#!/usr/bin/env python
"""Regenerate COVERAGE.md from the query registry. Run from repo root."""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warehouse_pg_spark.queries import REGISTRY  # noqa: E402

SECTION = {
    "tpch": "§2 headline TPC-H (scan/filter/join/agg/sort/limit)",
    "tpch_full": "§2 full TPC-H shapes (subqueries, semi/anti, DQA, disjunctive preds)",
    "joins": "§2.3 joins (all shapes, null-aware NOT IN, theta/range, lateral, correlated)",
    "aggregates": "§2.4 aggregation (DQA, grouping sets, ordered/stat/sketch aggs)",
    "window": "§2.5 windows (frames, GROUPS, EXCLUDE, ranking, analytic)",
    "setops": "§2.6/§2.7 set ops + VALUES + sample + limit/offset + CTE reuse",
    "functions_lib": "§2.9 scalar function library",
    "gp_types": "§1.2/§2.9 GP types (complex, svec, matrix, ordered-set, HLL)",
    "pg_sql": "§3.1 PG SQL front-end (dialect shim + recursive CTEs end-to-end)",
    "events_json": "§2.9 JSON + pivot/unpivot + sessionize + json_agg/json_table (events)",
    "timeseries": "§2.3/§2.9 time-series (as-of, range join, interpolate, downsample)",
    "dedup": "north-star dedup (exact, minhash-LSH, simhash, n-gram, fingerprint)",
    "similarity": "north-star similarity search (brute-force, IVF, LSH)",
    "textops": "north-star text analysis (lang-id, quality, tokens)",
    "multimodal_q": "north-star multimodal binary columns (mapInPandas decode, frame sampling)",
    "recursive": "§2.7 RecursiveUnion (WITH RECURSIVE fixpoint, DataFrame level)",
    "srf_udf": "§2.11 SRF/UDTF/UDA/table functions",
}

HEAD_EXTRA = """Non-query surfaces (tested outside the registry): DML copy-on-write
(`tests/test_engine.py`), external CSV ingest with reject limits
(`test_engine.py::test_external_csv_sreh`), partitioned layout with
static+dynamic pruning (`tests/test_partitioning.py`), bucketed
co-located joins + ANALYZE/CBO stats (`tests/test_bucketing.py`),
AQE skew-join split + salted-join fallback (`tests/test_skew.py`),
Structured Streaming incl. applyInPandasWithState
(`tests/test_streaming.py`), multimodal decode stubs + IVF recall
(`tests/test_operators.py`), physical-plan quality gates
(`tests/test_plans.py`), dialect property tests
(`tests/test_dialect_property.py`)."""


def main() -> None:
    by_mod = collections.defaultdict(list)
    for name, q in sorted(REGISTRY.items()):
        mod = q.fn.__module__.split(".")[-1]
        doc = (q.doc or "").strip().splitlines()[0] if q.doc else ""
        by_mod[mod].append(
            (name, "oracle" if q.oracle else "rows-only", ", ".join(q.tags), doc)
        )
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    lines = [
        "# COVERAGE — registry inventory vs SURVEY §2",
        "",
        f"{len(REGISTRY)} registered queries ({n_oracle} DuckDB-oracle-checked, "
        f"{len(REGISTRY) - n_oracle} rows-only). Every entry is exposed through",
        "`__spark_entry__.queries()` / `oracle_sql()` and runs in `tests/test_oracle_parity.py`.",
        "",
        HEAD_EXTRA,
        "",
    ]
    for mod, rows in sorted(by_mod.items()):
        lines.append(f"## {mod} — {SECTION.get(mod, '')}")
        lines.append("")
        lines.append("| query | check | tags | summary |")
        lines.append("|---|---|---|---|")
        for name, check, tags, doc in rows:
            lines.append(f"| `{name}` | {check} | {tags} | {doc.replace('|', '/')} |")
        lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(REGISTRY)} queries")


if __name__ == "__main__":
    main()
