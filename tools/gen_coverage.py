#!/usr/bin/env python
"""Regenerate COVERAGE.md from the live query registry.

Keeps the hand-written preamble (everything before the first `## `
module section) and rewrites the per-module tables: one row per
registered query with its check kind, tags, and docstring first line.
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warehouse_pg_spark.queries import REGISTRY  # noqa: E402

SECTION_TITLES = {
    "tpch": "tpch — §2 TPC-H anchor shapes (scan/agg/join/topk)",
    "tpch_full": "tpch_full — §2.3/2.4 the remaining TPC-H query shapes",
    "joins": "joins — §2.3 join variants",
    "aggregates": "aggregates — §2.4 aggregation (DQA, grouping sets, ordered/stat/sketch aggs)",
    "window": "window — §2.5 window functions (frames, exclusion, ranking)",
    "setops": "setops — §2.7 set operations + §2.6 sort/limit + sampling",
    "functions_lib": "functions_lib — §2.9 scalar function library",
    "events_json": "events_json — JSON + event-stream batch analytics",
    "timeseries": "timeseries — as-of / range joins, gap fill, LOCF",
    "dedup": "dedup — training-data deduplication family",
    "similarity": "similarity — embedding ANN / KNN family",
    "textops": "textops — text quality / tokenization / pipeline family",
    "recursive": "recursive — §2.7 RecursiveUnion",
    "srf_udf": "srf_udf — §2.1/2.11 SRF, UDTF, table functions, UDA",
    "gp_types": "gp_types — GP type shims (complex/svec/range/money/uuid)",
    "pg_sql": "pg_sql — PG-dialect SQL text through the engine",
    "multimodal_q": "multimodal_q — §north-star binary media columns",
}


def main() -> None:
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    text = open(path).read()
    preamble = text.split("\n## ", 1)[0].rstrip("\n")

    n = len(REGISTRY)
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    preamble = re.sub(
        r"\d+ registered queries \(\d+ DuckDB-oracle-checked, \d+ rows-only\)",
        f"{n} registered queries ({n_oracle} DuckDB-oracle-checked, "
        f"{n - n_oracle} rows-only)",
        preamble,
    )

    by_mod: dict[str, list] = defaultdict(list)
    for name, q in REGISTRY.items():
        mod = q.fn.__module__.rsplit(".", 1)[-1]
        by_mod[mod].append((name, q))

    out = [preamble, ""]
    for mod in SECTION_TITLES:
        entries = sorted(by_mod.get(mod, []))
        if not entries:
            continue
        out.append(f"## {SECTION_TITLES[mod]}")
        out.append("")
        out.append("| query | check | tags | summary |")
        out.append("|---|---|---|---|")
        for name, q in entries:
            fn = getattr(q.fn, "__wrapped__", q.fn)
            doc = (fn.__doc__ or "").strip().splitlines()
            summary = doc[0].strip() if doc else ""
            check = "oracle" if q.oracle is not None else "rows-only"
            out.append(
                f"| `{name}` | {check} | {', '.join(q.tags)} | {summary} |"
            )
        out.append("")
    open(path, "w").write("\n".join(out).rstrip("\n") + "\n")
    print(f"COVERAGE.md: {n} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
