"""Registry invariants the grading driver depends on.

The driver scores only the FIRST 50 registry entries (dict insertion
order), so the curated DRIVER_PREFIX must actually be the prefix, every
prefix entry must be oracle-checkable, and the prefix must span every
SURVEY §2 family (one representative tag each).
"""

from __future__ import annotations

from warehouse_pg_spark.queries import DRIVER_PREFIX, REGISTRY

# tag → family the prefix must exercise
REQUIRED_FAMILY_TAGS = [
    "scan",
    "join",
    "subquery",
    "lateral",
    "dqa",
    "groupingsets",
    "percentile",
    "ordered-agg",
    "orderedset",
    "sketch",
    "filter-clause",
    "window",
    "frames",
    "setop",
    "sample",
    "sort",
    "limit",
    "cte",
    "recursive",
    "srf",
    "udtf",
    "uda",
    "tablefunc",
    "external",
    "functions",
    "regex",
    "arrays",
    "datetime",
    "json",
    "asof",
    "timeseries",
    "streaming-batch",
    "dedup",
    "minhash",
    "similarity",
    "ivf",
    "pipeline",
    "text",
    "multimodal",
    "dialect",
]


def test_prefix_is_first_50():
    assert len(DRIVER_PREFIX) == 50
    assert list(REGISTRY)[:50] == list(DRIVER_PREFIX)


def test_prefix_entries_all_oracle_checkable():
    holes = [n for n in DRIVER_PREFIX if REGISTRY[n].oracle is None]
    assert not holes, f"prefix entries without oracle: {holes}"


def test_prefix_spans_every_family():
    seen: set[str] = set()
    for n in DRIVER_PREFIX:
        seen.update(REGISTRY[n].tags)
    missing = [t for t in REQUIRED_FAMILY_TAGS if t not in seen]
    assert not missing, f"families with no driver-scored representative: {missing}"


def test_no_rows_only_entries_anywhere():
    """Every registered query is oracle-checkable (driver shows zero
    'no_oracle' rows)."""
    holes = [n for n, q in REGISTRY.items() if q.oracle is None]
    assert not holes, f"rows-only entries: {holes}"
