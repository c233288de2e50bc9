"""Run EVERY registered query against its DuckDB oracle (driver mirror).

One parametrized test per registry entry — this is the same gate the
driver applies at sf0.01, run locally at sf0.001 for speed.
"""

from __future__ import annotations

import pytest

from warehouse_pg_spark.queries import REGISTRY
from tests.parity import compare


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check (driver's weaker gate)
        return
    compare(df, q.oracle, sf_dir, name=name)
