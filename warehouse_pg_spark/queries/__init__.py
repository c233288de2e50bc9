"""Query registry: every SURVEY §2 operator is exercised by at least one
registered query with (Spark implementation, DuckDB oracle SQL) pair.

The driver contract (__spark_entry__.py) exposes this registry via
queries()/oracle_sql(); the test suite runs the same pairs locally.
"""

from warehouse_pg_spark.queries.registry import REGISTRY, Query, register

# Import side-effect: each module registers its queries.
from warehouse_pg_spark.queries import (  # noqa: F401, E402
    tpch,
    tpch_full,
    joins,
    aggregates,
    window,
    setops,
    functions_lib,
    events_json,
    timeseries,
    dedup,
    similarity,
    textops,
    recursive,
    srf_udf,
    gp_types,
    pg_sql,
    multimodal_q,
)

__all__ = ["REGISTRY", "Query", "register"]
