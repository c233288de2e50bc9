"""warehouse_pg_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
WarehousePG (Greenplum-derived MPP OLAP warehouse, reference at
/root/reference), re-expressed idiomatically on Spark SQL / Catalyst /
DataFrame API over columnar Parquet.

Architecture correspondence (SURVEY.md §2.8, §3):
  - WHPG coordinator (QD)   -> Spark driver
  - WHPG segments (QEs)     -> Spark executors / tasks
  - WHPG Motion (shuffle)   -> Spark Exchange (shuffle service)
  - WHPG AOCS column store  -> Parquet (columnar, compressed, predicate pushdown)
  - ORCA cost-based planner -> Catalyst + CBO + AQE

Public surface:
  - session.get_spark / SessionConfig  — tuned SparkSession factory
  - catalog.Catalog                    — table registry over parquet dirs
  - engine.Engine                      — facade: SQL + function registry + DML
  - operators.*                        — as-of join, range join, recursive CTE,
                                         dedup, similarity, text analysis
  - streaming.*                        — Structured Streaming event pipelines
"""

from warehouse_pg_spark.session import SessionConfig, get_spark
from warehouse_pg_spark.catalog import Catalog

__all__ = ["SessionConfig", "get_spark", "Catalog"]
__version__ = "0.1.0"
