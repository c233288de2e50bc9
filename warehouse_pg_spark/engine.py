"""Engine facade: the user-facing API tying together session, catalog,
dialect shim, function registry, DML, and materialized views.

The WHPG surface (SURVEY §3.1 query lifecycle) collapses to:

    eng = Engine()                       # postmaster + GUCs
    eng.attach_fixtures(sf_dir)          # catalog
    eng.sql("SELECT ...")                # parse/plan/execute (Catalyst)
    eng.create_function(...)             # CREATE FUNCTION (§2.11)
    eng.create_table / insert / update / delete   # DDL + ModifyTable
    eng.create_materialized_view / refresh        # matview.c analogue
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from warehouse_pg_spark import sql_dialect
from warehouse_pg_spark.catalog import Catalog
from warehouse_pg_spark.functions.pg import register_pg_functions
from warehouse_pg_spark.operators.dml import ParquetTable
from warehouse_pg_spark.session import SessionConfig, get_spark

_DISTRIBUTED_BY_RE = re.compile(
    r"\s+DISTRIBUTED\s+BY\s*\(([^)]*)\)|\s+DISTRIBUTED\s+(RANDOMLY|REPLICATED)",
    re.IGNORECASE,
)


@dataclass
class MaterializedView:
    name: str
    sql: str
    path: str


class Engine:
    """PySpark-native warehouse engine with a PG-flavored front-end."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        config: SessionConfig | None = None,
        warehouse_dir: str | None = None,
    ):
        self.spark = spark or get_spark(config)
        self.catalog = Catalog(self.spark)
        self.warehouse_dir = warehouse_dir or os.path.join(
            os.getcwd(), "spark-warehouse-data"
        )
        self._matviews: dict[str, MaterializedView] = {}
        register_pg_functions(self.spark)

    # ---------------------------------------------------------------- query
    def sql(self, text: str, **named_args) -> DataFrame:
        """Execute SQL through the PG→Spark dialect shim."""
        lowered = sql_dialect.rewrite(text)
        ddl = self._maybe_ddl(lowered)
        if ddl is not None:
            return ddl
        if named_args:
            return self.spark.sql(lowered, args=named_args)
        return self.spark.sql(lowered)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # ----------------------------------------------------------------- DDL
    def _maybe_ddl(self, text: str) -> DataFrame | None:
        """Handle GP DDL Spark's parser rejects: DISTRIBUTED BY clauses.

        `CREATE TABLE ... DISTRIBUTED BY (k)` (reference parser
        gram.y:5597-5605, gp_distribution_policy.h) — distribution is a
        perf hint under Spark (SURVEY §1.1): recorded in the catalog,
        stripped from the DDL."""
        m = _DISTRIBUTED_BY_RE.search(text)
        if m is None:
            return None
        keys: tuple[str, ...] = ()
        policy = "random"
        if m.group(1):
            policy = "hash"
            keys = tuple(k.strip() for k in m.group(1).split(","))
        elif m.group(2):
            policy = m.group(2).lower()  # randomly | replicated
            policy = {"randomly": "random", "replicated": "replicated"}[policy]
        stripped = _DISTRIBUTED_BY_RE.sub("", text)
        out = self.spark.sql(stripped)
        name_m = re.search(r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)", text, re.IGNORECASE)
        if name_m:
            from warehouse_pg_spark.catalog import TableInfo

            tname = name_m.group(1).split(".")[-1]
            self.catalog.tables[tname] = TableInfo(
                name=tname, path="", distribution=(policy, keys)
            )
        return out

    # ------------------------------------------------------------- catalog
    def attach_fixtures(self, sf_dir: str) -> None:
        self.catalog.register_fixtures(sf_dir)

    def attach_parquet(self, name: str, path: str, **kw) -> None:
        self.catalog.register_parquet(name, path, **kw)

    # ----------------------------------------------------------------- UDF
    def create_function(self, name: str, fn, return_type) -> None:
        """CREATE FUNCTION for Python callables (§2.11). Row-at-a-time —
        the slow path; prefer create_sql_function / pandas UDFs."""
        self.spark.udf.register(name, fn, return_type)

    def create_sql_function(self, name: str, signature: str, returns: str, body: str) -> None:
        """CREATE FUNCTION as a pure-SQL expression (fast path: Catalyst
        codegen, no Python boundary)."""
        self.spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({signature}) "
            f"RETURNS {returns} RETURN {body}"
        )

    def create_pandas_aggregate(self, name: str, fn, return_type) -> None:
        """CREATE AGGREGATE via vectorized pandas GROUPED_AGG UDF
        (reference commands/aggregatecmds.c; partial-merge caveat
        documented in SURVEY §7.5)."""
        from pyspark.sql.functions import PandasUDFType, pandas_udf

        self.spark.udf.register(
            name, pandas_udf(fn, return_type, PandasUDFType.GROUPED_AGG)
        )

    # ----------------------------------------------------------------- DML
    def writable(self, path: str) -> ParquetTable:
        return ParquetTable(self.spark, path)

    def create_table_from(self, name: str, df: DataFrame, partition_by: tuple[str, ...] = ()) -> ParquetTable:
        """CTAS into the warehouse dir; registers a view."""
        path = os.path.join(self.warehouse_dir, name)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        self.catalog.register_parquet(name, path, partition_cols=partition_by)
        return ParquetTable(self.spark, path)

    def create_bucketed_table(
        self,
        name: str,
        df: DataFrame,
        keys: tuple[str, ...],
        num_buckets: int = 32,
    ) -> DataFrame:
        """`CREATE TABLE ... DISTRIBUTED BY (keys)` with real data
        placement: bucketed managed table (see
        Catalog.materialize_bucketed)."""
        return self.catalog.materialize_bucketed(name, df, keys, num_buckets)

    def analyze(self, name: str, columns: tuple[str, ...] = ()) -> None:
        """ANALYZE (commands/analyze.c): compute table + column stats
        feeding Catalyst CBO join reordering (ORCA's statistics
        derivation analogue, SURVEY §4.1). Works on catalog tables
        (bucketed/CTAS), not temp views."""
        stmt = f"ANALYZE TABLE {name} COMPUTE STATISTICS"
        self.spark.sql(stmt)
        if columns:
            self.spark.sql(
                f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS "
                + ", ".join(columns)
            )

    # ------------------------------------------------------------ matviews
    def create_materialized_view(self, name: str, sql: str) -> DataFrame:
        """CREATE MATERIALIZED VIEW (commands/matview.c analogue):
        results persisted as parquet + registered; refresh re-runs."""
        path = os.path.join(self.warehouse_dir, f"_mv_{name}")
        df = self.sql(sql)
        df.write.mode("overwrite").parquet(path)
        self._matviews[name] = MaterializedView(name, sql, path)
        self.spark.read.parquet(path).createOrReplaceTempView(name)
        return self.spark.table(name)

    def refresh_materialized_view(self, name: str) -> DataFrame:
        mv = self._matviews[name]
        return self.create_materialized_view(mv.name, mv.sql)

    # -------------------------------------------------------- introspection
    def metrics(self) -> DataFrame:
        """Cluster/table introspection (gp_toolkit / gp_size_of_* and
        pg_relation_size analogues, SURVEY §2.9 misc): one row per
        registered table with row count, on-disk bytes, file count, and
        the distribution hint. Sizes come from the filesystem (the
        storage layer a DBA actually bills), row counts from a
        metadata-only parquet count."""
        rows = []
        for name, info in sorted(self.catalog.tables.items()):
            n_bytes, n_files = 0, 0
            if os.path.isdir(info.path):
                for root, _dirs, files in os.walk(info.path):
                    for f in files:
                        if not f.startswith(("_", ".")):
                            n_files += 1
                            n_bytes += os.path.getsize(os.path.join(root, f))
            elif os.path.exists(info.path):
                n_files, n_bytes = 1, os.path.getsize(info.path)
            n_rows = self.catalog.load(name).count()
            policy, keys = info.distribution
            rows.append((name, n_rows, n_bytes, n_files, policy, list(keys)))
        return self.spark.createDataFrame(
            rows,
            "table_name string, n_rows long, n_bytes long, n_files long, "
            "distribution string, dist_keys array<string>",
        )
