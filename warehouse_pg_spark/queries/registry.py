"""Registry plumbing + cross-engine parity helpers.

Parity rules (every registered query follows these so its result is
bit-identical between Spark and the DuckDB oracle):

1. **Float sums are order-dependent** — Spark and DuckDB sum partitions
   in different orders, so double aggregation diverges in the last ulp.
   Fix: cast money-like inputs (2-decimal doubles in the fixtures) to
   DECIMAL *before* arithmetic; decimal +,* are exact and associative in
   both engines. Final results cast to an explicit DECIMAL(38,s) so the
   schema matches too.
2. **Averages** = CAST(decimal_sum AS DOUBLE) / count — a single IEEE
   division of identical operands is bit-identical across engines.
3. **No raw timestamps in outputs** — Spark TimestampType is
   tz-aware (LTZ), DuckDB TIMESTAMP is naive; emit DATE or a formatted
   string instead.
4. **Integer aggregates**: DuckDB SUM(BIGINT) returns HUGEINT — oracles
   wrap it in CAST(... AS BIGINT) to match Spark's LongType.
5. Row order never matters (driver hash is order-insensitive), but
   LIMIT/top-K queries break ties on a unique key so the *set* of rows
   is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable:
    """Decorator: register fn(spark, sf_dir) -> DataFrame under `name`."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table, normalizing physical-type quirks
    (TIMESTAMP(NANOS) → µs; see catalog.read_parquet_table)."""
    from warehouse_pg_spark.catalog import read_parquet_table

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return read_parquet_table(spark, f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- parity utils

# Money-like fixture doubles hold exactly 2 decimal digits; DECIMAL(18,2)
# recovers the intended value exactly in both engines.
MONEY = "decimal(18,2)"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: Column, scale: int = 2) -> Column:
    """Exact, order-independent sum → DECIMAL(38, scale)."""
    return F.sum(col).cast(f"decimal(38,{scale})")


def davg(col: Column) -> Column:
    """Order-independent average as a double (decimal sum / count)."""
    return F.sum(col).cast("double") / F.count(col)


def oracle_davg(expr: str, dec_type: str = MONEY) -> str:
    """DuckDB SQL matching davg(dec(expr))."""
    return f"CAST(SUM(CAST({expr} AS {dec_type})) AS DOUBLE) / COUNT({expr})"
