"""Scale-safe replacements for global (unpartitioned) window shapes.

A `Window.orderBy(...)` with no PARTITION BY compiles to `Exchange
SinglePartition` — the whole table through one task, a driver-size
bottleneck at 100 TB (the reference never does this either: a global
running sum is planned as per-segment partials + a gather of segment
offsets, cdbgroup.c two-stage style).

Two rewrites live here:

running_sum
    Distributed prefix sum. Pass 1: range-repartition on the order key
    and compute a per-range local running sum. Pass 2: aggregate one
    total per range (tiny — one row per range), prefix-sum those on the
    driver, and broadcast the per-range offsets back. local + offset is
    exactly the global running sum. Shuffle cost: one range exchange +
    one hash exchange of the data, and a rows=num_ranges side table —
    no single-partition stage.

banded_range_agg
    Global RANGE-frame aggregate (ORDER BY v RANGE BETWEEN lo AND hi)
    via value banding. Bucket rows by floor(v / W) with W = max(|lo|,
    hi): every row within [v+lo, v+hi] of a bucket-b row lives in
    buckets b-1..b+1. Replicate each row into its three neighbor
    buckets, run the same RANGE frame *partitioned by bucket*, and keep
    only each row's home copy. 3× replication buys full parallelism —
    the 100 TB trade the reference's Motion-based window plans make.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def running_sum(
    df: DataFrame,
    order_by: str,
    value: Column | str,
    out: str = "csum",
    num_ranges: int | None = None,
) -> DataFrame:
    """Global `SUM(value) OVER (ORDER BY order_by ROWS UNBOUNDED
    PRECEDING)` without an Exchange SinglePartition.

    `order_by` must be a total order (unique key) for the result to be
    deterministic — same contract as the global window it replaces.
    """
    spark = df.sparkSession
    val = F.col(value) if isinstance(value, str) else value
    if num_ranges is None:
        num_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    ranged = df.repartitionByRange(num_ranges, F.col(order_by)).withColumn(
        "__rng", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("__rng")
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__local", F.sum(val).over(w_local))

    # one row per range — tiny by construction; the driver-side prefix
    # over num_ranges values is loop control, not data processing
    totals = (
        local.groupBy("__rng").agg(F.max("__local").alias("__tot")).collect()
    )
    offsets, acc = [], 0
    for r in sorted(totals, key=lambda r: r["__rng"]):
        offsets.append((r["__rng"], acc))
        acc += r["__tot"] or 0
    off_df = spark.createDataFrame(offsets, "__rng int, __off bigint")

    return (
        local.join(F.broadcast(off_df), "__rng")
        .withColumn(out, (F.col("__local") + F.col("__off")).cast("bigint"))
        .drop("__rng", "__local", "__off")
    )


def banded_range_agg(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    agg_exprs: dict[str, Column],
    partition_by: tuple[str, ...] = (),
) -> DataFrame:
    """`agg OVER ([PARTITION BY ...] ORDER BY value_col RANGE BETWEEN
    |lo| PRECEDING AND hi FOLLOWING)` without a single-partition sort.

    agg_exprs maps output column name → an aggregate Column (e.g.
    F.count("*"), F.sum(...)); each is evaluated over the banded frame.
    lo/hi use rangeBetween sign conventions (lo negative = preceding).
    """
    width = float(max(abs(lo), abs(hi)))
    if width <= 0:
        raise ValueError("need a nonzero frame offset")
    home = F.floor(F.col(value_col) / width).cast("long")
    copies = df.withColumn("__home", home).withColumn(
        "__band",
        F.explode(
            F.array(F.col("__home") - 1, F.col("__home"), F.col("__home") + 1)
        ),
    )
    w = (
        Window.partitionBy(*partition_by, "__band")
        .orderBy(value_col)
        .rangeBetween(lo, hi)
    )
    agged = copies.select(
        "*", *[expr.over(w).alias(name) for name, expr in agg_exprs.items()]
    )
    return agged.filter(F.col("__band") == F.col("__home")).drop(
        "__home", "__band"
    )
