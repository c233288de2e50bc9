"""Window-function surface from SURVEY §2.5.

Reference coverage: nodeWindowAgg.c (3,881 LoC; frames :1454-1480),
windowfuncs.c ranking (:82-211) and analytic (:338-449) functions; ORCA
CPhysicalSequenceProject. Spark WindowExec covers ROWS/RANGE frames;
ranking/analytic functions are name-identical.

row_number/lag/lead require a total order per partition — every query
orders by a unique key (tiebreaks) so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from warehouse_pg_spark.queries.registry import dec, register, table


@register(
    "window_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
           ROUND(CUME_DIST()    OVER w, 6) AS cd,
           NTILE(4)       OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six ranking functions (windowfuncs.c:82-211)."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_orderkey, o_custkey,
           LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS prev_price,
           LEAD(CAST(o_totalprice AS DECIMAL(18,2)), 2, CAST(-1 AS DECIMAL(18,2))) OVER w AS next2_price,
           strftime(LAG(o_orderdate) OVER w, '%Y-%m-%d') AS prev_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with offset + default (windowfuncs.c:338-449)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag(dec("o_totalprice"), 1).over(w).alias("prev_price"),
        F.lead(dec("o_totalprice"), 2, -1).over(w).cast("decimal(18,2)").alias("next2_price"),
        F.lag("o_orderdate").over(w).cast("date").alias("prev_date"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DECIMAL(38,2)) AS running_total
    FROM orders
    """,
    tags=("window", "bench"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total — any aggregate as a window fn over a ROWS frame."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("decimal(38,2)").alias("running_total"),
    )


@register(
    "window_moving_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                OVER w AS DECIMAL(38,2)) AS qty_window,
           MIN(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS qty_min
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity, l_partkey, l_suppkey, l_extendedprice
                 ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
    """,
    tags=("window",),
)
def window_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame (nodeWindowAgg.c:1454-1480 frame options).

    (l_orderkey, l_linenumber) is NOT unique in the fixtures — the
    ORDER BY includes every observable column so tie permutations can't
    change the result (remaining ties are interchangeable rows)."""
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy(
            "l_linenumber", "l_quantity", "l_partkey", "l_suppkey", "l_extendedprice"
        )
        .rowsBetween(-2, 1)
    )
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_quantity")).over(w).cast("decimal(38,2)").alias("qty_window"),
        F.min(dec("l_quantity")).over(w).alias("qty_min"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT c_custkey, c_acctbal,
           COUNT(*) OVER (ORDER BY c_acctbal RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS peers_within_500
    FROM customer
    """,
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with numeric offsets (value-based framing).

    The frame has no PARTITION BY, which would plan as Exchange
    SinglePartition; instead the value-banded rewrite
    (operators/prefix.banded_range_agg) replicates each row into its
    ±1 value band and runs the same RANGE frame partitioned by band —
    full parallelism, identical result (gated by tests/test_plans.py).
    """
    from warehouse_pg_spark.operators.prefix import banded_range_agg

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    out = banded_range_agg(
        c,
        value_col="c_acctbal",
        lo=-500,
        hi=500,
        agg_exprs={"peers_within_500": F.count("*")},
    )
    return out.select("c_custkey", "c_acctbal", "peers_within_500")


@register(
    "window_first_last_nth",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FIRST_VALUE(l_partkey) OVER w AS first_part,
           LAST_VALUE(l_partkey)  OVER (PARTITION BY l_orderkey
                                        ORDER BY l_linenumber, l_partkey, l_suppkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_part,
           NTH_VALUE(l_partkey, 2) OVER w AS second_part
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey)
    """,
    tags=("window",),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value incl. the classic full-frame LAST_VALUE.

    Tiebreakers cover l_partkey (the observed value) since
    (l_orderkey, l_linenumber) is not unique in the fixtures."""
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_partkey").over(w).alias("first_part"),
        F.last("l_partkey").over(wfull).alias("last_part"),
        F.nth_value("l_partkey", 2).over(w).alias("second_part"),
    )


@register(
    "window_partition_agg",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY c_mktsegment) AS DECIMAL(38,2)) AS seg_total,
           COUNT(*) OVER (PARTITION BY c_mktsegment) AS seg_n
    FROM customer
    """,
    tags=("window",),
)
def window_partition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition window aggregate (no ORDER BY → full frame)."""
    w = Window.partitionBy("c_mktsegment")
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.sum(dec("c_acctbal")).over(w).cast("decimal(38,2)").alias("seg_total"),
        F.count("*").over(w).alias("seg_n"),
    )


@register(
    "window_groups_frame",
    oracle="""
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
             DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS dr
      FROM lineitem WHERE l_orderkey % 101 = 0
    )
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                OVER (PARTITION BY l_returnflag ORDER BY dr
                      RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                AS DECIMAL(38,2)) AS groups_sum
    FROM ranked
    """,
    tags=("window", "frames"),
)
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS frame (nodeWindowAgg.c:1454-1480) — Spark has no GROUPS
    mode; lowered via dense_rank + RANGE frame
    (operators/window_ext.groups_frame_agg). DuckDB hasn't implemented
    GROUPS either, so the oracle uses the SQL form of the same
    dense_rank identity (independent engine, same algebra)."""
    from warehouse_pg_spark.operators.window_ext import groups_frame_agg

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    out = groups_frame_agg(
        li,
        agg=lambda v: F.sum(dec(v)),
        value="l_quantity",
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=-1,
        end=1,
        out="groups_sum",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.col("groups_sum").cast("decimal(38,2)").alias("groups_sum"),
    )


@register(
    "window_exclude_current_row",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                      RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                      EXCLUDE CURRENT ROW)
                AS DECIMAL(38,2)) AS excl_sum
    FROM lineitem WHERE l_orderkey % 101 = 0
    """,
    tags=("window", "frames"),
)
def window_exclude_current_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE CURRENT ROW — lowered to frame_sum - current_value
    (operators/window_ext.sum_exclude)."""
    from warehouse_pg_spark.operators.window_ext import sum_exclude

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    out = sum_exclude(
        li,
        value=dec("l_quantity"),
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=-2,
        end=2,
        exclude="current row",
        out="excl_sum",
        frame_type="range",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.col("excl_sum").cast("decimal(38,2)").alias("excl_sum"),
    )


@register(
    "window_exclude_group",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                      RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                      EXCLUDE GROUP)
                AS DECIMAL(38,2)) AS excl_sum
    FROM lineitem WHERE l_orderkey % 101 = 0
    """,
    tags=("window", "frames"),
)
def window_exclude_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE GROUP — frame_sum minus the peer-group sum."""
    from warehouse_pg_spark.operators.window_ext import sum_exclude

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    out = sum_exclude(
        li,
        value=dec("l_quantity"),
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=-2,
        end=2,
        exclude="group",
        out="excl_sum",
        frame_type="range",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.col("excl_sum").cast("decimal(38,2)").alias("excl_sum"),
    )


@register(
    "window_exclude_ties",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                      RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                      EXCLUDE TIES)
                AS DECIMAL(38,2)) AS excl_sum
    FROM lineitem WHERE l_orderkey % 101 = 0
    """,
    tags=("window", "frames"),
)
def window_exclude_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE TIES — frame_sum - peer_sum + current_value."""
    from warehouse_pg_spark.operators.window_ext import sum_exclude

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    out = sum_exclude(
        li,
        value=dec("l_quantity"),
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=-2,
        end=2,
        exclude="ties",
        out="excl_sum",
        frame_type="range",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.col("excl_sum").cast("decimal(38,2)").alias("excl_sum"),
    )


@register(
    "window_exclude_group_minmax",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           MIN(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                                 RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                                 EXCLUDE GROUP) AS excl_min,
           MAX(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                                 RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                                 EXCLUDE GROUP) AS excl_max
    FROM lineitem WHERE l_orderkey % 101 = 0
    """,
    tags=("window", "frames"),
)
def window_exclude_group_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE GROUP for non-subtractable min/max — anti-frame union
    (operators/window_ext.minmax_exclude): min/max over the two RANGE
    sub-frames flanking the peer group, combined with least/greatest
    (nodeWindowAgg.c:1454-1480)."""
    from warehouse_pg_spark.operators.window_ext import minmax_exclude

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    out = minmax_exclude(
        li,
        value="l_quantity",
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=-2,
        end=2,
        agg="min",
        exclude="group",
        out="excl_min",
        frame_type="range",
        # l_quantity is integer-stepped (1..50) though stored as double
        assume_discrete=True,
    )
    out = minmax_exclude(
        out,
        value="l_quantity",
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=-2,
        end=2,
        agg="max",
        exclude="group",
        out="excl_max",
        frame_type="range",
        assume_discrete=True,
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_quantity", "excl_min", "excl_max"
    )


@register(
    "window_exclude_ties_minmax",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           MAX(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                                 RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                                 EXCLUDE TIES) AS excl_max
    FROM lineitem WHERE l_orderkey % 101 = 0
    """,
    tags=("window", "frames"),
)
def window_exclude_ties_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUDE TIES for max — anti-frame union plus the surviving
    current-row value."""
    from warehouse_pg_spark.operators.window_ext import minmax_exclude

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    out = minmax_exclude(
        li,
        value="l_quantity",
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=-2,
        end=2,
        agg="max",
        exclude="ties",
        out="excl_max",
        frame_type="range",
        # l_quantity is integer-stepped (1..50) though stored as double
        assume_discrete=True,
    )
    return out.select("l_orderkey", "l_linenumber", "l_quantity", "excl_max")


@register(
    "window_exclude_range_current",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           MIN(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                                 RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                                 EXCLUDE CURRENT ROW) AS excl_min,
           MAX(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                                 RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                                 EXCLUDE CURRENT ROW) AS excl_max
    FROM lineitem WHERE l_orderkey % 101 = 0
    """,
    tags=("window", "frames"),
)
def window_exclude_range_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame + EXCLUDE CURRENT ROW for non-subtractable min/max —
    the last frame-mode combination (nodeWindowAgg.c:1454-1480): the
    post-exclusion frame is the two flanking RANGE sub-frames plus the
    peer group minus self, the latter via ROWS flanks inside a
    peer-keyed partition (operators/window_ext.minmax_exclude)."""
    from warehouse_pg_spark.operators.window_ext import minmax_exclude

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    out = minmax_exclude(
        li,
        value="l_quantity",
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=-2,
        end=2,
        agg="min",
        exclude="current row",
        out="excl_min",
        frame_type="range",
    )
    out = minmax_exclude(
        out,
        value="l_quantity",
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=-2,
        end=2,
        agg="max",
        exclude="current row",
        out="excl_max",
        frame_type="range",
    )
    return out.select(
        "l_orderkey", "l_linenumber", "l_quantity", "excl_min", "excl_max"
    )


@register(
    "window_exclude_groups_frame",
    oracle="""
    WITH ranked AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
             DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS dr
      FROM lineitem WHERE l_orderkey % 101 = 0
    )
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                OVER (PARTITION BY l_returnflag ORDER BY dr
                      RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
                      EXCLUDE GROUP)
                AS DECIMAL(38,2)) AS excl_sum,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                OVER (PARTITION BY l_returnflag ORDER BY dr
                      RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
                      EXCLUDE CURRENT ROW)
                AS DECIMAL(38,2)) AS excl_cur_sum
    FROM ranked
    """,
    tags=("window", "frames"),
)
def window_exclude_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS frame + EXCLUDE GROUP / EXCLUDE CURRENT ROW — the last
    cell of the frame-mode × exclusion matrix (nodeWindowAgg.c
    frameOptions): a GROUPS frame over the ORDER BY key IS a RANGE
    frame over dense_rank (peers share a rank), so the existing
    range-frame exclusion machinery (operators/window_ext.sum_exclude)
    composes directly on the rank key. DuckDB has no GROUPS mode
    either, so the oracle spells the same dense_rank identity with its
    native RANGE + EXCLUDE."""
    from warehouse_pg_spark.operators.window_ext import sum_exclude

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    rank_w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    ranked = li.withColumn("__dr", F.dense_rank().over(rank_w))
    out = sum_exclude(
        ranked,
        value=dec("l_quantity"),
        partition_by=["l_returnflag"],
        order_by=["__dr"],
        start=-1,
        end=1,
        exclude="group",
        out="excl_sum",
        frame_type="range",
    )
    out = sum_exclude(
        out,
        value=dec("l_quantity"),
        partition_by=["l_returnflag"],
        order_by=["__dr"],
        start=-1,
        end=1,
        exclude="current row",
        out="excl_cur_sum",
        frame_type="range",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.col("excl_sum").cast("decimal(38,2)").alias("excl_sum"),
        F.col("excl_cur_sum").cast("decimal(38,2)").alias("excl_cur_sum"),
    )


@register(
    "window_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT n_name, c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) t WHERE rn <= 3
    """,
    tags=("window", "bench"),
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group — the canonical window+filter pattern."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            dec("c_acctbal").alias("c_acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_range_interval",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               AS DECIMAL(38,2)) AS v_last_hour
    FROM events
    """,
    tags=("window", "timeseries"),
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with a time-interval offset (nodeWindowAgg.c
    RANGE ... PRECEDING over timestamp ORDER BY) — the trailing-hour
    rolling metric. Spark's rangeBetween is numeric-only, so the
    lowering orders by epoch millis with a -3,600,000 lower bound;
    value-based inclusive bounds match PG/DuckDB exactly, including
    peer-row ties."""
    from warehouse_pg_spark.queries.registry import dec

    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.sum(dec("value")).over(w).cast("decimal(38,2)").alias("v_last_hour"),
    )


@register(
    "window_rows_exclude_group",
    oracle="""
    SELECT l_returnflag, l_quantity,
           CAST(SUM(l_quantity)
                OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                      ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING
                      EXCLUDE GROUP)
                AS DECIMAL(38,2)) AS excl_sum
    FROM lineitem WHERE l_orderkey % 101 = 0
    """,
    tags=("window", "frames"),
)
def window_rows_exclude_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frame + EXCLUDE GROUP — the formerly-missing cell of the
    frame x exclusion matrix (nodeWindowAgg.c:1454-1480). Collect-filter
    evaluator (operators/window_ext.rows_exclude_agg): bounded frame ⇒
    constant per-row state, higher-order filter drops the peer group,
    array fold re-aggregates — all JVM-side.

    Aggregating the ORDER BY key itself keeps the output multiset
    tie-order-invariant (per-row results are position functions), so
    the sorted-rows value hash is engine-comparable."""
    from warehouse_pg_spark.operators.window_ext import rows_exclude_agg

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    out = rows_exclude_agg(
        li,
        value="l_quantity",
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=-2,
        end=1,
        agg="sum",
        exclude="group",
        out="excl_sum",
    )
    return out.select(
        "l_returnflag",
        "l_quantity",
        F.col("excl_sum").cast("decimal(38,2)").alias("excl_sum"),
    )


@register(
    "window_rows_exclude_ties",
    oracle="""
    SELECT l_returnflag, l_quantity,
           MAX(l_quantity)
               OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                     ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING
                     EXCLUDE TIES) AS excl_max
    FROM lineitem WHERE l_orderkey % 101 = 0
    """,
    tags=("window", "frames"),
)
def window_rows_exclude_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frame + EXCLUDE TIES (peers leave, the current row stays) —
    the other formerly-missing matrix cell, same collect-filter
    evaluator, max over the survivors via array_max."""
    from warehouse_pg_spark.operators.window_ext import rows_exclude_agg

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    out = rows_exclude_agg(
        li,
        value="l_quantity",
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=-2,
        end=1,
        agg="max",
        exclude="ties",
        out="excl_max",
    )
    return out.select("l_returnflag", "l_quantity", "excl_max")


@register(
    "window_rows_unbounded_exclude",
    oracle="""
    SELECT l_returnflag, l_quantity,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                      EXCLUDE GROUP)
                AS DOUBLE) AS run_sum_excl,
           MAX(l_quantity)
               OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                     EXCLUDE TIES) AS suffix_max_excl
    FROM lineitem WHERE l_orderkey % 101 = 0
    """,
    tags=("window", "frames"),
)
def window_rows_unbounded_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-unbounded ROWS frames + EXCLUDE — the final frame x
    exclusion matrix cell (nodeWindowAgg.c:1454-1480), both directions:
    a running sum that excludes the whole peer group (survivors = rows
    with a strictly smaller key — tie-order-invariant), and a mirrored
    suffix max EXCLUDE TIES (strictly greater keys + self), evaluated
    over the reversed order by the same prefix/flank machinery
    (operators/window_ext._exclude_half_unbounded). Nothing unbounded
    is ever collected; both columns share one partition shuffle."""
    from warehouse_pg_spark.operators.window_ext import rows_exclude_agg

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    out = rows_exclude_agg(
        li.withColumn("__price", dec(F.col("l_extendedprice"))),
        value="__price",
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=Window.unboundedPreceding,
        end=0,
        agg="sum",
        exclude="group",
        out="run_sum_excl",
    )
    out = rows_exclude_agg(
        out,
        value="l_quantity",
        partition_by=["l_returnflag"],
        order_by=["l_quantity"],
        start=0,
        end=Window.unboundedFollowing,
        agg="max",
        exclude="ties",
        out="suffix_max_excl",
    )
    return out.select(
        "l_returnflag",
        "l_quantity",
        F.col("run_sum_excl").cast("double").alias("run_sum_excl"),
        "suffix_max_excl",
    )
