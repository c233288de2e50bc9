"""Time-series operators: as-of join, range join, downsampling,
linear interpolation (reference: utils/adt/interpolate.c:236,
timeseries.sql regress; SURVEY §2.3 range/as-of row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from warehouse_pg_spark.operators.asof import asof_join
from warehouse_pg_spark.queries.registry import davg, dec, register, table


@register(
    "ts_asof_join",
    oracle="""
    SELECT p.event_id,
           epoch_ms(p.ts) AS purchase_ms,
           (SELECT epoch_ms(MAX(c.ts)) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts)
             AS last_click_ms
    FROM events p WHERE p.event_type = 'purchase'
    """,
    tags=("timeseries", "asof", "bench"),
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the user's latest click at-or-before.

    Implemented with the distributed union+window algorithm
    (operators/asof.py) — one shuffle on user_id, no nested loop."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=[],
    )
    return joined.select(
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("purchase_ms"),
        F.unix_millis(F.col("asof_ts").cast("timestamp")).alias(
            "last_click_ms"
        ),
    )


@register(
    "ts_range_join_buckets",
    oracle="""
    WITH buckets(bucket_id, lo, hi) AS (
      VALUES (0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 150.0), (3, 150.0, 1e9)
    )
    SELECT bucket_id, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
    FROM events JOIN buckets ON value >= lo AND value < hi
    GROUP BY bucket_id
    """,
    tags=("timeseries", "range-join"),
)
def ts_range_join_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join against a broadcast bucket table.

    The small side is broadcast → BroadcastNestedLoopJoin; at scale the
    bucket table stays tiny so this never shuffles the fact side."""
    e = table(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [(0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 150.0), (3, 150.0, 1e9)],
        ["bucket_id", "lo", "hi"],
    )
    from warehouse_pg_spark.queries.registry import dsum

    return (
        e.join(
            F.broadcast(buckets),
            (e.value >= buckets.lo) & (e.value < buckets.hi),
        )
        .groupBy("bucket_id")
        .agg(F.count("*").alias("n"), dsum(dec("value")).alias("total"))
    )


@register(
    "ts_daily_downsample",
    oracle="""
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    tags=("timeseries",),
)
def ts_daily_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample to daily grain (date_trunc + agg)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"), davg(dec("value")).alias("avg_value"))


@register(
    "ts_linear_interpolate",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), grid AS (
      SELECT u.user_id, g.day
      FROM (SELECT DISTINCT user_id FROM daily) u
      CROSS JOIN (SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day) g
    ), joined AS (
      SELECT g.user_id, g.day, d.v FROM grid g
      LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    ), bounds AS (
      SELECT user_id, day, v,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x0,
        LAST_VALUE(v IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y0,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS x1,
        FIRST_VALUE(v IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS y1
      FROM joined
    )
    SELECT user_id, day,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN y0 IS NULL THEN y1
             WHEN y1 IS NULL THEN y0
             WHEN x1 = x0 THEN y0
             ELSE y0 + (y1 - y0) * (CAST(day - x0 AS DOUBLE) / CAST(x1 - x0 AS DOUBLE))
           END, 6) AS v_filled
    FROM bounds
    """,
    tags=("timeseries", "interpolate"),
)
def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling linear interpolation over a daily grid — the
    linear_interpolate capability (reference interpolate.c:236) as a
    window-function composition: last/first non-null bound + lerp."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(davg(dec("value")).alias("v"))
    users = daily.select("user_id").distinct()
    grid_days = spark.sql(
        "SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-30', interval 1 day)) AS day"
    )
    grid = users.crossJoin(F.broadcast(grid_days))
    joined = grid.join(daily, ["user_id", "day"], "left")

    wb = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    day_if_v = F.when(F.col("v").isNotNull(), F.col("day"))
    bounds = joined.select(
        "user_id",
        "day",
        "v",
        F.last(day_if_v, ignorenulls=True).over(wb).alias("x0"),
        F.last("v", ignorenulls=True).over(wb).alias("y0"),
        F.first(day_if_v, ignorenulls=True).over(wf).alias("x1"),
        F.first("v", ignorenulls=True).over(wf).alias("y1"),
    )
    frac = F.datediff("day", "x0").cast("double") / F.datediff("x1", "x0").cast(
        "double"
    )
    v_filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("y0").isNull(), F.col("y1"))
        .when(F.col("y1").isNull(), F.col("y0"))
        .when(F.col("x1") == F.col("x0"), F.col("y0"))
        .otherwise(F.col("y0") + (F.col("y1") - F.col("y0")) * frac)
    )
    return bounds.select(
        "user_id", "day", F.round(v_filled, 6).alias("v_filled")
    )


@register(
    "ts_locf_gap_fill",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,2)) END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    """,
    tags=("timeseries", "window", "interpolate"),
)
def ts_locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last observation carried forward) — the step-function
    sibling of linear_interpolate (reference utils/adt/interpolate.c,
    timeseries.sql regress): every event carries the user's most recent
    purchase value at-or-before it. Lowered to last(expr, ignorenulls)
    over a running ROWS frame — one shuffle on user_id, no self-join."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_v = F.when(
        F.col("event_type") == "purchase", dec(F.col("value"))
    )
    return e.select(
        "event_id",
        "user_id",
        F.last(purchase_v, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@register(
    "ts_asof_forward_nearest",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    m AS (
      SELECT p.event_id, epoch_ms(p.ts) AS purchase_ms,
             (SELECT epoch_ms(MAX(c.ts)) FROM events c
              WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts)
               AS back_ms,
             (SELECT epoch_ms(MIN(c.ts)) FROM events c
              WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts >= p.ts)
               AS fwd_ms
      FROM p
    )
    SELECT event_id, purchase_ms, fwd_ms AS next_click_ms,
           CASE
             WHEN fwd_ms IS NULL THEN back_ms
             WHEN back_ms IS NULL THEN fwd_ms
             WHEN purchase_ms - back_ms <= fwd_ms - purchase_ms THEN back_ms
             ELSE fwd_ms
           END AS nearest_click_ms
    FROM m
    """,
    tags=("timeseries", "asof"),
)
def ts_asof_forward_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward and nearest as-of joins (pandas merge_asof direction
    parity): for each purchase, the user's next click at-or-after, and
    the nearest click either way (tie → backward). Same union+window
    algorithm, still one shuffle on user_id — nearest evaluates both
    scan directions inside the one shuffled partition."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    fwd = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        right_values=[], direction="forward",
    ).select("event_id", "user_id", "ts", F.col("asof_ts").alias("fwd_ts"))
    near = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        right_values=[], direction="nearest",
    ).select("event_id", F.col("asof_ts").alias("near_ts"))
    return fwd.join(near, "event_id").select(
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("purchase_ms"),
        F.unix_millis(F.col("fwd_ts").cast("timestamp")).alias(
            "next_click_ms"
        ),
        F.unix_millis(F.col("near_ts").cast("timestamp")).alias(
            "nearest_click_ms"
        ),
    )


@register(
    "ts_range_join_bucketed",
    oracle="""
    WITH p AS (
      SELECT event_id, epoch_ms(ts) AS ls, epoch_ms(ts) + 600000 AS le
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT epoch_ms(ts) AS rs, epoch_ms(ts) + 600000 AS re
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, CAST(COUNT(c.rs) AS BIGINT) AS n_overlap
    FROM p LEFT JOIN c ON p.ls < c.re AND c.rs < p.le
    GROUP BY 1
    """,
    tags=("timeseries", "range-join"),
)
def ts_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided big x big interval-overlap join — neither side
    broadcastable at scale. Bucketed overlap algorithm
    (operators/range_join.interval_overlap_join): replicate each
    10-minute window to its covering time buckets, hash-join on bucket
    id, post-filter exact overlap, anchor to the first common bucket so
    pairs emit once. Equi hash join end-to-end — no nested loop
    (reference: nodeMergejoin.c:1504 range quals after motion)."""
    from warehouse_pg_spark.operators.range_join import interval_overlap_join

    e = table(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    win = 600_000  # 10-minute window on both sides
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", ms.alias("ls"), (ms + win).alias("le")
    )
    c = e.filter(F.col("event_type") == "click").select(
        ms.alias("rs"), (ms + win).alias("re")
    )
    pairs = interval_overlap_join(
        p, c, "ls", "le", "rs", "re", bucket_width=win
    )
    counts = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return (
        p.select("event_id")
        .join(counts, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        )
    )
