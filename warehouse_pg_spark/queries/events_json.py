"""events table: JSON extraction, sessionization, pivot, tumbling windows.

JSON: reference utils/adt/jsonfuncs.c / jsonpath_exec.c →
get_json_object / from_json. Sessionization + tumbling buckets are the
batch-equivalent of the streaming module (SURVEY §2.10) so they get
DuckDB oracles; the true Structured Streaming path lives in
warehouse_pg_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from warehouse_pg_spark.queries.registry import davg, dec, dsum, register, table

_SESSION_GAP_MS = 30 * 60 * 1000  # 30 min


@register(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
    tags=("json",),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction + aggregation (jsonfuncs.c → get_json_object)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "events_from_json_struct",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    """,
    tags=("json",),
)
def events_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct, then field access + filter."""
    e = table(spark, sf_dir, "events")
    parsed = e.select(
        "event_id", F.from_json("props", "k BIGINT").alias("p")
    )
    return parsed.select("event_id", F.col("p.k").alias("k")).filter(
        F.col("k") > 90
    )


@register(
    "events_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > {_SESSION_GAP_MS}
                       OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           CAST(SUM(cnt) AS BIGINT) AS n_events,
           CAST(MAX(cnt) AS BIGINT) AS max_session_events
    FROM (
      SELECT user_id, session_id, COUNT(*) AS cnt
      FROM sessions GROUP BY user_id, session_id
    ) s
    GROUP BY user_id
    """,
    tags=("window", "timeseries", "bench"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running sum.

    The batch analogue of streaming session windows; one shuffle on
    user_id, everything else window functions — scales linearly."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (
            (
                F.unix_millis(F.col("ts").cast("timestamp"))
                - F.unix_millis(prev_ts.cast("timestamp"))
            )
            > _SESSION_GAP_MS
        ),
        1,
    ).otherwise(0)
    sessions = e.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(new_session).over(wrun).alias("session_id"),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("cnt")
    )
    return per_session.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.sum("cnt").cast("long").alias("n_events"),
        F.max("cnt").cast("long").alias("max_session_events"),
    )


@register(
    "events_pivot",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS click,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS purchase
    FROM events GROUP BY user_id
    """,
    tags=("pivot",),
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (GP pivot_sum analogue, reference utils/adt/pivot.c:31)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(dsum(dec("value")))
    )


@register(
    "events_unpivot",
    oracle="""
    WITH wide AS (
      SELECT user_id,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
             COUNT(CASE WHEN event_type = 'view'  THEN 1 END) AS views
      FROM events GROUP BY user_id
    )
    SELECT user_id, kind, CAST(cnt AS BIGINT) AS cnt
    FROM wide UNPIVOT (cnt FOR kind IN (clicks, views))
    """,
    tags=("pivot",),
)
def events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (Spark 3.4+ unpivot; GP pivot.c family)."""
    e = table(spark, sf_dir, "events")
    wide = e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
    )
    return wide.unpivot("user_id", ["clicks", "views"], "kind", "cnt")


@register(
    "events_tumbling_window",
    oracle="""
    SELECT epoch_ms(ts) - epoch_ms(ts) % 300000 AS bucket_start_ms,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
    FROM events
    GROUP BY 1, 2
    """,
    tags=("timeseries", "streaming-batch"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregation (batch form of the streaming
    module's window() — SURVEY §2.10)."""
    e = table(spark, sf_dir, "events")
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    bucket = (ts_ms - (ts_ms % F.lit(300000))).alias("bucket_start_ms")
    return e.groupBy(bucket, "event_type").agg(
        F.count("*").alias("n"),
        dsum(dec("value")).alias("total"),
    )


@register(
    "agg_json_agg",
    oracle="""
    SELECT o_orderpriority,
           to_json(list_sort(list(o_orderkey))) AS keys_json,
           count(*) AS n
    FROM orders
    WHERE o_custkey < 20
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg", "json"),
)
def agg_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG json_agg(x ORDER BY x) (utils/adt/json.c json_agg_transfn):
    collect_list sorted for determinism, serialized with to_json —
    the ordered-aggregate shim composed with JSON output."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.to_json(F.sort_array(F.collect_list("o_orderkey"))).alias("keys_json"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "tablefunc_json_table",
    oracle="""
    SELECT event_id, 'k' AS prop_key,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_value
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
    tags=("tablefunc", "json"),
)
def tablefunc_json_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableFuncScan / XMLTABLE analogue (nodeTableFuncscan.c) over
    JSON: shred each props document into (key, value) rows via
    from_json(map) + explode. The Spark side is generic over any key
    set; the fixture's props happen to hold a single key 'k', which is
    what the oracle spells out literally."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    kv = F.explode(F.from_json("props", "map<string,bigint>")).alias(
        "prop_key", "prop_value"
    )
    return e.select("event_id", kv).orderBy("event_id")


@register(
    "events_sliding_window",
    oracle="""
    WITH assigned AS (
      SELECT u.ws AS window_start, user_id, value
      FROM events,
           unnest([ (epoch_ms(ts) // 300000) * 300 - 300,
                    (epoch_ms(ts) // 300000) * 300 ]) AS u(ws)
    )
    SELECT window_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_value
    FROM assigned GROUP BY window_start ORDER BY window_start
    """,
    tags=("timeseries", "streaming-batch"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (batch form of the
    streaming sliding-window agg, SURVEY §2.10). Spark's window()
    replicates each event into length/slide = 2 windows — the oracle
    makes that explicit by unnesting the two covering window starts.
    Output key = window start in epoch seconds (no raw timestamps,
    parity rule 3)."""
    e = table(spark, sf_dir, "events")
    w = F.window(F.col("ts").cast("timestamp"), "10 minutes", "5 minutes")
    return (
        e.select(w.alias("w"), "user_id", dec("value").alias("v"))
        .groupBy(F.unix_seconds(F.col("w.start")).alias("window_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            dsum(F.col("v")).alias("total_value"),
        )
        .orderBy("window_start")
    )


@register(
    "events_session_window_native",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > {_SESSION_GAP_MS}
                       OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
      FROM flagged
    )
    SELECT user_id,
           epoch_ms(MIN(ts)) // 1000 AS session_start_s,
           (epoch_ms(MAX(ts)) + {_SESSION_GAP_MS}) // 1000 AS session_end_s,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_start_s
    """,
    tags=("timeseries", "streaming-batch", "window"),
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window() in batch mode (the same operator
    Structured Streaming uses for stateful session aggregation, SURVEY
    §2.10): 30-min gap, emits [first_event, last_event + gap) bounds.
    The oracle reconstructs identical sessions with the lag/running-sum
    gap-split. One shuffle on user_id; state merging is Spark-internal."""
    e = table(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
    return (
        e.groupBy("user_id", sw.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_seconds(F.col("w.start")).alias("session_start_s"),
            F.unix_seconds(F.col("w.end")).alias("session_end_s"),
            "n_events",
        )
        .orderBy("user_id", "session_start_s")
    )


@register(
    "srf_json_each",
    oracle="""
    SELECT k AS key, COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.' || k) AS BIGINT))
                AS BIGINT) AS total
    FROM (SELECT props, unnest(json_keys(props)) AS k FROM events) t
    GROUP BY k
    """,
    tags=("srf", "json"),
)
def srf_json_each(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG json_each / jsonb_each SRF (utils/adt/jsonfuncs.c): explode
    every key/value pair of an untyped JSON document column. Lowered to
    from_json into MapType + explode — schema-free, so it survives
    ragged documents, unlike the typed from_json struct path."""
    e = table(spark, sf_dir, "events")
    kv = e.select(
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "val")
    )
    return kv.groupBy("key").agg(
        F.count("*").alias("n"),
        F.sum(F.col("val").cast("bigint")).alias("total"),
    )
