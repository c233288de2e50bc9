"""Aggregation surface from SURVEY §2.4.

Reference coverage: nodeAgg.c (hash/sorted/mixed agg, spill),
cdbgroupingpaths.c (multi-stage agg, DQA classification :74-83 +
TupleSplit), planner.c grouping-sets preprocessing (:170-262),
orderedsetaggs.c (percentile_cont/disc :423/:557), pg_proc.dat median
(:11586), gp_hyperloglog (utils/hyperloglog/).

Spark's RewriteDistinctAggregates is the TupleSplit analogue; Expand is
the grouping-sets engine; partial/final AggregateExec pairs are the
multi-stage agg. All built-in — these queries pin down the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warehouse_pg_spark.queries.registry import davg, dec, dsum, register, table


@register(
    "agg_dqa_single",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_parts, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "dqa"),
)
def agg_dqa_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single distinct-qualified aggregate (SINGLE_DQA, cdbgroupingpaths.c:74)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd_parts"),
            F.count("*").alias("n"),
        )
    )


@register(
    "agg_dqa_multi",
    oracle="""
    SELECT l_linestatus,
           COUNT(DISTINCT l_partkey) AS nd_parts,
           COUNT(DISTINCT l_suppkey) AS nd_supps,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("agg", "dqa", "bench"),
)
def agg_dqa_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DQAs + plain agg (MULTI_DQAS → TupleSplit / Expand rewrite)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.countDistinct("l_partkey").alias("nd_parts"),
            F.countDistinct("l_suppkey").alias("nd_supps"),
            dsum(dec("l_quantity")).alias("sum_qty"),
        )
    )


@register(
    "agg_sum_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_d_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "dqa"),
)
def agg_sum_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(DISTINCT) — distinct-qualified non-count aggregate."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum_distinct(dec("l_quantity")).cast("decimal(38,2)").alias("sum_d_qty"))
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
           COUNT(*) AS n,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "groupingsets"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() ids (planner.c:170-262 → Spark Expand)."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity")).alias("sum_qty"),
            F.count("*").alias("n"),
            F.grouping_id().alias("gid"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "groupingsets"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            dsum(dec("o_totalprice")).alias("total"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "groupingsets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint sets, incl. grand total)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_median_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_disc(l_quantity, 0.25) AS p25_disc_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggs: median / percentile_cont / percentile_disc
    (orderedsetaggs.c:423,:557; GP median pg_proc.dat:11586).

    Spark `percentile` = continuous interpolation (quantile_cont);
    discrete = lowest value whose cumulative fraction >= p."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_pct")
    return spark.sql(
        """
        SELECT l_returnflag,
               percentile(l_quantity, 0.5) AS median_qty,
               percentile(l_quantity, 0.9) AS p90_qty,
               percentile_approx(l_quantity, 0.25, 2147483647) AS p25_disc_qty
        FROM li_pct GROUP BY l_returnflag
        """
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(var_pop(l_quantity), 6) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qe,
           ROUND(covar_pop(l_quantity, l_discount), 6) AS cov_qd,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS icept
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (float.c/numeric.c transition fns).

    Double-valued and order-dependent in the last ulps → rounded on both
    sides (parity: error ~1e-12 relative, round at 4-6 decimals)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_pop("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qe"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("cov_qd"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("icept"),
    )


@register(
    "agg_bool_minmax",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS min_price,
           MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS max_price,
           CAST(MIN(o_orderdate) AS DATE) AS first_order,
           CAST(MAX(o_orderdate) AS DATE) AS last_order
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_bool_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and/bool_or + min/max over numerics and dates."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.min(dec("o_totalprice")).alias("min_price"),
        F.max(dec("o_totalprice")).alias("max_price"),
        F.min("o_orderdate").cast("date").alias("first_order"),
        F.max("o_orderdate").cast("date").alias("last_order"),
    )


@register(
    "agg_string_agg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg", "ordered-agg"),
)
def agg_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string_agg(x, d ORDER BY y) — PG ordered aggregate (SURVEY §2.4).

    Spark has no ORDER BY inside aggregates; the engine's shim is
    collect_list → sort_array → array_join (deterministic)."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "agg_array_agg_ordered",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(array_agg(c_custkey ORDER BY c_custkey), ',') AS custkeys
    FROM customer
    WHERE c_acctbal > 9000
    GROUP BY c_mktsegment
    """,
    tags=("agg", "ordered-agg"),
)
def agg_array_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg(x ORDER BY x) → sort_array(collect_list(x))."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return c.groupBy("c_mktsegment").agg(
        F.sort_array(F.collect_list("c_custkey")).alias("custkeys")
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_nd_parts,
           TRUE AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "sketch"),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL NDV sketch (gp_hyperloglog.c analogue → approx_count_distinct).

    Raw sketch values aren't cross-engine comparable (HLL++ registers vs
    DuckDB's sketch), so the checkable contract is: exact NDV plus a
    Spark-computed boolean asserting the sketch landed within ±5% of
    exact — the oracle emits the exact NDV and literal TRUE."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_nd_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey")
                - F.countDistinct("l_partkey")
            )
            <= 0.05 * F.countDistinct("l_partkey")
        ).alias("within_5pct"),
    )


@register(
    "agg_having",
    oracle="""
    SELECT l_partkey, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING COUNT(*) >= 8 AND SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100
    """,
    tags=("agg",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("l_quantity")).alias("_qty_raw"),
        )
        .filter((F.col("n") >= 8) & (F.col("_qty_raw") > 100))
        .select("l_partkey", "n", F.col("_qty_raw").cast("decimal(38,2)").alias("qty"))
    )


@register(
    "agg_avg_group",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal,
           COUNT(*) AS n
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def agg_avg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain grouped average (exact-double parity form)."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        davg(dec("c_acctbal")).alias("avg_bal"), F.count("*").alias("n")
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DECIMAL(38,2)) AS open_value,
           CAST(MAX(CAST(o_orderdate AS DATE))
                FILTER (WHERE o_orderstatus = 'P') AS DATE) AS last_partial
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("agg", "filter-clause"),
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG `agg(x) FILTER (WHERE cond)` (SQL:2003, parse_agg.c aggfilter)
    lowered to conditional aggregation — `agg(CASE WHEN cond THEN x END)`.
    Stays a single HashAggregate pass (one shuffle), exactly how PG
    evaluates the filter inside the agg transition loop (nodeAgg.c)."""
    o = table(spark, sf_dir, "orders")
    fin = F.when(F.col("o_orderstatus") == "F", 1)
    openv = F.when(F.col("o_orderstatus") == "O", dec("o_totalprice"))
    part = F.when(F.col("o_orderstatus") == "P", F.to_date("o_orderdate"))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.count(fin).alias("n_finished"),
            dsum(openv).alias("open_value"),
            F.max(part).alias("last_partial"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_hypothetical_rank",
    oracle="""
    SELECT o_orderpriority,
           1 + COUNT(*) FILTER (WHERE o_totalprice < 50000.0) AS h_rank,
           1 + COUNT(DISTINCT o_totalprice) FILTER (WHERE o_totalprice < 50000.0)
               AS h_dense_rank,
           CAST(COUNT(*) FILTER (WHERE o_totalprice < 50000.0) AS DOUBLE)
               / COUNT(*) AS h_percent_rank,
           CAST(1 + COUNT(*) FILTER (WHERE o_totalprice <= 50000.0) AS DOUBLE)
               / (COUNT(*) + 1) AS h_cume_dist
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("agg", "orderedset"),
)
def agg_hypothetical_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG hypothetical-set aggregates (orderedsetaggs.c:1300+
    hypothetical_rank_common): `rank(50000.0) WITHIN GROUP (ORDER BY
    o_totalprice)` et al. Spark has no WITHIN GROUP — lowered to their
    defining counting forms (rank = 1 + |{x < v}|, dense_rank over
    distinct, percent_rank = |{x<v}|/n, cume_dist = (1+|{x<=v}|)/(n+1)),
    which is literally how the PG executor computes them."""
    o = table(spark, sf_dir, "orders")
    v = F.lit(50000.0)
    below = F.when(F.col("o_totalprice") < v, 1)
    below_d = F.when(F.col("o_totalprice") < v, F.col("o_totalprice"))
    at_or_below = F.when(F.col("o_totalprice") <= v, 1)
    return (
        o.groupBy("o_orderpriority")
        .agg(
            (F.count(below) + 1).alias("h_rank"),
            (F.count_distinct(below_d) + 1).alias("h_dense_rank"),
            (F.count(below).cast("double") / F.count("*")).alias(
                "h_percent_rank"
            ),
            (
                (F.count(at_or_below) + 1).cast("double")
                / (F.count("*") + 1)
            ).alias("h_cume_dist"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_bitwise",
    oracle="""
    SELECT o_orderstatus,
           CAST(bit_and(o_custkey) AS BIGINT) AS k_and,
           CAST(bit_or(o_custkey) AS BIGINT) AS k_or,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS k_xor
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg", "bitwise"),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG bit_and/bit_or aggregates (numeric.c int8and/int8or; pg_proc
    bit_and/bit_or) + xor — Spark's builtin bit aggregates, straight
    partial/final pipeline."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr("bit_and(o_custkey)").cast("bigint").alias("k_and"),
            F.expr("bit_or(o_custkey)").cast("bigint").alias("k_or"),
            F.expr("bit_xor(o_orderkey)").cast("bigint").alias("k_xor"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_percentile_approx",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_cont(CAST(l_quantity AS DECIMAL(18,2)), 0.5)
                AS DOUBLE) AS exact_p50,
           CAST(quantile_cont(CAST(l_quantity AS DECIMAL(18,2)), 0.95)
                AS DOUBLE) AS exact_p95,
           TRUE AS p50_close, TRUE AS p95_close
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("agg", "sketch", "percentile"),
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantile sketch (the t-digest/GK analogue of the
    reference's ordered-set percentile path, orderedsetaggs.c):
    percentile_approx is the 100-TB route — mergeable per-partition
    sketches, no global sort — while exact percentile needs the full
    ordered group. Contract mirrors the HLL entry: exact values plus
    Spark-certified closeness booleans (±2% of the value range), so the
    sketch is checkable without being bit-identical across engines."""
    li = table(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    span = F.max(q) - F.min(q)
    close = lambda p: (  # noqa: E731
        F.abs(
            F.percentile_approx(q, p, 10000).cast("double")
            - F.percentile(q, p).cast("double")
        )
        <= 0.02 * span.cast("double")
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile(q, 0.5).cast("double").alias("exact_p50"),
            F.percentile(q, 0.95).cast("double").alias("exact_p95"),
            close(0.5).alias("p50_close"),
            close(0.95).alias("p95_close"),
        )
        .orderBy("l_returnflag")
    )
