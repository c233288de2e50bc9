"""Remaining TPC-H-shaped queries (Q2, Q4, Q7-Q9, Q11-Q22), adapted to
the fixture star schema (no partsupp table; reduced column set — see
TESTDATA.md), while preserving each query's characteristic plan shape:

  q2  — correlated scalar MAX subquery (decorrelated to agg + join, the
        same rewrite ORCA applies: gporca CSubqueryHandler / planner
        cdb/cdbsubselect.c)
  q4  — EXISTS semi-join with a non-equi date predicate
        (reference: nodeHashjoin.c semi path + nodeNestloop.c quals)
  q7  — two-sided nation-pair join with OR-of-IN predicates + year roll
  q8  — market share: conditional agg ratio over an 8-way join
  q9  — profit decomposition, LIKE filter, per-nation-year agg
  q11 — HAVING against an uncorrelated scalar subquery (group filter)
  q12 — conditional counts (CASE inside SUM) over a date-window join
  q13 — outer join with join-clause filter + double aggregation
        (count per customer, then histogram of counts)
  q14 — conditional-aggregate ratio (promo revenue share)
  q15 — top-supplier: agg view reused by MAX + equality join
        (reference ShareInputScan nodeShareInputScan.c:1-35 analogue)
  q16 — NOT IN anti-join + COUNT(DISTINCT) (DQA, cdbgroupingpaths.c:74)
  q17 — correlated AVG subquery (decorrelated to groupBy + join)
  q18 — IN subquery over a HAVING aggregate (large-volume orders)
  q19 — disjunctive (OR-of-ANDs) join predicate with a common equi key
  q20 — nested IN subquery with HAVING (supplier promotion candidates)
  q21 — EXISTS + NOT EXISTS double self-join (waiting-supplier pattern)
  q22 — anti-join + uncorrelated scalar AVG threshold (cntrycode from
        customer-name suffix; fixtures lack c_phone)

Scale notes (100 TB): lineitem is the fact; joins to orders shuffle on
orderkey (co-partitioned if both bucketed by orderkey via the catalog's
DISTRIBUTED BY hints). Broadcast policy: `F.broadcast()` is forced only
where the size is scale-INVARIANT — nation/region (25/5 rows at any SF,
the reference's replicated-table locus, cdbpathlocus.h
CdbLocusType_Replicated) and 1-row scalar frames (q11 threshold, q15
max_rev, q22 avg_bal). Linear-growth tables (customer, supplier, part)
and per-key aggregates over them carry NO hint: the static planner /
AQE broadcasts them while they fit under
spark.sql.autoBroadcastJoinThreshold and falls back to a shuffle join
at 100 TB, where a forced broadcast would OOM. Self-joins of lineitem (q21)
reuse one scan and shuffle on l_orderkey for all three branches, so the
exchange is shared (ReuseExchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warehouse_pg_spark.queries.registry import (
    dec,
    dsum,
    register,
    table,
)

_DISC_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _disc_price() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    SELECT DISTINCT CAST(s_acctbal AS DECIMAL(18,2)) AS s_acctbal, s_name, n_name, p_partkey, p_type
    FROM part JOIN lineitem ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
    WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'ASIA'
      AND s_acctbal = (
        SELECT max(s2.s_acctbal)
        FROM supplier s2 JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
             JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
             JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p_partkey AND r2.r_name = 'ASIA')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("join", "subquery", "topk"),
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: best-supplier-per-part via correlated MAX,
    decorrelated into groupBy(partkey).max + equality join — the exact
    rewrite ORCA's subquery handler performs."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    # (partkey, supplier) pairs restricted to ASIA suppliers.
    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    # Per-partkey MAX is unchanged by restricting to the qualifying
    # partkeys, so the selective part filter joins BEFORE the
    # correlated max, and the max itself is a window over the reduced
    # pairs — one shuffle on (filtered) l_partkey instead of a
    # full-pairs aggregate plus a join back.
    from pyspark.sql import Window

    pairs = (
        li.join(asia_supp, li.l_suppkey == asia_supp.s_suppkey)
        .join(part, li.l_partkey == part.p_partkey)
        .select("l_partkey", "s_acctbal", "s_name", "n_name",
                "p_partkey", "p_type")
    )
    w = Window.partitionBy("l_partkey")
    return (
        pairs.withColumn("max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .select(
            dec("s_acctbal").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
        )
        .distinct()
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("join", "semi", "agg"),
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: late-shipment EXISTS (semi join with an extra
    non-equi predicate; fixtures lack l_commitdate/l_receiptdate so
    'late' = shipped >90 days after order date)."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DECIMAL(38,4)) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
                 {_DISC_PRICE} AS volume
          FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN customer ON c_custkey = o_custkey
               JOIN nation n1 ON s_nationkey = n1.n_nationkey
               JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name IN ('NATION_1','NATION_2','NATION_3') AND n2.n_name IN ('NATION_4','NATION_5','NATION_6'))
              OR (n1.n_name IN ('NATION_4','NATION_5','NATION_6') AND n2.n_name IN ('NATION_1','NATION_2','NATION_3')))
            AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg"),
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-group trade volume by ship year."""
    grp_a = ["NATION_1", "NATION_2", "NATION_3"]
    grp_b = ["NATION_4", "NATION_5", "NATION_6"]
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    sn = F.col("supp_nation")
    cn = F.col("cust_nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            (sn.isin(grp_a) & cn.isin(grp_b)) | (sn.isin(grp_b) & cn.isin(grp_a))
        )
        .select(
            sn,
            cn,
            F.year("l_shipdate").alias("l_year"),
            _disc_price().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
                 CAST({_DISC_PRICE} AS DECIMAL(38,4)) AS volume,
                 n1.n_name AS nation
          FROM part JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation n1 ON s_nationkey = n1.n_nationkey
               JOIN nation n2 ON c_nationkey = n2.n_nationkey
               JOIN region ON n2.n_regionkey = r_regionkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
            AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31') all_nations
    GROUP BY o_year ORDER BY o_year
    """,
    tags=("join", "agg"),
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional ECONOMY-part revenue.
    Conditional-agg ratio: both sums exact decimal, one IEEE division."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey")
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("volume")
    zero = F.lit(0).cast("decimal(38,4)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_rkey") == region.r_regionkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().cast("decimal(38,4)").alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_type_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DECIMAL(38,5)) AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
                 {_DISC_PRICE} - CAST(0.5 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS amount
          FROM part JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%widget%') profit
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "bench"),
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year (cost
    modeled as 0.5 * retail price since fixtures lack ps_supplycost).
    All arithmetic stays in exact decimals; scale 5 preserved so no
    engine-dependent rounding occurs."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    amount = _disc_price() - (
        F.lit(0.5).cast("decimal(2,1)")
        * dec("p_retailprice", "decimal(12,2)")
        * dec("l_quantity", "decimal(12,2)")
    )
    # supplier ⋈ nation prejoined dim-side (1 tiny broadcast join) so
    # the fact pays 3 join passes instead of 4 (r17: −5% here, one
    # fewer full pass over lineitem at any scale).
    supp_n = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), 5).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
    SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS part_value
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) >
      (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * CAST(0.001 AS DECIMAL(6,4))
       FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
       WHERE n_name = 'NATION_3')
    ORDER BY part_value DESC, l_partkey
    """,
    tags=("agg", "subquery", "having"),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value filtered by a global-threshold
    scalar subquery (fraction of the nation's total). The per-part agg
    is computed once and reused for the threshold (sum of sums) — the
    ShareInputScan pattern."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    base = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("value_raw"))
    )
    threshold = base.agg(
        (F.sum("value_raw") * F.lit(0.001).cast("decimal(6,4)")).alias("thr")
    )
    return (
        base.join(F.broadcast(threshold))
        .filter(F.col("value_raw") > F.col("thr"))
        .select(
            "l_partkey", F.col("value_raw").cast("decimal(38,2)").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "tpch_q12_shipping_priority_counts",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    tags=("join", "agg", "conditional"),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority counts for slow shipments (fixtures
    lack l_shipmode/l_receiptdate; 'slow' = shipped >30d after order,
    grouped by l_linestatus)."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "outer", "agg"),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution. Left outer join
    with a filter inside the join clause, then two aggregations."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100 AS DOUBLE)
           * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST({_DISC_PRICE} AS DECIMAL(38,4)) ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
           / CAST(SUM(CAST({_DISC_PRICE} AS DECIMAL(38,4))) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    tags=("join", "agg", "conditional"),
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO revenue share for one month. Exact decimal
    sums; the 100*x/y arithmetic is identical IEEE ops in both engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    part = table(spark, sf_dir, "part")
    vol = _disc_price().cast("decimal(38,4)")
    zero = F.lit(0).cast("decimal(38,4)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100).cast("double")
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM({_DISC_PRICE}) AS DECIMAL(38,4)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("agg", "subquery", "view"),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue. The revenue
    aggregate is built once and consumed twice (MAX + join) — exact
    decimal revenue makes the equality reliable."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_disc_price(), 4).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(
            F.broadcast(max_rev),
            revenue.total_revenue == max_rev.max_revenue,
        )
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      AND p_size IN (1,5,9,14,19,23,36,45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "anti", "dqa"),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute,
    excluding negative-balance suppliers via NOT IN (anti join; keys are
    non-null so the null-aware path degenerates to a plain anti join)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'SMALL'
      AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    tags=("join", "subquery", "agg"),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-half-average-quantity orders of
    SMALL parts. Correlated AVG decorrelated to groupBy + join.
    l_quantity is integral, so avg = exact-sum / count is bit-identical
    across engines."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    # Per-partkey AVG is unchanged by restricting to the qualifying
    # partkeys, so join the selective part filter FIRST (broadcast),
    # then compute the correlated avg as a window over the REDUCED
    # fact — one shuffle of the filtered rows, not a full-lineitem
    # aggregate plus a second join back.
    from pyspark.sql import Window

    li_small = li.join(part, li.l_partkey == part.p_partkey)
    w = Window.partitionBy("l_partkey")
    return (
        li_small.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "tpch_q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice, SUM(l_quantity) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("join", "semi", "having", "topk", "bench"),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with large-volume orders (IN over a HAVING
    aggregate → semi join). Quantities are integral doubles, so sums
    are exact in any order.

    Single-pass plan: the HAVING aggregate already IS the query's
    sum_qty (the final group keys are order-level), so the qualifying
    orders carry their sum out of ONE lineitem shuffle — no second
    lineitem join + re-aggregation, which at 100 TB would double the
    dominant fact shuffle. The filtered survivor set is tiny, so AQE
    broadcasts it into orders."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            dec("o_totalprice").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({_DISC_PRICE}) AS DECIMAL(38,4)) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 21 AND p_size BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 30 AND p_size BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#33' AND l_quantity BETWEEN 20 AND 40 AND p_size BETWEEN 1 AND 25)
    """,
    tags=("join", "filter"),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive predicate revenue. The common
    p_partkey = l_partkey equi-key is extracted by Catalyst so this
    stays a hash join with a post-join OR filter, not a cartesian."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    br = F.col("p_brand")
    cond = (
        ((br == "Brand#12") & q.between(1, 21) & sz.between(1, 15))
        | ((br == "Brand#23") & q.between(10, 30) & sz.between(1, 20))
        | ((br == "Brand#33") & q.between(20, 40) & sz.between(1, 25))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(dsum(_disc_price(), 4).alias("revenue"))
    )


@register(
    "tpch_q20_promotion_suppliers",
    oracle="""
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 300)
    ORDER BY s_name
    """,
    tags=("join", "semi", "having"),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved significant PROMO-part
    volume in 1996 (nested IN with HAVING → semi join on the agg)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    movers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_suppkey")
    )
    return (
        supp.join(movers, supp.s_suppkey == movers.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("join", "semi", "anti", "topk"),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the only supplier late on a multi-supplier
    order ('late' = shipped >60d after order date; fixtures lack
    commit/receipt dates). EXISTS → semi join, NOT EXISTS → anti join,
    both on l_orderkey so all three lineitem branches share one shuffle
    key (ReuseExchange at scale)."""
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    late60 = F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + late60)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    only_late = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3.k3)
            & (F.col("l_suppkey") != l3.s3)
            & (l3.d3 > F.col("o_orderdate") + late60),
            "left_anti",
        )
    )
    return (
        only_late.join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    SELECT cntrycode, count(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS totacctbal
    FROM (SELECT substring(c_name, 18, 1) AS cntrycode, c_acctbal
          FROM customer
          WHERE substring(c_name, 18, 1) IN ('1','3','5','7','9')
            AND c_acctbal > (
              SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
              FROM customer c2
              WHERE c2.c_acctbal > 0.0 AND substring(c2.c_name, 18, 1) IN ('1','3','5','7','9'))
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_orderstatus = 'P')) custsale
    GROUP BY cntrycode ORDER BY cntrycode
    """,
    tags=("anti", "subquery", "agg"),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no pending
    orders, grouped by a code digit taken from the customer-name suffix
    (fixtures lack c_phone). Uncorrelated scalar AVG threshold uses the
    exact-decimal-sum / count parity rule."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    code = F.substring("c_name", 18, 1)
    digits = ["1", "3", "5", "7", "9"]
    coded = cust.filter(code.isin(digits)).withColumn("cntrycode", code)
    avg_bal = coded.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("ab")
    )
    return (
        coded.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, coded.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
