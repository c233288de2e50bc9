"""All join shapes from SURVEY §2.3.

Reference coverage: nodeHashjoin.c (inner/left/right/full/semi/anti/
anti-NotIn, :182 ExecHashJoinImpl), nodeMergejoin.c (:1504),
nodeNestloop.c (:364 theta/cross), and ORCA's CPhysical*Join variants.
Spark picks broadcast/shuffled-hash/sort-merge via Catalyst + AQE; the
queries below pin broadcast() where a dim is replicated-table-like.

Null-aware NOT IN (reference CPhysicalLeftAntiSemiHashJoinNotIn) maps to
Spark's NullAwareAntiJoin — exercised both with and without NULLs in the
subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from warehouse_pg_spark.queries.registry import dec, dsum, register, table


@register(
    "join_left_outer",
    oracle="""
    SELECT n_name, COUNT(c_custkey) AS n_customers,
           CAST(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 0) AS DECIMAL(38,2)) AS total_bal
    FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER: every nation, customer metrics where present."""
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    return (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.coalesce(F.sum(dec("c_acctbal")), F.lit(0))
            .cast("decimal(38,2)")
            .alias("total_bal"),
        )
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT n_name, COUNT(s_suppkey) AS n_suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (supplier → nation)."""
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.k, sn.k) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (nations with customers xor suppliers)."""
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    cn = cust.groupBy(F.col("c_nationkey").alias("ck")).agg(
        F.count("*").alias("n_cust")
    )
    sn = supp.groupBy(F.col("s_nationkey").alias("sk")).agg(
        F.count("*").alias("n_supp")
    )
    return cn.join(sn, cn.ck == sn.sk, "full").select(
        F.coalesce(cn.ck, sn.sk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_semi_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    tags=("join", "subquery"),
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with a big order."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti_not_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "subquery"),
)
def join_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_notin_no_nulls",
    oracle="""
    SELECT COUNT(*) AS n
    FROM lineitem
    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000)
    """,
    tags=("join", "subquery"),
)
def join_notin_no_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a null-free subquery → anti join (reference LASJ NotIn)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_nn")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("supp_nn")
    return spark.sql(
        """
        SELECT COUNT(*) AS n FROM li_nn
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supp_nn WHERE s_acctbal > 5000)
        """
    )


@register(
    "join_notin_with_nulls",
    oracle="""
    SELECT COUNT(*) AS n
    FROM customer
    WHERE c_nationkey NOT IN (SELECT NULLIF(s_nationkey, 3) FROM supplier)
    """,
    tags=("join", "subquery"),
)
def join_notin_with_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN whose subquery yields a NULL → PG 3-valued logic (0 rows).

    Exercises Spark's NullAwareAntiJoin (the reference's
    CPhysicalLeftAntiSemiHashJoinNotIn null semantics)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("cust_nw")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("supp_nw")
    return spark.sql(
        """
        SELECT COUNT(*) AS n FROM cust_nw
        WHERE c_nationkey NOT IN (SELECT NULLIF(s_nationkey, 3) FROM supp_nw)
        """
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join (CartesianProduct / BroadcastNestedLoop)."""
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@register(
    "join_theta_range",
    oracle="""
    SELECT a.s_suppkey AS low_supp, b.s_suppkey AS high_supp
    FROM supplier a JOIN supplier b
      ON a.s_acctbal < b.s_acctbal AND a.s_nationkey <> b.s_nationkey
    """,
    tags=("join", "theta"),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join — NestLoop analogue (nodeNestloop.c:364)."""
    a = table(spark, sf_dir, "supplier").alias("a")
    b = table(spark, sf_dir, "supplier").alias("b")
    return a.join(
        b,
        (F.col("a.s_acctbal") < F.col("b.s_acctbal"))
        & (F.col("a.s_nationkey") != F.col("b.s_nationkey")),
    ).select(
        F.col("a.s_suppkey").alias("low_supp"),
        F.col("b.s_suppkey").alias("high_supp"),
    )


@register(
    "join_scalar_subquery",
    oracle="""
    SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    """,
    tags=("join", "subquery"),
)
def join_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (InitPlan, nodeSubplan.c)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("cust_ss")
    return spark.sql(
        """
        SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal
        FROM cust_ss WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM cust_ss)
        """
    )


@register(
    "join_correlated_subquery",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
    FROM orders o
    WHERE o_totalprice > (SELECT 2 * (CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                          FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
    tags=("join", "subquery"),
)
def join_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery → decorrelated to join (CSubqueryHandler).

    The threshold is computed as decimal-sum → double → divide so both
    engines evaluate the identical IEEE expression (parity rule 2)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("ord_cs")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_cs")
    return spark.sql(
        """
        SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
        FROM ord_cs o
        WHERE o_totalprice > (SELECT 2 * (CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
                              FROM li_cs l WHERE l.l_orderkey = o.o_orderkey)
        """
    )


@register(
    "join_in_subquery",
    oracle="""
    SELECT COUNT(*) AS n FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
    """,
    tags=("join", "subquery"),
)
def join_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → semi join (hashed IN, nodeSubplan.c)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("ord_in")
    table(spark, sf_dir, "customer").createOrReplaceTempView("cust_in")
    return spark.sql(
        """
        SELECT COUNT(*) AS n FROM ord_in
        WHERE o_custkey IN (SELECT c_custkey FROM cust_in WHERE c_mktsegment = 'MACHINERY')
        """
    )


@register(
    "join_lateral_topn",
    oracle="""
    SELECT c_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS top_price
    FROM customer,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders
                  WHERE o_custkey = c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 1) best
    WHERE c_custkey < 200
    ORDER BY c_custkey
    """,
    tags=("join", "lateral", "topk"),
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG LATERAL subquery (nodeNestloop.c parameterized inner): each
    customer's single most expensive order. Spark SQL supports lateral
    correlated subqueries; equivalently (and how it should run at
    scale) a row_number window per customer — that is the plan used
    here: one shuffle on o_custkey, no per-row re-execution."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    best = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", dec("o_totalprice").alias("top_price"))
    )
    return (
        cust.join(best, cust.c_custkey == best.o_custkey)
        .select("c_custkey", "o_orderkey", "top_price")
        .orderBy("c_custkey")
    )


@register(
    "join_correlated_select_list",
    oracle="""
    SELECT c_custkey,
           (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
           (SELECT CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
            FROM orders WHERE o_custkey = c_custkey) AS max_price
    FROM customer
    WHERE c_custkey < 100
    ORDER BY c_custkey
    """,
    tags=("join", "subquery"),
)
def join_correlated_select_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries in the SELECT list with aggregates
    (SubPlan, nodeSubplan.c; the shape §4.1 flags as a Spark risk) —
    expressed via decorrelation: one grouped aggregate + left join,
    COUNT's empty-group NULL fixed up with coalesce (the exact
    CXformInnerApply2InnerJoin-style rewrite ORCA would emit)."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    per_cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max(dec("o_totalprice")).alias("max_price"),
        )
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left_outer")
        .select(
            "c_custkey",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
            "max_price",
        )
        .orderBy("c_custkey")
    )


@register(
    "join_quantified_all_any",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           CAST(SUM(CASE WHEN c.c_acctbal > ALL
                         (SELECT s.s_acctbal FROM supplier s
                          WHERE s.s_nationkey = c.c_nationkey)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_dominant,
           CAST(SUM(CASE WHEN c.c_acctbal < ANY
                         (SELECT s.s_acctbal FROM supplier s
                          WHERE s.s_nationkey = c.c_nationkey)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_below_some
    FROM customer c
    GROUP BY c.c_nationkey
    """,
    tags=("join", "subquery", "quantified"),
)
def join_quantified_all_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison subqueries (`> ALL`, `< ANY`) — ORCA's
    CSubqueryHandler quantified-subquery decorrelation (SURVEY §4.1).
    Spark SQL has no ALL/ANY, so the lowering is the classic rewrite:
    `x > ALL (S)` → per-group MAX(S) left-joined back, true when the
    group is empty (vacuous truth) or x > max; `x < ANY (S)` → true
    when the group is non-empty and x < max. The fixtures leave most
    nations supplier-less, so the empty-group branch is exercised for
    real. One broadcast join (25-row aggregate), one shuffle for the
    final groupBy."""
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    per_nation = supp.groupBy("s_nationkey").agg(
        F.max("s_acctbal").alias("max_bal")
    )
    no_suppliers = F.col("max_bal").isNull()
    return (
        cust.join(
            F.broadcast(per_nation),
            cust.c_nationkey == per_nation.s_nationkey,
            "left",
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.sum(
                F.when(
                    no_suppliers | (F.col("c_acctbal") > F.col("max_bal")), 1
                ).otherwise(0)
            ).alias("n_dominant"),
            F.sum(
                F.when(
                    ~no_suppliers & (F.col("c_acctbal") < F.col("max_bal")), 1
                ).otherwise(0)
            ).alias("n_below_some"),
        )
    )
