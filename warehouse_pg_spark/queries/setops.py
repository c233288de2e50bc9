"""Set operations from SURVEY §2.7.

Reference coverage: nodeAppend.c (UNION ALL), nodeSetOp.c:190
(INTERSECT/EXCEPT [ALL], hashed :217), nodeUnique.c (DISTINCT),
nodeMergeAppend.c (ordered union). Catalyst applies the same rewrites
ORCA does (Intersect→semi join, Except→anti join:
CXformIntersect2Join.cpp / CXformDifference2LeftAntiSemiJoin.cpp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warehouse_pg_spark.queries.registry import dec, register, table


def _cust_nations(spark, sf_dir):
    return table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "setop_union_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey FROM supplier
    ) t GROUP BY nationkey
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (Append) + agg on top."""
    u = _cust_nations(spark, sf_dir).unionAll(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count("*").alias("n"))


@register(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — Append + Unique."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT → left-semi join rewrite (CXformIntersect2Join)."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "setop_intersect_all",
    oracle="""
    SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics, nodeSetOp.c:190)."""
    li = table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("k"))
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_partkey").alias("k"))
    return r.intersectAll(a)


@register(
    "setop_except",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT c_nationkey FROM customer
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT → anti-join rewrite (CXformDifference2LeftAntiSemiJoin)."""
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey")
    )
    return n.subtract(_cust_nations(spark, sf_dir))


@register(
    "setop_except_all",
    oracle="""
    SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'O'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference)."""
    li = table(spark, sf_dir, "lineitem")
    o = li.filter(F.col("l_linestatus") == "O").select(F.col("l_suppkey").alias("k"))
    f = li.filter(F.col("l_linestatus") == "F").select(F.col("l_suppkey").alias("k"))
    return o.exceptAll(f)


@register(
    "setop_values_scan",
    oracle="""
    SELECT t.code, t.descr, COUNT(o_orderkey) AS n
    FROM (VALUES ('O', 'open'), ('F', 'finished'), ('P', 'pending'), ('X', 'unknown'))
         AS t(code, descr)
    LEFT JOIN orders ON o_orderstatus = t.code
    GROUP BY t.code, t.descr
    """,
    tags=("setop", "values"),
)
def setop_values_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES list (nodeValuesscan.c) joined to a table."""
    vals = spark.createDataFrame(
        [("O", "open"), ("F", "finished"), ("P", "pending"), ("X", "unknown")],
        ["code", "descr"],
    )
    o = table(spark, sf_dir, "orders")
    return (
        vals.join(o, o.o_orderstatus == vals.code, "left")
        .groupBy("code", "descr")
        .agg(F.count("o_orderkey").alias("n"))
    )


@register(
    "setop_distinct_multicol",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    tags=("setop",),
)
def setop_distinct_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over multiple columns (nodeUnique.c)."""
    return table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@register(
    "setop_sample_deterministic",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
    FROM lineitem WHERE l_orderkey % 97 < 10
    """,
    tags=("setop", "sample"),
)
def setop_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via key-mod (TABLESAMPLE analogue).

    True BERNOULLI sampling (nodeSamplescan.c, bernoulli.c:47) is
    nondeterministic across engines; the engine exposes df.sample() for
    real use and this key-mod form for oracle-checkable tests."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 < 10)
    from warehouse_pg_spark.queries.registry import dec, dsum

    return li.agg(
        F.count("*").alias("n"), dsum(dec("l_quantity")).alias("qty")
    )


@register(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25 OFFSET 50
    """,
    tags=("sort", "limit"),
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT + OFFSET pagination (nodeLimit.c:240 ExecLimit with
    offset state): Spark 3.4+ DataFrame.offset; unique-key tiebreak
    keeps the page deterministic."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", dec("o_totalprice").alias("o_totalprice"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(50)
        .limit(25)
    )


@register(
    "cte_shared_reuse",
    oracle="""
    WITH s AS (
      SELECT l_suppkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
      FROM lineitem GROUP BY l_suppkey)
    SELECT s.l_suppkey, s.rev
    FROM s
    WHERE s.rev > (SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) FROM s)
    ORDER BY s.rev DESC, s.l_suppkey
    """,
    tags=("cte", "subquery"),
)
def cte_shared_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE consumed twice (ShareInputScan, nodeShareInputScan.c:1-35 /
    ORCA CTEProducer-Consumer): suppliers with above-average revenue.
    Spark SQL WITH + scalar subquery; Catalyst reuses the shared agg
    subtree via ReuseExchange at scale."""
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_cte_src")
    return spark.sql(
        """
        WITH s AS (
          SELECT l_suppkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
          FROM lineitem_cte_src GROUP BY l_suppkey)
        SELECT s.l_suppkey, s.rev
        FROM s
        WHERE s.rev > (SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) FROM s)
        ORDER BY s.rev DESC, s.l_suppkey
        """
    )
