"""Recursive CTE queries (reference: nodeRecursiveunion.c, regress
gp_recursive_cte.sql) realized with the driver-side fixpoint operator
(warehouse_pg_spark/operators/recursive.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warehouse_pg_spark.operators.recursive import recursive_union
from warehouse_pg_spark.queries.registry import register, table


@register(
    "recursive_series",
    oracle="""
    WITH RECURSIVE t(n) AS (
      SELECT 1
      UNION ALL
      SELECT n + 1 FROM t WHERE n < 100
    )
    SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MAX(n) AS BIGINT) AS mx
    FROM t
    """,
    tags=("recursive",),
)
def recursive_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE counter 1..100 (UNION ALL semantics)."""
    base = spark.range(1, 2).select(F.col("id").cast("long").alias("n"))
    acc = recursive_union(
        base,
        step=lambda t: t.filter(F.col("n") < 100).select(
            (F.col("n") + 1).alias("n")
        ),
        distinct=False,
        max_iterations=150,
    )
    return acc.agg(
        F.sum("n").alias("total"),
        F.count("*").alias("cnt"),
        F.max("n").alias("mx"),
    )


@register(
    "recursive_graph_closure",
    oracle="""
    WITH RECURSIVE
    edges AS (
      SELECT n_nationkey AS src, (n_nationkey * 3 + 7) % 25 AS dst FROM nation
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst
      FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src, CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_reachable
    FROM reach GROUP BY src
    """,
    tags=("recursive", "graph"),
)
def recursive_graph_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of a synthetic 25-node graph derived from
    nation keys (UNION-distinct fixpoint — terminates on no new rows).

    Per-iteration work is a distributed join; only loop control is on
    the driver (SURVEY §7 phase 6)."""
    n = table(spark, sf_dir, "nation")
    edges = n.select(
        F.col("n_nationkey").cast("long").alias("src"),
        ((F.col("n_nationkey") * 3 + 7) % 25).cast("long").alias("dst"),
    ).localCheckpoint(eager=True)

    def step(frontier: DataFrame) -> DataFrame:
        e = edges.select(
            F.col("src").alias("e_src"), F.col("dst").alias("e_dst")
        )
        return (
            frontier.join(e, frontier.dst == F.col("e_src"))
            .select(frontier.src.alias("src"), F.col("e_dst").alias("dst"))
        )

    closure = recursive_union(edges, step, distinct=True, max_iterations=30)
    return closure.groupBy("src").agg(
        F.count_distinct("dst").alias("n_reachable")
    )
