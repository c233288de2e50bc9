"""Skew handling: AQE skew-join split + manual salted join.

Mirrors the reference's skew strategies (SURVEY §4.1: AQE skew-join
replaces ORCA's LOJ→UnionAll rewrite; salting is the manual fallback).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from warehouse_pg_spark.operators.skew import salted_join


@pytest.fixture()
def skewed_frames(spark):
    # 90% of fact rows share key 0 — the megacustomer pattern.
    fact = spark.range(0, 50_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(0, 50_000).select(
        F.col("id").alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim


def test_salted_join_matches_plain_join(spark, skewed_frames):
    fact, dim = skewed_frames
    plain = fact.join(dim, fact.k == dim.dk).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    ).collect()[0]
    salted = salted_join(fact, dim, "k", "dk", salt=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    ).collect()[0]
    assert (salted.n, salted.sv) == (plain.n, plain.sv)


def test_salted_join_spreads_hot_key(spark, skewed_frames):
    """The hot key's rows must land in several shuffle buckets: group
    (k, salt) cardinality for k=0 should be ~salt, not 1."""
    fact, _ = skewed_frames
    salted = fact.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
    buckets = (
        salted.filter(F.col("k") == 0)
        .select("__salt")
        .distinct()
        .count()
    )
    assert buckets == 8


def test_aqe_skew_join_split(spark, skewed_frames):
    """With tiny advisory sizes, AQE must mark the skewed SMJ partition
    as split (isSkew=true in the final adaptive plan)."""
    fact, dim = skewed_frames
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = fact.join(dim, fact.k == dim.dk)
        j.collect()  # AQE marks live on the *executed* QueryExecution
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
