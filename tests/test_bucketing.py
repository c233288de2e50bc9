"""Co-located join + CBO stats gates.

GP hash distribution (`DISTRIBUTED BY`, gp_distribution_policy.h,
cdbhash.c) exists so that equi-joins on the distribution key run
without a Motion. The Spark realization is bucketed tables: same keys,
same bucket count → SortMergeJoin with NO Exchange on either side.
ANALYZE feeds Catalyst CBO (ORCA statistics analogue).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from warehouse_pg_spark.engine import Engine
from warehouse_pg_spark.queries.registry import table


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    return eng


@pytest.fixture(scope="module")
def bucketed(engine, spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    engine.create_bucketed_table("orders_bkt", orders, ("o_orderkey",), 8)
    engine.create_bucketed_table("lineitem_bkt", li, ("l_orderkey",), 8)
    return engine


def _plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_colocated_join_no_shuffle(bucketed, spark):
    """Bucketed-on-join-key tables must join with zero Exchange —
    the locus-matched join (cdbpath.c:94) Spark equivalent."""
    o = spark.table("orders_bkt")
    l = spark.table("lineitem_bkt")
    # force the non-broadcast path so placement is what's being tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderpriority").count()
        plan = _plan(j)
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in join_part, plan
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(bucketed, spark, sf_dir):
    o = spark.table("orders_bkt")
    l = spark.table("lineitem_bkt")
    got = o.join(l, o.o_orderkey == l.l_orderkey).count()
    expected = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert got == expected


def test_analyze_produces_stats(bucketed, spark):
    bucketed.analyze("orders_bkt", ("o_orderkey", "o_orderpriority"))
    desc = spark.sql("DESCRIBE EXTENDED orders_bkt").collect()
    stats = [r for r in desc if r.col_name == "Statistics"]
    assert stats and "rows" in stats[0].data_type
    cdesc = spark.sql("DESCRIBE EXTENDED orders_bkt o_orderkey").collect()
    kv = {r.info_name: r.info_value for r in cdesc}
    assert kv.get("distinct_count") not in (None, "NULL")


def test_distribution_hint_recorded(bucketed):
    info = bucketed.catalog.tables["orders_bkt"]
    assert info.distribution == ("hash", ("o_orderkey",))
