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


def test_scale_fixture_preserves_dup_rate(spark):
    """tools/gen_scale.py replication must not manufacture cross-copy
    near-duplicates: the per-copy word tag zeroes 3-gram shingle
    overlap BETWEEN copies (every window contains a tagged word that
    survives the dedup normalizer inside the word) while keeping each
    copy's internal duplicate pairs intact — the corpus dup RATE stays
    constant as it scales. A verbatim replica here would turn
    pair-listing dedup output O(copies^2) — the sf10 lesson."""
    import importlib.util
    import os

    from pyspark.sql import functions as F

    from warehouse_pg_spark.queries.dedup import _shingles

    spec = importlib.util.spec_from_file_location(
        "gen_scale",
        os.path.join(os.path.dirname(__file__), "..", "tools", "gen_scale.py"),
    )
    gen_scale = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen_scale)

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base + " one"), (2, base + " two"), (3, "totally different words here")],
        ["doc_id", "text"],
    )
    out = gen_scale.replicate(df, {"doc_id": 100}, 3)
    rows = out.select(
        "doc_id", F.explode(_shingles("text")).alias("sh")
    ).collect()
    by_copy = {}
    for r in rows:
        by_copy.setdefault(r.doc_id // 100, set()).add(r.sh)
    assert len(by_copy) == 3
    # zero shingle overlap between any two copies
    assert not (by_copy[0] & by_copy[1])
    assert not (by_copy[0] & by_copy[2])
    assert not (by_copy[1] & by_copy[2])
    # within each copy, docs 1 and 2 stay near-duplicates (shared base)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, set()).add(r.sh)
    for c in range(3):
        a, b, other = (per_doc[c * 100 + i] for i in (1, 2, 3))
        jac = len(a & b) / len(a | b)
        assert jac > 0.5, (c, jac)
        assert not (a & other)
