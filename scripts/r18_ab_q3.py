#!/usr/bin/env python
"""Interleaved A/B of tpch_q3 variants at a given SF dir.

Variants:
  cur : tree version (dim-dim reorder + SHUFFLE_HASH hint on oc)
  bco : dim-dim reorder + explicit F.broadcast(oc)
  noh : dim-dim reorder, no hint (static planner choice)

Usage: python /tmp/ab_q3.py SF_DIR ROUNDS [--plans OUTDIR]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from warehouse_pg_spark.queries import REGISTRY
from warehouse_pg_spark.queries.registry import table, dsum
from warehouse_pg_spark.queries.tpch import _disc_price
from warehouse_pg_spark.session import SessionConfig, get_spark

SF_DIR = sys.argv[1]
ROUNDS = int(sys.argv[2])
PLAN_DIR = None
if "--plans" in sys.argv:
    PLAN_DIR = sys.argv[sys.argv.index("--plans") + 1]


def _q3_core(spark, sf_dir, mode):
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    oc = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    if mode == "cur":
        oc = oc.hint("shuffle_hash")
    elif mode == "bco":
        oc = F.broadcast(oc)
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(_disc_price(), 4).alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def main():
    spark = get_spark(SessionConfig(app_name="ab_q3"))
    sys.path.insert(0, "/root/repo")
    from bench import stage_warehouse

    qdir = stage_warehouse(spark, SF_DIR)
    modes = ["cur", "bco", "noh"]

    # row equality first
    base = _q3_core(spark, qdir, "cur").collect()
    for m in ("bco", "noh"):
        rows = _q3_core(spark, qdir, m).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, base)), m
    print("row equality OK across variants", flush=True)

    times = {m: [] for m in modes}
    for r in range(ROUNDS):
        order = modes if r % 2 == 0 else modes[::-1]
        for m in order:
            df = _q3_core(spark, qdir, m)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            times[m].append(time.perf_counter() - t0)
        print(f"round {r}: " + " ".join(f"{m}={times[m][-1]:.3f}" for m in order), flush=True)

    import statistics
    for m in modes:
        ts = sorted(times[m])
        print(f"{m}: median={statistics.median(ts):.3f} min={ts[0]:.3f} all={[round(t,3) for t in ts]}")

    if PLAN_DIR:
        os.makedirs(PLAN_DIR, exist_ok=True)
        sf_tag = os.path.basename(SF_DIR.rstrip("/"))
        for m in modes:
            df = _q3_core(spark, qdir, m)
            df.collect()  # execute df's own queryExecution so AQE finalizes
            final = df._jdf.queryExecution().executedPlan().toString()
            p = os.path.join(PLAN_DIR, f"tpch_q3_{m}_final_{sf_tag}.txt")
            with open(p, "w") as f:
                f.write(final)
            print(f"wrote {p}")


if __name__ == "__main__":
    main()
