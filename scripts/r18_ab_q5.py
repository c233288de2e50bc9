#!/usr/bin/env python
"""Interleaved A/B of tpch_q5: current 6-way star vs ASIA-pre-reduced
dims (constraint propagation through c_nationkey = s_nationkey).
Usage: python /tmp/ab_q5.py SF_DIR ROUNDS"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from warehouse_pg_spark.queries.registry import table, dsum
from warehouse_pg_spark.queries.tpch import _disc_price
from warehouse_pg_spark.session import SessionConfig, get_spark

SF_DIR = sys.argv[1]
ROUNDS = int(sys.argv[2])


def q5_variant(spark, sf_dir, mode):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    if mode == "alt":
        nr = nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select("n_nationkey", "n_name")
        supp = supp.join(
            F.broadcast(nr), supp.s_nationkey == nr.n_nationkey
        ).select("s_suppkey", "s_nationkey", "n_name")
        cust = cust.join(
            F.broadcast(nr.select("n_nationkey")),
            cust.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey", "c_nationkey")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(
                supp,
                (li.l_suppkey == supp.s_suppkey)
                & (cust.c_nationkey == supp.s_nationkey),
            )
            .groupBy("n_name")
            .agg(dsum(_disc_price(), 4).alias("revenue"))
        )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_disc_price(), 4).alias("revenue"))
    )


def main():
    spark = get_spark(SessionConfig(app_name="ab_q5"))
    from bench import stage_warehouse

    qdir = stage_warehouse(spark, SF_DIR)
    base = sorted(map(tuple, q5_variant(spark, qdir, "cur").collect()))
    alt = sorted(map(tuple, q5_variant(spark, qdir, "alt").collect()))
    assert base == alt, (base[:3], alt[:3])
    print("row equality OK", len(base), flush=True)
    times = {"cur": [], "alt": []}
    for r in range(ROUNDS):
        order = ["cur", "alt"] if r % 2 == 0 else ["alt", "cur"]
        for m in order:
            df = q5_variant(spark, qdir, m)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            times[m].append(time.perf_counter() - t0)
        print(f"round {r}: " + " ".join(f"{m}={times[m][-1]:.3f}" for m in order), flush=True)
    import statistics
    for m in ("cur", "alt"):
        ts = sorted(times[m])
        print(f"{m}: median={statistics.median(ts):.3f} all={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
