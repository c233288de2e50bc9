#!/usr/bin/env python
"""Interleaved A/B of ngram_jaccard pairs: blocked self-join (current)
vs groupBy(shingle)+collect_list pair explosion (r17-rejected rewrite),
at a given SF. Usage: python /tmp/ab_ngram.py SF_DIR ROUNDS"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from warehouse_pg_spark.queries.dedup import (
    _DF_CAP,
    _shingles,
    ngram_jaccard_pairs,
)
from warehouse_pg_spark.queries.registry import table
from warehouse_pg_spark.session import SessionConfig, get_spark

SF_DIR = sys.argv[1]
ROUNDS = int(sys.argv[2])


def grouped_pairs(d, df_cap=_DF_CAP, threshold=0.2):
    sh_all = d.select(
        "doc_id", F.explode(_shingles("text")).alias("shingle")
    ).cache()
    hot = (
        sh_all.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > df_cap)
        .select("shingle")
    )
    sh = sh_all.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    groups = sh.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    pairs = groups.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("ids"), i + 2, F.size(F.col("ids"))
                        ),
                        lambda b: F.struct(
                            a.alias("id_a"), b.alias("id_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    common = pairs.groupBy("id_a", "id_b").agg(F.count("*").alias("c"))
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("c").cast("double") / (
        F.col("sa.sz") + F.col("sb.sz") - F.col("c")
    )
    return (
        common.join(sa, F.col("id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("id_b") == F.col("sb.doc_id"))
        .filter(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def main():
    spark = get_spark(SessionConfig(app_name="ab_ngram"))
    from bench import stage_warehouse

    qdir = stage_warehouse(spark, SF_DIR)
    par = spark.sparkContext.defaultParallelism
    mk = lambda: table(spark, qdir, "documents").repartition(par, "doc_id")
    spark.catalog.clearCache()
    base = sorted(map(tuple, ngram_jaccard_pairs(mk()).collect()))
    spark.catalog.clearCache()
    alt = sorted(map(tuple, grouped_pairs(mk()).collect()))
    assert base == alt, (len(base), len(alt))
    print("row equality OK", len(base), flush=True)
    times = {"cur": [], "alt": []}
    for r in range(ROUNDS):
        order = ["cur", "alt"] if r % 2 == 0 else ["alt", "cur"]
        for m in order:
            spark.catalog.clearCache()
            df = ngram_jaccard_pairs(mk()) if m == "cur" else grouped_pairs(mk())
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
