#!/usr/bin/env python
"""Scale-up fixture generator: replicate a driver fixture directory N
times with key offsetting, preserving schemas, value distributions, and
join selectivities exactly (each copy is internally consistent; keys and
foreign keys shift by copy * (max_key + 1)).

This is the sf1 scale-check path (TESTDATA.md stops at sf0.1, which the
driver generates with seed=42; this derives sf1 deterministically FROM
sf0.1 rather than re-rolling a new distribution). Dims whose size is
scale-invariant in TPC-H (region, nation) are copied as-is.

Usage:
    python tools/gen_scale.py [SRC_DIR] [DST_DIR] [COPIES]
defaults: /root/testdata/sf0.1  /root/repo/.scaledata/sf1  10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

# table -> columns to offset by copy * stride(table-of-that-key).
# Strides are computed from the key's OWNING table so FK columns shift
# in lockstep with the PK they reference.
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_AS_IS = ["region", "nation"]

# key column whose max defines each stride
STRIDE_KEY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "events_user": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def replicate(df: DataFrame, offsets: dict[str, int], copies: int) -> DataFrame:
    copies_df = F.broadcast(
        df.sparkSession.range(copies).withColumnRenamed("id", "_copy")
    )
    out = df.crossJoin(copies_df)
    for col, stride in offsets.items():
        out = out.withColumn(col, F.col(col) + F.col("_copy") * F.lit(stride))
    if "text" in df.columns:
        # Perturb replicated document text per copy. Verbatim copies
        # would put every doc in a `copies`-clique of exact/near
        # duplicates, making pair-listing dedup outputs O(copies²) — a
        # pathological corpus, not corpus growth. Tagging every 3rd
        # word with the copy index zeroes the word-3-gram shingle
        # overlap BETWEEN copies (every 3-word window contains a tagged
        # word) while keeping each copy's internal dup-groups intact —
        # the duplicate RATE of the source corpus stays constant as
        # its size scales, which is what "100× more data" means for a
        # dedup benchmark.
        tagged = F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                # alphanumeric tag: survives the dedup normalizer
                # ([^a-z0-9 ] -> space) as part of the SAME word — a
                # punctuation tag would split into its own word and
                # leave every 4th 3-gram window copy-invariant
                lambda w, i: F.when(
                    i % 3 == 0,
                    F.concat(w, F.lit("x"), F.col("_copy").cast("string")),
                ).otherwise(w),
            ),
        )
        out = out.withColumn(
            "text",
            F.when(F.col("_copy") > 0, tagged).otherwise(F.col("text")),
        )
        if "n_chars" in df.columns:
            out = out.withColumn(
                "n_chars", F.length("text").cast(dict(df.dtypes)["n_chars"])
            )
    return out.drop("_copy")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaledata/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .appName("gen_scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tables = {
        name: spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        for name in COPY_AS_IS + sorted(KEYED)
    }
    strides = {}
    for skey, col in STRIDE_KEY.items():
        tbl = "events" if skey == "events_user" else skey
        strides[skey] = tables[tbl].agg(F.max(col)).collect()[0][0] + 1

    os.makedirs(dst, exist_ok=True)
    for name in COPY_AS_IS:
        tables[name].write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
    for name, keys in KEYED.items():
        offsets = {col: strides[owner] for col, owner in keys.items()}
        out = replicate(tables[name], offsets, copies)
        # spread the big facts so downstream scans parallelize
        n = tables[name].count() * copies
        parts = max(1, min(32, n // 50_000))
        out.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
        print(f"{name}: {n} rows -> {parts} files", file=sys.stderr)
    print(f"wrote {dst} ({copies}x {src})", file=sys.stderr)


if __name__ == "__main__":
    main()
