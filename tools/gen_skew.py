#!/usr/bin/env python
"""Skewed-key fixture variant: reassign a fraction of `events` rows to
one hot user_id, leaving everything else identical. Pairs with
tools/gen_scale.py output to measure how the user_id-shuffled operators
(sessionize, as-of join) degrade under a hot key — the evidence behind
SCALING.md's skew section.

The reference handles skew with planner rewrites; here AQE skew-join
splitting covers joins, while window/sessionize operators concentrate a
hot user's history on one reducer by construction (the algorithm needs
the full per-user ordering) — the measurement shows that partition
staying in memory and the query inside ~2x of the uniform run.

Usage:
    python tools/gen_skew.py [SRC_DIR] [DST_DIR] [HOT_FRACTION]
defaults: /root/repo/.scaledata/sf1  /root/repo/.scaledata/sf1_skew  0.3
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warehouse_pg_spark.session import get_spark

HOT_USER = 1  # existing id: keeps the dim-side cardinality unchanged


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaledata/sf1_skew"
    frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3

    spark = get_spark()
    e = spark.read.parquet(os.path.join(src, "events.parquet"))
    # deterministic selection: hash of event_id, not rand()
    skewed = e.withColumn(
        "user_id",
        F.when(
            (F.abs(F.hash("event_id")) % 100) < int(frac * 100),
            F.lit(HOT_USER).cast("long"),
        ).otherwise(F.col("user_id")),
    )
    # the uniform BASELINE goes through the identical writer (same file
    # count, same compression path) — otherwise layout differences
    # confound the skew measurement
    for variant, df in ((dst, skewed), (dst + "_base", e)):
        os.makedirs(variant, exist_ok=True)
        out = os.path.join(variant, "events.parquet")
        tmp = out + ".tmp"
        df.repartition(8, "event_id").write.mode("overwrite").parquet(tmp)
        if os.path.exists(out):
            shutil.rmtree(out)
        os.rename(tmp, out)
        for f in os.listdir(src):
            if f == "events.parquet":
                continue
            s, d = os.path.join(src, f), os.path.join(variant, f)
            if not os.path.exists(d):
                if os.path.isdir(s):
                    shutil.copytree(s, d)
                else:
                    shutil.copy2(s, d)
    hot = skewed.filter(F.col("user_id") == HOT_USER).count()
    total = skewed.count()
    print(f"wrote {dst} (+_base): {total} events, hot user owns {hot} "
          f"({100.0 * hot / total:.1f}%)")


if __name__ == "__main__":
    main()
