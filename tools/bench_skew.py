#!/usr/bin/env python
"""Skew evidence: run the user_id-shuffled headline queries (sessionize,
as-of join) on the uniform sf1 fixture and on the hot-key variant
(tools/gen_skew.py), print one JSON line with both timings and the
ratio. SCALING.md quotes the result; the claim under test is that AQE
skew handling + in-memory window partitions keep the skewed run within
~2x of uniform (no reducer collapse, no spill death).

Usage: python tools/bench_skew.py [UNIFORM_DIR] [SKEW_DIR] [RUNS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warehouse_pg_spark.session import get_spark

QUERIES = ["events_sessionize", "ts_asof_join"]


def _time(fn, spark, sf_dir, runs):
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 4)


def main() -> None:
    uni = (sys.argv[1] if len(sys.argv) > 1
           else "/root/repo/.scaledata/sf1_skew_base")
    skw = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaledata/sf1_skew"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from warehouse_pg_spark.queries import REGISTRY

    spark = get_spark()
    out = {"metric": "skew_vs_uniform", "unit": "sec", "queries": {}}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        # warm both variants (JIT/codegen) before timing either
        fn(spark, uni).write.format("noop").mode("overwrite").save()
        fn(spark, skw).write.format("noop").mode("overwrite").save()
        u = _time(fn, spark, uni, runs)
        s = _time(fn, spark, skw, runs)
        out["queries"][name] = {
            "uniform_sec": u,
            "skewed_sec": s,
            "ratio": round(s / u, 2) if u else None,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
