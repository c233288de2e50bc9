#!/usr/bin/env python
"""Per-bench-query build (fn call, pure py4j/plan construction) vs exec
(noop save) split. Usage: python /tmp/profile_build.py [SF_DIR]"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from warehouse_pg_spark.queries import REGISTRY
from warehouse_pg_spark.session import SessionConfig, get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main():
    spark = get_spark(SessionConfig(app_name="profile_build"))
    from bench import stage_warehouse

    qdir = stage_warehouse(spark, SF_DIR)
    bench_queries = {n: q for n, q in REGISTRY.items() if "bench" in q.tags}
    rows = []
    for name, q in sorted(bench_queries.items()):
        fn = getattr(q.fn, "__wrapped__", q.fn)
        builds, execs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, qdir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        rows.append((name, min(builds), min(execs)))
        print(f"{name:35s} build={min(builds):.3f} exec={min(execs):.3f}", flush=True)
    tb = sum(r[1] for r in rows)
    te = sum(r[2] for r in rows)
    print(f"TOTAL build={tb:.3f} exec={te:.3f} ({tb/(tb+te)*100:.0f}% build)")


if __name__ == "__main__":
    main()
