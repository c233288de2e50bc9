#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is run twice; the best time is reported (first run pays JVM
warm-up / code-gen; the steady-state number is what scales).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from warehouse_pg_spark.queries import REGISTRY  # noqa: E402
from warehouse_pg_spark.session import SessionConfig, get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(SessionConfig(app_name="warehouse_pg_spark-bench"))
    bench_queries = {
        name: q for name, q in REGISTRY.items() if "bench" in q.tags
    }
    timings: dict[str, float] = {}
    for name, q in sorted(bench_queries.items()):
        best = float("inf")
        for _ in range(max(1, RUNS)):
            t0 = time.perf_counter()
            df = q.fn(spark, SF_DIR)
            # noop sink: full materialization on executors without the
            # driver-side py4j row transfer (engine time, not IPC time)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_of(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
