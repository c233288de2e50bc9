#!/usr/bin/env python
"""Quiet-machine bench watch: per-query steady-state pins.

The driver's per-round bench.py run shares the machine with whatever
else is running; BENCH_r13/r14 were both load-polluted. This tool
produces the authoritative steady-state record: it WAITS for the
5-minute loadavg to drop under --max-load (default 0.5), then runs
every `bench`-tagged registry query n times (default 8) recording all
times + the best, re-reading loadavg before each query so a burst of
ambient load marks the affected entries.

Usage: python tools/bench_watch.py [--out BENCH_WATCH_rN.json]
           [--runs 8] [--max-load 0.5] [--wait-secs 900]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SF_DIR, read_loadavg, sf_of, stage_warehouse  # noqa: E402
from warehouse_pg_spark.queries import REGISTRY  # noqa: E402
from warehouse_pg_spark.session import SessionConfig, get_spark  # noqa: E402


def main() -> None:
    runs, max_load, wait_secs, out_path = 8, 0.5, 900, None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--runs":
            runs = int(args.pop(0))
        elif a == "--max-load":
            max_load = float(args.pop(0))
        elif a == "--wait-secs":
            wait_secs = int(args.pop(0))
        elif a == "--out":
            out_path = args.pop(0)

    waited = 0
    while read_loadavg()[0] > max_load and waited < wait_secs:
        time.sleep(15)
        waited += 15
    load_start = read_loadavg()
    if load_start[0] > max_load:
        print(
            json.dumps({
                "error": "machine never went quiet",
                "loadavg": load_start,
                "waited_secs": waited,
            })
        )
        sys.exit(2)

    spark = get_spark(SessionConfig(app_name="warehouse_pg_spark-watch"))
    query_dir = stage_warehouse(spark, SF_DIR)
    bench_queries = {
        n: q for n, q in REGISTRY.items() if "bench" in q.tags
    }
    rec: dict[str, dict] = {}
    for name, q in sorted(bench_queries.items()):
        fn = getattr(q.fn, "__wrapped__", q.fn)
        times: list[float] = []
        pre_load = read_loadavg()
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, query_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                times.append(round(time.perf_counter() - t0, 4))
        except Exception as exc:
            rec[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            continue
        rec[name] = {
            "best": min(times),
            "times": times,
            "loadavg_pre": pre_load[0],
        }
    out = {
        "sf": sf_of(SF_DIR),
        "runs": runs,
        "loadavg_start": load_start,
        "loadavg_end": read_loadavg(),
        "queries": rec,
        "total_best_sec": round(
            sum(v["best"] for v in rec.values() if "best" in v), 4
        ),
    }
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
