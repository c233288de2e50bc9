#!/usr/bin/env python
"""PG-dialect breadth metric: run every self-contained (FROM-less)
SELECT expression found in the reference's regress suite through
engine.sql and record the pass rate. One JSON line:
{"metric": "regress_expr_compat", "pass": N, "fail": M, "pct": P}.

This is a coverage TREND metric, not a target of 100%: the corpus
includes expressions that reference regress-local UDFs/types created
by the suites' setup DDL (COMPLEX, pleast, widget, ...), full-text
search (tsvector/tsquery), and BC-era dates — all out of scope by
design. What moves the number round-over-round is generic dialect
coverage (operators, casts, function spellings, SRF forms).

Usage: python tools/compat_probe.py [--sample N] [--fails-out PATH]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REGRESS = "/root/reference/src/test/regress/sql/*.sql"


def corpus() -> list[str]:
    stmts = set()
    for f in glob.glob(REGRESS):
        for line in open(f, errors="ignore"):
            s = line.strip()
            if (
                re.match(r"(?i)^SELECT\s", s)
                and s.endswith(";")
                and " from " not in s.lower()
                and len(s) < 120
                and "pg_" not in s
            ):
                stmts.add(s.rstrip(";"))
    return sorted(stmts)


def main() -> None:
    sample = None
    fails_out = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--sample":
            sample = int(args.pop(0))
        elif a == "--fails-out":
            fails_out = args.pop(0)

    from warehouse_pg_spark.engine import Engine
    from warehouse_pg_spark.session import get_spark

    eng = Engine(get_spark())
    stmts = corpus()
    if sample:
        import random

        random.seed(42)
        stmts = random.sample(stmts, min(sample, len(stmts)))
    ok = 0
    fails: list[str] = []
    for s in stmts:
        try:
            eng.sql(s).collect()
            ok += 1
        except Exception:
            fails.append(s)
    if fails_out:
        with open(fails_out, "w") as f:
            json.dump(fails, f, indent=1)
    n = len(stmts)
    print(json.dumps({
        "metric": "regress_expr_compat",
        "pass": ok,
        "fail": n - ok,
        "total": n,
        "pct": round(100.0 * ok / n, 1),
    }))


if __name__ == "__main__":
    main()
