"""Offline FTS ground-truth sweep: extract FROM-less single-value FTS
statements (and the session SET statements between them, in file
order) from a regress expected/*.out file, run them through
Engine.sql, and diff against the expected psql rendering.

Usage: python tools/fts_sweep.py <expected.out> <fails.jsonl>

The SET replay matters: tsearch.out flips default_text_search_config
to 'simple' mid-file; statements probed after it expect unstemmed
lexemes. r16 ran statements standalone and mis-scored those three.
"""

import json
import re
import sys

sys.path.insert(0, "/root/repo")

_FTS_RE = re.compile(
    r"(?i)tsvector|tsquery|ts_rank|ts_headline|ts_lexize|setweight"
    r"|websearch|ts_rewrite|ts_delete|ts_filter|@@")


def extract(path):
    """[(kind, stmt, expected)] in file order; kind in
    SET / ERROR / VALUE."""
    lines = open(path).read().splitlines()
    i, n = 0, len(lines)
    cases = []
    while i < n:
        ln = lines[i]
        if re.match(r"(?i)^(SET|RESET)\b", ln):
            stmt = [ln]
            while not lines[i].rstrip().endswith(";") and i + 1 < n:
                i += 1
                stmt.append(lines[i])
            cases.append(("SET", "\n".join(stmt).rstrip(";"), None))
            i += 1
            continue
        if re.match(r"(?i)^SELECT\b", ln):
            stmt = [ln]
            while not lines[i].rstrip().endswith(";") and i + 1 < n:
                i += 1
                stmt.append(lines[i])
            stmt = "\n".join(stmt).rstrip(";")
            j = i + 1
            if j < n and lines[j].startswith("ERROR"):
                cases.append(("ERROR", stmt, lines[j]))
                i = j + 1
                continue
            if j + 1 < n and re.match(r"^-+(\+-+)*$",
                                      lines[j + 1].strip()):
                vals = []
                k = j + 2
                while k < n and not re.match(r"^\(\d+ rows?\)$",
                                             lines[k]):
                    vals.append(lines[k])
                    k += 1
                if (k < n and lines[k] == "(1 row)"
                        and "FROM" not in stmt.upper()):
                    cases.append(("VALUE", stmt, "\n".join(vals)))
                i = k + 1
                continue
        i += 1
    return cases


def render(cell) -> str:
    if cell is None:
        return ""
    if cell is True:
        return "t"
    if cell is False:
        return "f"
    if isinstance(cell, float):
        return repr(cell)
    if isinstance(cell, list):
        return "{" + ",".join(str(x) for x in cell) + "}"
    return str(cell)


def main(out_path, fails_path):
    cases = extract(out_path)
    fts = [c for c in cases
           if c[0] == "SET" or _FTS_RE.search(c[1])]
    n_scored = sum(1 for c in fts if c[0] != "SET")
    from pyspark.sql import SparkSession

    from warehouse_pg_spark.engine import Engine

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark)
    ok = bad = err = 0
    fails = []
    for kind, stmt, expected in fts:
        if kind == "SET":
            try:
                eng.sql(stmt)
            except Exception:
                pass
            continue
        try:
            rows = eng.sql(stmt).collect()
            if kind == "ERROR":
                bad += 1
                fails.append((stmt, "expected-error-but-ran",
                              expected, str(rows)[:100]))
                continue
            got = render(rows[0][0])
            exp = expected.strip()
            if got == exp or got.strip() == exp:
                ok += 1
            elif (isinstance(rows[0][0], float)
                  and re.match(r"^-?[\d.e+-]+$", exp)
                  and abs(rows[0][0] - float(exp))
                  <= 1e-6 * max(1, abs(float(exp)))):
                ok += 1
            else:
                bad += 1
                fails.append((stmt, "value", exp, got))
        except Exception as e:  # noqa: BLE001
            if kind == "ERROR":
                ok += 1
            else:
                err += 1
                fails.append((stmt, "error", expected, repr(e)[:150]))
    print(f"ok={ok} bad={bad} err={err} / {n_scored}")
    with open(fails_path, "w") as f:
        for s, k, e, g in fails:
            f.write(json.dumps(
                {"stmt": s, "kind": k, "exp": e, "got": g}) + "\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
