#!/usr/bin/env python
"""PG-dialect breadth metric, ANSWER-CHECKED (round 9).

Runs every self-contained (FROM-less) SELECT expression found in the
reference's regress suite through engine.sql AND through DuckDB (which
speaks most of PG's dialect), then compares values — because
"runs-without-exception" is exactly the metric that let the base-10
log() bug (r8 commit e88e252: PG log is base-10, Spark's is ln) ship
silently. Counts:

  value_pass         executed in both engines, values match
  value_mismatch     executed in both, values DIFFER — the
                     silent-wrong-answer class; triaged in --fails-out
  exec_only          engine ran but DuckDB can't (no oracle available)
  skipped_nondet     nondeterministic (random/now/...): never compared
  engine_error       engine.sql raised
  oracle_diverges    skip-list: DuckDB is known to differ from PG here,
                     so a mismatch is not evidence against the engine

One JSON line; --fails-out writes the full triage.

Usage: python tools/compat_probe.py [--sample N] [--fails-out PATH]
"""

from __future__ import annotations

import datetime
import glob
import json
import math
import os
import re
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REGRESS = "/root/reference/src/test/regress/sql/*.sql"

_NONDET_RE = re.compile(
    r"(?i)\b(random|setseed|now|clock_timestamp|statement_timestamp"
    r"|transaction_timestamp|timeofday|currval|nextval|current_date"
    r"|current_time|current_timestamp|localtime|localtimestamp"
    r"|current_user|session_user|user|version|inet_|gen_random_uuid"
    r"|current_database|current_schema|current_catalog)\b"
)

# Expressions where DuckDB's own answer differs from PG (verified by
# hand against PG semantics), so a Spark≠DuckDB diff is expected and
# carries no signal. Substring match on the statement text.
ORACLE_DIVERGES = (
    # json `->` on a NULL leaf: PG (and the engine, r14) returns the
    # json value `null` — rendered as the 4-char text 'null' — while
    # DuckDB's -> unwraps it to SQL NULL (verified against PG
    # expected/json.out; jsonfuncs.c json_object_field returns the
    # JSON null datum, not SQL NULL)
    '\'{"a": "c", "b": null}\'::json -> \'b\'',
    # DuckDB renders float4 values with float8 shortest-repr (PG prints
    # the float4 shortest repr: '1.2345679e+20' etc.)
    "::float4",
    "as float4",
    # DuckDB's search path is its own catalog model (main,main,main,
    # pg_catalog); PG's current_schemas(false) is {public} and (true)
    # prepends pg_catalog (namespace.c) — the ENGINE matches PG
    # (verified against expected/search_path.out)
    "current_schemas(",
    # DuckDB ~ / !~ are POSIX but its char-class/locale behavior inside
    # bracket expressions differs from PG's in regress edge strings
    "[[:",
    # PG numeric pow/exp print with numeric-typed scale rules DuckDB
    # doesn't replicate digit-for-digit
    "^ 0.5",
    # interval output style differs (PG '1 day 12:00:00' vs DuckDB
    # '1 day 12:00:00' is close, but mixed styles like '@ 1 day' and
    # justify_* spellings differ)
    "justify_",
    "@ ",
    # to_char group separators / FM modes: DuckDB's to_char is not
    # PG-complete; its output is not an oracle for formatting
    "to_char(",
    # DuckDB regexp_matches returns BOOL; PG returns setof text[]
    "regexp_matches(",
    # PG format() rejects unknown specifiers; DuckDB echoes them
    "format(",
    # DuckDB loses record field names and uses engine-native NULL
    # semantics for row equality (PG record_eq is three-valued)
    "row(",
    # PG json_array_length ERRORs on a non-array; DuckDB returns 0
    "json_array_length(",
    # DuckDB's make_timestamptz ignores the explicit-offset tz argument
    "make_timestamptz(",
    # DuckDB silently drops zone abbreviations in timestamptz literals
    " msk'",
    " pst'",
    " est'",
    " edt'",
    " pdt'",
    # DuckDB to_hex uppercases; PG is lowercase
    "to_hex(",
    # locale collations: neither engine implements PG's libc/ICU rules
    "collate",
    # x = ANY/ALL(NULL::arr): PG yields NULL, DuckDB true/false
    "(null::",
    # DST-ambiguous local times: PG resolves to the later UTC offset,
    # the JVM to the earlier one (documented deviation, README)
    "europe/moscow",
    # two-digit-year / field-order date inputs: PG windows 2-digit
    # years (<70 → 2000s) and disambiguates fields by DateStyle
    # (date.out:228 '99-01-08' → 1999-01-08); DuckDB reads the first
    # field as a literal year (0099-01-08). Engine matches PG.
    "date '99-01-08'",
    "date '99-08-01'",
    "date '99 01 08'",
    "date '99 08 01'",
    "date '01/02/03'",
    # DuckDB's bytea input treats \\x escape-format differently from
    # PG's hex form (verified against varlena.c byteain; unit-tested
    # in tests/test_engine.py::test_bytea_hex_literals)
    "::bytea",
    # zero-width alternation edges where DuckDB's regex engine returns
    # false and PG/Java true
    "($$)+",
    "($|^)*",
    "(^$)*",
    "(^)+^",
    # DuckDB's AT TIME ZONE ignores abbreviations entirely (returns the
    # input unchanged); PG's Default file links MSK -> Europe/Moscow
    # (dynamic: +04 during 2011-2014) — the engine matches PG's
    # expected/timestamptz.out via the _TZ_ABBREV_ZONES rewrite
    "'msk'",
    # PG SRFs in the select list expand ROWS; DuckDB returns a LIST
    "generate_series(",
    # DuckDB json_object treats the braced text[] argument as one
    # literal key; PG parses it as an array of keys/values
    "json_object(",
    "jsonb_object(",
    # PG string_to_array with a NULL delimiter splits per character;
    # DuckDB returns the whole string as one element
    "string_to_array('1|2|3', null)",
    # ...and with an EMPTY delimiter PG keeps the whole string as one
    # element (text_to_array); DuckDB splits per character
    "string_to_array('1|2|3', '')",
    "string_to_array('abc', '')",
    # PG array_to_string is STRICT — NULL delimiter -> NULL; DuckDB
    # treats it as skip-nulls join
    "array_to_string(array[1,2,3,4,null,6], null)",
    # single-value stddev/var of inf/nan: PG NaN, DuckDB 0, Spark NULL
    "'inf'::float8",
    "'nan'::float8",
    # PG date ±infinity sentinels don't exist in the engine's DATE
    "'infinity'::date",
    # json TYPE preserves \uNNNN escapes verbatim; duck re-escapes
    "\\u00",
    "\\u0024",
    # element||array concatenation: PG's || over an array operand is
    # array_cat (engine matches: {0,1,2}); DuckDB string-concats
    "|| array[",
    "array[1,2] ||",
    # PG sha2 functions return BYTEA ('\xef53...', engine matches);
    # DuckDB's return VARCHAR hex without the \x
    "sha224(",
    "sha256(",
    "sha384(",
    "sha512(",
    # VARIADIC array arguments spread as individual args in PG
    # (text.out: concat(variadic array[1,2,3]) = '123', engine
    # matches); DuckDB passes the LIST through as one value
    "variadic ",
    # PG to_json(timestamp) renders ISO-8601 with 'T'; DuckDB keeps a
    # space separator (engine uses T; sub-second digits are millis —
    # README "Known deviations")
    "to_json(timestamp",
    "to_jsonb(timestamp",
)


def _expected_errors_for(sql_path: str) -> dict[str, bool]:
    """Parse the statement's expected/*.out twin: psql echoes each
    statement, so the line after a SELECT block tells us whether PG
    itself raises (ERROR: ...) — an engine error there is error
    PARITY, and an engine success is the silently-succeeding class."""
    out_path = sql_path.replace("/sql/", "/expected/")[:-4] + ".out"
    if not os.path.exists(out_path):
        return {}
    lines = open(out_path, errors="ignore").read().split("\n")
    seen: dict[str, list[bool]] = {}
    for i, ln in enumerate(lines):
        s = ln.strip()
        # psql echoes trailing same-line comments too
        # ("select ...;  -- FAIL"); strip them so the echo still
        # keys to the corpus statement
        if "--" in s and not s.endswith(";"):
            s = re.sub(r"\s*--.*$", "", s).strip()
        if re.match(r"(?i)^SELECT\s", s) and s.endswith(";"):
            flag = False
            for j in range(i + 1, min(i + 6, len(lines))):
                nxt = lines[j]
                if nxt.startswith("ERROR"):
                    # an aborted-transaction error is block context,
                    # not a semantic verdict on this statement
                    flag = "current transaction is aborted" not in nxt
                    break
                if re.match(
                    r"(?i)^(SELECT|INSERT|UPDATE|DELETE|CREATE|DROP|SET"
                    r"|RESET|BEGIN|COMMIT|--)\b",
                    nxt.strip(),
                ):
                    break
            seen.setdefault(s.rstrip(";"), []).append(bool(flag))
    # deterministic FROM-less statements error consistently; a mixed
    # record means context effects — don't flag
    return {k: all(v) for k, v in seen.items()}


def corpus() -> list[tuple[str, bool | None]]:
    """(statement, expected_error) pairs; expected_error is None when
    the statement wasn't found in an expected/*.out file."""
    stmts: dict[str, bool | None] = {}
    for f in glob.glob(REGRESS):
        err_map = _expected_errors_for(f)
        for line in open(f, errors="ignore"):
            s = line.strip()
            if (
                re.match(r"(?i)^SELECT\s", s)
                and s.endswith(";")
                and " from " not in s.lower()
                and len(s) < 120
                and "pg_" not in s
            ):
                key = s.rstrip(";")
                flag = err_map.get(key)
                prev = stmts.get(key)
                if prev is None:
                    stmts[key] = flag
                elif flag is not None:
                    stmts[key] = prev and flag
    return sorted(stmts.items())


def _split_statements(text: str) -> list[str]:
    """Split a regress script into top-level statements: respects
    '...' literals, $tag$...$tag$ bodies, "quoted idents", -- and
    /* */ comments."""
    out: list[str] = []
    buf: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "-" and text[i: i + 2] == "--":
            j = text.find("\n", i)
            i = n if j < 0 else j
            continue
        if ch == "/" and text[i: i + 2] == "/*":
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if ch == "'":
            j = i + 1
            while j < n:
                if text[j] == "'":
                    if text[j: j + 2] == "''":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(text[i: j + 1])
            i = j + 1
            continue
        if ch == '"':
            j = text.find('"', i + 1)
            j = n - 1 if j < 0 else j
            buf.append(text[i: j + 1])
            i = j + 1
            continue
        if ch == "$":
            dm = re.match(r"\$(\w*)\$", text[i:])
            if dm:
                tag = dm.group(0)
                j = text.find(tag, i + len(tag))
                j = n if j < 0 else j + len(tag)
                buf.append(text[i: j])
                i = j
                continue
        if ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


_CONTEXT_DDL_RE = re.compile(
    r"(?is)^\s*(?:CREATE\s+(?:OR\s+REPLACE\s+)?"
    r"(?:(?:GLOBAL\s+|LOCAL\s+)?TEMP(?:ORARY)?\s+|UNLOGGED\s+)?"
    r"(?:DOMAIN|TYPE|FUNCTION|SEQUENCE|AGGREGATE|TABLE)"
    r"|ALTER\s+(?:TYPE|DOMAIN|SEQUENCE))\b"
)
# session hygiene replayed alongside (regress scripts DROP before
# re-CREATEing the same names) — executed but NOT counted in the
# context-surface metric
_CONTEXT_DROP_RE = re.compile(
    r"(?is)^\s*DROP\s+(?:TABLE|TYPE|DOMAIN|FUNCTION|SEQUENCE"
    r"|AGGREGATE|VIEW)\b"
)
# custom-namespace GUC SETs (guc.c placeholder options): the suite
# SETs nosuch.setting='nada' then probes current_setting() — replay
# them (uncounted hygiene) so the probe sees the suite's session
# state; built-in GUCs (datestyle &c) are NOT replayed — they would
# change every later probe's semantics, which a per-file replay
# can't scope the way psql's sequential run does
_CONTEXT_SET_RE = re.compile(
    r"(?is)^\s*SET\s+[a-z_]\w*\.[\w.]+\s*=")


def _ctx_family(c: str) -> str:
    """Census bucket for a context-replay statement: DDL head plus
    the discriminating sub-form (CREATE TYPE AS ENUM vs RANGE,
    CREATE FUNCTION language, partitioned CREATE TABLE)."""
    m = re.match(
        r"(?is)^\s*(create(?:\s+or\s+replace)?|alter)\s+"
        r"(?:(?:global\s+|local\s+)?temp(?:orary)?\s+|unlogged\s+)?"
        r"(\w+)",
        c,
    )
    if not m:
        return "other"
    kind = (
        "CREATE" if m.group(1).lower().startswith("create") else "ALTER"
    ) + " " + m.group(2).upper()
    cl = c.lower()
    if kind == "CREATE TYPE":
        am = re.search(r"(?i)\bas\s+(enum|range)\b", c)
        return kind + (f" AS {am.group(1).upper()}" if am else " AS composite"
                       if re.search(r"(?i)\bas\s*\(", c) else " shell")
    if kind == "CREATE FUNCTION":
        lm = re.search(r"(?i)\blanguage\s+'?(\w+)", c)
        return kind + (f" lang={lm.group(1).lower()}" if lm else "")
    if kind == "CREATE TABLE":
        if "partition by" in cl:
            return kind + " partitioned"
        if re.search(r"(?i)\binherits\b", cl):
            return kind + " inherits"
        return kind
    return kind


def context_statements(sql_path: str) -> list[str]:
    """The file's CREATE DOMAIN/TYPE/FUNCTION/SEQUENCE/AGGREGATE
    statements, in order — the session context a FROM-less probe
    statement may reference (regress scripts CREATE then SELECT)."""
    try:
        text = open(sql_path, errors="ignore").read()
    except OSError:
        return []
    stmts = [
        s for s in _split_statements(text)
        if _CONTEXT_DDL_RE.match(s) or _CONTEXT_DROP_RE.match(s)
        or _CONTEXT_SET_RE.match(s)
    ]
    # keep a DROP only when the file re-CREATEs one of its names
    # LATER — the drop-then-recreate pattern the replay needs; pure
    # end-of-file cleanup DROPs would strip objects the probes use
    out = []
    for i, s in enumerate(stmts):
        if _CONTEXT_DROP_RE.match(s):
            names = {
                n.split(".")[-1].strip('"').lower()
                for n in re.findall(
                    r'[\w."]+',
                    re.sub(
                        r"(?is)^\s*DROP\s+\w+\s+(?:IF\s+EXISTS\s+)?"
                        r"|\b(?:CASCADE|RESTRICT)\b",
                        "",
                        s,
                    ),
                )
            }
            later = " ".join(stmts[i + 1 :]).lower()
            if not any(
                re.search(rf"\b{re.escape(n)}\b", later) for n in names
            ):
                continue
        out.append(s)
    return out


def corpus_by_file() -> list[tuple[str, list[tuple[str, bool | None]]]]:
    """The same deduped corpus as corpus(), grouped by the FIRST file
    a statement appears in, so per-file context replay can run its
    CREATEs before probing the file's statements."""
    merged = dict(corpus())
    by_file: dict[str, list[tuple[str, bool | None]]] = {}
    seen: set[str] = set()
    for f in sorted(glob.glob(REGRESS)):
        bucket = []
        for line in open(f, errors="ignore"):
            s = line.strip()
            if (
                re.match(r"(?i)^SELECT\s", s)
                and s.endswith(";")
                and " from " not in s.lower()
                and len(s) < 120
                and "pg_" not in s
            ):
                key = s.rstrip(";")
                if key in merged and key not in seen:
                    seen.add(key)
                    bucket.append((key, merged[key]))
        if bucket:
            by_file[f] = bucket
    return sorted(by_file.items())


_PG_IV_TEXT_RE = re.compile(
    r"(?:(-?\d+) years? ?)?(?:(-?\d+) mons? ?)?(?:(-?\d+) days? ?)?"
    r"(?:([+-]?)(\d+):(\d{2}):(\d{2}(?:\.\d+)?))?"
)


def _norm_cell(v) -> str:
    """Engine-neutral value rendering: exact for ints/strings/bools,
    10-significant-digit for floats (PG/DuckDB/Spark print shortest
    reprs that differ in the last ulp), date-only for midnight
    timestamps (date vs timestamp typing differs across engines for
    the same literal)."""
    import numpy as np
    import pandas as pd

    if v is None:
        return "NULL"
    if not isinstance(v, (list, tuple, np.ndarray, dict, str, bytes)):
        try:
            if pd.isna(v):  # NaT subclasses datetime; catch all scalars
                return "NULL"
        except (TypeError, ValueError):
            pass
    if isinstance(v, (np.floating, float, Decimal)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if math.isinf(f):
            return "Infinity" if f > 0 else "-Infinity"
        if f == int(f) and abs(f) < 1e15:
            return str(int(f))
        return f"{f:.10g}"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:  # engines differ only in rendering:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, datetime.timedelta):
        return f"interval:{v.total_seconds():.6f}"
    if isinstance(v, datetime.time):
        # engine time is a day-time interval; canon both to seconds
        secs = v.hour * 3600 + v.minute * 60 + v.second + v.microsecond / 1e6
        return f"interval:{secs:.6f}"
    if isinstance(v, str):
        # deeply-nested lists come back PRE-RENDERED as text from
        # DuckDB ('[a, bb]' with spaces) while Spark's come as real
        # nested lists (recursion renders '[a,bb]') — normalize the
        # separator so identical arrays compare equal
        if v.startswith("[") and v.endswith("]"):
            return re.sub(r",\s+", ",", v)
        # PG interval_out text (the engine's Calendar/YM rendering) vs
        # DuckDB's timedelta: canon to seconds with DuckDB's 30-day
        # month / 360-day year conversion, so both sides agree
        m = _PG_IV_TEXT_RE.fullmatch(v.strip())
        if m and any(m.group(i) for i in (1, 2, 3)):
            y = int(m.group(1) or 0)
            mo = int(m.group(2) or 0)
            d = int(m.group(3) or 0)
            secs = y * 31104000 + mo * 2592000 + d * 86400
            if m.group(5):
                t = (
                    int(m.group(5)) * 3600
                    + int(m.group(6)) * 60
                    + float(m.group(7) or 0)
                )
                secs += -t if m.group(4) == "-" else t
            return f"interval:{secs:.6f}"
        if re.fullmatch(r"-?\d{1,9}:\d{2}:\d{2}(?:\.\d+)?", v):
            neg = v.startswith("-")
            h, mi, s = v.lstrip("-").split(":")
            secs = int(h) * 3600 + int(mi) * 60 + float(s)
            return f"interval:{-secs if neg else secs:.6f}"
    if isinstance(v, np.ndarray) and v.ndim == 0:
        return _norm_cell(v.item())
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return json.dumps(
            {k: _norm_cell(x) for k, x in sorted(v.items())}, sort_keys=True
        )
    if isinstance(v, (bytes, bytearray)):
        return "\\x" + bytes(v).hex()
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def _rows_of(pdf) -> list[tuple]:
    return [
        tuple(_norm_cell(c) for c in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


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

    import shutil

    import duckdb

    from warehouse_pg_spark.engine import Engine
    from warehouse_pg_spark.session import get_spark

    # stale managed-table locations from a previous probe run make
    # re-CREATEs fail with LOCATION_ALREADY_EXISTS even after DROP
    shutil.rmtree("spark-warehouse", ignore_errors=True)

    eng = Engine(get_spark())
    con = duckdb.connect()
    groups = corpus_by_file()
    if sample:
        import random

        random.seed(42)
        flat = [(f, s, e) for f, b in groups for s, e in b]
        flat = random.sample(flat, min(sample, len(flat)))
        regrouped: dict[str, list[tuple[str, bool | None]]] = {}
        for f, s, e in flat:
            regrouped.setdefault(f, []).append((s, e))
        groups = sorted(regrouped.items())

    n_stmts = sum(len(b) for _, b in groups)
    value_pass = exec_only = skipped_nondet = diverges = 0
    error_parity = 0
    ctx_stmts = ctx_ok = ctx_files = 0
    ctx_fail_census: dict[str, int] = {}
    ctx_fail_samples: dict[str, list] = {}
    engine_errors: list[dict] = []
    mismatches: list[dict] = []
    should_error: list[str] = []
    from warehouse_pg_spark.user_types import UserTypes

    for path, bucket in groups:
        # statement-context REPLAY: run the file's CREATE DOMAIN/TYPE/
        # FUNCTION/SEQUENCE/AGGREGATE statements first, so probe
        # statements referencing regress-local objects become
        # reachable. User-type state resets per file (regress files
        # redefine the same names with different bodies).
        ctx = context_statements(path)
        if ctx:
            ctx_files += 1
            eng._user_types = UserTypes()
            eng._variadic_functions.clear()
            eng._poly_functions.clear()
            eng._sql_aggregates.clear()
            try:
                eng.sql("RESET ALL")  # custom GUCs must not leak
            except Exception:
                pass
            for c in ctx:
                if _CONTEXT_DROP_RE.match(c) or _CONTEXT_SET_RE.match(c):
                    # hygiene, not surface: run, never count
                    try:
                        eng.sql(c)
                    except Exception:
                        pass
                    try:
                        con.execute(c)
                    except Exception:
                        pass
                    continue
                ctx_stmts += 1
                try:
                    eng.sql(c)
                    ctx_ok += 1
                except Exception as cex:
                    if "ALREADY_EXISTS" in str(cex):
                        # per-file replay can't interleave the DROP
                        # that separated two same-named CREATEs in
                        # the original script — drop and retry (the
                        # LATER definition is the one probes see,
                        # matching psql's sequential end state)
                        nm = re.search(
                            r"(?i)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?"
                            r"(?:(?:GLOBAL\s+|LOCAL\s+)?TEMP(?:ORARY)?"
                            r"\s+|UNLOGGED\s+)?(\w+)\s+"
                            r"(?:IF\s+NOT\s+EXISTS\s+)?([\w.\"]+)", c)
                        try:
                            if nm:
                                eng.sql(
                                    f"DROP {nm.group(1)} IF EXISTS "
                                    f"{nm.group(2)}")
                            eng.sql(c)
                            ctx_ok += 1
                            continue
                        except Exception as cex2:
                            cex = cex2
                    fam = _ctx_family(c)
                    ctx_fail_census[fam] = ctx_fail_census.get(fam, 0) + 1
                    if len(ctx_fail_samples.setdefault(fam, [])) < 5:
                        ctx_fail_samples[fam].append(
                            {"sql": c[:200],
                             "err": str(cex)[:160]}
                        )
                try:
                    con.execute(c)  # best-effort oracle context
                except Exception:
                    pass
        for s, exp_err in bucket:
            try:
                df = eng.sql(s)
                try:
                    s_rows = _rows_of(df.toPandas())
                except Exception as conv_ex:
                    # pandas datetime64[ns] spans 1677..2262 only; a
                    # CORRECT engine value outside that (year 97 etc.)
                    # fails only the pandas conversion — compare via
                    # collect() instead of penalizing the engine
                    if "timestamp" not in str(conv_ex).lower():
                        raise
                    s_rows = [
                        tuple(_norm_cell(c) for c in row)
                        for row in df.collect()
                    ]
            except Exception as ex:
                if exp_err:
                    # PG's own expected output is ERROR here — raising
                    # IS the correct behavior (error parity)
                    error_parity += 1
                    continue
                # PySpark exception text often STARTS with a newline —
                # strip first, or the recorded err is blank and the
                # missing-object classifier can never fire. Arrow-
                # worker raises bury the engine's message inside the
                # Python traceback — surface the ValueError line.
                es = str(ex).strip()
                vm = re.search(r"ValueError: (.+)", es)
                engine_errors.append(
                    {"sql": s,
                     "err": (vm.group(1).strip() if vm
                             else es.split("\n")[0])[:200]}
                )
                continue
            if exp_err:
                # PG raises, we silently return a value — the inverse
                # silent-wrong class
                should_error.append(s)
                continue
            if _NONDET_RE.search(s):
                skipped_nondet += 1
                continue
            if any(p in s.lower() for p in ORACLE_DIVERGES):
                diverges += 1
                continue
            try:
                # fetchall, not .df(): pandas conversion corrupts NULLs
                # inside LIST values (int list with NULL -> zeros)
                duck_raw = con.execute(s).fetchall()
            except Exception:
                exec_only += 1
                continue
            d_rows = [
                tuple(_norm_cell(c) for c in row) for row in duck_raw
            ]
            if sorted(s_rows) == sorted(d_rows):
                value_pass += 1
            else:
                mismatches.append(
                    {"sql": s, "spark": s_rows[:3], "duck": d_rows[:3]}
                )

    # should_error recheck under the strict GUC: how many of the
    # silently-succeeding expressions become loud with
    # SET strict_errors = on (spark.sql.ansi.enabled — PG's raising
    # posture for div-by-zero / overflow / bad casts)?
    strict_loud = 0
    if should_error:
        eng.sql("SET strict_errors = on")
        for s in should_error:
            try:
                eng.sql(s).collect()
            except Exception:
                strict_loud += 1
        eng.sql("SET strict_errors = off")

    n = n_stmts
    executed = n - len(engine_errors) - error_parity
    checked = value_pass + len(mismatches)
    out = {
        "metric": "regress_expr_compat",
        "total": n,
        "context_files": ctx_files,
        "context_stmts": ctx_stmts,
        "context_ok": ctx_ok,
        "executed": executed,
        "exec_pct": round(100.0 * executed / n, 1),
        "value_checked": checked,
        "value_pass": value_pass,
        "value_mismatch": len(mismatches),
        "value_pct": round(100.0 * value_pass / checked, 1) if checked else None,
        "exec_only": exec_only,
        "skipped_nondet": skipped_nondet,
        "oracle_diverges_skiplist": diverges,
        "engine_error": len(engine_errors),
        "error_parity": error_parity,
        "should_error": len(should_error),
        "should_error_strict_loud": strict_loud,
    }
    if fails_out:
        # objects the regress suite CREATEs in its own scripts: a
        # statement failing because such an object is missing needs
        # statement-context REPLAY, not engine surface — a FROM-less
        # expression probe can never reach it
        created: set[str] = set()
        create_pat = re.compile(
            r"(?i)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?"
            r"(?:UNLOGGED\s+)?(?:FUNCTION|TABLE|TYPE|DOMAIN|SEQUENCE"
            r"|VIEW|MATERIALIZED\s+VIEW|INDEX|AGGREGATE|OPERATOR"
            r"|PROCEDURE|COLLATION)\s+(?:IF\s+NOT\s+EXISTS\s+)?"
            r'([\w."]+)'
        )
        rename_pat = re.compile(
            r"(?i)\bRENAME\s+TO\s+([\w.\"]+)"
        )
        operator_pat = re.compile(
            r"(?i)^\s*CREATE\s+OPERATOR\s+([^\s(]+)"
        )
        suite_operators: set[str] = set()
        for f in glob.glob(REGRESS):
            for line in open(f, errors="ignore"):
                cm = create_pat.match(line)
                if cm:
                    created.add(
                        cm.group(1).split(".")[-1].strip('"').lower()
                    )
                rm = rename_pat.search(line)
                if rm:
                    # ALTER ... RENAME TO targets are suite-local too
                    created.add(
                        rm.group(1).split(".")[-1].strip('"').lower()
                    )
                om = operator_pat.match(line)
                if om:
                    op = om.group(1).split(".")[-1]
                    # symbol-only, NON-standard spellings carry signal
                    # (CREATE OPERATOR CLASS/FAMILY keywords and a
                    # suite-defined '=' must not swallow every query)
                    if re.fullmatch(r"[^\w\s]+", op) and op not in (
                        "=", "<>", "<", ">", "<=", ">=",
                        "+", "-", "*", "/", "||", "=>",
                    ):
                        suite_operators.add(op)
        missing_pat = re.compile(
            r"routine (?:`[\w.]+`\.)*`(\w+)`"
            r"|view `+(?:\w+`?\.`?)*(\w+)`"
            r"|sequence '(\w+)'|relation \"(\w+)\""
            r"|The `(\w+)` requires \d+ parameters"
        )

        def classify(e: str, err: str = "") -> str:
            mm = missing_pat.search(err)
            if mm:
                name = next(g for g in mm.groups() if g)
                if name.lower() in created:
                    if "requires" in err and "parameters" in err:
                        return (
                            "out-of-scope: regress-local overloaded "
                            "function (PG overloads by signature; the "
                            "engine keeps the last definition)"
                        )
                    return (
                        "out-of-scope: regress-local object "
                        "(CREATE'd by the suite; needs context replay)"
                    )
            el = e.lower()
            # errors the engine raises ON PURPOSE where PG itself
            # raises (enum input validation, unknown GUC lookup): the
            # expected-out echo scan missed these (multi-file dedup /
            # whitespace), but raising IS the correct behavior
            if re.search(
                r"invalid input value for enum"
                r"|unrecognized configuration parameter"
                r"|invalid jsonpath"
                r"|XQuery \"x\" flag"
                r"|invalid like_regex flag"
                r"|invalid regular expression in like_regex"
                r"|is out of range for type double precision"
                r"|int[248] out of range"
                r"|^input is out of range"
                r"|date field value out of range"
                r"|time field value out of range"
                r"|invalid input syntax for type boolean"
                r"|cannot cast jsonb"
                r"|invalid input syntax for type json"
                r"|invalid value \"[^\"]*\" for \""
                r"|source string too short for"
                r"|conflicting values for"
                r"|invalid combination of date conventions"
                r"|in source string is out of range"
                r"|is only supported in to_char"
                r"|invalid XML content"
                r"|unsupported XML feature"
                r"|not an XML document"
                r"|empty XPath expression"
                r"|string is not a valid identifier"
                r"|out of range for type money"
                r"|invalid hexadecimal"
                r"|invalid input syntax for type bytea"
                r"|invalid Unicode"
                r"|format\(\) type specifier"
                r"|appears more than once"
                r"|processing instruction target"
                r"|must be type xml"
                r"|numeric time zone"
                r"|not recognized"
                r"|interval out of range"
                r"|range lower bound"
                r"|array must have"
                r"|mismatched array dimensions"
                r"|wrong number of array subscripts"
                r"|null value not allowed for object key"
                r"|count must be greater than zero"
                r"|lower bound cannot equal upper bound"
                r"|cannot be NaN"
                r"|unsupported Unicode escape sequence"
                r"|stack depth limit exceeded"
                r"|invalid regular expression option"
                r"|out of range for type"
                r"|bigint out of range"
                r"|integer out of range"
                r"|smallint out of range"
                # r15 validation families
                r"|cannot take logarithm"
                r"|zero raised to a negative power"
                r"|yields a complex result"
                r"|value overflows numeric format"
                r"|cannot convert infinity to numeric"
                r"|malformed range literal"
                r"|range lower bound must be less"
                r"|null character not permitted"
                r"|timestamp cannot be NaN"
                r"|date/time field value out of range"
                r"|cannot determine type of empty array"
                r"|function (?:substr|length)\(integer"
                r"|operator does not exist:"
                r"|is not a valid binary digit"
                r"|syntax error at or near .COLLATE."
                r"|abscissa type not supported"
                r"|invalid backreference number"
                r"|cannot get array length"
                r"|key value must be scalar"
                r"|path element at position"
                r"|cannot replace existing key"
                r"|jsonpath array subscript"
                r"|jsonpath item method"
                r"|thresholds array must not contain"
                r"|violates check constraint"
                r"|result is out of range"
                r"|malformed array literal"
                r"|timestamp out of range"
                r"|date out of range"
                r"|hour .* is invalid for the 12-hour clock"
                r"|linear_interpolate",
                err,
            ):
                return (
                    "error-parity: engine raises PG's own error "
                    "(expected-out echo unmatched)"
                )
            # corpus-filter artifacts: the FROM-less filter checks
            # ' from ' with spaces; tab-separated or glued FROMs slip
            # through as table-backed statements the probe can't run
            if re.search(r"(?i)(?:\s|\*)from\s+\w", e):
                return (
                    "out-of-scope: table-backed query "
                    "(corpus FROM-filter artifact)"
                )
            if "DATATYPE_MISMATCH" in err and re.search(
                r"(?i)\b(?:true|false)\s*(?:/\*.*?\*/)?\s*"
                r"(?:<=|>=|<>|<|>)\s*",
                e,
            ):
                # PG: operator does not exist boolean <= integer —
                # both engines reject, differing only in message
                return (
                    "error-parity: boolean-vs-number comparison "
                    "(PG raises operator-does-not-exist)"
                )
            # PG's own DATE/TIMESTAMP range exceeds Spark's (4713BC..
            # 5874897AD vs 0001..9999 dates / 1677..2262 Arrow ns):
            # out-of-range years are a documented README deviation
            if re.search(r"year -?\d+ is out of range", err) or (
                re.search(r"'\d{1,2}/\d{1,2}/\d{5,}'", e)
            ):
                return (
                    "out-of-scope: beyond Spark date/timestamp year "
                    "range (README deviation)"
                )
            if "INVALID_NUMERIC_LITERAL_RANGE" in err:
                # PG numeric holds 131072 digits / 1e±16383 exponents;
                # nothing on the JVM side can represent the value
                return (
                    "out-of-scope: beyond float8/DECIMAL numeric "
                    "range (PG unbounded numeric)"
                )
            if "WHILE loop exceeded" in err:
                # the loud fuel bound is the documented posture for
                # unbounded-iteration PL/pgSQL under compilation
                return (
                    "out-of-scope: unbounded-iteration PL/pgSQL "
                    "(fuel-bounded compilation; README)"
                )
            # a statement whose call / cast names a suite-CREATE'd
            # object that still failed to register (plpgsql features
            # beyond the compiled subset, table rowtypes with
            # unsupported bodies): context replay ran, the OBJECT is
            # the blocker, not engine surface
            if re.search(
                r"PARSE_SYNTAX_ERROR|UNSUPPORTED_DATATYPE"
                r"|UNRESOLVED_ROUTINE|UNRESOLVED_COLUMN"
                r"|WRONG_NUM_ARGS",
                err,
            ):
                names = re.findall(r"\b([a-z_]\w*)\s*\(", el)
                names += re.findall(r"::\s*([a-z_]\w*)", el)
                if any(n in created for n in names):
                    return (
                        "out-of-scope: regress-local object "
                        "(CREATE'd by the suite; replay could not "
                        "register it)"
                    )
            if re.search(
                r"(?i)\btimestamp(?:tz)?\s*'-?infinity'", e
            ):
                return (
                    "out-of-scope: PG ±infinity timestamp sentinels "
                    "(README deviation)"
                )
            # suite-defined custom operators (CREATE OPERATOR !=- etc.)
            for op in suite_operators:
                if op in e:
                    return (
                        "out-of-scope: regress-local operator "
                        "(CREATE OPERATOR'd by the suite)"
                    )
            # trigger pseudo-rows referenced outside a trigger body
            if re.search(r"(?i)\b(?:new|old)\s*\.\s*\w+", e):
                return (
                    "out-of-scope: trigger pseudo-row outside a "
                    "trigger context"
                )
            # zero-column target lists (PG allows `SELECT;`; Spark
            # requires at least one projection)
            if re.match(r"(?i)^select\s*(?:union|intersect|except|$)",
                        e.strip()):
                return (
                    "out-of-scope: zero-column target list "
                    "(Spark requires a projection)"
                )
            # plain-literal backslash: Spark unescapes inside '...'
            # (PG does not) — pinned README deviation since r9
            if re.search(r"'[^']*\\", e) and not re.search(
                r"(?i)\bE'", e
            ):
                return (
                    "out-of-scope: plain-literal backslash "
                    "(README deviation; E''/$tag$ forms are PG-exact)"
                )
            # line-based corpus extraction artifacts: a line with more
            # close-parens than opens, or an odd number of quotes, is
            # the TAIL of a multi-line statement, not a statement
            if e.count(")") > e.count("(") or e.count("'") % 2:
                return "out-of-scope: mid-statement fragment"
            if re.search(r"\\if\b|\\else\b|\\endif\b|\\gset|\\gexec",
                         el):
                return "out-of-scope: psql client syntax"
            if re.search(r"tsvector|tsquery|to_tsvector|@@", el):
                return "out-of-scope: full-text search"
            if re.search(r"'\d+-\d+-\d+ *bc'|\bbc\b", el):
                return "out-of-scope: BC dates"
            if re.search(r"'j\d+'", el) and "out of range" in err.lower():
                # Julian day numbers below 1721426 are BC-era dates
                return "out-of-scope: BC dates"
            if re.search(
                r"\binto\s+\w+(?:\s*,\s*\w+)*\s*$"
                r"|\binto\s+(?:retval|out_\w+|\w+_var)\b"
                r"|\binto\s+temp(?:orary)?\s+\w+"
                r"|\\\\;|:\{\?|(?<!:):'?\w+'?\s*\\\\|^select\s+:\w+"
                r"|[\s(]:(?!:)[a-z_]\w*",
                el,
            ) or "\\;" in e:
                return "out-of-scope: psql client syntax"
            if re.search(r"\blo_(?:create|open|import|export|unlink)\b",
                         el):
                return "out-of-scope: large objects"
            if re.search(
                r"\b(to_reg(?:proc|procedure|oper|operator|role|type"
                r"|class|namespace|collation)|has_\w+_privilege"
                r"|format_type|(?:col|obj|shobj)_description"
                r"|table_to_xml\w*|cursor_to_xml\w*|query_to_xml\w*"
                r"|schema_to_xml\w*|database_to_xml\w*"
                r"|brin_\w+|gin_\w+|gp_\w+|ts_headline|ts_rank\w*"
                r"|ts_debug|ts_stat|txid_\w+|\w*_recv|\w*_send"
                # reg* OID-constructor CALLS (regtype('int4') etc.) are
                # catalog lookups like their to_reg* counterparts;
                # row_security_active / set_ttdummy / test_atomic_ops /
                # get_ao_distribution are RLS/regress/AO admin hooks
                r"|reg(?:proc|procedure|oper|operator|role|type|class"
                r"|namespace|collation)(?=\s*\()"
                r"|row_security_active|set_ttdummy|test_atomic_ops"
                r"|get_ao_distribution)\b",
                el,
            ):
                return (
                    "out-of-scope: catalog/ACL/admin introspection"
                )
            if re.search(
                r"\b(widget|complex|pleast|dfunc|city|int44|textrange"
                r"|float8range|myint|tstzrange|table_am|rgb|rainbow"
                r"|usr_define_type|xy_tuple|testtype\d*|tbl\d+"
                r"|foreach_test|currtid2|merge_db|func1_\w+|excpt_test\d*"
                r"|transaction_test\d*|sales_region|sec_definer_\w+"
                r"|array_elem_check|anyarray_anyrange_func|serialtest\w*"
                r"|get_ao_compression_ratio|gp_inject_fault|check_atsetam"
                r"|\w+send|\w+recv|disable_xform|enable_xform"
                r"|satisfies_hash_partition|brin_desummarize_range"
                r"|lo_create|has_table_privilege|ts_lexize|verify)\b", el,
            ):
                return "out-of-scope: regress-local UDF/type or admin fn"
            if re.search(r"\$\d+\b", e):  # bare prepared-stmt params
                return "out-of-scope: unbound $n parameter"
            # bare PL/pgSQL variables probed outside any body: the
            # corpus line-splitter lifts `select value + seed;` /
            # `i_caller` lines out of CREATE FUNCTION bodies; run
            # standalone, PG itself raises column-does-not-exist —
            # the engine raising UNRESOLVED_COLUMN is error parity
            if "UNRESOLVED_COLUMN" in err:
                um = re.search(r"`(\w+)`", err)
                if um and re.search(
                    rf"\b{re.escape(um.group(1))}\b(?!\s*\()",
                    el,
                    re.IGNORECASE,
                ):
                    return (
                        "error-parity: bare identifier outside its "
                        "PL/pgSQL body (PG raises "
                        "column-does-not-exist)"
                    )
            return "in-scope"

        def se_family(s: str) -> str:
            """Census bucket for a PG-raises / engine-accepts
            statement (the silent-accept divergence class)."""
            sl = s.lower()
            if re.search(r"/\s*0(?:\.0*)?\b|/ nullif", sl):
                return "division-by-zero (strict_errors makes loud)"
            if re.search(r"::(int|smallint|bigint|numeric|decimal"
                         r"|float|real|double)", sl) and re.search(
                         r"'[^']*[a-df-z][^']*'", sl):
                return "invalid numeric input (strict_errors)"
            if re.search(r"::(date|time|timestamp|interval)", sl):
                return "invalid datetime input"
            if re.search(r"\b(pow|power|exp|log|ln|sqrt|factorial"
                         r"|\^|!)\b|overflow", sl):
                return "numeric overflow / domain (strict_errors)"
            if re.search(r"::(bit|varbit)|b'[01]*'", sl):
                return "bit-string width/format"
            if re.search(r"\[\s*-?\d+\s*\]|array|\bslice", sl):
                return "array subscript/shape"
            if re.search(r"json|->|#>", sl):
                return "json path/type"
            if re.search(r"substring|overlay|position|trim|chr\(", sl):
                return "string argument range"
            if re.search(r"::inet|::cidr|::macaddr|::point|::box"
                         r"|::circle|::line|::lseg|::path|::polygon",
                         sl):
                return "typed-input validation (inet/geo)"
            return "other relaxed validation"

        se_census: dict[str, int] = {}
        for s in should_error:
            k = se_family(s)
            se_census[k] = se_census.get(k, 0) + 1

        triage = {
            "context_fail_census": dict(
                sorted(ctx_fail_census.items(), key=lambda kv: -kv[1])
            ),
            "context_fail_samples": ctx_fail_samples,
            "should_error": should_error,
            "should_error_census": dict(
                sorted(se_census.items(), key=lambda kv: -kv[1])
            ),
            "engine_errors": [
                {**d, "triage": classify(d["sql"], d.get("err", ""))}
                for d in engine_errors
            ],
            "mismatches": mismatches,
            "counts": {
                "in_scope_errors": sum(
                    1 for d in engine_errors
                    if classify(d["sql"], d.get("err", "")) == "in-scope"
                ),
                "out_of_scope_errors": sum(
                    1 for d in engine_errors
                    if classify(d["sql"], d.get("err", "")) != "in-scope"
                ),
            },
        }
        with open(fails_out, "w") as f:
            json.dump(triage, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
