"""PG → Spark SQL dialect shim (SURVEY §3.1: 'our engine adds a thin
SQL-dialect shim in front of spark.sql plus our function registry').

Conservative, token-aware textual rewrites for the PG-isms that appear
in the reference regress corpus but aren't Spark SQL:

  expr::type            -> CAST(expr AS type)       (simple operands)
  j ->> 'k'  /  -> 'k'  -> get_json_object(j, '$.k')
  generate_series(a,b[,s]) in FROM -> LATERAL explode(sequence(...))
  text/int4/int8/float8 type names -> STRING/INT/BIGINT/DOUBLE
  TRUE/FALSE literals, ILIKE, string concat ||  -> native (already valid)

The shim never parses full SQL — each rewrite is a bounded regex with
word-boundary guards; anything it doesn't recognize passes through to
Spark's parser untouched.
"""

from __future__ import annotations

import re

_TYPE_MAP = {
    "text": "STRING",
    "varchar": "STRING",
    "bpchar": "STRING",
    "int2": "SMALLINT",
    "int4": "INT",
    "int8": "BIGINT",
    "float4": "FLOAT",
    "float8": "DOUBLE",
    "bool": "BOOLEAN",
    "numeric": "DECIMAL(38,18)",
    "timestamptz": "TIMESTAMP",
}

# expr::type for simple operands: identifier, quoted literal, number,
# or a parenthesized tail like fn(x)::text (matches the closing paren).
_CAST_RE = re.compile(
    r"(\w+\([^()]*\)|'[^']*'|\"[^\"]*\"|[\w.]+)\s*::\s*([a-zA-Z_][\w]*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)"
)

_ARROW2_RE = re.compile(r"([\w.\)\]]+)\s*->>\s*'([^']+)'")
_ARROW1_RE = re.compile(r"([\w.\)\]]+)\s*->\s*'([^']+)'")

_GENSERIES_FROM_RE = re.compile(
    r"\bFROM\s+generate_series\s*\(([^()]*)\)\s*(?:AS\s+)?(\w+)\s*\(\s*(\w+)\s*\)",
    re.IGNORECASE,
)


# EXTRACT(EPOCH FROM expr) — Spark's Extract has no epoch field
_EXTRACT_EPOCH_RE = re.compile(
    r"\bEXTRACT\s*\(\s*EPOCH\s+FROM\s+([^()]+|\([^()]*\))\s*\)",
    re.IGNORECASE,
)

# PG string_agg(x, 'sep' ORDER BY cols) → listagg WITHIN GROUP (the
# ORDER BY sits inside the call parens in PG, after them in Spark)
_STRING_AGG_ORDER_RE = re.compile(
    r"\bstring_agg\s*\(([^(),]+),\s*('[^']*')\s+ORDER\s+BY\s+([^()]+)\)",
    re.IGNORECASE,
)
_STRING_AGG_RE = re.compile(
    r"\bstring_agg\s*\(([^(),]+),\s*('[^']*')\s*\)", re.IGNORECASE
)

_DISTINCT_ON_RE = re.compile(
    r"^\s*SELECT\s+DISTINCT\s+ON\s*\(([^)]*)\)\s*(.*?)\s+FROM\s+(.*?)"
    r"(?:\s+ORDER\s+BY\s+(.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _rewrite_distinct_on(sql: str) -> str:
    """PG `SELECT DISTINCT ON (k) cols FROM ... ORDER BY k, tiebreak`
    (parser gram.y distinct_clause) → row_number window, keep first row
    per key. Only the whole-statement shape is handled; anything more
    nested passes through (and Spark reports the syntax error)."""
    m = _DISTINCT_ON_RE.match(sql)
    if m is None:
        return sql
    on_cols, select_list, tail, order_by = m.groups()
    order = order_by.strip() if order_by else on_cols.strip()
    return (
        f"SELECT * EXCEPT (__rn) FROM ("
        f"SELECT {select_list.strip()}, row_number() OVER ("
        f"PARTITION BY {on_cols.strip()} ORDER BY {order}) AS __rn "
        f"FROM {tail.strip()}) __distinct_on WHERE __rn = 1"
    )


def _map_type(t: str) -> str:
    base = t.split("(")[0].strip().lower()
    mapped = _TYPE_MAP.get(base)
    if mapped is None:
        return t
    if "(" in t and base in ("varchar", "bpchar", "numeric"):
        if base == "numeric":
            return "DECIMAL" + t[t.index("(") :]
        return "STRING"
    return mapped


def rewrite(sql: str) -> str:
    """Apply all PG→Spark rewrites to a SQL string."""
    out = _rewrite_distinct_on(sql)

    # j ->> 'k' / j -> 'k'  (->> first so -> doesn't eat it)
    out = _ARROW2_RE.sub(lambda m: f"get_json_object({m.group(1)}, '$.{m.group(2)}')", out)
    out = _ARROW1_RE.sub(lambda m: f"get_json_object({m.group(1)}, '$.{m.group(2)}')", out)

    # expr::type  (repeat: chained casts a::text::int)
    prev = None
    while prev != out:
        prev = out
        out = _CAST_RE.sub(
            lambda m: f"CAST({m.group(1)} AS {_map_type(m.group(2))})", out
        )

    # Fallback for operands _CAST_RE can't bound (nested parens): Spark 4
    # parses `expr::type` natively, so just map the PG type name.
    out = re.sub(
        r"::\s*([a-zA-Z_]\w*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)",
        lambda m: "::" + _map_type(m.group(1)),
        out,
    )

    # EXTRACT(EPOCH FROM x) → unix_seconds (PG timestamp.c epoch field)
    out = _EXTRACT_EPOCH_RE.sub(
        lambda m: f"unix_seconds(CAST({m.group(1).strip()} AS TIMESTAMP))",
        out,
    )

    # string_agg → listagg (Spark 4); in-paren ORDER BY → WITHIN GROUP
    out = _STRING_AGG_ORDER_RE.sub(
        lambda m: (
            f"listagg({m.group(1).strip()}, {m.group(2)}) "
            f"WITHIN GROUP (ORDER BY {m.group(3).strip()})"
        ),
        out,
    )
    out = _STRING_AGG_RE.sub(
        lambda m: f"listagg({m.group(1).strip()}, {m.group(2)})", out
    )

    # FROM generate_series(a, b[, s]) [AS] t(n)
    out = _GENSERIES_FROM_RE.sub(
        lambda m: (
            f"FROM (SELECT explode(sequence({m.group(1)})) AS {m.group(3)}) {m.group(2)}"
        ),
        out,
    )

    return out
