"""Output-clause rewrites: DISTINCT ON, FETCH ... WITH TIES, NULLS LAST/FIRST injection, dollar-quote strings.

Split from sql_dialect.py (r14); see that module's docstring for
the shim-wide design rules (masked literals, bounded regexes,
anything unrecognized passes through loud).
"""

from __future__ import annotations

import re


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


_WITH_TIES_RE = re.compile(
    r"^(.*)\bORDER\s+BY\s+(.+?)\s+"
    r"FETCH\s+(?:FIRST|NEXT)\s+(\d+)\s+ROWS?\s+WITH\s+TIES\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _rewrite_with_ties(sql: str) -> str:
    """PG 13 `FETCH FIRST n ROWS WITH TIES` (gram.y limit_clause,
    LIMIT_OPTION_WITH_TIES) → rank() window: rows tying with the n-th
    row on the ORDER BY key survive the limit. Whole-statement shape
    only; ORDER BY items must name output columns (they become the
    rank window's keys over the wrapped subquery)."""
    m = _WITH_TIES_RE.match(sql.strip())
    if m is None:
        return sql
    head, order, n = m.group(1).strip(), m.group(2).strip(), m.group(3)
    return (
        f"SELECT * EXCEPT (__rk) FROM ("
        f"SELECT __q.*, rank() OVER (ORDER BY {order}) AS __rk "
        f"FROM ({head}) __q) __ties WHERE __rk <= {n} ORDER BY {order}"
    )


# ORDER BY items end at these keywords (masked text, depth 0) or at the
# enclosing paren. ROWS/RANGE/GROUPS terminate window ORDER BYs.
_ORDER_TERMINATOR_RE = re.compile(
    r"\b(LIMIT|OFFSET|FETCH|UNION|EXCEPT|INTERSECT|WINDOW|ROWS|RANGE|GROUPS)\b",
    re.IGNORECASE,
)
_ORDER_BY_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
_NULLS_RE = re.compile(r"\bNULLS\s+(FIRST|LAST)\b", re.IGNORECASE)
_DESC_TAIL_RE = re.compile(r"\bDESC\s*$", re.IGNORECASE)
_ORDINAL_RE = re.compile(r"^\d+$")


def _inject_nulls_ordering(sql: str) -> str:
    """PG defaults ASC → NULLS LAST, DESC → NULLS FIRST (gram.y
    opt_nulls_order / SortByNulls); Spark defaults the opposite way
    round. Make every ORDER BY item explicit unless it already says
    NULLS FIRST/LAST. Bare ordinals (ORDER BY 1) are left alone —
    Spark resolves them before sort options apply."""
    out = sql
    # process right-to-left so earlier offsets stay valid after edits
    for m in reversed(list(_ORDER_BY_RE.finditer(sql))):
        start = m.end()
        # find clause end: depth-0 terminator keyword, unbalanced ')',
        # or end of string
        depth = 0
        i, n = start, len(sql)
        end = n
        while i < n:
            ch = sql[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    end = i
                    break
                depth -= 1
            elif depth == 0:
                t = _ORDER_TERMINATOR_RE.match(sql, i)
                if t and re.match(r"\W", sql[i - 1]):
                    end = i
                    break
            i += 1
        clause = sql[start:end]
        # split items on depth-0 commas
        items, buf, depth = [], [], 0
        for ch in clause:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                items.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        items.append("".join(buf))
        fixed = []
        for item in items:
            body = item.strip()
            if not body or _NULLS_RE.search(body) or _ORDINAL_RE.match(body):
                fixed.append(item)
            elif _DESC_TAIL_RE.search(body):
                fixed.append(item.rstrip() + " NULLS FIRST")
            else:
                fixed.append(item.rstrip() + " NULLS LAST")
        out = (
            out[:start] + " " + ", ".join(f.strip() for f in fixed) + " " + out[end:]
        )
    return out


# dollar-quoted string literals (gram.y xdolq scanner states):
# $$...$$ / $tag$...$tag$ → standard quoted literal. Runs BEFORE the
# literal masker, which only knows '...' quoting — so this is a real
# left-to-right scan over both quote forms: a $$ inside a normal
# literal is never a delimiter, and quotes inside a dollar body double
# on the way out. `$1` parameters don't match the $tag$ opener.
_DOLLAR_TAG_RE = re.compile(r"\$([A-Za-z_]\w*|)\$")


def _rewrite_dollar_quotes(sql: str) -> str:
    if "$" not in sql:
        return sql
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i: j + 1])
            i = j + 1
        elif ch == "$":
            m = _DOLLAR_TAG_RE.match(sql, i)
            if m:
                tag = m.group(0)
                end = sql.find(tag, i + len(tag))
                if end >= 0:
                    body = sql[i + len(tag): end]
                    # dollar-quoted text is VERBATIM in PG — double the
                    # backslashes so Spark's literal unescaping yields
                    # the same characters ($re$\s+$re$ previously
                    # became the regex 's+': silent wrong split)
                    out.append(
                        "'"
                        + body.replace("\\", "\\\\").replace("'", "''")
                        + "'"
                    )
                    i = end + len(tag)
                    continue
            out.append(ch)
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)
