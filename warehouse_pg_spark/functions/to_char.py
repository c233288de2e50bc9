"""PG to_char() format engine (reference: utils/adt/formatting.c — the
DCH_* datetime keywords and NUM_* numeric picture parser, ~6k LoC).

Spark-first design: the PG *format string* is a plan-time literal, so
the translation happens once in Python and compiles to pure Catalyst
expressions (date_format / format_number / concat / upper / lpad) —
JVM codegen, no Python in the hot path, unlike a per-row UDF port.

to_char_datetime(col, fmt)
    Tokenizes the PG pattern (longest-match, case-sensitive the way
    formatting.c is: MON/Mon/mon pick the output case) and emits a
    concat of date_format segments. Case-transformed name tokens
    (MONTH/DAY families) flush into their own segment wrapped in
    upper()/lower(); unknown letters become literals; punctuation stays
    inside the running date_format pattern.

to_char_numeric(x, fmt)
    Implements the common NUM_ picture elements: 9/0 digit slots,
    decimal point, ',' grouping, FM fill-mode, leading '$'. Without FM,
    PG right-aligns into the picture width with a leading sign slot
    (to_char(123, '999') = ' 123'); FM strips that.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# PG DCH token → (java date_format pattern, case transform or None).
# Ordered longest-first for the tokenizer.
_DCH_TOKENS: list[tuple[str, str, str | None]] = [
    ("HH24", "HH", None),
    ("HH12", "hh", None),
    ("YYYY", "yyyy", None),
    ("MONTH", "MMMM", "upper"),
    ("Month", "MMMM", None),
    ("month", "MMMM", "lower"),
    ("DDD", "DDD", None),
    ("MON", "MMM", "upper"),
    ("Mon", "MMM", None),
    ("mon", "MMM", "lower"),
    ("DAY", "EEEE", "upper"),
    ("Day", "EEEE", None),
    ("day", "EEEE", "lower"),
    ("DY", "EEE", "upper"),
    ("Dy", "EEE", None),
    ("dy", "EEE", "lower"),
    ("HH", "hh", None),
    ("MI", "mm", None),
    ("SS", "ss", None),
    ("MS", "SSS", None),
    ("US", "SSSSSS", None),
    ("YYY", "yyy", None),
    ("YY", "yy", None),
    ("Y", "y", None),
    ("MM", "MM", None),
    ("DD", "dd", None),
    ("AM", "a", None),
    ("PM", "a", None),
    ("am", "a", "lower"),
    ("pm", "a", "lower"),
    ("Q", "q", None),
]

# punctuation that can sit inside a Java pattern unquoted
_SAFE_PUNCT = set(" -/:.,;()")

_ROMAN_MONTHS = (
    "I", "II", "III", "IV", "V", "VI",
    "VII", "VIII", "IX", "X", "XI", "XII",
)

# DCH tokens with no Java date_format twin (Spark's Proleptic parser
# rejects the week-based Y/w patterns outright): ISO week-year family
# (formatting.c DCH_IYYY..DCH_I — the ISO year is the year of the
# week's Thursday), week numbers, Julian day, century, Roman months.
# Each entry renders as a SQL expression over placeholder {x}; the
# Column emitter evaluates the same shapes with pyspark functions.
_ISO_Y = "year(date_add(CAST({x} AS DATE), 3 - weekday({x})))"
_DCH_SPECIAL_SQL: list[tuple[str, str]] = [
    ("IYYY", f"lpad(CAST({_ISO_Y} AS STRING), 4, '0')"),
    ("IYY", f"substr(lpad(CAST({_ISO_Y} AS STRING), 4, '0'), 2)"),
    ("IW", "lpad(CAST(weekofyear({x}) AS STRING), 2, '0')"),
    ("IY", f"substr(lpad(CAST({_ISO_Y} AS STRING), 4, '0'), 3)"),
    ("ID", "CAST(weekday({x}) + 1 AS STRING)"),
    ("I", f"substr(lpad(CAST({_ISO_Y} AS STRING), 4, '0'), 4)"),
    ("WW", "CAST((dayofyear({x}) - 1) div 7 + 1 AS STRING)"),
    ("W", "CAST((dayofmonth({x}) - 1) div 7 + 1 AS STRING)"),
    ("CC", "CAST((year({x}) + 99) div 100 AS STRING)"),
    ("J", "CAST(datediff(CAST({x} AS DATE), DATE'1970-01-01') "
          "+ 2440588 AS STRING)"),
    ("RM", "__ROMAN_UPPER__"),
    ("rm", "__ROMAN_LOWER__"),
]


def _roman_col(c: Column, lower: bool, fm: bool) -> Column:
    r = F.element_at(
        F.array(*[F.lit(x.lower() if lower else x) for x in _ROMAN_MONTHS]),
        F.month(c),
    )
    # PG blank-pads RM to 4 unless fill mode
    return r if fm else F.rpad(r, 4, " ")


def _roman_sql(x: str, lower: bool, fm: bool) -> str:
    arr = ", ".join(
        "'" + (m.lower() if lower else m) + "'" for m in _ROMAN_MONTHS
    )
    r = f"element_at(array({arr}), month({x}))"
    return r if fm else f"rpad({r}, 4, ' ')"


def _dch_special_col(tok: str, c: Column, fm: bool) -> Column:
    """Column twin of the _DCH_SPECIAL_SQL snippets."""
    if tok == "RM":
        return _roman_col(c, False, fm)
    if tok == "rm":
        return _roman_col(c, True, fm)
    d = F.to_date(c)
    iso_y4 = F.lpad(
        F.year(F.date_add(d, F.lit(3) - F.weekday(c))).cast("string"),
        4, "0",
    )
    return {
        "IYYY": iso_y4,
        "IYY": F.substring(iso_y4, 2, 3),
        "IW": F.lpad(F.weekofyear(c).cast("string"), 2, "0"),
        "IY": F.substring(iso_y4, 3, 2),
        "ID": (F.weekday(c) + 1).cast("string"),
        "I": F.substring(iso_y4, 4, 1),
        "WW": (F.floor((F.dayofyear(c) - 1) / 7) + 1).cast("string"),
        "W": (F.floor((F.dayofmonth(c) - 1) / 7) + 1).cast("string"),
        "CC": F.floor((F.year(c) + 99) / 100).cast("string"),
        "J": (
            F.datediff(d, F.lit("1970-01-01").cast("date")) + 2440588
        ).cast("string"),
    }[tok]


def to_char_datetime(col: Column | str, fmt: str) -> Column:
    """PG to_char(timestamp/date, fmt) → concat of date_format segments."""
    c = F.col(col) if isinstance(col, str) else col
    parts: list[Column] = []
    buf = ""  # pending java pattern chars
    fm = False

    def flush():
        nonlocal buf
        if buf:
            parts.append(F.date_format(c, buf))
            buf = ""

    i, n = 0, len(fmt)
    while i < n:
        if fmt[i] == '"':  # quoted literal
            j = fmt.find('"', i + 1)
            j = n if j < 0 else j
            flush()
            parts.append(F.lit(fmt[i + 1 : j]))
            i = j + 1
            continue
        if fmt.startswith("FM", i):  # fill mode: date side is a no-op
            fm = True
            i += 2
            continue
        if fmt.startswith("TM", i):  # translation mode: English names
            i += 2
            continue
        sp = next(
            (t for t, _ in _DCH_SPECIAL_SQL if fmt.startswith(t, i)), None
        )
        if sp is not None:
            flush()
            parts.append(_dch_special_col(sp, c, fm))
            i += len(sp)
            continue
        if fmt[i] == "D" and not fmt.startswith(("DD", "DY", "Dy", "DAY", "Day"), i):
            # PG D = day of week, Sunday=1 — matches Spark dayofweek()
            flush()
            parts.append(F.dayofweek(c).cast("string"))
            i += 1
            continue
        for tok, java, case in _DCH_TOKENS:
            if fmt.startswith(tok, i):
                if case is None:
                    buf += java
                else:
                    flush()
                    seg = F.date_format(c, java)
                    parts.append(F.upper(seg) if case == "upper" else F.lower(seg))
                i += len(tok)
                break
        else:
            ch = fmt[i]
            if ch in _SAFE_PUNCT:
                buf += ch
            else:  # unknown letter → literal, never a stray pattern char
                flush()
                parts.append(F.lit(ch))
            i += 1
    flush()
    if not parts:
        return F.lit("")
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def _num_pic(fmt: str):
    """Parse a PG NUM picture (formatting.c NUM_* keywords subset):
    9/0 digit slots, grouping commas, decimal point, FM fill mode,
    $/L currency, quoted literal text, bare literal chars outside the
    digit core (regress numeric.out to_char_24..36: 'foo999' renders
    'foo 100', backslash is literal except \" which is a quote).
    Returns None for sign/ordinal/roman/scientific tokens this subset
    does not model (S MI PL SG TH RN EEEE) — callers stay loud."""
    fill = fmt.startswith("FM")
    pic = fmt[2:] if fill else fmt
    pre: list[str] = []
    post: list[str] = []
    core: list[str] = []
    currency = False
    stage = 0  # 0 = before digits, 1 = digit core, 2 = after
    i, n = 0, len(pic)
    while i < n:
        c = pic[i]
        if c == '"':
            j = i + 1
            buf: list[str] = []
            while j < n and pic[j] != '"':
                if pic[j] == "\\" and j + 1 < n:
                    buf.append(pic[j + 1])
                    j += 2
                    continue
                buf.append(pic[j])
                j += 1
            (pre if stage == 0 else post).append("".join(buf))
            i = j + 1
            continue
        if c == "\\" and pic[i + 1 : i + 2] == '"':
            (pre if stage == 0 else post).append('"')
            i += 2
            continue
        if c in "90" or (stage == 1 and c in ".,"):
            if stage == 0:
                stage = 1
            if stage == 1:
                core.append(c)
            else:
                post.append(c)
            i += 1
            continue
        if stage == 1:
            stage = 2
        up2, up4 = pic[i : i + 2].upper(), pic[i : i + 4].upper()
        if c.upper() == "S" or up2 in ("MI", "PL", "SG", "TH", "RN") or (
            up4 == "EEEE"
        ):
            return None
        if c in "$L" and stage == 0:
            currency = True
            i += 1
            continue
        (pre if stage == 0 else post).append(c)
        i += 1
    core_s = "".join(core)
    int_part, _, frac_part = core_s.partition(".")
    decimals = sum(1 for ch in frac_part if ch in "90")
    # FM may trim trailing 9-slot zeros but never below the last
    # 0-slot (a 0 forces the digit)
    frac_keep = 0
    for k, ch in enumerate(frac_part):
        if ch == "0":
            frac_keep = k + 1
    return {
        "fill": fill,
        "currency": currency,
        "pre": "".join(pre),
        "post": "".join(post),
        "decimals": decimals,
        "frac_keep": frac_keep,
        "has_point": "." in core_s,
        "grouping": "," in int_part,
        "zero_pad": int_part.replace(",", "").startswith("0"),
        "int_width": sum(1 for ch in int_part if ch in "90"),
    }


def to_char_numeric(col: Column | str, fmt: str) -> Column:
    """PG to_char(numeric, fmt) — Column twin of to_char_numeric_sql
    (pinned equal by tests/test_dialect_property.py)."""
    p = _num_pic(fmt)
    if p is None:
        raise ValueError(f"unsupported numeric picture: {fmt!r}")
    x = F.col(col) if isinstance(col, str) else col
    body = F.format_number(x.cast("double"), p["decimals"])
    if not p["grouping"]:
        body = F.replace(body, F.lit(","), F.lit(""))
    if p["zero_pad"]:
        pad_w = p["int_width"] + (1 + p["decimals"] if p["decimals"] else 0)
        body = F.when(
            x < 0,
            F.concat(
                F.lit("-"),
                F.lpad(F.replace(body, F.lit("-"), F.lit("")), pad_w, "0"),
            ),
        ).otherwise(F.lpad(body, pad_w, "0"))
    if p["fill"] and p["decimals"] > p["frac_keep"]:
        body = F.regexp_replace(
            body, r"(\.\d{%d,}?)0+$" % p["frac_keep"], "$1"
        )
    if p["currency"]:
        body = F.concat(F.lit("$"), body)
    if not p["fill"]:
        # PG reserves a sign slot: non-negatives get a leading space
        body = F.when(x < 0, body).otherwise(F.concat(F.lit(" "), body))
    if p["pre"]:
        body = F.concat(F.lit(p["pre"]), body)
    if p["post"]:
        body = F.concat(body, F.lit(p["post"]))
    return body


# --- SQL-text emitters -------------------------------------------------
# The same translations, rendered as SQL expression strings for the
# dialect layer (sql_dialect rewrites `to_char(x, 'fmt')` in PG SQL
# text — Spark's native to_char speaks Oracle-ish pictures and rejects
# PG's FM/9-slot forms). tests/test_operators.py pins these equivalent
# to the Column builders over a format sample, so the two renderings
# cannot drift.


def _sql_quote(text: str) -> str:
    return "'" + text.replace("\\", "\\\\").replace("'", "\\'") + "'"


def to_char_datetime_sql(x: str, fmt: str) -> str:
    """SQL-text rendering of to_char_datetime."""
    parts: list[str] = []
    buf = ""
    fm = False

    def flush():
        nonlocal buf
        if buf:
            parts.append(f"date_format({x}, {_sql_quote(buf)})")
            buf = ""

    i, n = 0, len(fmt)
    while i < n:
        if fmt[i] == '"':
            j = fmt.find('"', i + 1)
            j = n if j < 0 else j
            flush()
            parts.append(_sql_quote(fmt[i + 1 : j]))
            i = j + 1
            continue
        if fmt.startswith("FM", i):
            fm = True
            i += 2
            continue
        if fmt.startswith("TM", i):
            i += 2
            continue
        sp = next(
            (
                (t, s) for t, s in _DCH_SPECIAL_SQL
                if fmt.startswith(t, i)
            ),
            None,
        )
        if sp is not None:
            tok, snippet = sp
            flush()
            if tok in ("RM", "rm"):
                parts.append(_roman_sql(x, tok == "rm", fm))
            else:
                parts.append(snippet.format(x=x))
            i += len(tok)
            continue
        if fmt[i] == "D" and not fmt.startswith(
            ("DD", "DY", "Dy", "DAY", "Day"), i
        ):
            flush()
            parts.append(f"CAST(dayofweek({x}) AS STRING)")
            i += 1
            continue
        for tok, java, case in _DCH_TOKENS:
            if fmt.startswith(tok, i):
                if case is None:
                    buf += java
                else:
                    flush()
                    seg = f"date_format({x}, {_sql_quote(java)})"
                    parts.append(f"{case}({seg})")
                i += len(tok)
                break
        else:
            ch = fmt[i]
            if ch in _SAFE_PUNCT:
                buf += ch
            else:
                flush()
                parts.append(_sql_quote(ch))
            i += 1
    flush()
    if not parts:
        return "''"
    if len(parts) == 1:
        return parts[0]
    return "concat(" + ", ".join(parts) + ")"


def to_char_numeric_sql(x: str, fmt: str) -> str | None:
    """SQL-text rendering of to_char_numeric; None for pictures the
    subset does not model (the dialect leaves the call untouched)."""
    p = _num_pic(fmt)
    if p is None:
        return None
    body = f"format_number(CAST({x} AS DOUBLE), {p['decimals']})"
    if not p["grouping"]:
        body = f"replace({body}, ',', '')"
    if p["zero_pad"]:
        pad_w = p["int_width"] + (
            1 + p["decimals"] if p["decimals"] else 0
        )
        body = (
            f"(CASE WHEN ({x}) < 0 THEN concat('-', "
            f"lpad(replace({body}, '-', ''), {pad_w}, '0')) "
            f"ELSE lpad({body}, {pad_w}, '0') END)"
        )
    if p["fill"] and p["decimals"] > p["frac_keep"]:
        body = (
            f"regexp_replace({body}, "
            f"'(\\\\.\\\\d{{{p['frac_keep']},}}?)0+$', '$1')"
        )
    if p["currency"]:
        body = f"concat('$', {body})"
    if not p["fill"]:
        body = (
            f"(CASE WHEN ({x}) < 0 THEN {body} "
            f"ELSE concat(' ', {body}) END)"
        )
    if p["pre"]:
        body = f"concat({_sql_quote(p['pre'])}, {body})"
    if p["post"]:
        body = f"concat({body}, {_sql_quote(p['post'])})"
    return body


def dch_parse_pattern(fmt: str) -> str:
    """Translate a PG DCH pattern to a Java parse pattern for
    to_date/to_timestamp (formatting.c do_to_timestamp direction).
    Case transforms don't apply to parsing; FM is a no-op; quoted and
    unknown-letter spans become Java quoted literals."""
    out: list[str] = []
    i, n = 0, len(fmt)
    while i < n:
        if fmt[i] == '"':
            j = fmt.find('"', i + 1)
            j = n if j < 0 else j
            out.append("'" + fmt[i + 1 : j] + "'")
            i = j + 1
            continue
        if fmt.startswith("FM", i):
            i += 2
            continue
        for tok, java, _case in _DCH_TOKENS:
            if fmt.startswith(tok, i):
                out.append(java)
                i += len(tok)
                break
        else:
            ch = fmt[i]
            out.append(ch if ch in _SAFE_PUNCT else "'" + ch + "'")
            i += 1
    return "".join(out)


# ---------------------------------------------------------------- to_date
# plan-time literal fold (formatting.c do_to_timestamp / from_char_*):
# PG's loose scan — skip separators, read up to the field's width in
# digits — plus the composition rules Java patterns can't express
# (J julian day, CC century + YY, W week-of-month, Q quarter).
_FROM_TOKENS: list[tuple[str, str, int]] = [
    # (PG token, field name, max digits) — longest match first; the
    # I* ISO-calendar family composes via date.fromisocalendar
    ("YYYY", "year", 4), ("IYYY", "isoyear", 4),
    ("YYY", "year3", 3), ("IYY", "isoyear3", 3),
    ("MONTH", "monname", 0), ("MON", "monname", 0),
    ("DAY", "dayname", 0), ("DY", "dayname", 0),
    ("IDDD", "isodoy", 3), ("DDD", "doy", 3), ("DD", "day", 2),
    ("IW", "isoweek", 2), ("WW", "woy", 2), ("W", "wom", 1),
    ("MM", "month", 2), ("MI", "minute", 2), ("MS", "ms", 3),
    ("US", "us", 6), ("CC", "century", 2),
    ("HH24", "hour", 2), ("HH12", "hour12", 2), ("HH", "hour12", 2),
    ("SSSS", "secs_midnight", 5), ("SS", "second", 2),
    ("YY", "year2", 2), ("IY", "isoyear2", 2), ("Y", "year1", 1),
    ("J", "julian", 7), ("Q", "quarter", 1),
    ("RM", "monroman", 0), ("AM", "ampm", 0), ("PM", "ampm", 0),
    ("ID", "isodow", 1), ("D", "dow", 1), ("I", "isoyear1", 1),
]

_ROMAN_IN = (  # input-match order: longest first
    "XII", "XI", "IX", "X", "VIII", "VII", "VI", "IV", "V",
    "III", "II", "I",
)
_ROMAN_IN_VAL = {
    "I": 1, "II": 2, "III": 3, "IV": 4, "V": 5, "VI": 6, "VII": 7,
    "VIII": 8, "IX": 9, "X": 10, "XI": 11, "XII": 12,
}

_MON_NAMES = ("january", "february", "march", "april", "may", "june",
              "july", "august", "september", "october", "november",
              "december")


def _seq_bad(rest: str) -> str:
    """from_char_seq_search error text: the unmatched input,
    truncated at the first whitespace."""
    return re.split(r"\s", rest, maxsplit=1)[0]


def _tok_at(fmt: str, fi: int):
    """The DCH token starting at fmt[fi], or None."""
    up = fmt.upper()
    for tok, field, width in _FROM_TOKENS:
        if up.startswith(tok, fi):
            return tok, field, width
    return None


def _from_char_scan(value: str, fmt: str):
    """formatting.c from_char field scanner shared by the to_date /
    to_timestamp plan-time folds. Returns the parsed field dict, None
    when the picture/value is outside the supported subset (callers
    fall back to the Java-pattern path), or RAISES ValueError with
    PG's own message on definitively-invalid input — invalid value
    for a field, source string too short (fixed-width reads when the
    next picture node is also numeric, from_char_parse_int_len),
    conflicting duplicate fields, mixed Gregorian/ISO conventions
    (do_to_timestamp checks)."""
    f: dict[str, int] = {}
    fsrc: dict[str, str] = {}  # field -> the picture token that set it
    vi, fi = 0, 0
    v, n = value, len(value)

    def set_field(field: str, val: int, tok: str) -> None:
        if field in f and f[field] != val:
            raise ValueError(
                f'conflicting values for "{tok}" field in '
                "formatting string"
            )
        f[field] = val
        fsrc[field] = tok

    def read_int(maxd: int, tok: str, exact: bool) -> int | None:
        # from_char_parse_int / from_char_parse_int_len: skip leading
        # whitespace; fixed-width when the NEXT picture node is also
        # numeric (exact), else up to the field's width in digits.
        nonlocal vi
        while vi < n and v[vi].isspace():
            vi += 1
        if vi < n and v[vi] == "-":
            return None  # negative (BC) years stay on the loud path
        if exact:
            span = v[vi : vi + maxd]
            if len(span) < maxd:
                raise ValueError(
                    f'source string too short for "{tok}" '
                    "formatting field"
                )
            if not span.isdigit():
                raise ValueError(
                    f'invalid value "{span}" for "{tok}"'
                )
            vi += maxd
            return int(span)
        # non-exact (from_char_parse_int): strtol semantics — read
        # ALL consecutive digits, not just the field width
        j = vi
        while j < n and v[j].isdigit():
            j += 1
        if j == vi:
            if vi >= n:
                raise ValueError(
                    f'source string too short for "{tok}" '
                    "formatting field"
                )
            raise ValueError(
                f'invalid value "{v[vi : vi + maxd]}" for "{tok}"'
            )
        out = int(v[vi:j])
        if out > 2147483647:
            raise ValueError(
                f'value for "{tok}" in source string is out of range'
            )
        vi = j
        return out

    def _is_sep_char(c: str) -> bool:
        # formatting.c is_separator_char: ASCII printable, not
        # letter/digit (space is NOT a separator char there)
        return 0x20 < ord(c) < 0x7F and not c.isalnum()

    def post_field() -> None:
        # DCH_from_char: "Ignore all spaces after fields" — resets
        # and recounts extra_skip so separator nodes can match
        # nothing and literal nodes skip their consume
        nonlocal vi, extra_skip
        extra_skip = 0
        while vi < n and v[vi].isspace():
            vi += 1
            extra_skip += 1

    fm_next = False  # FM prefix toggles fill mode for the next node
    extra_skip = 0  # input chars eaten beyond the format's own nodes
    while fi < len(fmt):
        if vi >= n:
            # DCH_from_char loop runs while *s != '\0': an exhausted
            # source leaves the remaining format nodes unmatched and
            # is NOT an error (qp_misc_jiras.out:5118 — to_timestamp(
            # '2011-01-20','YYYY-MM-DD HH24:MI:SS') = midnight)
            break
        ch = fmt[fi]
        if ch == '"':
            j = fmt.find('"', fi + 1)
            span = fmt[fi + 1 : j if j > 0 else len(fmt)]
            vi += len(span)  # quoted literal: skip that many chars
            fi = (j + 1) if j > 0 else len(fmt)
            continue
        if fmt.upper().startswith("FM", fi):
            fm_next = True
            fi += 2
            continue
        if fmt.upper().startswith("FX", fi):
            fi += 2
            continue
        if fmt.upper().startswith("Y,YYY", fi):
            # grouped-digit year picture ('1,582' — formatting.c
            # DCH_Y_YYY): thousands digit, comma, three digits
            fi += 5
            hi = read_int(1, "Y,YYY", True)
            while vi < n and v[vi] in ", ":
                vi += 1  # the group separator in the value
            lo = read_int(3, "Y,YYY", False)
            if hi is None or lo is None:
                return None
            set_field("year", hi * 1000 + lo, "Y,YYY")
            if fmt.upper().startswith("TH", fi):
                fi += 2
                k = 0
                while vi < n and v[vi].isalpha() and k < 2:
                    vi += 1
                    k += 1
            post_field()
            continue
        if not ch.isalpha():
            # SPACE / SEPARATOR node (DCH_from_char, non-FX): one
            # format space-or-separator consumes ONE input
            # space-or-separator if present, else matches nothing;
            # runs of input whitespace around fields are eaten by the
            # post-field skip, so '2000 ++ JUN' under 'YYYY  MON'
            # succeeds while '2000 + + JUN' still fails at MON
            # (horology.out:3129-3147)
            fi += 1
            extra_skip -= 1
            if v[vi].isspace() or _is_sep_char(v[vi]):
                vi += 1
                extra_skip += 1
            continue
        up4 = fmt.upper()[fi : fi + 4]
        if up4.startswith(("TZH", "TZM")):
            # DCH_TZH / DCH_TZM are INPUT-capable (only tz/TZ/OF are
            # output-only). TZH's minus sign may have been swallowed
            # by a preceding separator node — if extra input chars
            # were skipped and the previous one was '-', the sign is
            # negative (horology.out:3150-3161, DCH_from_char TZH)
            tztok = up4[:3]
            fi += 3
            if tztok == "TZH":
                if v[vi] in "+- ":
                    set_field(
                        "tzsign", -1 if v[vi] == "-" else 1, tztok)
                    vi += 1
                else:
                    set_field(
                        "tzsign",
                        -1 if (extra_skip > 0 and vi > 0
                               and v[vi - 1] == "-") else 1,
                        tztok,
                    )
            elif "tzsign" not in f:
                set_field("tzsign", 1, tztok)
            nxt = _tok_at(fmt, fi)
            exact = not fm_next and nxt is not None and nxt[2] > 0
            got = read_int(2, tztok, exact)
            if got is None:
                return None
            set_field("tzh" if tztok == "TZH" else "tzm", got, tztok)
            fm_next = False
            post_field()
            continue
        if up4.startswith(("TZ", "OF")):
            # formatting.c: tz/TZ/OF are output-only for from_char
            raise ValueError(
                f'formatting field "{up4[:2]}" is only supported'
                " in to_char"
            )
        if up4 in ("A.D.", "B.C.") or up4[:2] in ("AD", "BC"):
            # era tokens: consume the matching era word; BC stays on
            # the loud path (pre-AD years are outside Spark's range)
            fi += 4 if up4 in ("A.D.", "B.C.") else 2
            while vi < n and v[vi].isspace():
                vi += 1
            w = v[vi : vi + 4].replace(".", "").lower()
            if w[:2] == "bc":
                return None
            if w[:2] == "ad":
                while vi < n and (v[vi].isalpha() or v[vi] == "."):
                    vi += 1
            post_field()
            continue
        hit = _tok_at(fmt, fi)
        if hit is None:
            # a bare letter in the picture is a literal node: it
            # consumes one input character UNLESS earlier skips
            # already ate extra input (NODE_TYPE_CHAR extra_skip
            # rescue in DCH_from_char)
            fi += 1
            if extra_skip > 0:
                extra_skip -= 1
            else:
                vi += 1
            continue
        tok, field, width = hit
        fi += len(tok)
        th_suffix = fmt.upper().startswith("TH", fi)
        if th_suffix:
            fi += 2  # ordinal suffix picture
        if field == "dayname":
            # day-of-week names are redundant with the date fields
            # (formatting.c ignores the value on input) but the NAME
            # must match (from_char_seq_search); DY consumes exactly
            # the 3-char abbreviation, DAY the matched full name
            while vi < n and v[vi].isspace():
                vi += 1
            days = ("sunday", "monday", "tuesday", "wednesday",
                    "thursday", "friday", "saturday")
            for nm in days:
                if v[vi : vi + 3].lower() == nm[:3]:
                    if len(tok) <= 2:  # DY / Dy / dy
                        vi += 3
                    else:
                        k = 3
                        while (vi + k < n and k < len(nm)
                               and v[vi + k].lower() == nm[k]):
                            k += 1
                        vi += k
                    break
            else:
                raise ValueError(
                    f'invalid value "{_seq_bad(v[vi:])}" for "{tok}"'
                )
        elif field == "monname":
            # MON consumes exactly the 3-char abbreviation; MONTH the
            # matched-prefix of the full name (from_char_seq_search)
            while vi < n and v[vi].isspace():
                vi += 1
            for k, nm in enumerate(_MON_NAMES, start=1):
                if v[vi : vi + 3].lower() == nm[:3]:
                    set_field("month", k, tok)
                    if len(tok) <= 3:  # MON / Mon / mon
                        vi += 3
                    else:
                        j2 = 3
                        while (vi + j2 < n and j2 < len(nm)
                               and v[vi + j2].lower() == nm[j2]):
                            j2 += 1
                        vi += j2
                    break
            else:
                raise ValueError(
                    f'invalid value "{_seq_bad(v[vi:])}" for "{tok}"'
                )
        elif field == "monroman":
            # DCH_RM / DCH_rm: month as a roman numeral
            while vi < n and not v[vi].isalpha():
                vi += 1
            for rn in _ROMAN_IN:
                if v[vi : vi + len(rn)].upper() == rn:
                    set_field("month", _ROMAN_IN_VAL[rn], tok)
                    vi += len(rn)
                    break
            else:
                return None
        elif field == "ampm":
            while vi < n and v[vi].isspace():
                vi += 1
            word = v[vi : vi + 4].replace(".", "").upper()
            if word[:2] in ("AM", "PM"):
                set_field("pm", 1 if word[0] == "P" else 0, tok)
                while vi < n and (v[vi].isalpha() or v[vi] == "."):
                    vi += 1
            else:
                raise ValueError(
                    f'invalid value "{_seq_bad(v[vi:])}" for "{tok}"'
                )
        else:
            nxt = _tok_at(fmt, fi)
            exact = (
                not fm_next
                and nxt is not None
                and nxt[2] > 0
            )
            got = read_int(width, tok, exact)
            if got is None:
                return None
            set_field(field, got, tok)
            if th_suffix:
                # '1,582nd': the ordinal suffix rides the VALUE too
                # (from_char skips it)
                k = 0
                while vi < n and v[vi].isalpha() and k < 2:
                    vi += 1
                    k += 1
        fm_next = False
        post_field()
    # do_to_timestamp: ISO-week and Gregorian date conventions must
    # not mix
    iso = {"isoyear", "isoyear3", "isoyear2", "isoyear1", "isoweek",
           "isodow", "isodoy"}
    greg = {"year", "year3", "year2", "year1", "century",
            "month", "day", "woy", "wom", "doy", "quarter"}
    if (f.keys() & iso) and (f.keys() & greg):
        raise ValueError("invalid combination of date conventions")
    # field range checks (DCH_from_char_args / do_to_timestamp): the
    # value string reports in PG's message verbatim
    rng = {
        "month": (1, 12), "day": (1, 31), "doy": (1, 366),
        "woy": (1, 53), "wom": (1, 5), "quarter": (1, 4),
        "hour": (0, 23), "minute": (0, 59), "second": (0, 59),
        "secs_midnight": (0, 86399), "isoweek": (1, 53),
        "isodow": (1, 7), "dow": (1, 7), "isodoy": (1, 371),
    }
    for field, (lo, hi) in rng.items():
        if field in f and not (lo <= f[field] <= hi):
            raise ValueError(
                f"date/time field value out of range: {value!r}"
            )
    return f


def _compose_date(f: dict):
    """Field-dict -> date (formatting.c do_to_timestamp composition
    rules)."""
    import datetime as _dt

    if "julian" in f:
        return _dt.date(1970, 1, 1) + _dt.timedelta(
            days=f["julian"] - 2440588
        )
    # ISO-calendar family (DCH_IYYY/IW/ID/IDDD): composes through
    # fromisocalendar; partial ISO years take the YY/YYY windows
    iy = f.get("isoyear")
    if iy is None and "isoyear3" in f:
        y3 = f["isoyear3"]
        iy = y3 if y3 >= 1000 else (
            y3 + 1000 if y3 >= 500 else y3 + 2000
        )
    if iy is None and "isoyear2" in f:
        y2 = f["isoyear2"]
        iy = 2000 + y2 if y2 < 70 else 1900 + y2
    if iy is None and "isoyear1" in f:
        iy = 2000 + f["isoyear1"]
    if iy is not None:
        try:
            if "isodoy" in f:
                return _dt.date.fromisocalendar(iy, 1, 1) \
                    + _dt.timedelta(days=f["isodoy"] - 1)
            return _dt.date.fromisocalendar(
                iy, f.get("isoweek", 1), f.get("isodow", 1)
            )
        except ValueError:
            return None
    year = f.get("year")
    if year is None and "year3" in f:
        # formatting.c DCH_YYY: 3-digit years complete to the nearest
        # of 1000..1999 / 2000..2499 (>=500 -> +1000, else +2000)
        y3 = f["year3"]
        year = y3 if y3 >= 1000 else (
            y3 + 1000 if y3 >= 500 else y3 + 2000
        )
    if "century" in f and year is None and "year3" not in f:
        # formatting.c do_to_timestamp: CC applies only when yysz <= 2
        # (a 4-digit YYYY / 3-digit YYY wins); YY=00 with CC is the
        # century year itself (CC=21, YY=00 -> 2100); CC alone means
        # the first year of the century.
        cc = f["century"]
        sub = f.get("year2", f.get("year1"))
        if sub is None:
            year = (cc - 1) * 100 + 1
        elif sub % 100 == 0:
            year = cc * 100
        else:
            year = (cc - 1) * 100 + sub % 100
    elif year is None and "year2" in f:
        y2 = f["year2"]
        year = 2000 + y2 if y2 < 70 else 1900 + y2
    elif year is None and "year1" in f:
        year = 2000 + f["year1"]
    if year is None or year <= 0:
        return None  # BC years: out of Python's range, stay loud
    if year > 9999:
        # PG spans to 5874897 AD; Spark's DATE stops at 9999 (README
        # deviation) — and beyond PG's own cap it raises too
        raise ValueError(f"year {year} is out of range")
    if "doy" in f:
        import calendar as _cal

        if f["doy"] > (366 if _cal.isleap(year) else 365):
            raise ValueError("date/time field value out of range")
        return _dt.date(year, 1, 1) + _dt.timedelta(days=f["doy"] - 1)
    month = f.get("month")
    if month is None and "quarter" in f:
        month = (f["quarter"] - 1) * 3 + 1
    if month is None and "woy" in f:
        d = _dt.date(year, 1, 1) + _dt.timedelta(
            days=(f["woy"] - 1) * 7
        )
        return d
    month = month or 1
    day = f.get("day")
    if day is None and "wom" in f:
        day = (f["wom"] - 1) * 7 + 1
    day = day or 1
    try:
        return _dt.date(year, month, day)
    except ValueError:
        # Feb 30 / Jun 31: the fields were individually in range but
        # do not compose (do_to_timestamp ValidateDate)
        raise ValueError("date/time field value out of range")


def to_date_fold(value: str, fmt: str):
    """Fold to_date('literal', 'picture') at plan time; returns a
    datetime.date or None when outside the supported subset."""
    f = _from_char_scan(value, fmt)
    if f is not None and f.get("year", 0) > 5874897:
        # beyond even PG's julian ceiling (datetime.c JULIAN checks)
        raise ValueError(f'date out of range: "{value}"')
    return None if f is None else _compose_date(f)


def to_timestamp_fold(value: str, fmt: str):
    """Fold to_timestamp('literal', 'picture') at plan time
    (formatting.c do_to_timestamp): the shared field scan plus the
    time-of-day composition (HH24 / HH12+AM-PM / SSSS seconds past
    midnight / MS / US)."""
    import datetime as _dt

    f = _from_char_scan(value, fmt)
    if f is None:
        return None
    if f.get("year", 0) > 5874897:
        raise ValueError(f'timestamp out of range: "{value}"')
    d = _compose_date(f)
    if d is None:
        return None
    base = _dt.datetime.combine(d, _dt.time())
    # TZH/TZM parsed: the result is the UTC instant local - offset
    # (do_to_timestamp applies tmfc.tzh/tzm/tzsign as a displacement)
    tzoff = _dt.timedelta(0)
    if "tzh" in f or "tzm" in f:
        tzoff = f.get("tzsign", 1) * _dt.timedelta(
            hours=f.get("tzh", 0), minutes=f.get("tzm", 0))
    if "secs_midnight" in f:
        return base + _dt.timedelta(seconds=f["secs_midnight"]) - tzoff
    h = f.get("hour")
    if h is None and "hour12" in f:
        # formatting.c do_to_timestamp: an out-of-range 12-hour value
        # (hour > 12, no meridiem needed) is taken as already-24h —
        # HH12='13' yields 13:00, not 01:00; in-range values ride the
        # 12-hour wheel (12 AM -> 0, 1 PM -> 13)
        # ... but the rescue applies ONLY when tmfc.pm is falsy
        # (do_to_timestamp: WARNING + pm=true + hour-12, net 24h);
        # with explicit PM, or hour < 1 in any case, it's an ERROR
        h12, pm = f["hour12"], f.get("pm", 0)
        if not (1 <= h12 <= 12):
            if h12 > 12 and not pm:
                pm, h12 = 1, h12 - 12
            else:
                raise ValueError(
                    f'hour "{h12}" is invalid for the 12-hour clock'
                )
        if pm and h12 < 12:
            h = h12 + 12
        elif not pm and h12 == 12:
            h = 0
        else:
            h = h12
    us = f.get("us", 0) + f.get("ms", 0) * 1000
    try:
        return base + _dt.timedelta(
            hours=h or 0, minutes=f.get("minute", 0),
            seconds=f.get("second", 0), microseconds=us,
        ) - tzoff
    except OverflowError:
        return None
