"""Plan-time numeric LITERAL validation (split from
sql_dialect.py in the r16 size pass): int/float input ranges, literal
arithmetic overflow, trig/log/power domain errors, infinity->numeric.

Reference semantics: int.c / int8.c (intNin, intNmul & division
twins), float.c (float8in, dtoiN, dacosh/datanh, dlog1/dpow),
numeric.c (ln_var/log_var/power_var, float8_numeric). PG raises where
Spark's relaxed posture returns NULL/NaN/wraps; literals are checkable
at plan time, so the engine raises there — non-literal expressions
stay on the strict_errors (ANSI-mode) path.
"""

from __future__ import annotations

import re

from warehouse_pg_spark.dialect.mask import _LIT, _lit_value


def check_numeric_literals(out: str, lits: list[str]) -> str:
    # literal float -> int chains and float8 range (float.c float8in /
    # dtoi2 & friends): PG rounds half-even then RAISES out-of-range;
    # overflow/underflow on float8 input text raises too
    _INT_RANGES = {
        "int2": 32767, "smallint": 32767,
        "int4": 2147483647, "int": 2147483647, "integer": 2147483647,
        "int8": 9223372036854775807, "bigint": 9223372036854775807,
    }

    def _pg_float_text(t: str) -> float:
        t = t.strip().lower()
        if t in ("infinity", "inf", "+infinity", "+inf"):
            return float("inf")
        if t in ("-infinity", "-inf"):
            return float("-inf")
        if t == "nan":
            return float("nan")
        v = float(t)  # ValueError propagates (PG raises there too)
        # float.c float8in (PG 12+): raise only when strtod overflows
        # to ±inf or underflows to EXACTLY zero from nonzero text —
        # denormals ('1e-323') are accepted
        if v in (float("inf"), float("-inf")):
            raise ValueError(
                f'"{t}" is out of range for type double precision')
        if v == 0.0 and re.search(r"[1-9]", t.split("e")[0]):
            raise ValueError(
                f'"{t}" is out of range for type double precision')
        return v

    _PG_INT_NAMES = {
        "int2": "smallint", "smallint": "smallint",
        "int4": "integer", "int": "integer", "integer": "integer",
        "int8": "bigint", "bigint": "bigint",
    }

    def _fold_float_int_cast(m: re.Match) -> str:
        v = _pg_float_text(_lit_value(m.group(1), lits))
        src = (m.group(2) or "float8").lower()
        tgt = m.group(3).lower()
        import math as _math

        if src in ("float4", "real") and not (
            _math.isnan(v) or _math.isinf(v)
        ):
            # the value passes through float4 precision first
            # (float.c dtof then ftoi4): 2147483647 stored as float4
            # IS 2147483648.0
            import struct as _struct

            try:
                v = _struct.unpack("f", _struct.pack("f", v))[0]
            except OverflowError:
                v = float("inf")
        pgname = _PG_INT_NAMES[tgt]
        if _math.isnan(v) or _math.isinf(v):
            raise ValueError(f"{pgname} out of range")
        r = round(v)  # banker's rounding, as rint()
        lim = _INT_RANGES[tgt]
        if not (-lim - 1 <= r <= lim):  # two's-complement min is -max-1
            raise ValueError(f"{pgname} out of range")
        return f"CAST({r} AS {'BIGINT' if _INT_RANGES[tgt] > 2**31 else 'INT' if _INT_RANGES[tgt] > 2**15 else 'SMALLINT'})"

    out = re.sub(
        rf"({_LIT})\s*::\s*(float[48]?|real|double\s+precision)"
        r"\s*::\s*(int[248]?|smallint|integer|bigint)\b",
        _fold_float_int_cast,
        out,
        flags=re.IGNORECASE,
    )
    # the CAST(x AS t) spelling of the same chain
    out = re.sub(
        rf"CAST\s*\(\s*({_LIT})\s*::\s*"
        r"(float[48]?|real|double\s+precision)\s+AS\s+"
        r"(int[248]?|smallint|integer|bigint)\s*\)",
        _fold_float_int_cast,
        out,
        flags=re.IGNORECASE,
    )

    # int literal INPUT range (int8.c int8in / int.c int2in int4in):
    # '9223372036854775808'::int8 raises at plan time. Invalid
    # non-numeric text stays on the relaxed path (strict_errors).
    def _check_int_lit(m: re.Match) -> str:
        t = _lit_value(m.group(1), lits).strip()
        tgt = m.group(2).lower()
        if re.fullmatch(r"[+-]?\d+", t):
            lim = _INT_RANGES[tgt]
            if not (-lim - 1 <= int(t) <= lim):
                raise ValueError(
                    f'value "{t}" is out of range for type '
                    f"{_PG_INT_NAMES[tgt]}"
                )
        return m.group(0)

    out = re.sub(
        rf"({_LIT})\s*::\s*(int[248]?|smallint|integer|bigint)\b"
        r"(?!\s*\[)",
        _check_int_lit,
        out,
        flags=re.IGNORECASE,
    )

    # negation/abs of the int8 minimum (int8.c int8um / int8abs):
    # |-9223372036854775808| has no int8 representation
    def _check_int8_negabs(m: re.Match) -> str:
        t = _lit_value(m.group(2), lits).strip()
        if re.fullmatch(r"[+-]?\d+", t):
            v = int(t)
            v = abs(v) if m.group(1).lower() == "abs" else -v
            lim = _INT_RANGES["int8"]
            if not (-lim - 1 <= v <= lim):
                raise ValueError("bigint out of range")
        return m.group(0)

    def _negabs_gate(m: re.Match) -> str:
        if m.group(1) == "-":
            # unary context only: a binary minus (x - (...)) computes
            # a different value — don't judge it by the operand alone
            before = m.string[: m.start(1)].rstrip()
            if before and before[-1] not in "(," and not re.search(
                r"(?i)\b(?:select|where|when|then|and|or|by)$", before
            ):
                return m.group(0)
        return _check_int8_negabs(m)

    out = re.sub(
        rf"(abs|-)\s*\(\s*({_LIT})\s*::\s*(?:int8|bigint)\s*\)",
        _negabs_gate,
        out,
        flags=re.IGNORECASE,
    )

    # literal intN arithmetic (int.c int2mul/int4mul/int8mul &
    # division twins): PG checks the RESULT against the wider
    # operand's type — (-32768)::int2 * (-1)::int2 overflows int2
    def _check_int_arith(m: re.Match) -> str:
        a, ta, op, b, tb = (
            int(m.group(1)), m.group(2).lower(), m.group(3),
            int(m.group(4)), m.group(5).lower(),
        )
        if op == "/" and b == 0:
            return m.group(0)  # division by zero: strict_errors path
        # exact truncating division — float `int(a / b)` misrounds
        # above 2^53 (int8 max / 1 would falsely overflow)
        if op == "*":
            r = a * b
        else:
            r = (abs(a) // abs(b)) * (1 if (a >= 0) == (b >= 0) else -1)
        lim = max(_INT_RANGES[ta], _INT_RANGES[tb])
        wide = "int2" if lim <= 32767 else (
            "int4" if lim <= 2147483647 else "int8")
        if not (-lim - 1 <= r <= lim):
            raise ValueError(f"{_PG_INT_NAMES[wide]} out of range")
        return m.group(0)

    out = re.sub(
        r"\(\s*(-?\d+)\s*\)\s*::\s*(int[248])\s*([*/])\s*"
        r"\(\s*(-?\d+)\s*\)\s*::\s*(int[248])",
        _check_int_arith,
        out,
        flags=re.IGNORECASE,
    )

    # the quoted-literal spelling of the same checks, extended to the
    # full operator set: 'N'::int8 + 'M'::int4 overflows like int8pl
    # (int8.c int8pl/int8mi/int8mul; div/mod by a zero literal raises
    # at plan time — PG raises unconditionally, not only under ANSI)
    _conditional = bool(re.search(
        r"(?i)\bcase\b|\bnullif\b|\bcoalesce\b|\bwhen\b", out))

    def _check_int_arith_quoted(m: re.Match) -> str:
        ta, tb = m.group(2).lower(), m.group(5).lower()
        try:
            a = int(_lit_value(m.group(1), lits).strip())
            b = int(_lit_value(m.group(4), lits).strip())
        except ValueError:
            return m.group(0)
        op = m.group(3)
        if op in "/%" and b == 0:
            if _conditional:
                return m.group(0)
            raise ValueError("division by zero")
        if op == "+":
            r = a + b
        elif op == "-":
            r = a - b
        elif op == "*":
            r = a * b
        elif op == "%":
            r = a - (abs(a) // abs(b)) * abs(b) * (1 if a >= 0 else -1)
        else:
            r = (abs(a) // abs(b)) * (1 if (a >= 0) == (b >= 0) else -1)
        lim = max(_INT_RANGES[ta], _INT_RANGES[tb])
        wide = "int2" if lim <= 32767 else (
            "int4" if lim <= 2147483647 else "int8")
        if not (-lim - 1 <= r <= lim):
            raise ValueError(f"{_PG_INT_NAMES[wide]} out of range")
        return m.group(0)

    out = re.sub(
        rf"({_LIT})\s*::\s*(int[248]|smallint|integer|bigint)\s*"
        rf"([-+*/%])\s*({_LIT})\s*::\s*"
        r"(int[248]|smallint|integer|bigint)",
        _check_int_arith_quoted,
        out,
        flags=re.IGNORECASE,
    )

    # literal division by a literal zero (int.c int4div & friends,
    # float.c float8div, numeric.c div_var): PG raises; conditional
    # contexts (CASE/NULLIF/COALESCE) may never evaluate, so skip them
    if not _conditional:
        _zero = (r"(?:0+(?:\.0+)?|" + _LIT + r")"
                 r"(?:\s*::\s*(?:int[248]?|smallint|integer|bigint"
                 r"|numeric|decimal|float[48]?|real"
                 r"|double\s+precision))?")
        _numlit = (r"(?:-?\d+(?:\.\d+)?|" + _LIT + r")"
                   r"(?:\s*::\s*(?:int[248]?|smallint|integer"
                   r"|bigint|numeric|decimal|float[48]?|real"
                   r"|double\s+precision))?")

        def _check_div_zero(m: re.Match) -> str:
            lhs, rhs = m.group(1), m.group(2)
            def _val(tok):
                mm = re.match(rf"({_LIT})", tok)
                t = _lit_value(mm.group(1), lits) if mm else \
                    re.match(r"-?\d+(?:\.\d+)?", tok).group(0)
                try:
                    return float(t)
                except ValueError:
                    return None
            lv, rv = _val(lhs), _val(rhs)
            if lv is not None and rv == 0.0:
                raise ValueError("division by zero")
            return m.group(0)

        out = re.sub(
            rf"(?<![\w.])({_numlit})\s*[/%]\s*({_zero})(?![\w.])",
            _check_div_zero,
            out,
            flags=re.IGNORECASE,
        )

    def _check_float8_lit(m: re.Match) -> str:
        txt = _lit_value(m.group(1), lits)
        v = _pg_float_text(txt)
        # float.c float4in: a finite double that overflows FLT_MAX or
        # underflows to float4-zero from nonzero text raises "out of
        # range for type real" (float8 is fine with it)
        if m.group(2).lower() in ("float4", "real"):
            import math as _math
            import struct as _struct

            if not (_math.isnan(v) or _math.isinf(v)):
                try:
                    v4 = _struct.unpack("f", _struct.pack("f", v))[0]
                except OverflowError:
                    v4 = float("inf")
                if _math.isinf(v4) or (v4 == 0.0 and v != 0.0):
                    raise ValueError(
                        f'"{txt}" is out of range for type real')
        return m.group(0)

    out = re.sub(
        rf"({_LIT})\s*::\s*(float[48]?|real|double\s+precision)\b"
        r"(?!\s*\[)",  # float8[] array casts are array_in, not float8in
        _check_float8_lit,
        out,
        flags=re.IGNORECASE,
    )

    # inverse trig/hyperbolic DOMAIN errors on literal args (float.c
    # dacosh/datanh raise; Spark returns NaN)
    def _check_trig_domain(m: re.Match) -> str:
        fn = m.group(1).lower()
        try:
            v = _pg_float_text(_lit_value(m.group(2), lits))
        except ValueError:
            return m.group(0)
        import math as _math

        if _math.isnan(v):  # float.c: NaN propagates, never raises
            return m.group(0)
        bad = (
            (fn == "acosh" and v < 1.0)
            or (fn == "atanh" and not (-1.0 <= v <= 1.0))
            or (fn in ("asin", "acos") and not (-1.0 <= v <= 1.0))
        )
        if bad:
            raise ValueError("input is out of range")
        return m.group(0)

    out = re.sub(
        rf"(?i)\b(acosh|atanh|asin|acos)\s*\(\s*"
        rf"(?:float[48]\s*)?({_LIT})(?:\s*::\s*\w+)?\s*\)",
        _check_trig_domain,
        out,
    )

    # ln/log/power literal DOMAIN errors (numeric.c ln_var/log_var/
    # power_var; float.c dlog1/dpow raise the same messages): Spark
    # returns NULL/NaN/Infinity where PG raises
    def _log_domain(v: float) -> None:
        if v < 0:
            raise ValueError(
                "cannot take logarithm of a negative number")
        if v == 0:
            raise ValueError("cannot take logarithm of zero")

    def _check_ln_log(m: re.Match) -> str:
        _log_domain(float(m.group(2)))
        if m.group(3) is not None:
            b = float(m.group(2))
            _log_domain(float(m.group(3)))
            if b == 1.0:  # log_var: ln(base)=0 divisor
                raise ValueError("division by zero")
        return m.group(0)

    out = re.sub(
        r"(?i)\b(?:(ln|log|log10)\s*\(\s*(-?\d+(?:\.\d+)?)\s*"
        r"(?:,\s*(-?\d+(?:\.\d+)?)\s*)?)\)",
        _check_ln_log,
        out,
    )

    def _check_power(m: re.Match) -> str:
        import math as _math

        x, y = float(m.group(1)), float(m.group(2))
        if _math.isnan(x) or _math.isnan(y):
            return m.group(0)
        if x == 0 and y < 0:
            raise ValueError(
                "zero raised to a negative power is undefined")
        if x < 0 and y != int(y):
            raise ValueError(
                "a negative number raised to a non-integer power "
                "yields a complex result")
        # power_var overflow: numeric tops out near 1e131071
        if x != 0 and abs(x) != 1 and y * _math.log10(abs(x)) > 131071:
            raise ValueError("value overflows numeric format")
        return m.group(0)

    _num_opnd = r"\(?\s*(-?\d+(?:\.\d+)?)\s*\)?"
    out = re.sub(
        rf"(?i)\bpow(?:er)?\s*\(\s*{_num_opnd}\s*,\s*{_num_opnd}\s*\)",
        _check_power,
        out,
    )
    out = re.sub(
        rf"(?<![\w.]){_num_opnd}\s*\^\s*{_num_opnd}(?![\w.])",
        _check_power,
        out,
    )

    # float8/float4 ±Infinity -> numeric (numeric.c float8_numeric)
    def _check_inf_numeric(m: re.Match) -> str:
        v = _pg_float_text(_lit_value(m.group(1), lits))
        import math as _math

        if _math.isinf(v):
            raise ValueError("cannot convert infinity to numeric")
        return m.group(0)

    out = re.sub(
        rf"({_LIT})\s*::\s*(?:float[48]|real|double\s+precision)"
        r"\s*::\s*(?:numeric|decimal)\b",
        _check_inf_numeric,
        out,
        flags=re.IGNORECASE,
    )

    return out


def check_misc_literals(out: str, lits: list[str]) -> str:
    """Assorted plan-time literal validations from the should_error
    census (r16): width_bucket NULL thresholds, dangling set-op tail,
    unknown-literal UNION branches against a numeric first branch."""
    # width_bucket(x, ARRAY[...NULL...]): arrayfuncs width_bucket_array
    # raises before scanning (utils/adt/arrayfuncs.c)
    if re.search(
        r"(?i)\bwidth_bucket\s*\(\s*[^(),]+,\s*array\s*\[[^\]]*"
        r"\bnull\b[^\]]*\]\s*\)", out
    ):
        raise ValueError("thresholds array may not contain NULLs")

    # statement ending at a set operation keyword: gram.y raises
    # "syntax error at end of input"
    if re.search(r"(?is)\b(?:union|intersect|except)(?:\s+all)?\s*;?\s*$",
                 out) and re.match(r"(?is)^\s*\(?\s*select\b", out):
        raise ValueError("syntax error at end of input")

    # numeric-branch UNION with an unknown literal second branch:
    # select_common_type coerces the unknown through numeric_in, which
    # raises on non-numeric text (parse_coerce.c + numeric.c)
    m = re.search(
        rf"(?is)::\s*(?:numeric|decimal)\b.*?\bunion\b(?:\s+all)?\s+"
        rf"select\s+({_LIT})\s*;?\s*$", out)
    if m:
        t = _lit_value(m.group(1), lits).strip()
        if not re.fullmatch(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?",
                            t):
            raise ValueError(
                f'invalid input syntax for type numeric: "{t}"')

    return out
