"""PG interval_out rendering for interval-typed RESULT columns.

Reference: src/backend/utils/adt/datetime.c EncodeInterval (postgres
style): per-field signs ('-10 mons -3 days'), the time part printed as
[sign]HH:MM:SS[.ffffff] where sign is '-' for a negative time and '+'
for a positive time that follows a negative field (regress
sql/interval.sql: '-10 mons -3 days +03:55:06.70'), zero-valued fields
omitted, and the all-zero interval printed as '00:00:00'.

Why at the engine boundary: PySpark cannot convert CalendarIntervalType
or YearMonthIntervalType rows to Python at all (fromInternal is
NOT_IMPLEMENTED in pyspark 4.1), so a query whose final projection is
e.g. `interval '1 year 2 mons 3 days 04:05'` plans and runs but crashes
at collect(). Engine.sql() rewrites just those top-level result columns
through these pure-SQL renderings — PG clients receive interval text
over the wire too, so the text boundary matches the reference's own
output channel. DayTimeIntervalType is left native: PySpark converts it
to datetime.timedelta cleanly and downstream arithmetic keeps working.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, YearMonthIntervalType

try:  # CalendarIntervalType exists in pyspark >= 3.4
    from pyspark.sql.types import CalendarIntervalType
except ImportError:  # pragma: no cover
    CalendarIntervalType = ()  # type: ignore[assignment]


def _assemble(y: str, mo: str, d: str, tneg: str, hh: str, mm: str,
              ss: str, frac: str, has_time: str) -> str:
    """PG postgres-style assembly from SQL snippets for the six fields.

    y/mo/d: BIGINT exprs; tneg: BOOLEAN (time part negative); hh/mm/ss:
    non-negative BIGINT exprs; frac: STRING expr ('' or '.ffff', zeros
    already trimmed); has_time: BOOLEAN (time part nonzero)."""
    day_parts = (
        f"IF({y} <> 0, concat({y}, IF(abs({y}) = 1, ' year', ' years')), "
        "CAST(NULL AS STRING)), "
        f"IF({mo} <> 0, concat({mo}, IF(abs({mo}) = 1, ' mon', ' mons')), "
        "CAST(NULL AS STRING)), "
        f"IF({d} <> 0, concat({d}, IF(abs({d}) = 1, ' day', ' days')), "
        "CAST(NULL AS STRING))"
    )
    sign = (
        f"CASE WHEN {tneg} THEN '-' "
        f"WHEN {y} < 0 OR {mo} < 0 OR {d} < 0 THEN '+' ELSE '' END"
    )
    # hours may exceed 99 (PG does not spill them into days); lpad
    # TRUNCATES long strings, so pad only 1-digit values
    hh_s = f"IF({hh} >= 10, CAST({hh} AS STRING), concat('0', {hh}))"
    time_s = (
        f"concat({sign}, {hh_s}, ':', lpad(CAST({mm} AS STRING), 2, '0'), "
        f"':', lpad(CAST({ss} AS STRING), 2, '0'), {frac})"
    )
    show_time = (
        f"{has_time} OR ({y} = 0 AND {mo} = 0 AND {d} = 0)"
    )
    return (
        f"concat_ws(' ', {day_parts}, "
        f"IF({show_time}, {time_s}, CAST(NULL AS STRING)))"
    )


def calendar_interval_out_sql(col: str) -> str:
    """CalendarIntervalType -> PG text, by parsing Spark's own canonical
    string rendering ('1 years 2 months 3 days 4 hours 5 minutes
    6.699999 seconds', zero components omitted, '0 seconds' for zero —
    months already normalized into years+months exactly as PG's
    interval_out normalizes them)."""
    cs = f"CAST({col} AS STRING)"

    def unit(u: str) -> str:
        return (
            f"coalesce(CAST(nullif(regexp_extract({cs}, "
            f"'(-?\\\\d+) {u}s?( |$)', 1), '') AS BIGINT), 0)"
        )

    y, mo, d = unit("year"), unit("month"), unit("day")
    h, mi = unit("hour"), unit("minute")
    sstr = (
        f"coalesce(nullif(regexp_extract({cs}, "
        f"'(-?\\\\d+(?:\\\\.\\\\d+)?) seconds?( |$)', 1), ''), '0')"
    )
    sabs = f"ltrim('-', {sstr})"
    ss = f"CAST(split_part({sabs}, '.', 1) AS BIGINT)"
    frac = (
        f"IF(contains({sabs}, '.'), "
        f"concat('.', split_part({sabs}, '.', 2)), '')"
    )
    tneg = f"({h} < 0 OR {mi} < 0 OR startswith({sstr}, '-'))"
    has_time = f"({h} <> 0 OR {mi} <> 0 OR {sabs} <> '0')"
    body = _assemble(
        y, mo, d, tneg, f"abs({h})", f"abs({mi})", ss, frac, has_time
    )
    return f"IF({col} IS NULL, CAST(NULL AS STRING), {body})"


def ym_interval_out_sql(col: str, dtype: YearMonthIntervalType) -> str:
    """YearMonthIntervalType -> PG text. Total months via CAST to
    BIGINT, which Spark defines in the END-field unit (months when the
    interval carries a MONTH field, years otherwise); extract() is no
    use here — extract(MONTH) normalizes to 0-11 even on a MONTH-only
    interval, losing the total."""
    if dtype.endField == YearMonthIntervalType.MONTH:
        m = f"(CAST({col} AS BIGINT))"
    else:
        m = f"(CAST({col} AS BIGINT) * 12)"
    y, mo = f"({m} div 12)", f"({m} % 12)"
    body = _assemble(y, mo, "0", "false", "0", "0", "0", "''", "false")
    return f"IF({col} IS NULL, CAST(NULL AS STRING), {body})"


def present_intervals(df: DataFrame) -> DataFrame:
    """Rewrite Calendar/YM interval result columns to PG interval text;
    a no-op (same DataFrame object) when none are present."""
    exprs, changed = [], False
    for fld in df.schema.fields:
        quoted = "`" + fld.name.replace("`", "``") + "`"
        if isinstance(fld.dataType, YearMonthIntervalType):
            exprs.append(
                F.expr(ym_interval_out_sql(quoted, fld.dataType))
                .alias(fld.name)
            )
            changed = True
        elif CalendarIntervalType and isinstance(
            fld.dataType, CalendarIntervalType
        ):
            exprs.append(
                F.expr(calendar_interval_out_sql(quoted)).alias(fld.name)
            )
            changed = True
        elif isinstance(fld.dataType, ArrayType) and (
            isinstance(fld.dataType.elementType, YearMonthIntervalType)
            or (CalendarIntervalType and isinstance(
                fld.dataType.elementType, CalendarIntervalType))
        ):
            # interval ARRAYS can't collect either — render each
            # element (interval[] literals, array_agg over intervals)
            elem = fld.dataType.elementType
            inner = (
                ym_interval_out_sql("__iv", elem)
                if isinstance(elem, YearMonthIntervalType)
                else calendar_interval_out_sql("__iv")
            )
            exprs.append(
                F.expr(f"transform({quoted}, __iv -> {inner})")
                .alias(fld.name)
            )
            changed = True
        else:
            exprs.append(F.col(quoted))
    return df.select(*exprs) if changed else df
