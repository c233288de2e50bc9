"""PG range types as first-class SQL functions over a bounds struct.

Reference: src/backend/utils/adt/rangetypes.c (range_in/range_out,
range_contains, range_overlaps, range_adjacent, range_before/after,
range_union/intersect, range_eq, empty/infinite-bound semantics).

Model: STRUCT<lo: DOUBLE, hi: DOUBLE, li: BOOLEAN, hi_i: BOOLEAN,
empty: BOOLEAN>. A NULL lo/hi is an infinite bound (PG stores infinite
bounds as exclusive, so li/hi_i are forced false there). Discrete
ranges (int4range/int8range) canonicalize to the [lo, hi) form at the
DIALECT layer (sql_dialect numrange/int4range rewrites), so equality
and adjacency work on the canonical representation — exactly PG's
canonical function contract (rangetypes.c int4range_canonical).

Everything here is a pure-SQL temporary function: Catalyst inlines the
bodies, whole-stage codegen applies, zero Python per row — range
predicates over a 100 TB fact column cost the same as hand-written
boolean expressions. The one PG behavior with no expression-level
lowering is the ERROR on a reversed constructor (numrange(2,1)) and on
a union of non-overlapping, non-adjacent ranges — both yield the empty
range / NULL here instead (documented deviation; silent-NULL, never a
wrong value).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_R = "STRUCT<lo: DOUBLE, hi: DOUBLE, li: BOOLEAN, hi_i: BOOLEAN, empty: BOOLEAN>"

_EMPTY = (
    "named_struct('lo', CAST(NULL AS DOUBLE), 'hi', CAST(NULL AS DOUBLE), "
    "'li', false, 'hi_i', false, 'empty', true)"
)

# lower bound of a <= lower bound of b (for containment): a.lo infinite
# always qualifies; equal finite bounds need a at-least-as-inclusive
_LO_LE = (
    "(a.lo IS NULL OR (b.lo IS NOT NULL AND (b.lo > a.lo "
    "OR (b.lo = a.lo AND (a.li OR NOT b.li)))))"
)
_HI_GE = (
    "(a.hi IS NULL OR (b.hi IS NOT NULL AND (b.hi < a.hi "
    "OR (b.hi = a.hi AND (a.hi_i OR NOT b.hi_i)))))"
)

_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "pg_range": (
        "lo DOUBLE, hi DOUBLE, li BOOLEAN, hi_i BOOLEAN",
        _R,
        f"""CASE
        WHEN lo IS NOT NULL AND hi IS NOT NULL
             AND (lo > hi OR (lo = hi AND NOT (li AND hi_i)))
          THEN {_EMPTY}
        ELSE named_struct('lo', lo, 'hi', hi,
             'li', lo IS NOT NULL AND li,
             'hi_i', hi IS NOT NULL AND hi_i, 'empty', false) END""",
    ),
    "range_contains_elem": (
        f"a {_R}, x DOUBLE",
        "BOOLEAN",
        """NOT a.empty AND x IS NOT NULL
        AND (a.lo IS NULL OR x > a.lo OR (x = a.lo AND a.li))
        AND (a.hi IS NULL OR x < a.hi OR (x = a.hi AND a.hi_i))""",
    ),
    "range_contains": (
        f"a {_R}, b {_R}",
        "BOOLEAN",
        f"b.empty OR (NOT a.empty AND {_LO_LE} AND {_HI_GE})",
    ),
    "range_overlaps": (
        f"a {_R}, b {_R}",
        "BOOLEAN",
        """NOT a.empty AND NOT b.empty
        AND (a.hi IS NULL OR b.lo IS NULL OR b.lo < a.hi
             OR (b.lo = a.hi AND a.hi_i AND b.li))
        AND (b.hi IS NULL OR a.lo IS NULL OR a.lo < b.hi
             OR (a.lo = b.hi AND b.hi_i AND a.li))""",
    ),
    "range_adjacent": (
        f"a {_R}, b {_R}",
        "BOOLEAN",
        """NOT a.empty AND NOT b.empty AND (
          (a.hi IS NOT NULL AND b.lo IS NOT NULL AND a.hi = b.lo
           AND a.hi_i <> b.li)
          OR
          (b.hi IS NOT NULL AND a.lo IS NOT NULL AND b.hi = a.lo
           AND b.hi_i <> a.li))""",
    ),
    "range_before": (  # a << b: every element of a is below every of b
        f"a {_R}, b {_R}",
        "BOOLEAN",
        """NOT a.empty AND NOT b.empty
        AND a.hi IS NOT NULL AND b.lo IS NOT NULL
        AND (a.hi < b.lo OR (a.hi = b.lo AND NOT (a.hi_i AND b.li)))""",
    ),
    "range_after": (
        f"a {_R}, b {_R}",
        "BOOLEAN",
        "range_before(b, a)",
    ),
    "range_eq": (
        f"a {_R}, b {_R}",
        "BOOLEAN",
        """(a.empty AND b.empty) OR (NOT a.empty AND NOT b.empty
        AND a.lo <=> b.lo AND a.hi <=> b.hi
        AND a.li = b.li AND a.hi_i = b.hi_i)""",
    ),
    "range_union": (  # PG errors on disjoint non-adjacent; NULL here
        f"a {_R}, b {_R}",
        _R,
        f"""CASE
        WHEN a.empty THEN b
        WHEN b.empty THEN a
        WHEN NOT (range_overlaps(a, b) OR range_adjacent(a, b))
          THEN CAST(NULL AS {_R})
        ELSE named_struct(
          'lo', CASE WHEN a.lo IS NULL OR b.lo IS NULL THEN CAST(NULL AS DOUBLE)
                     ELSE least(a.lo, b.lo) END,
          'hi', CASE WHEN a.hi IS NULL OR b.hi IS NULL THEN CAST(NULL AS DOUBLE)
                     ELSE greatest(a.hi, b.hi) END,
          'li', CASE WHEN a.lo IS NULL OR b.lo IS NULL THEN false
                     WHEN a.lo < b.lo THEN a.li
                     WHEN b.lo < a.lo THEN b.li
                     ELSE a.li OR b.li END,
          'hi_i', CASE WHEN a.hi IS NULL OR b.hi IS NULL THEN false
                       WHEN a.hi > b.hi THEN a.hi_i
                       WHEN b.hi > a.hi THEN b.hi_i
                       ELSE a.hi_i OR b.hi_i END,
          'empty', false) END""",
    ),
    "range_intersect": (
        f"a {_R}, b {_R}",
        _R,
        f"""CASE
        WHEN a.empty OR b.empty OR NOT range_overlaps(a, b) THEN {_EMPTY}
        ELSE pg_range(
          CASE WHEN a.lo IS NULL THEN b.lo WHEN b.lo IS NULL THEN a.lo
               ELSE greatest(a.lo, b.lo) END,
          CASE WHEN a.hi IS NULL THEN b.hi WHEN b.hi IS NULL THEN a.hi
               ELSE least(a.hi, b.hi) END,
          CASE WHEN a.lo IS NULL AND b.lo IS NULL THEN false
               WHEN a.lo IS NULL THEN b.li WHEN b.lo IS NULL THEN a.li
               WHEN a.lo > b.lo THEN a.li WHEN b.lo > a.lo THEN b.li
               ELSE a.li AND b.li END,
          CASE WHEN a.hi IS NULL AND b.hi IS NULL THEN false
               WHEN a.hi IS NULL THEN b.hi_i WHEN b.hi IS NULL THEN a.hi_i
               WHEN a.hi < b.hi THEN a.hi_i WHEN b.hi < a.hi THEN b.hi_i
               ELSE a.hi_i AND b.hi_i END) END""",
    ),
    "isempty": (f"a {_R}", "BOOLEAN", "a.empty"),
    "lower_inc": (f"a {_R}", "BOOLEAN", "NOT a.empty AND a.li"),
    "upper_inc": (f"a {_R}", "BOOLEAN", "NOT a.empty AND a.hi_i"),
    "lower_inf": (f"a {_R}", "BOOLEAN", "NOT a.empty AND a.lo IS NULL"),
    "upper_inf": (f"a {_R}", "BOOLEAN", "NOT a.empty AND a.hi IS NULL"),
    # PG range_out text form, for SELECTing a range directly
    "range_text": (
        f"a {_R}",
        "STRING",
        """CASE WHEN a.empty THEN 'empty' ELSE concat(
          CASE WHEN a.li THEN '[' ELSE '(' END,
          coalesce(CAST(a.lo AS STRING), ''), ',',
          coalesce(CAST(a.hi AS STRING), ''),
          CASE WHEN a.hi_i THEN ']' ELSE ')' END) END""",
    ),
}


def register_range_functions(spark: SparkSession) -> None:
    for name, (sig, ret, body) in _FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
            f"RETURNS {ret} RETURN {body}"
        )
