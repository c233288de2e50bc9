"""PG geometric types: point / box / circle.

Reference: src/backend/utils/adt/geo_ops.c (point_in/box_in/circle_in,
point_distance, box_contain_pt, circle_contain_pt, box_ov, area/
center/radius/diameter/width/height); regress sql/point.sql,
sql/box.sql, sql/circle.sql.

Spark-first model — a geometric value IS a struct, and every operator
is an inline Catalyst expression (no UDFs, no runtime dispatch):

  point  -> STRUCT<x: DOUBLE, y: DOUBLE>
  box    -> STRUCT<x1,y1,x2,y2>  normalized at construction so
            (x1,y1) is the upper-right and (x2,y2) the lower-left
            corner, exactly as box_in stores high/low
  circle -> STRUCT<x: DOUBLE, y: DOUBLE, r: DOUBLE>

Literals fold at plan time (the Python parsers below implement the
same input grammar geo_ops.c accepts); constructors and operators on
column data lower to named_struct / arithmetic that whole-stage
codegen inlines — distance on a 100 TB point column is a handful of
fused multiply-adds per row, never a Python boundary crossing.

The type of every geo expression is known at REWRITE time (a folded
literal or a constructor call carries its field list in the emitted
text), so operator dispatch (point<->point vs circle<->circle) is
static — mirroring how PG's parser binds the operator by operand type.
"""

from __future__ import annotations

import re

_NUM = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"


def _f(s: str) -> float:
    return float(s)


def parse_point(s: str) -> tuple[float, float] | None:
    """point_in: '(x,y)' or 'x,y'."""
    m = re.fullmatch(
        rf"\s*\(?\s*({_NUM})\s*,\s*({_NUM})\s*\)?\s*", s
    )
    return (_f(m.group(1)), _f(m.group(2))) if m else None


def parse_box(s: str) -> tuple[float, float, float, float] | None:
    """box_in: '((x1,y1),(x2,y2))' / '(x1,y1),(x2,y2)' / bare commas;
    returns (hx, hy, lx, ly) — corners normalized high/low."""
    # GP also accepts adjacent point groups without the comma
    # ('((2,1)(1,5))'): normalize before the strict match
    s = re.sub(r"\)\s*\(", "),(", s)
    nums = re.findall(_NUM, s)
    if len(nums) != 4 or not re.fullmatch(
        rf"\s*\(?\s*\(?\s*{_NUM}\s*,\s*{_NUM}\s*\)?\s*,\s*\(?\s*"
        rf"{_NUM}\s*,\s*{_NUM}\s*\)?\s*\)?\s*",
        s,
    ):
        return None
    x1, y1, x2, y2 = map(_f, nums)
    return (max(x1, x2), max(y1, y2), min(x1, x2), min(y1, y2))


def parse_circle(s: str) -> tuple[float, float, float] | None:
    """circle_in: '<(x,y),r>' / '((x,y),r)' / '(x,y),r' / 'x,y,r';
    negative radius is rejected, as PG does."""
    m = re.fullmatch(
        rf"\s*[<(]?\s*\(?\s*({_NUM})\s*,\s*({_NUM})\s*\)?\s*,\s*"
        rf"({_NUM})\s*[>)]?\s*",
        s,
    )
    if not m:
        return None
    x, y, r = _f(m.group(1)), _f(m.group(2)), _f(m.group(3))
    return None if r < 0 else (x, y, r)


def _lit(v: float) -> str:
    return repr(float(v))


def point_sql(x: str, y: str) -> str:
    return (
        f"named_struct('x', CAST({x} AS DOUBLE), "
        f"'y', CAST({y} AS DOUBLE))"
    )


def box_sql_lit(hx: float, hy: float, lx: float, ly: float) -> str:
    return (
        f"named_struct('x1', CAST({_lit(hx)} AS DOUBLE), "
        f"'y1', CAST({_lit(hy)} AS DOUBLE), "
        f"'x2', CAST({_lit(lx)} AS DOUBLE), "
        f"'y2', CAST({_lit(ly)} AS DOUBLE))"
    )


def box_sql_pts(a: str, b: str) -> str:
    """box(point, point) — normalizes corners at runtime
    (geo_ops.c boxes are stored high/low)."""
    return (
        f"named_struct("
        f"'x1', greatest(({a}).x, ({b}).x), "
        f"'y1', greatest(({a}).y, ({b}).y), "
        f"'x2', least(({a}).x, ({b}).x), "
        f"'y2', least(({a}).y, ({b}).y))"
    )


def circle_sql(x: str, y: str, r: str) -> str:
    return (
        f"named_struct('x', CAST({x} AS DOUBLE), "
        f"'y', CAST({y} AS DOUBLE), 'r', CAST({r} AS DOUBLE))"
    )


# ---- static type dispatch: the emitted text carries the field list
def geo_kind(expr: str) -> str | None:
    """Classify a rewritten geo expression by its named_struct field
    list: 'point' | 'box' | 'circle' | None."""
    if not re.match(r"(?is)^\s*named_struct\s*\(", expr.strip()):
        return None
    head = expr[:80]
    if "'x1'" in head:
        return "box"
    if "'r'" in head:
        return "circle"
    if "'x'" in head:
        return "point"
    return None


def dist_pp(a: str, b: str) -> str:
    return (
        f"sqrt(power(({a}).x - ({b}).x, 2) + "
        f"power(({a}).y - ({b}).y, 2))"
    )


def distance_sql(a: str, ka: str, b: str, kb: str) -> str | None:
    """<-> by operand kinds (geo_ops.c point_distance,
    dist_pc, circle_distance)."""
    if ka == "point" and kb == "point":
        return dist_pp(a, b)
    if {ka, kb} == {"point", "circle"}:
        p, c = (a, b) if ka == "point" else (b, a)
        return f"greatest(0.0D, {dist_pp(p, c)} - ({c}).r)"
    if ka == "circle" and kb == "circle":
        return (
            f"greatest(0.0D, {dist_pp(a, b)} - ({a}).r - ({b}).r)"
        )
    return None


# geo_ops.c compares through an EPSILON=1.0E-06 fuzz: FPle(a,b) is
# a - EPSILON <= b, FPge(a,b) is a + EPSILON >= b, FPeq(a,b) is
# fabs(a-b) <= EPSILON. The fuzzed operators below mirror exactly the
# sites where the reference uses the FP* macros; box_contain_pt and
# circle_contain_pt use plain comparisons in geo_ops.c and stay exact.
_EPS = "1.0E-6D"


def _fple(a: str, b: str) -> str:
    return f"{a} <= {b} + {_EPS}"


def _fpge(a: str, b: str) -> str:
    return f"{a} >= {b} - {_EPS}"


def _fpeq(a: str, b: str) -> str:
    return f"abs({a} - {b}) <= {_EPS}"


def contains_sql(outer: str, ko: str, inner: str, ki: str) -> str | None:
    """@> by operand kinds (box_contain_pt, circle_contain_pt,
    box_contain)."""
    if ko == "box" and ki == "point":
        # box_contain_point: exact comparisons in the reference
        return (
            f"(({inner}).x <= ({outer}).x1 AND "
            f"({inner}).x >= ({outer}).x2 AND "
            f"({inner}).y <= ({outer}).y1 AND "
            f"({inner}).y >= ({outer}).y2)"
        )
    if ko == "circle" and ki == "point":
        # circle_contain_pt: exact in the reference
        return f"({dist_pp(outer, inner)} <= ({outer}).r)"
    if ko == "box" and ki == "box":
        # box_contain: FPge/FPle on each corner
        return (
            f"({_fpge(f'({outer}).x1', f'({inner}).x1')} AND "
            f"{_fple(f'({outer}).x2', f'({inner}).x2')} AND "
            f"{_fpge(f'({outer}).y1', f'({inner}).y1')} AND "
            f"{_fple(f'({outer}).y2', f'({inner}).y2')})"
        )
    if ko == "circle" and ki == "circle":
        # circle_contain: FPle(d + r_inner, r_outer)
        return (
            f"({_fple(dist_pp(outer, inner) + f' + ({inner}).r', f'({outer}).r')})"
        )
    return None


def overlap_sql(a: str, ka: str, b: str, kb: str) -> str | None:
    """&& (box_ov / circle_overlap) — FP-fuzzed like the reference."""
    if ka == "box" and kb == "box":
        return (
            f"({_fple(f'({a}).x2', f'({b}).x1')} AND "
            f"{_fpge(f'({a}).x1', f'({b}).x2')} AND "
            f"{_fple(f'({a}).y2', f'({b}).y1')} AND "
            f"{_fpge(f'({a}).y1', f'({b}).y2')})"
        )
    if ka == "circle" and kb == "circle":
        return f"({_fple(dist_pp(a, b), f'({a}).r + ({b}).r')})"
    return None


def same_sql(a: str, ka: str, b: str, kb: str) -> str | None:
    """~= "same as" (point_eq / box_same / circle_same) — FPeq on
    every coordinate, per the reference's EPSILON fuzz."""
    if ka != kb:
        return None
    if ka == "point":
        return (f"({_fpeq(f'({a}).x', f'({b}).x')} AND "
                f"{_fpeq(f'({a}).y', f'({b}).y')})")
    if ka == "box":
        return (f"({_fpeq(f'({a}).x1', f'({b}).x1')} AND "
                f"{_fpeq(f'({a}).y1', f'({b}).y1')} AND "
                f"{_fpeq(f'({a}).x2', f'({b}).x2')} AND "
                f"{_fpeq(f'({a}).y2', f'({b}).y2')})")
    if ka == "circle":
        return (f"({_fpeq(f'({a}).x', f'({b}).x')} AND "
                f"{_fpeq(f'({a}).y', f'({b}).y')} AND "
                f"{_fpeq(f'({a}).r', f'({b}).r')})")
    return None


def accessor_sql(fn: str, expr: str, kind: str) -> str | None:
    """area/center/radius/diameter/width/height (geo_ops.c)."""
    f = fn.lower()
    if f == "area":
        if kind == "box":
            return (
                f"((({expr}).x1 - ({expr}).x2) * "
                f"(({expr}).y1 - ({expr}).y2))"
            )
        if kind == "circle":
            return f"(pi() * power(({expr}).r, 2))"
    if f == "center":
        if kind == "box":
            return point_sql(
                f"(({expr}).x1 + ({expr}).x2) / 2",
                f"(({expr}).y1 + ({expr}).y2) / 2",
            )
        if kind == "circle":
            return point_sql(f"({expr}).x", f"({expr}).y")
    if kind == "circle":
        if f == "radius":
            return f"(({expr}).r)"
        if f == "diameter":
            return f"(2 * ({expr}).r)"
    if kind == "box":
        if f == "width":
            return f"(({expr}).x1 - ({expr}).x2)"
        if f == "height":
            return f"(({expr}).y1 - ({expr}).y2)"
    return None
