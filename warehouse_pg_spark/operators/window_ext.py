"""Window-frame extensions Spark lacks: GROUPS frames and EXCLUDE
clauses (reference: executor/nodeWindowAgg.c:1454-1480 frame-option
handling; SURVEY §2.5 flags both as 'no Spark equivalent → rewrite
layer').

GROUPS frames
-------------
PG `GROUPS BETWEEN p PRECEDING AND f FOLLOWING` frames count *peer
groups* (rows tying on the ORDER BY key), not rows. Rewrite: key each
peer group by dense_rank() over the partition order, then use a RANGE
frame over that integer rank — rangeBetween(-p, f) over dense_rank is
exactly a GROUPS frame.

EXCLUDE clauses
---------------
PG `EXCLUDE CURRENT ROW / GROUP / TIES` subtract rows from the frame.
Rewrite by self-subtraction on distributive aggregates:
  EXCLUDE CURRENT ROW: frame_agg - current_row_value
  EXCLUDE GROUP:       frame_agg - peer_group_agg
  EXCLUDE TIES:        frame_agg - peer_group_agg + current_row_value
where peer_group_agg is the same aggregate over a rangeBetween(0, 0)
frame (exactly the peers). Works for sum/count/avg(=sum/count).

min/max (non-subtractable aggregates) use the *anti-frame union*
instead (minmax_exclude): the post-exclusion frame is split into the
two contiguous sub-frames on either side of the excluded rows and the
results combined with least/greatest — exactly how the reference
evaluates non-invertible aggregates over EXCLUDE frames
(nodeWindowAgg.c:1454-1480 re-aggregates the frame minus exclusion).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window, WindowSpec


def groups_frame_agg(
    df: DataFrame,
    agg: Callable[[Column | str], Column],
    value: Column | str,
    partition_by: list[str],
    order_by: list[str],
    start: int,
    end: int,
    out: str = "groups_agg",
) -> DataFrame:
    """agg(value) OVER (PARTITION BY ... ORDER BY ...
    GROUPS BETWEEN |start| PRECEDING AND end FOLLOWING).

    start/end use rowsBetween sign conventions (negative = preceding).
    """
    rank_w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn("__grp_rank", F.dense_rank().over(rank_w))
    frame_w = (
        Window.partitionBy(*partition_by)
        .orderBy("__grp_rank")
        .rangeBetween(start, end)
    )
    return ranked.withColumn(out, agg(value).over(frame_w)).drop("__grp_rank")


def sum_exclude(
    df: DataFrame,
    value: Column | str,
    partition_by: list[str],
    order_by: list[str],
    start,
    end,
    exclude: str = "current row",
    out: str = "sum_excl",
    frame_type: str = "rows",
) -> DataFrame:
    """SUM(value) OVER (... RANGE/ROWS BETWEEN start AND end
    EXCLUDE CURRENT ROW | GROUP | TIES) via self-subtraction.

    Uses a ROWS frame (start/end ints) for the base aggregate and a
    peers RANGE(0,0) frame for the group term."""
    val = F.col(value) if isinstance(value, str) else value
    base = Window.partitionBy(*partition_by).orderBy(*order_by)
    if frame_type == "rows":
        base_w = base.rowsBetween(start, end)
    else:
        # RANGE base frame: deterministic under ORDER BY ties (frame is
        # a value interval), which ROWS frames are not.
        base_w = base.rangeBetween(start, end)
    peers_w = (
        Window.partitionBy(*partition_by)
        .orderBy([F.col(c) if isinstance(c, str) else c for c in order_by])
        .rangeBetween(0, 0)
    )
    frame_sum = F.sum(val).over(base_w)
    frame_cnt = F.count(val).over(base_w)  # non-null values in frame
    group_sum = F.sum(val).over(peers_w)
    group_cnt = F.count(val).over(peers_w)
    mode = exclude.lower()
    # PG semantics (nodeWindowAgg.c): SUM over the post-exclusion frame
    # is NULL iff no *non-null* value survives. A NULL value excluded
    # from the frame must not poison the subtraction (SUM ignores NULLs)
    # — so subtract coalesce(x, 0) and count survivors with the non-null
    # counts, not row counts.
    val_nn = F.when(val.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    zero = F.lit(0)
    if mode == "current row":
        surviving = frame_cnt - val_nn
        expr = F.when(surviving > 0, frame_sum - F.coalesce(val, zero))
    elif mode == "group":
        surviving = frame_cnt - group_cnt
        expr = F.when(surviving > 0, frame_sum - F.coalesce(group_sum, zero))
    elif mode == "ties":
        surviving = frame_cnt - group_cnt + val_nn
        expr = F.when(
            surviving > 0,
            frame_sum - F.coalesce(group_sum, zero) + F.coalesce(val, zero),
        )
    elif mode == "no others":
        expr = frame_sum
    else:
        raise ValueError(f"unknown EXCLUDE mode: {exclude}")
    return df.withColumn(out, expr)


def minmax_exclude(
    df: DataFrame,
    value: Column | str,
    partition_by: list[str],
    order_by: list[str],
    start: int,
    end: int,
    agg: str = "min",
    exclude: str = "group",
    out: str = "minmax_excl",
    frame_type: str = "rows",
) -> DataFrame:
    """MIN/MAX(value) OVER (... ROWS/RANGE BETWEEN start AND end
    EXCLUDE CURRENT ROW | GROUP | TIES) via anti-frame union.

    min/max are not subtractable, so the excluded rows can't be backed
    out of the full-frame aggregate. Instead evaluate the aggregate over
    the two contiguous sub-frames flanking the exclusion and combine:

      ROWS  + EXCLUDE CURRENT ROW: rows [start,-1] ∪ rows [1,end]
      RANGE + EXCLUDE GROUP:       range [start,-1] ∪ range [1,end]
        (the peer group occupies exactly the range offset 0, so integer
         ±1 bounds skip it — requires a discrete ORDER BY key, which is
         also PG's RANGE-with-offset constraint for non-numeric keys)
      RANGE + EXCLUDE TIES:        EXCLUDE GROUP result ∪ current value

    least()/greatest() skip NULLs (all-NULL → NULL), matching PG's
    "empty post-exclusion frame aggregates to NULL".
    """
    if agg not in ("min", "max"):
        raise ValueError(f"agg must be min|max, got {agg}")
    mode = exclude.lower()
    val = F.col(value) if isinstance(value, str) else value
    agg_fn = F.min if agg == "min" else F.max
    comb = F.least if agg == "min" else F.greatest

    base = Window.partitionBy(*partition_by).orderBy(*order_by)
    if frame_type == "rows":
        if mode != "current row":
            # ROWS frames can't address the peer group as a contiguous
            # row interval around the current row.
            raise NotImplementedError(
                "ROWS frame supports EXCLUDE CURRENT ROW only; "
                "use frame_type='range' for GROUP/TIES"
            )
        lo_w, hi_w = base.rowsBetween(start, -1), base.rowsBetween(1, end)
        expr = comb(agg_fn(val).over(lo_w), agg_fn(val).over(hi_w))
    elif mode in ("group", "ties"):
        lo_w, hi_w = base.rangeBetween(start, -1), base.rangeBetween(1, end)
        expr = comb(agg_fn(val).over(lo_w), agg_fn(val).over(hi_w))
        if mode == "ties":  # current row itself stays in the frame
            expr = comb(expr, val)
    elif mode == "no others":
        expr = agg_fn(val).over(base.rangeBetween(start, end))
    elif mode == "current row":
        # RANGE + EXCLUDE CURRENT ROW: the post-exclusion frame is
        #   range [start,-1]  ∪  range [1,end]  ∪  (peer group \ self).
        # "peers minus self" can't be a RANGE frame (every peer shares
        # the offset-0 interval), but inside a partition keyed by
        # (partition_by, order key) every row IS a peer, so two ROWS
        # frames flanking the current row enumerate exactly the peers
        # minus self — in any intra-group order, since the union of the
        # two flanks is order-invariant (nodeWindowAgg.c:1454-1480
        # re-aggregates the same set row-by-row).
        peer_part = Window.partitionBy(*partition_by, *order_by).orderBy(
            *order_by
        )
        peers_lo = agg_fn(val).over(
            peer_part.rowsBetween(Window.unboundedPreceding, -1)
        )
        peers_hi = agg_fn(val).over(
            peer_part.rowsBetween(1, Window.unboundedFollowing)
        )
        lo_w, hi_w = base.rangeBetween(start, -1), base.rangeBetween(1, end)
        expr = comb(
            agg_fn(val).over(lo_w),
            agg_fn(val).over(hi_w),
            comb(peers_lo, peers_hi),
        )
    else:
        raise ValueError(f"unknown EXCLUDE mode: {exclude}")
    return df.withColumn(out, expr)
