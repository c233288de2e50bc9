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
frame (exactly the peers). Works for sum/count/avg(=sum/count);
min/max need the anti-frame union instead (not provided here).
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
    frame_cnt = F.count(val).over(base_w)
    group_sum = F.sum(val).over(peers_w)
    group_cnt = F.count(val).over(peers_w)
    mode = exclude.lower()
    # PG semantics: an empty post-exclusion frame aggregates to NULL,
    # not 0 — gate each form on the surviving row count.
    if mode == "current row":
        expr = F.when(frame_cnt > 1, frame_sum - val)
    elif mode == "group":
        expr = F.when(frame_cnt - group_cnt > 0, frame_sum - group_sum)
    elif mode == "ties":
        expr = frame_sum - group_sum + val  # current row always survives
    elif mode == "no others":
        expr = frame_sum
    else:
        raise ValueError(f"unknown EXCLUDE mode: {exclude}")
    return df.withColumn(out, expr)
