"""Two-sided (big x big) interval-overlap range join.

The reference evaluates interval joins as MergeJoin range quals
(src/backend/executor/nodeMergejoin.c:1504 — the qual list carries the
band predicates) after motion has co-located both sides. Spark has no
native band join, and a raw theta join of two large inputs falls back
to BroadcastNestedLoopJoin / cartesian — the classic 100-TB killer.

Bucketed overlap join
---------------------
Pick a bucket width W on the interval domain. Replicate every row of
BOTH sides to each bucket its interval overlaps
(sequence(floor(start/W), floor(end/W)) + explode), hash-join on
(equi keys ..., bucket id), then post-filter the exact overlap
predicate. Each matching pair shares every bucket in the intersection
of its spans, so matches are anchored to ONE canonical bucket —
greatest(floor(l_start/W), floor(r_start/W)) — instead of deduplicated
with a DISTINCT (no extra shuffle).

Scale properties:
- replication factor per row = interval_length / W + 1 → choose W near
  the typical interval length so the factor stays ~2;
- the join itself is an equi hash join on bucket id (+ any equi keys):
  shuffle-partitionable, AQE-skew-splittable, never a nested loop;
- post-filter runs inside the join stage (no extra pass).

For a small bucket/dimension side prefer the broadcast path
(queries/timeseries.ts_range_join_buckets) — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int | float,
    on: list[str] | None = None,
    closed: bool = False,
) -> DataFrame:
    """Inner-join rows whose [start, end) intervals overlap.

    left_start/left_end/right_start/right_end name NUMERIC columns
    (cast timestamps to epoch millis first). `on` adds equi-join keys
    evaluated alongside the bucket id. `closed=True` treats intervals
    as [start, end] (touching endpoints match, PG OVERLAPS-style point
    intervals); default is half-open [start, end).

    Column-name collisions between the two inputs must be resolved by
    the caller (alias/rename) — the join output carries both schemas.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    on = on or []
    w = F.lit(bucket_width)

    def buckets(start: str, end: str) -> Column:
        return F.sequence(
            F.floor(F.col(start) / w), F.floor(F.col(end) / w)
        )

    lb = left.withColumn("__l_bucket", F.explode(buckets(left_start, left_end)))
    rb = right.withColumn(
        "__r_bucket", F.explode(buckets(right_start, right_end))
    )

    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    if closed:
        overlap = (ls <= re_) & (rs <= le)
    else:
        overlap = (ls < re_) & (rs < le)
    # anchor each matching pair to its first common bucket so it is
    # emitted exactly once (no DISTINCT / extra shuffle)
    anchor = F.col("__l_bucket") == F.greatest(
        F.floor(ls / w), F.floor(rs / w)
    )
    cond = F.col("__l_bucket") == F.col("__r_bucket")
    for k in on:
        cond = cond & (lb[k] == rb[k])
    joined = lb.join(rb, cond & overlap & anchor, "inner")
    return joined.drop("__l_bucket", "__r_bucket")
