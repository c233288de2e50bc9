"""As-of (point-in-time) join.

The reference has no dedicated as-of operator — its time-series support
is function-level (reference: src/backend/utils/adt/interpolate.c:236,
window functions, timeseries.sql regress test) and as-of semantics are
expressed through MergeJoin/NestLoop theta quals (SURVEY §2.3). Here we
implement the idiomatic *distributed* as-of algorithm:

    union(left tagged, right tagged)
      → single hash shuffle on the key
      → per-key sort by (ts, side)
      → last_value(right attrs, ignorenulls) over unbounded-preceding
      → keep left rows

One shuffle, no range-explosion, no skewed nested loop — this is the
plan that survives 100 TB (a naive theta join is O(n·m) per key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    strict: bool = False,
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts (or < if strict), matching on `on` keys.

    right_values: right columns to carry (prefixed as given).
    tolerance_ms: if set, matches older than this are nulled out.
    Timestamps tie-break: right rows at the same ts as the left row
    match when strict=False (DuckDB ASOF semantics).
    """
    on = list(on)
    lcols = left.columns

    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_values],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
    ).select(  # align column order with l_tagged
        *[F.col(c) for c in lcols],
        "__ts",
        "__side",
        *[F.col(f"__r_{c}") for c in right_values],
    )

    unioned = l_tagged.unionByName(r_tagged)
    # strict: left rows must see only strictly-earlier right rows → left
    # sorts before same-ts right rows.
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__ts",
        "__side",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_values
        ],
        F.last(
            F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
        ).over(w).alias("__match_ts"),
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance_ms is not None:
        in_tol: Column = (
            F.unix_millis(F.col("__ts")) - F.unix_millis(F.col("__match_ts"))
        ) <= F.lit(tolerance_ms)
        out = out.select(
            *lcols,
            F.col("__match_ts"),
            *[
                F.when(in_tol, F.col(f"__f_{c}")).alias(f"asof_{c}")
                for c in right_values
            ],
            F.when(in_tol, F.col("__match_ts")).alias("asof_ts"),
        ).drop("__match_ts")
    else:
        out = out.select(
            *lcols,
            *[F.col(f"__f_{c}").alias(f"asof_{c}") for c in right_values],
            F.col("__match_ts").alias("asof_ts"),
        )
    return out
