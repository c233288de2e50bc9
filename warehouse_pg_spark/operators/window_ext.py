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

# ROWS offsets beyond this magnitude are treated as unbounded
# (Window.unboundedPreceding/Following are ±2^63-ish sentinels).
_UNBOUNDED = 1 << 40


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
    mode = exclude.lower()
    base = Window.partitionBy(*partition_by).orderBy(*order_by)
    if frame_type == "rows":
        if mode in ("group", "ties"):
            # Subtraction over-subtracts when the peer group extends
            # beyond a bounded ROWS frame (peers outside the frame were
            # never in it) — the collect-filter evaluator is exact.
            return rows_exclude_agg(
                df, val, partition_by, order_by, start, end,
                agg="sum", exclude=mode, out=out,
            )
        base_w = base.rowsBetween(start, end)
    else:
        # RANGE base frame: deterministic under ORDER BY ties (frame is
        # a value interval), which ROWS frames are not. The peer group
        # (and the current row) sit at value-offset 0 — when the frame
        # bounds exclude offset 0 entirely, EXCLUDE is a no-op and
        # subtracting the group term would over-subtract rows that were
        # never in the frame.
        if not (start <= 0 <= end) and mode != "no others":
            base_w = base.rangeBetween(start, end)
            return df.withColumn(
                out,
                F.when(F.count(val).over(base_w) > 0, F.sum(val).over(base_w)),
            )
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
    assume_discrete: bool = False,
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
    if frame_type != "rows" and not (start <= 0 <= end) and mode != "no others":
        # value-offset 0 (the peer group + current row) lies outside
        # the RANGE frame: nothing to exclude (see sum_exclude)
        w = base.rangeBetween(start, end)
        return df.withColumn(out, agg_fn(val).over(w))
    if frame_type == "rows":
        if mode in ("group", "ties"):
            # The peer group is not a constant row interval around the
            # current row — delegate to the collect-filter evaluator
            # (rows_exclude_agg), which re-aggregates the frame minus
            # the exclusion exactly.
            return rows_exclude_agg(
                df, val, partition_by, order_by, start, end,
                agg=agg, exclude=mode, out=out,
            )
        lo_w, hi_w = base.rowsBetween(start, -1), base.rowsBetween(1, end)
        expr = comb(agg_fn(val).over(lo_w), agg_fn(val).over(hi_w))
    elif mode in ("group", "ties"):
        # The ±1 bounds that skip the peer group assume a discrete
        # (integer-stepped) ORDER BY key; on a continuous key they
        # would silently drop non-peer rows within 1.0 of the current
        # value. Refuse rather than mis-answer (PG's RANGE-offset
        # in_range machinery has the analogous type constraint); pass
        # assume_discrete=True for float columns known to hold
        # integer-stepped values.
        if not assume_discrete:
            _require_discrete_order_key(
                df, order_by, "RANGE + EXCLUDE " + mode
            )
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


def rows_exclude_agg(
    df: DataFrame,
    value: Column | str,
    partition_by: list[str],
    order_by: list[str],
    start: int,
    end: int,
    agg: str = "sum",
    exclude: str = "group",
    out: str = "rows_excl",
) -> DataFrame:
    """agg(value) OVER (... ROWS BETWEEN start AND end
    EXCLUDE CURRENT ROW | GROUP | TIES) — the last two cells of the
    frame x exclusion matrix (nodeWindowAgg.c:1454-1480), for
    agg in {sum, count, avg, min, max}.

    Bounded frames: materialize row_number over the partition order
    (fixing the tie-break once), collect (rn, order-key, value) structs
    over the ROWS frame — bounded frame ⇒ constant per-row state —
    drop the excluded rows with a JVM-side higher-order filter, and
    re-aggregate the survivors with array-native functions. This is
    exactly the reference's re-aggregate-the-frame-minus-exclusion,
    vectorized and with no Python in the loop. With tied ORDER BY keys
    a bounded ROWS frame is tie-order-dependent in PG as well; results
    here are exact for the materialized tie-break.

    Unbounded-both frames (the deterministic-under-ties form): the
    frame is the whole partition, so EXCLUDE GROUP/TIES reduce to
    partition-aggregate minus peer-group-aggregate (sum/count/avg) or
    a prefix/suffix flank combine (min/max) — no collection, one
    shuffle, any orderable key type.

    Half-unbounded frames (UNBOUNDED PRECEDING..end, start..UNBOUNDED
    FOLLOWING): prefix-aggregate subtraction / flank combine with the
    peer group's in-frame slice resolved from broadcast group bounds —
    see _exclude_half_unbounded; nothing unbounded is collected.
    """
    if agg not in ("sum", "count", "avg", "min", "max"):
        raise ValueError(f"unsupported agg for rows_exclude_agg: {agg}")
    mode = exclude.lower()
    if mode not in ("current row", "group", "ties", "no others"):
        raise ValueError(f"unknown EXCLUDE mode: {exclude}")
    val = F.col(value) if isinstance(value, str) else value
    base = Window.partitionBy(*partition_by).orderBy(*order_by)
    agg_fns = {
        "sum": F.sum, "count": F.count, "avg": F.avg,
        "min": F.min, "max": F.max,
    }
    if mode == "no others":
        return df.withColumn(
            out, agg_fns[agg](val).over(base.rowsBetween(start, end))
        )
    unb_lo, unb_hi = start <= -_UNBOUNDED, end >= _UNBOUNDED
    if unb_lo and unb_hi:
        return _exclude_over_partition(
            df, val, partition_by, order_by, agg, mode, out
        )
    if unb_lo or unb_hi:
        # Half-unbounded: [UNBOUNDED PRECEDING, end] directly, or the
        # mirror [start, UNBOUNDED FOLLOWING] as [UNBOUNDED PRECEDING,
        # -start] over the reversed order (same peer groups, same
        # exclusion set; ROWS tie-breaks are order-dependent in PG too).
        if unb_lo:
            return _exclude_half_unbounded(
                df, val, partition_by, order_by, end, agg, mode, out
            )
        return _exclude_half_unbounded(
            df, val, partition_by, order_by, -start, agg, mode, out,
            descending=True,
        )

    rn_c, arr_c = "__xrn", "__xfr"
    ranked = df.withColumn(rn_c, F.row_number().over(base))
    frame_w = (
        Window.partitionBy(*partition_by).orderBy(rn_c).rowsBetween(start, end)
    )
    struct_cols = [F.col(rn_c).alias("__rn"), val.alias("__v")] + [
        F.col(c).alias(f"__k{i}") for i, c in enumerate(order_by)
    ]
    ranked = ranked.withColumn(
        arr_c, F.collect_list(F.struct(*struct_cols)).over(frame_w)
    )

    def _is_peer(x: Column) -> Column:
        cond = F.lit(True)
        for i, c in enumerate(order_by):
            cond = cond & x[f"__k{i}"].eqNullSafe(F.col(c))
        return cond

    if mode == "current row":
        keep = lambda x: x["__rn"] != F.col(rn_c)  # noqa: E731
    elif mode == "group":
        keep = lambda x: ~_is_peer(x)  # noqa: E731
    else:  # ties: peers go, the current row itself stays
        keep = lambda x: (x["__rn"] == F.col(rn_c)) | ~_is_peer(x)  # noqa: E731

    vals = F.filter(
        F.transform(F.filter(F.col(arr_c), keep), lambda x: x["__v"]),
        lambda v: v.isNotNull(),
    )
    n = F.size(vals)
    if agg == "count":
        expr = n.cast("long")
    else:
        if agg == "min":
            body = F.array_min(vals)
        elif agg == "max":
            body = F.array_max(vals)
        else:
            # fold seeded with the first element — no type gymnastics
            s = F.aggregate(
                F.slice(vals, F.lit(2), F.greatest(n - 1, F.lit(0))),
                F.element_at(vals, 1),
                lambda acc, v: acc + v,
            )
            body = s if agg == "sum" else s / n
        expr = F.when(n > 0, body)  # empty survivor set → NULL (PG)
    return ranked.withColumn(out, expr).drop(rn_c, arr_c)


def _exclude_over_partition(
    df: DataFrame,
    val: Column,
    partition_by: list[str],
    order_by: list[str],
    agg: str,
    mode: str,
    out: str,
) -> DataFrame:
    """ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING + EXCLUDE: frame =
    whole partition, so exclusion is partition-minus-group (or -self).
    Deterministic under ORDER BY ties — the form oracle queries use."""
    part_w = Window.partitionBy(*partition_by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    group_w = Window.partitionBy(*partition_by, *order_by).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    val_nn = F.when(val.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    zero = F.lit(0)
    if agg in ("sum", "count", "avg"):
        part_sum, part_cnt = F.sum(val).over(part_w), F.count(val).over(part_w)
        grp_sum, grp_cnt = F.sum(val).over(group_w), F.count(val).over(group_w)
        if mode == "current row":
            surv_cnt = part_cnt - val_nn
            surv_sum = part_sum - F.coalesce(val, zero)
        elif mode == "group":
            surv_cnt = part_cnt - grp_cnt
            surv_sum = part_sum - F.coalesce(grp_sum, zero)
        else:  # ties
            surv_cnt = part_cnt - grp_cnt + val_nn
            surv_sum = (
                part_sum - F.coalesce(grp_sum, zero) + F.coalesce(val, zero)
            )
        if agg == "count":
            expr = surv_cnt.cast("long")
        elif agg == "sum":
            expr = F.when(surv_cnt > 0, surv_sum)
        else:
            expr = F.when(surv_cnt > 0, surv_sum / surv_cnt)
        return df.withColumn(out, expr)

    # min/max: not subtractable — prefix/suffix flanks around the peer
    # group (works for any orderable key type, unlike value-space RANGE
    # flanks). Everything shares one (partition_by) shuffle.
    agg_fn = F.min if agg == "min" else F.max
    comb = F.least if agg == "min" else F.greatest
    base = Window.partitionBy(*partition_by).orderBy(*order_by)
    rn_c = "__xrn"
    ranked = df.withColumn(rn_c, F.row_number().over(base))
    rn = F.col(rn_c)
    pre = agg_fn(val).over(
        Window.partitionBy(*partition_by)
        .orderBy(rn_c)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    suf = agg_fn(val).over(
        Window.partitionBy(*partition_by)
        .orderBy(rn_c)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    if mode == "current row":
        expr = comb(pre, suf)
        return ranked.withColumn(out, expr).drop(rn_c)
    g_lo, g_hi = F.min(rn).over(group_w), F.max(rn).over(group_w)
    ranked = ranked.withColumn("__xpre", pre).withColumn("__xsuf", suf)
    ranked = ranked.withColumn("__xglo", g_lo).withColumn("__xghi", g_hi)
    # the flank value *at the group boundary row*, broadcast to the group
    grp_pre = F.max(
        F.when(rn == F.col("__xglo"), F.col("__xpre"))
    ).over(group_w)
    grp_suf = F.max(
        F.when(rn == F.col("__xghi"), F.col("__xsuf"))
    ).over(group_w)
    expr = comb(grp_pre, grp_suf)
    if mode == "ties":
        expr = comb(expr, val)
    return ranked.withColumn(out, expr).drop(
        rn_c, "__xpre", "__xsuf", "__xglo", "__xghi"
    )


def _exclude_half_unbounded(
    df: DataFrame,
    val: Column,
    partition_by: list[str],
    order_by: list[str],
    end: int,
    agg: str,
    mode: str,
    out: str,
    descending: bool = False,
) -> DataFrame:
    """ROWS BETWEEN UNBOUNDED PRECEDING AND `end` + EXCLUDE — the last
    cell of the frame x exclusion matrix (nodeWindowAgg.c:1454-1480).
    `descending=True` evaluates the mirrored [start, UNBOUNDED
    FOLLOWING] frame over the reversed partition order.

    Unlike the bounded-frame collect evaluator, the frame prefix here
    grows with the partition, so nothing unbounded is ever collected:

    - sum/count/avg: frame aggregate minus the peer-group-within-frame
      aggregate. The group's in-frame slice is [g_lo, min(g_hi, rn+end)]
      (peers are contiguous in row_number), so its sum falls out of
      prefix aggregates: whole group in frame → group aggregate; frame
      cuts into the group → C(rn+end) − C(g_lo−1), where C(rn+end) IS
      the frame aggregate and C(g_lo−1) is the prefix-exclusive
      aggregate at the group's first row, broadcast over the group.
    - min/max (non-subtractable): survivors = [unb, g_lo−1] ∪ (non-peer
      rows of the bounded tail (g_hi, rn+end]]. The first flank is the
      prefix-exclusive min/max broadcast from the group's first row;
      the tail is a bounded (≤ end rows) struct collect filtered to
      non-peers — constant per-row state, all JVM-side.

    One (partition_by) shuffle feeds every window; the extra group
    windows share the same exchange after partial-key re-sort.
    """
    ob = [F.col(c).desc() if descending else F.col(c) for c in order_by]
    rn_c = "__xrn"
    ranked = df.withColumn(
        rn_c, F.row_number().over(Window.partitionBy(*partition_by).orderBy(*ob))
    )
    rn = F.col(rn_c)
    rw = Window.partitionBy(*partition_by).orderBy(rn_c)
    unb, unf = Window.unboundedPreceding, Window.unboundedFollowing
    frame_w = rw.rowsBetween(unb, end)
    gw = Window.partitionBy(*partition_by, *order_by).rowsBetween(unb, unf)
    ranked = ranked.withColumn("__glo", F.min(rn).over(gw)).withColumn(
        "__ghi", F.max(rn).over(gw)
    )
    glo, ghi = F.col("__glo"), F.col("__ghi")
    in_frame = end >= 0  # current row (offset 0) inside [unb, end]?
    helpers = [rn_c, "__glo", "__ghi"]

    if agg in ("sum", "count", "avg"):
        zero = F.lit(0)
        val_nn = F.when(val.isNotNull(), F.lit(1)).otherwise(zero)
        cum_sum = F.sum(val).over(rw.rowsBetween(unb, 0))
        cum_cnt = F.count(val).over(rw.rowsBetween(unb, 0))
        ranked = (
            ranked.withColumn("__fs", F.sum(val).over(frame_w))
            .withColumn("__fc", F.count(val).over(frame_w))
            .withColumn(
                "__ps", F.coalesce(cum_sum - F.coalesce(val, zero), zero)
            )
            .withColumn("__pc", cum_cnt - val_nn)
        )
        # prefix-exclusive aggregates C(g_lo − 1), broadcast over group
        ranked = (
            ranked.withColumn(
                "__bs", F.max(F.when(rn == glo, F.col("__ps"))).over(gw)
            )
            .withColumn(
                "__bc", F.max(F.when(rn == glo, F.col("__pc"))).over(gw)
            )
            .withColumn("__gs", F.coalesce(F.sum(val).over(gw), zero))
            .withColumn("__gc", F.count(val).over(gw))
        )
        helpers += ["__fs", "__fc", "__ps", "__pc", "__bs", "__bc",
                    "__gs", "__gc"]
        fs = F.coalesce(F.col("__fs"), zero)
        fc = F.col("__fc")
        frame_end = rn + F.lit(end)
        pif_sum = (
            F.when(frame_end < glo, zero)
            .when(ghi <= frame_end, F.col("__gs"))
            .otherwise(fs - F.col("__bs"))
        )
        pif_cnt = (
            F.when(frame_end < glo, zero)
            .when(ghi <= frame_end, F.col("__gc"))
            .otherwise(fc - F.col("__bc"))
        )
        cur_sum = F.coalesce(val, zero) if in_frame else zero
        cur_cnt = val_nn if in_frame else zero
        if mode == "current row":
            surv_sum, surv_cnt = fs - cur_sum, fc - cur_cnt
        elif mode == "group":
            surv_sum, surv_cnt = fs - pif_sum, fc - pif_cnt
        else:  # ties: peers leave, the current row itself stays
            surv_sum = fs - pif_sum + cur_sum
            surv_cnt = fc - pif_cnt + cur_cnt
        if agg == "count":
            expr = surv_cnt.cast("long")
        elif agg == "sum":
            expr = F.when(surv_cnt > 0, surv_sum)
        else:
            expr = F.when(surv_cnt > 0, surv_sum / surv_cnt)
        return ranked.withColumn(out, expr).drop(*helpers)

    agg_fn = F.min if agg == "min" else F.max
    comb = F.least if agg == "min" else F.greatest
    ranked = ranked.withColumn(
        "__pre", agg_fn(val).over(rw.rowsBetween(unb, -1))
    ).withColumn("__fa", agg_fn(val).over(frame_w))
    helpers += ["__pre", "__fa"]
    if mode == "current row":
        if end < 0:  # current row not in frame: exclusion is a no-op
            expr = F.col("__fa")
        elif end == 0:
            expr = F.col("__pre")
        else:
            expr = comb(
                F.col("__pre"), agg_fn(val).over(rw.rowsBetween(1, end))
            )
        return ranked.withColumn(out, expr).drop(*helpers)

    # group / ties: [unb, g_lo−1] flank ∪ non-peers of the bounded tail
    ranked = ranked.withColumn(
        "__gpre", F.max(F.when(rn == glo, F.col("__pre"))).over(gw)
    )
    helpers.append("__gpre")
    if end < 0:
        # frame may stop before the group (no exclusion) or cut into it
        # (survivors are exactly the [unb, g_lo−1] flank)
        expr = F.when(rn + F.lit(end) < glo, F.col("__fa")).otherwise(
            F.col("__gpre")
        )
    elif end == 0:
        expr = F.col("__gpre")
    else:
        struct_cols = [val.alias("__v")] + [
            F.col(c).alias(f"__k{i}") for i, c in enumerate(order_by)
        ]
        ranked = ranked.withColumn(
            "__tail",
            F.collect_list(F.struct(*struct_cols)).over(
                rw.rowsBetween(1, end)
            ),
        )
        helpers.append("__tail")

        def _not_peer(x: Column) -> Column:
            cond = F.lit(False)
            for i, c in enumerate(order_by):
                cond = cond | ~x[f"__k{i}"].eqNullSafe(F.col(c))
            return cond

        tail_vals = F.filter(
            F.transform(F.filter(F.col("__tail"), _not_peer), lambda x: x["__v"]),
            lambda v: v.isNotNull(),
        )
        m3 = F.array_min(tail_vals) if agg == "min" else F.array_max(tail_vals)
        expr = comb(F.col("__gpre"), m3)
    if mode == "ties" and in_frame:
        expr = comb(expr, val)
    return ranked.withColumn(out, expr).drop(*helpers)


def _require_discrete_order_key(
    df: DataFrame, order_by: list[str], what: str
) -> None:
    """Raise unless every ORDER BY column has an integer-stepped type.

    The value-space ±1 RANGE bounds used to skip a peer group are only
    sound when adjacent distinct key values differ by ≥ 1 — true for
    integral and date types, not for float/double/fractional decimal.
    """
    from pyspark.sql import types as T

    discrete = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                T.DateType, T.BooleanType)
    fields = {f.name: f.dataType for f in df.schema.fields}
    for c in order_by:
        name = c if isinstance(c, str) else None
        dt = fields.get(name)
        if dt is None:
            continue  # computed expression — caller's responsibility
        ok = isinstance(dt, discrete) or (
            isinstance(dt, T.DecimalType) and dt.scale == 0
        )
        if not ok:
            raise ValueError(
                f"{what} requires a discrete (integer-stepped) ORDER BY "
                f"key; column {name!r} has type {dt.simpleString()}. "
                "Use a ROWS frame, cast the key, or pass "
                "assume_discrete=True if values are integer-stepped."
            )
