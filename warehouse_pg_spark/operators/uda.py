"""User-defined aggregates with partial/merge semantics.

PG `CREATE AGGREGATE` (reference: commands/aggregatecmds.c, regress
create_aggregate.sql) takes sfunc (accumulate), prelimfunc/combinefunc
(merge partial states — what makes the aggregate distributable across
segments), and finalfunc. Spark's `pandas_udf GROUPED_AGG` has no
combine step (SURVEY §7.5), so `TreeAggregate` realizes the full
contract manually as two Arrow-batched stages:

  stage 1  groupBy(keys, partition_id) → acc(rows) → partial state
           (map-side: every partition reduces its own rows first,
            exactly PG's per-segment transition phase)
  stage 2  groupBy(keys) → merge(states) → final(state)
           (one shuffle of *states*, not rows — the same wire savings
            multi-stage agg buys in the reference,
            cdb/cdbgroupingpaths.c:258)

State is a fixed-width list of doubles (`state_size`), so the shuffle
payload is tiny and schema-stable at any scale.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TreeAggregate:
    """CREATE AGGREGATE analogue: acc / merge / final over grouped rows.

    acc(pdf: pd.DataFrame) -> list[float]        # rows → state
    merge(states: list[list[float]]) -> list[float]
    final(state: list[float]) -> float
    """

    def __init__(
        self,
        acc: Callable[[pd.DataFrame], Sequence[float]],
        merge: Callable[[Sequence[Sequence[float]]], Sequence[float]],
        final: Callable[[Sequence[float]], float],
        state_size: int,
        result_col: str = "result",
    ):
        self.acc = acc
        self.merge = merge
        self.final = final
        self.state_size = state_size
        self.result_col = result_col

    def apply(self, df: DataFrame, keys: Sequence[str]) -> DataFrame:
        keys = list(keys)
        key_fields = ", ".join(
            f"{name} {dtype}" for name, dtype in df.select(*keys).dtypes
        )
        state_cols = [f"s{i}" for i in range(self.state_size)]
        state_fields = ", ".join(f"{c} double" for c in state_cols)
        acc, merge, final, n_state = (
            self.acc,
            self.merge,
            self.final,
            self.state_size,
        )

        def partial(pdf: pd.DataFrame) -> pd.DataFrame:
            state = list(acc(pdf))
            row = {k: [pdf[k].iloc[0]] for k in keys}
            row.update({f"s{i}": [float(state[i])] for i in range(n_state)})
            return pd.DataFrame(row)

        def combine(pdf: pd.DataFrame) -> pd.DataFrame:
            states = pdf[state_cols].values.tolist()
            out_state = merge(states)
            row = {k: [pdf[k].iloc[0]] for k in keys}
            row[self.result_col] = [float(final(out_state))]
            return pd.DataFrame(row)

        staged = (
            df.withColumn("__pid", F.spark_partition_id())
            .groupBy(*keys, "__pid")
            .applyInPandas(partial, f"{key_fields}, {state_fields}")
        )
        return staged.groupBy(*keys).applyInPandas(
            combine, f"{key_fields}, {self.result_col} double"
        )


def var_pop_uda(value_col: str) -> TreeAggregate:
    """Population variance as a mergeable (n, sum, sumsq) state —
    the canonical combinefunc example."""

    def acc(pdf: pd.DataFrame):
        v = pdf[value_col].astype(float)
        return [float(len(v)), float(v.sum()), float((v * v).sum())]

    def merge(states):
        n = sum(s[0] for s in states)
        sm = sum(s[1] for s in states)
        sq = sum(s[2] for s in states)
        return [n, sm, sq]

    def final(s):
        n, sm, sq = s
        if n == 0:
            return float("nan")
        return sq / n - (sm / n) ** 2

    return TreeAggregate(acc, merge, final, state_size=3, result_col="var_pop")
