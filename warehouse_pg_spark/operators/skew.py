"""Skew-fighting join helpers.

The reference fights skew with planner rewrites (ORCA
CXformLeftOuter2InnerUnionAllLeftAntiSemiJoin) and by hashing on
better-distributed keys (cdbhash.c). Spark's first line of defense is
AQE skew-join splitting (spark.sql.adaptive.skewJoin.*, on by default
in our SessionConfig); `salted_join` is the manual fallback for the
cases AQE can't fix — e.g. a shuffled aggregation or join where one
key holds a double-digit percentage of all rows (the "null key" /
"megacustomer" patterns at 100 TB).

Mechanics: the skewed (big) side gets a random salt in [0, salt); the
small side is replicated once per salt value; the join key becomes
(key, salt). Row multiplication happens only on the small side, so the
shuffle spreads the hot key over `salt` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key shuffle spread over `salt` buckets.

    Returns the joined frame with helper columns removed. `small` is
    replicated `salt`× — keep it the dimension side."""
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_big.join(
        salted_small,
        (salted_big[big_key] == salted_small[small_key])
        & (salted_big["__salt"] == salted_small["__salt"]),
        how,
    )
    return out.drop("__salt")
