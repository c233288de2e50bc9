"""Recursive CTE (WITH RECURSIVE) via driver-side fixpoint iteration.

Spark has no RecursiveUnion operator (reference:
src/backend/executor/nodeRecursiveunion.c, regress gp_recursive_cte.sql);
the standard Spark-native realization is a driver loop: the *plan* for
each iteration is distributed, only the loop control is on the driver —
the same structure as the reference's QD-side plan with a worktable,
so per-iteration work scales with the cluster.

localCheckpoint() truncates lineage each iteration so the plan doesn't
grow unboundedly (the classic iterative-algorithm pitfall at scale).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_union(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    distinct: bool = True,
    max_iterations: int = 100,
) -> DataFrame:
    """WITH RECURSIVE t AS (base UNION [ALL] step(t)) SELECT * FROM t.

    distinct=True  → UNION semantics: new rows joined against the
                     accumulated set; terminates when no *new* rows.
    distinct=False → UNION ALL semantics: terminates when step() yields
                     an empty frontier (caller must guarantee progress).
    """
    acc = base.localCheckpoint(eager=True)
    frontier = acc
    for _ in range(max_iterations):
        nxt = step(frontier)
        if distinct:
            nxt = nxt.distinct().subtract(acc)
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            return acc
        acc = acc.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    raise RuntimeError(
        f"recursive_union did not converge in {max_iterations} iterations"
    )
