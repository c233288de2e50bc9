"""Property-based check of the recursive fixpoint operator: on random
DAG-ish edge sets, recursive_union's transitive closure must equal a
plain Python BFS — for any graph hypothesis draws, including cycles.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from warehouse_pg_spark.operators.recursive import recursive_union

_EDGES = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=25,
    unique=True,
)


def _python_closure(edges: list[tuple[int, int]]) -> set[tuple[int, int]]:
    """Reachability pairs (src, dst) via BFS from every node."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    out: set[tuple[int, int]] = set()
    for start in {a for a, _ in edges}:
        seen: set[int] = set()
        frontier = {start}
        while frontier:
            nxt: set[int] = set()
            for n in frontier:
                for m in adj.get(n, ()):
                    if m not in seen:
                        seen.add(m)
                        nxt.add(m)
            frontier = nxt
        out.update((start, d) for d in seen)
    return out


@settings(max_examples=12, deadline=None)
@given(edges=_EDGES)
def test_recursive_closure_matches_bfs(spark, edges):
    e = spark.createDataFrame(edges, ["src", "dst"])
    e.createOrReplaceTempView("__prop_edges")

    def step(frontier):
        from pyspark.sql import functions as F

        # string-qualified alias resolution: frontier IS the base
        # relation on iteration 1, so attribute access would be an
        # ambiguous self-join
        f = frontier.alias("f")
        ed = e.alias("ed")
        return f.join(ed, F.col("f.dst") == F.col("ed.src")).select(
            F.col("f.src").alias("src"), F.col("ed.dst").alias("dst")
        )

    got = {
        (r.src, r.dst)
        for r in recursive_union(e, step, distinct=True, max_iterations=30).collect()
    }
    expected = _python_closure(edges) | set(edges)
    assert got == expected
