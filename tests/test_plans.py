"""Physical-plan quality gates — the 100 TB design checks.

Each test asserts the *plan shape* Catalyst produces for a registered
query, mirroring the reference's planner regression suite (ORCA minidump
replay, SURVEY §5): filters reach the parquet scan, small dims broadcast,
aggregates split partial/final, top-K avoids global sorts, and custom
operators don't introduce extra shuffles.
"""

from __future__ import annotations

import re

import pytest

from warehouse_pg_spark.queries import REGISTRY


def plan_of(spark, sf_dir, name: str, mode: str = "formatted") -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_q6_filter_pushdown_and_pruning(spark, sf_dir):
    """Filters must reach the parquet scan; scan must read only the
    4 needed columns of lineitem's 11 (AOCS projection analogue)."""
    plan = plan_of(spark, sf_dir, "tpch_q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert set(read_cols) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }, read_cols


def test_q5_broadcasts_dims(spark, sf_dir):
    """Star-join dims must broadcast (Motion: broadcast, not
    redistribute) — no sort-merge join against a 25-row nation."""
    plan = plan_of(spark, sf_dir, "tpch_q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_q1_partial_final_agg(spark, sf_dir):
    """Multi-stage aggregation (cdbgroupingpaths.c two-stage analogue):
    a partial HashAggregate below the exchange, final above."""
    plan = plan_of(spark, sf_dir, "tpch_q1_pricing_summary")
    assert "HashAggregate" in plan
    assert "partial_" in plan  # map-side combine fired
    assert plan.count("Exchange") <= 2  # one agg shuffle (+AQE read)


def test_q3_topk_no_global_sort(spark, sf_dir):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject (bounded
    heap top-K, tuplesort.c bounded-sort analogue), not a full sort."""
    plan = plan_of(spark, sf_dir, "tpch_q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_shapes(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "join_semi_exists")
    assert "LeftAnti" in plan_of(spark, sf_dir, "join_anti_not_exists")


def test_asof_join_single_shuffle(spark, sf_dir):
    """The as-of join must cost exactly one hash exchange (on the key)
    plus nothing else — the union+window algorithm's whole point."""
    plan = plan_of(spark, sf_dir, "ts_asof_join", mode="simple")
    # hashpartitioning exchanges only; count distinct Exchange nodes
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_window_running_sum_single_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "window_running_sum", mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_sessionize_single_shuffle(spark, sf_dir):
    """Sessionization = windows + aggs all on user_id: one shuffle."""
    plan = plan_of(spark, sf_dir, "events_sessionize", mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_range_join_broadcasts(spark, sf_dir):
    """Bucket range-join must broadcast the tiny bucket table, never
    shuffle the fact side into a cartesian."""
    plan = plan_of(spark, sf_dir, "ts_range_join_buckets")
    assert "BroadcastNestedLoopJoin" in plan


def test_sim_topk_broadcasts_query_vector(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sim_topk_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_notin_null_aware(spark, sf_dir):
    """NOT IN must plan the null-aware anti join (LASJ NotIn analogue,
    CPhysicalLeftAntiSemiHashJoinNotIn)."""
    plan = plan_of(spark, sf_dir, "join_notin_with_nulls")
    assert "LeftAnti" in plan


def test_q4_semi_join_with_nonequi_predicate(spark, sf_dir):
    """EXISTS with an extra date qual must stay a hash semi join (the
    equi key carries it), never a nested-loop."""
    plan = plan_of(spark, sf_dir, "tpch_q4_order_priority", "simple")
    assert "LeftSemi" in plan
    assert "NestedLoop" not in plan


def test_q19_or_predicate_stays_hash_join(spark, sf_dir):
    """OR-of-ANDs with a common equi key: Catalyst must extract
    l_partkey = p_partkey and keep a hash join, not a cartesian."""
    plan = plan_of(spark, sf_dir, "tpch_q19_discounted_revenue", "simple")
    assert "HashJoin" in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_q21_semi_anti_shapes(spark, sf_dir):
    """EXISTS -> semi, NOT EXISTS -> anti, both hash joins on the
    shared l_orderkey key; top-K avoids a global sort."""
    plan = plan_of(spark, sf_dir, "tpch_q21_waiting_suppliers", "simple")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan


def test_q16_anti_join_and_distinct_agg(spark, sf_dir):
    """NOT IN over non-null keys -> plain anti join; COUNT(DISTINCT)
    expands to a two-phase aggregate."""
    plan = plan_of(spark, sf_dir, "tpch_q16_supplier_part_counts", "simple")
    assert "LeftAnti" in plan
    assert "HashAggregate" in plan


def test_q17_decorrelated_avg_no_cartesian(spark, sf_dir):
    """Correlated AVG subquery decorrelated to agg+join must not
    produce a nested-loop over lineitem."""
    plan = plan_of(spark, sf_dir, "tpch_q17_small_quantity_revenue", "simple")
    assert "Cartesian" not in plan


def test_svec_dot_broadcasts_query_entries(spark, sf_dir):
    """Sparse-dot joins the query vector's entries broadcast-side; the
    corpus entries never shuffle before the per-vector agg."""
    plan = plan_of(spark, sf_dir, "fn_svec_sparse_dot", "simple")
    assert "BroadcastHashJoin" in plan


def test_pipeline_prep_two_shuffles_and_pruning(spark, sf_dir):
    """The curation pipeline costs exactly two hash exchanges — one for
    the content-hash dedup window, one for the per-source stats — and
    the documents scan reads only the 3 needed columns of 5."""
    plan = plan_of(spark, sf_dir, "pipeline_training_data_prep", "simple")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    f = plan_of(spark, sf_dir, "pipeline_training_data_prep")
    m = re.search(r"ReadSchema: struct<([^>]*)>", f)
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert read_cols == {"doc_id", "text", "source"}, read_cols


def test_bpe_tokens_single_shuffle_and_pruning(spark, sf_dir):
    """Token accounting = one partial/final agg shuffle; the per-doc
    regex work happens map-side before the exchange."""
    plan = plan_of(spark, sf_dir, "text_bpe_tokens", "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_" in plan_of(spark, sf_dir, "text_bpe_tokens")
    f = plan_of(spark, sf_dir, "text_bpe_tokens")
    m = re.search(r"ReadSchema: struct<([^>]*)>", f)
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert read_cols == {"text", "source"}, read_cols


def test_sliding_window_dqa_two_phase(spark, sf_dir):
    """Sliding windows + COUNT(DISTINCT user) — the DQA expand rewrite
    (TupleSplit analogue) costs at most two exchanges."""
    plan = plan_of(spark, sf_dir, "events_sliding_window", "simple")
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_filter_clause_single_agg_pass(spark, sf_dir):
    """FILTER-qualified aggregates stay one partial/final HashAggregate
    pair — no per-filter scan duplication."""
    plan = plan_of(spark, sf_dir, "agg_filter_clause", "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_" in plan_of(spark, sf_dir, "agg_filter_clause")


def test_shard_packing_no_single_partition_exchange(spark, sf_dir):
    """The global running sum must use the two-pass prefix-sum rewrite:
    no Exchange SinglePartition anywhere (the 100 TB bottleneck)."""
    plan = plan_of(spark, sf_dir, "text_shard_packing", "simple")
    assert "Exchange SinglePartition" not in plan, plan
    assert "rangepartitioning" in plan  # pass 1: range repartition


def test_range_frame_no_single_partition_exchange(spark, sf_dir):
    """The global RANGE frame must use the value-banded rewrite: the
    window is partitioned by band, never a single-partition sort."""
    plan = plan_of(spark, sf_dir, "window_range_frame", "simple")
    assert "Exchange SinglePartition" not in plan, plan


@pytest.mark.parametrize(
    "name",
    [
        "dedup_exact",
        "window_moving_frame",
        "window_groups_frame",
        "window_exclude_current_row",
        "sample_source_weighted",
        "events_tumbling_window",
    ],
)
def test_single_shuffle_operators(spark, sf_dir, name):
    """Operators whose algebra needs exactly one hash exchange must not
    acquire extra shuffles (and never a single-partition stage)."""
    plan = plan_of(spark, sf_dir, name, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan


@pytest.mark.parametrize(
    "name",
    ["dedup_minhash_lsh", "dedup_ngram_jaccard", "text_decontaminate",
     "sim_ivf_bucketed", "sim_label_knn_capped"],
)
def test_blocked_joins_never_cartesian(spark, sf_dir, name):
    """Candidate-generation self-joins must stay blocked (hash joins on
    the block key) — a CartesianProduct here is the n² failure mode."""
    plan = plan_of(spark, sf_dir, name, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_ivf_broadcasts_centroids(spark, sf_dir):
    """IVF assignment must broadcast the centroid table (map-only
    assignment pass — the 100 TB path)."""
    plan = plan_of(spark, sf_dir, "sim_ivf_bucketed", "simple")
    assert "BroadcastExchange" in plan


def test_repetition_gopher_map_only(spark, sf_dir):
    """Gopher repetition signals are per-row array ops: the plan must be
    a pure scan→project pipeline — no Exchange, no BatchEvalPython (the
    higher-order functions stay JVM-side)."""
    plan = plan_of(spark, sf_dir, "text_repetition_gopher")
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert read_cols == {"doc_id", "text"}, read_cols


def test_srp_lsh_join_is_hash_on_signature(spark, sf_dir):
    """SRP-LSH candidates must join on the signature (hash or broadcast
    hash), with cosine as a post-join filter — never a cartesian /
    nested-loop expansion."""
    plan = plan_of(spark, sf_dir, "sim_srp_lsh_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_phash_band_joins_never_cartesian(spark, sf_dir):
    """pHash near-dup: the Hamming pigeonhole banding (one exploded band
    table, self-joined on band index+value) must be a hash join on the
    band key (candidates-then-confirm), never a cartesian expansion."""
    plan = plan_of(spark, sf_dir, "multimodal_phash_near_dup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_no_forced_broadcast_on_linear_growth_tables():
    """Broadcast-policy lint: F.broadcast() may only be forced on
    scale-invariant frames (nation/region — 25/5 rows at any SF) or
    1-row scalar aggregates. A forced broadcast on customer/supplier/
    part (or a per-key aggregate over them) works at bench SF and OOMs
    the driver at 100 TB — the planner/AQE must make that call from
    actual sizes instead."""
    import pathlib
    import re

    qdir = pathlib.Path(__file__).resolve().parent.parent / (
        "warehouse_pg_spark/queries"
    )
    forbidden = re.compile(
        r"F\.broadcast\(\s*(cust|supp|part|asia_supp|best|bad_supp|avg_qty)\s*[),]"
    )
    hits = []
    for f in sorted(qdir.glob("*.py")):
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if forbidden.search(line):
                hits.append(f"{f.name}:{i}: {line.strip()}")
    assert not hits, "forced broadcast on linear-growth frame:\n" + "\n".join(hits)


def test_passage_dedup_is_agg_not_window(spark, sf_dir):
    """Passage dedup must reduce first-occurrence via partial-aggregated
    groupBy (hot boilerplate passages collapse map-side), never a
    window over the passage key (which would pile every duplicate of a
    hot passage into one partition) — and never a cartesian."""
    plan = plan_of(spark, sf_dir, "text_passage_dedup", "simple")
    assert "partial_min" in plan or "partial" in plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def test_incremental_lsh_band_join_is_hash(spark, sf_dir):
    """Incremental corpus dedup: the batch→corpus band join must be a
    hash join on the band key (per-ingest cost scales with the batch),
    never a cartesian expansion."""
    plan = plan_of(spark, sf_dir, "dedup_incremental_lsh", "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q18_single_lineitem_pass(spark, sf_dir):
    """Q18's HAVING aggregate IS the output sum_qty, so the plan must
    scan lineitem exactly once — a second scan means the redundant
    re-join + re-aggregation crept back (at 100 TB it doubles the
    dominant fact shuffle)."""
    plan = plan_of(spark, sf_dir, "tpch_q18_large_volume_customer")
    assert plan.count("lineitem") <= 1, plan


def test_q17_q2_window_decorrelation(spark, sf_dir):
    """Q17/Q2 correlated aggregates lower to a window over the
    part-filtered fact: one lineitem scan, no aggregate-plus-join-back
    (the selective filter must run BEFORE the correlated agg)."""
    for name in ("tpch_q17_small_quantity_revenue", "tpch_q2_min_cost_supplier"):
        plan = plan_of(spark, sf_dir, name)
        assert plan.count("lineitem") <= 1, (name, plan)
        assert "Window" in plan, name


def test_half_unbounded_exclude_single_shuffle(spark, sf_dir):
    """Both directions of window_rows_unbounded_exclude (forward
    running sum + mirrored suffix max, each with peer-group broadcast
    windows) must ride ONE hashpartitioning exchange on the partition
    key — the flank/prefix machinery re-sorts within partitions but
    never re-shuffles (operators/window_ext._exclude_half_unbounded)."""
    plan = plan_of(spark, sf_dir, "window_rows_unbounded_exclude")
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1


def test_repetition_gopher_no_lambda_recompute(spark, sf_dir):
    """The tokenize subtree must appear let-bound (transform over a
    singleton array), not inlined into per-element lambdas — HOF
    lambdas are interpreted with no CSE, so an inlined regex re-runs
    per token (the sf10 finding). One regexp_replace chain per doc:
    the analyzed plan carries exactly one tokenize expression."""
    df = REGISTRY["text_repetition_gopher"].fn(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("regexp_replace") <= 2  # the 2-step normalizer


def test_no_row_at_a_time_python_udf_in_any_registry_plan(spark, sf_dir):
    """Every Python boundary in every registered query must be
    Arrow-batched: the plan may contain ArrowEvalPython (pandas UDF),
    FlatMapGroupsInPandas, MapInPandas, etc., but never a
    BatchEvalPython node — the row-at-a-time pickled path that turns a
    100 TB scan into a per-row serialization loop. Round-10 gate for
    the jsonb/xml shim conversion (functions/pg._arrow_batched)."""
    offenders = []
    for name, q in REGISTRY.items():
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # plan construction must not crash either
            offenders.append((name, f"plan error: {e}"))
            continue
        if "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython"))
    assert not offenders, offenders


def test_combinefunc_aggregate_two_stage_plan(spark, sf_dir):
    """A CREATE AGGREGATE with a combinefunc must lower to the
    partial/merge shape (engine_fn_ddl._lower_combinefunc_aggregate):
    the inner stage groups on (keys, spark_partition_id()) so no task
    folds a whole group, and only states cross the merge boundary."""
    from warehouse_pg_spark.queries import REGISTRY

    df = REGISTRY["pgsql_combinefunc_aggregate"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan.upper()
    # two aggregation stages: the (key, pid) partial and the key merge
    import re as _re

    n_aggs = len(_re.findall(
        r"HashAggregate|ObjectHashAggregate|SortAggregate", plan))
    assert n_aggs >= 2, plan
