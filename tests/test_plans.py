"""Physical-plan audits: the optimizations SURVEY.md §4 promises must be
visible in .explain — predicate pushdown into the parquet scan, column
pruning, broadcast joins for dims, whole-stage codegen coverage. These are
regression guards for the 100 TB posture, checked at sf0.001 (plan shape
is scale-independent)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    # shipdate predicate reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the 7 needed columns are read, not all 11
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q02_dims_broadcast(spark):
    plan = plan_of(spark, "q02_regional_revenue")
    # customer/nation/region joins must be broadcast-hash, not SMJ
    assert plan.count("BroadcastHashJoin") >= 3
    # the orders⋈lineitem fact join may be SMJ/shuffled-hash — but never
    # a nested-loop
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q05_anti_join_filter_pushed(spark):
    plan = plan_of(spark, "q05_customers_without_orders")
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_q08_asof_no_cartesian(spark):
    plan = plan_of(spark, "q08_asof_nearest")
    # the bucketed as-of join must plan as an equi-join on the bucket key
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q25_query_side_broadcast(spark):
    plan = plan_of(spark, "q25_cosine_topk")
    # corpus × queries: queries side broadcast, single corpus scan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def _production_layout():
    """Make the r12 single-row-group input fan-out inert by pretending
    every table has a production layout (row_groups >> cores): the
    map-only plan-shape tests below assert the AT-SCALE shape, which is
    exactly what the fan-out preserves there (tests/test_fanout.py
    covers the local fan-out behavior itself)."""
    from big_data_project_datapipeline_spark import tables as _tables

    _tables._ROW_GROUPS.clear()
    for t in _tables.TABLE_NAMES:
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            _tables._ROW_GROUPS[(f"/root/testdata/{sf}", t)] = (1 << 20, 0)


def test_q09_single_stage_projection(spark):
    _production_layout()
    try:
        plan = plan_of(spark, "q09_temporal_features")
    finally:
        from big_data_project_datapipeline_spark import tables as _tables

        _tables._ROW_GROUPS.clear()
    # pure projection: no exchange at all (map-only at any scale)
    assert "Exchange" not in plan
    assert "*(1)" in plan  # whole-stage codegen span (star notation)


@pytest.mark.parametrize(
    "name",
    ["q13_tumbling_hourly", "q20_exact_dedup", "q18_distinct_users"],
)
def test_aggregations_have_partial_phase(spark, name):
    """Map-side partial aggregation (HashAggregate below the exchange) —
    the difference between shuffling rows and shuffling groups."""
    plan = plan_of(spark, name)
    assert "HashAggregate" in plan or "SortAggregate" in plan
    assert "Exchange hashpartitioning" in plan

def test_q40_range_join_keeps_equi_key(spark):
    """The range predicate must ride on a hash/merge join keyed on
    user_id — never degrade to a nested-loop over the cross product."""
    plan = plan_of(spark, "q40_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_q43_winnow_stays_map_only(spark):
    """Fingerprinting is a scan→project pipeline: no exchange at all
    in the at-scale shape (see test_q09_single_stage_projection)."""
    _production_layout()
    try:
        plan = plan_of(spark, "q43_winnow_fingerprints")
    finally:
        from big_data_project_datapipeline_spark import tables as _tables

        _tables._ROW_GROUPS.clear()
    assert "Exchange" not in plan


def test_q44_partial_aggregation(spark):
    """Centroid aggs must map-side combine (partial_ before the shuffle)."""
    plan = plan_of(spark, "q44_label_centroids")
    assert "partial_" in plan
    assert "CartesianProduct" not in plan


def test_q45_semi_join_not_inner(spark):
    plan = plan_of(spark, "q45_dedup_then_join")
    assert "LeftSemi" in plan


def test_q61_chunk_dedup_groupby_not_window(spark):
    plan = plan_of(spark, "q61_chunk_dedup")
    # first-occurrence decision must be the skew-proof groupBy-min (with a
    # map-side partial phase), never a row_number window keyed on chunk
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_q62_vocab_join_size_driven_not_hinted(spark):
    # tf⋈vocab must not carry a broadcast HINT: web vocabularies are
    # hapax-heavy and huge, and a forced broadcast would OOM the driver
    # at scale. Catalyst choosing broadcast at sf0.001 (where the vocab
    # really is tiny) is correct size-driven behavior and reverses on its
    # own once the vocab outgrows the threshold — so the audit checks the
    # LOGICAL plan for hints, not the physical strategy. The only hint
    # allowed is the deliberate 1-row total broadcast.
    df = entrymod.queries()["q62_lm_perplexity"](spark, SF)
    logical = df._jdf.queryExecution().analyzed().toString()
    hints = [l for l in logical.splitlines() if "ResolvedHint" in l]
    assert len(hints) == 1, hints  # the 1-row __total only
    assert "CartesianProduct" not in plan_of(spark, "q62_lm_perplexity")


def test_q63_rates_broadcast(spark):
    plan = plan_of(spark, "q63_source_mix_rebalance")
    # per-source keep-rates are O(sources) — they must come back as a
    # broadcast, so the corpus-side selection is one map-only pass
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q64_decision_no_cartesian(spark):
    plan = plan_of(spark, "q64_semantic_dedup")
    # the pair step stays inside (label, tbl, bucket) cells and the
    # decision is groupBy + equi-join back — nothing quadratic globally
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q75_chunking_stays_map_only(spark):
    # tokenize → sequence/explode → slice: zero exchanges in the
    # at-scale shape (see test_q09_single_stage_projection)
    _production_layout()
    try:
        plan = plan_of(spark, "q75_rag_chunks")
    finally:
        from big_data_project_datapipeline_spark import tables as _tables

        _tables._ROW_GROUPS.clear()
    assert "Exchange" not in plan


def test_q79_single_basket_shuffle(spark):
    plan = plan_of(spark, "q79_copurchase_lift")
    # pair generation is map-side from per-basket arrays: no self-join
    # of the item stream (a second join would appear as SMJ on basket)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q83_baseline_broadcast(spark):
    plan = plan_of(spark, "q83_seasonal_anomalies")
    # the O(groups×24) baseline joins back via broadcast, never SMJ
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q85_no_cartesian(spark):
    plan = plan_of(spark, "q85_target_encode")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q86_hashing_partial_agg(spark):
    plan = plan_of(spark, "q86_feature_hashing")
    # (doc, bucket) counts must map-side combine before the exchange
    assert "partial_count" in plan or "partial_" in plan


def test_q89_kmeans_broadcast_centroids(spark):
    plan = plan_of(spark, "q89_kmeans")
    # the k-row centroid frame joins via broadcast; the point stream is
    # never shuffled for assignment
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
