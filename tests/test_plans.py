"""Physical-plan regression tests: the scale properties the engine is
designed around, asserted on the actual executed plans (sf0.001 — plan
shape is SF-independent).

These are the Spark analogs of the reference's physical-strategy picks
(FilterOperatorUtils.java:43-68 choosing sorted/bitmap/scan operators;
InstancePlanMakerImplV2.java:148-211 metadata/dictionary fast paths): at
100 TB the plan, not the operator code, decides the cost.
"""

from __future__ import annotations

import pytest

from realtime_olap_spark import suite
from tests.conftest import SF_DIR


def plan_of(spark, name: str) -> str:
    return (suite.QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())


def test_filter_pushdown_reaches_parquet(spark):
    plan = plan_of(spark, "filter_basic")
    assert "PushedFilters: [" in plan
    assert "EqualTo(l_returnflag,R)" in plan


def test_projection_prunes_scan_columns(spark):
    # flagship Q1 reads 7 of lineitem's 11 columns — ReadSchema must show
    # the pruned set, not the full table
    plan = plan_of(spark, "flagship_q1")
    read = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_returnflag" in read


def test_aggregation_is_partial_then_final(spark):
    # partial (map-side) + final HashAggregate around one exchange —
    # Pinot's per-segment aggregate → server merge → broker merge
    plan = plan_of(spark, "agg_topn_having")
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_star_join_broadcasts_all_dims(spark):
    plan = plan_of(spark, "ext_join_star")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    # the only exchanges are broadcasts + the final group-by shuffle
    non_broadcast = [ln for ln in plan.splitlines()
                     if "Exchange hashpartitioning" in ln]
    assert len(non_broadcast) <= 1


def test_simhash_has_no_shuffle(spark):
    # per-row fold: the whole fingerprint computation is scan-side
    plan = plan_of(spark, "dedup_simhash")
    assert "Exchange hashpartitioning" not in plan


def test_selection_order_by_uses_top_k(spark):
    # bounded per-partition top-k, not a global sort — the reference's
    # per-segment PriorityQueue (SelectionOperatorService.java:76-109)
    plan = plan_of(spark, "sel_order_by_offset")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_sim_brute_force_is_top_k_not_sort(spark):
    plan = plan_of(spark, "sim_topk_brute")
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_on_hot_path(spark):
    # AQE finalizes the plan at execution; codegen spans show up then
    df = suite.QUERIES["agg_scalar_all"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' operator prefixes mark WholeStageCodegen stages
    assert "== Final Plan ==" in plan and "*(" in plan


def test_minhash_joins_on_band_key_no_cartesian(spark):
    plan = plan_of(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_pairs_no_cartesian(spark):
    plan = plan_of(spark, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["rollup_routed_agg"])
def test_rollup_routes_away_from_fact(spark, name):
    # routed queries aggregate the rollup, not the raw fact table: the
    # fact's metric columns must not appear in the final plan's scans
    plan = plan_of(spark, name)
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads, "expected a parquet scan"
