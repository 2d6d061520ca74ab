"""Round-16 optimization pins: every entry proves an optimized path is
value-identical to the shape it replaced (and, where the claim is a plan
shape, asserts the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.operators.groupby import Agg, group_by_agg

MV_AGGS = [
    Agg("count", None, "rows_cnt"),
    Agg("countmv", "embedding", "countmv"),
    Agg("minmv", "embedding", "minmv"),
    Agg("maxmv", "embedding", "maxmv"),
    Agg("summv", "embedding", "summv"),
    Agg("avgmv", "embedding", "avgmv"),
    Agg("minmaxrangemv", "embedding", "rangemv"),
    Agg("percentile50mv", "embedding", "p50"),
    Agg("percentile90mv", "embedding", "p90"),
]


@pytest.fixture(scope="module")
def mv_edge_df(spark):
    rows = [
        (1, [0.5, -1.25, 3.0]),
        (2, []),           # empty array: counts 0 elements, keeps the row
        (3, None),         # NULL array
        (4, [None, 2.0]),  # NULL element: decimal fold row-poisons
        (5, [1e9, -5.0]),  # |x| > fx clamp: routes SUMMV/AVGMV to decimal
        (6, [0.125]),
    ]
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def _vals(df):
    return df.collect()[0].asDict()


def test_fused_scalar_mv_matches_split_paths(mv_edge_df):
    """The fused single-pass (folds recomputed element-wise inside the
    exploded aggregate) must equal the split fold-aggregate x element-
    aggregate construction bit for bit — including the NULL-array /
    NULL-element / decimal-risk edge cases."""
    fused = _vals(group_by_agg(mv_edge_df, [], MV_AGGS))
    split = {**_vals(group_by_agg(mv_edge_df, [], MV_AGGS[:7])),
             **_vals(group_by_agg(mv_edge_df, [], MV_AGGS[7:]))}
    assert fused == split
    # fx branch (no large-magnitude rows): same equality
    small = mv_edge_df.where("id != 5")
    fused2 = _vals(group_by_agg(small, [], MV_AGGS))
    split2 = {**_vals(group_by_agg(small, [], MV_AGGS[:7])),
              **_vals(group_by_agg(small, [], MV_AGGS[7:]))}
    assert fused2 == split2


def test_fused_scalar_mv_single_scan_plan(mv_edge_df):
    """The fused path is ONE aggregate over ONE Generate — no cross join
    of two scans (the shape it replaced)."""
    plan = (group_by_agg(mv_edge_df, [], MV_AGGS)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Generate") == 1


def test_fused_path_not_taken_with_keys(spark):
    """Grouped mixed MV queries keep the join-back path (the fusion is
    scalar-only); results unchanged by the routing guard."""
    df = spark.createDataFrame(
        [(1, "a", [1.0, 2.0]), (2, "a", [3.0]), (3, "b", [])],
        "id long, k string, embedding array<double>")
    from realtime_olap_spark.operators.groupby import Key
    out = group_by_agg(df, [Key("k", "k")], [
        Agg("countmv", "embedding", "countmv"),
        Agg("percentile50mv", "embedding", "p50"),
    ]).orderBy("k").collect()
    assert [(r["k"], r["countmv"], r["p50"]) for r in out] == [
        ("a", 3, 2.0), ("b", 0, None)]
