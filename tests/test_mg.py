"""Misra-Gries heavy hitters: the deterministic sandwich bound vs exact
counts, the no-false-negative guarantee, the gated-exact plan's row
identity with the plain groupBy, the merge law, and the too-coarse
guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.operators.mg import (heavy_hitters_mg,
                                              mg_merge_counts, mg_partials,
                                              mg_topk)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def words(spark):
    """Word stream from the documents corpus — Zipf-ish, many keys."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (docs.select(F.explode(F.split(F.col("text"), r"\s+"))
                        .alias("w"))
            .where(F.length("w") > 0)
            .repartition(8))


def _exact(words):
    return {r["w"]: r["n"] for r in
            words.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()}


def test_sandwich_bound(words):
    exact = _exact(words)
    got = mg_topk(words, "w", k=64).collect()
    assert len(got) > 0
    for r in got:
        true = exact[r["key"]]
        assert r["est"] <= true <= r["upper"], (r, true)


def test_decrement_bound_and_guarantee(words):
    exact = _exact(words)
    n = sum(exact.values())
    k = 64
    parts = mg_partials(words, "w", k)
    rows = parts.collect()
    dec = sum(r["dec"] for r in rows if r["key"] is None)
    n_parts = words.rdd.getNumPartitions()
    assert dec <= n // (k + 1) + n_parts  # per-partition floors
    # every key with true > dec appears in some summary
    present = {r["key"] for r in rows if r["key"] is not None}
    for w, c in exact.items():
        if c > dec:
            assert w in present, (w, c, dec)
    # absent keys are certified <= dec
    for w, c in exact.items():
        if w not in present:
            assert c <= dec


def test_gated_exact_equals_plain(words):
    threshold = 50
    plain = {(r["key"], r["n"]) for r in
             words.select(F.col("w").alias("key"))
             .groupBy("key").agg(F.count(F.lit(1)).alias("n"))
             .where(F.col("n") >= threshold).collect()}
    gated = {(r["key"], r["n"]) for r in
             heavy_hitters_mg(words, "w", threshold, k=512).collect()}
    assert gated == plain and len(plain) > 0


def test_gate_too_coarse_raises(words):
    with pytest.raises(ValueError, match="too coarse"):
        heavy_hitters_mg(words, "w", threshold=2, k=1)


def test_partials_bounded(words):
    k = 16
    parts = mg_partials(words, "w", k).collect()
    n_parts = words.rdd.getNumPartitions()
    assert len(parts) <= (k + 1) * n_parts
    per_part_nulls = sum(1 for r in parts if r["key"] is None)
    assert per_part_nulls == n_parts


def test_merge_law_python():
    """Driver-side merge keeps the MG invariant: est <= true, undercount
    bounded by the summed decrements."""
    import random
    rng = random.Random(7)
    stream = [f"w{rng.randint(0, 40)}" for _ in range(5000)] + ["hot"] * 500
    rng.shuffle(stream)
    half = len(stream) // 2
    k = 12

    def build(items):
        c, d = {}, 0
        for it in items:
            c[it] = c.get(it, 0) + 1
            if len(c) > k:
                t = sorted(c.values(), reverse=True)[k]
                c = {K: v - t for K, v in c.items() if v > t}
                d += t
        return c, d

    c1, d1 = build(stream[:half])
    c2, d2 = build(stream[half:])
    merged, d3 = mg_merge_counts(c1, c2, k)
    assert len(merged) <= k
    dec = d1 + d2 + d3
    from collections import Counter
    true = Counter(stream)
    for key_, est in merged.items():
        assert est <= true[key_] <= est + dec
    assert "hot" in merged  # 500 occurrences >> n/(k+1) bound
    assert dec <= len(stream) // (k + 1) + 3


def test_null_keys_dropped(spark):
    df = spark.createDataFrame([("a",), ("a",), (None,), ("b",)],
                               "w string")
    got = {r["key"]: r["est"] for r in mg_topk(df, "w", k=8).collect()}
    assert got == {"a": 2, "b": 1}


def test_gated_plan_broadcast_semi(words):
    """The gate plan never shuffles the corpus for the join: candidates
    broadcast into a BroadcastHashJoin LeftSemi; no SortMergeJoin."""
    plan = (heavy_hitters_mg(words, "w", threshold=50, k=512)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" not in plan, plan
    assert "LeftSemi" in plan, plan


def test_route_decision_both_regimes():
    from realtime_olap_spark.operators.mg import _route_heavy_hitters
    # tiny key space -> plain JVM groupBy, regardless of row count
    assert _route_heavy_hitters(10**9, 5_000, 4096, None, 0.125) \
        == "groupby"
    # keys ~ rows -> MG gate (shuffle bounded at k*P, not cardinality)
    assert _route_heavy_hitters(10**9, 6 * 10**8, 4096, None, 0.125) \
        == "mg"
    # moderate cardinality but tiny fraction of rows: partial agg
    # already bounds the plain shuffle -> groupby
    assert _route_heavy_hitters(10**12, 10**7, 4096, None, 0.125) \
        == "groupby"
    # custom thresholds respected
    assert _route_heavy_hitters(100, 90, 4, mg_min_keys=50,
                                mg_key_row_ratio=0.5) == "mg"


def test_auto_row_identical_both_routes(words):
    from realtime_olap_spark.operators.mg import heavy_hitters_auto
    want = sorted((k, n) for k, n in _exact(words).items() if n >= 40)
    # hint forces each route deterministically; results must be identical
    plain = heavy_hitters_auto(words, "w", 40, k=4096, n_keys_hint=100)
    gated = heavy_hitters_auto(words, "w", 40, k=4096,
                               n_keys_hint=10**9, mg_min_keys=1)
    assert sorted(map(tuple, plain.collect())) == want
    assert sorted(map(tuple, gated.collect())) == want
    # probe path (no hint): tiny-vocab corpus must route to groupby and
    # still match
    auto = heavy_hitters_auto(words, "w", 40, k=4096)
    assert sorted(map(tuple, auto.collect())) == want


def test_auto_picks_plan_by_regime(words):
    from realtime_olap_spark.operators.mg import heavy_hitters_auto
    # plain route: one whole-stage-codegen count, no gate join and no
    # checkpointed summary scan
    plan_plain = heavy_hitters_auto(
        words, "w", 40, n_keys_hint=100
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan_plain
    assert "ExistingRDD" not in plan_plain
    # MG route: localCheckpointed summary partials (ExistingRDD scan)
    # broadcast into the candidate semi-join gate
    plan_mg = heavy_hitters_auto(
        words, "w", 40, n_keys_hint=10**9, mg_min_keys=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan_mg and "ExistingRDD" in plan_mg


def test_top_k_auto_exact_route_matches_plain(words):
    from realtime_olap_spark.operators.mg import top_k_auto
    exact = _exact(words)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["key"], r["est"], r["upper"]) for r in
           top_k_auto(words, "w", 20, n_keys_hint=100).collect()]
    assert [(k, n, n) for k, n in want] == got
    # probe path on the tiny-vocab corpus also routes exact
    got_auto = [(r["key"], r["est"]) for r in
                top_k_auto(words, "w", 20).collect()]
    assert got_auto == [(k, n) for k, n in want]


def test_top_k_auto_mg_route_sandwich(words):
    from realtime_olap_spark.operators.mg import top_k_auto
    exact = _exact(words)
    rows = top_k_auto(words, "w", 20, k=2048,
                      n_keys_hint=10**9, mg_min_keys=1).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["est"] <= exact[r["key"]] <= r["upper"]
