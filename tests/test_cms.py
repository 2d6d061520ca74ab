"""Count-Min-gated heavy hitters: overestimate-only invariant, gated ≡
ungated groupBy+HAVING, weighted build ≡ raw build, literal ≡ broadcast
probe, boilerplate-line composition, JSON round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_olap_spark.operators.cms import (CMSketch, cms_build,
                                               cms_estimate,
                                               frequent_lines_exact,
                                               heavy_hitters_exact)

from tests.conftest import SF_DIR


def _skewed(spark, n=20_000):
    """key k_i appears ~n/(i+1) times (Zipf-ish): a few heavies, a long
    unique tail."""
    return (spark.range(n)
            .select(F.concat(F.lit("k"),
                             F.floor(F.sqrt(F.col("id"))).cast("string"))
                    .alias("key")))


def test_estimate_never_undercounts_and_is_tight(spark):
    df = _skewed(spark)
    sk = cms_build(df, "key", width=2048, depth=4)
    true = df.groupBy("key").agg(F.count(F.lit(1)).alias("t"))
    est = true.withColumn("e", cms_estimate(spark, "key", sk))
    bad = est.where(F.col("e") < F.col("t")).count()
    assert bad == 0  # CMS can only overcount
    # ε = e/w ≈ 0.0013 at w=2048 ⇒ overshoot ≤ ε·N=27 w.h.p.; allow 4x
    loose = est.where(F.col("e") - F.col("t") > 110).count()
    assert loose == 0


def test_gated_equals_plain_groupby_having(spark):
    df = _skewed(spark)
    sk = cms_build(df, "key", width=2048, depth=4)
    want = sorted((r["key"], r["n"]) for r in
                  df.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
                  .where(F.col("n") >= 50).collect())
    for mode in ("literal", "broadcast"):
        got = sorted((r["key"], r["n_occurrences"]) for r in
                     heavy_hitters_exact(df, "key", 50, sk,
                                         mode=mode).collect())
        assert got == want and len(got) > 0, mode


def test_weighted_build_equals_raw_build(spark):
    """Building from a pre-aggregated (key, n) table with weight=n must
    produce the IDENTICAL sketch (same per-cell sums)."""
    df = _skewed(spark, 5_000)
    raw = cms_build(df, "key", width=512, depth=3)
    agg = df.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    weighted = cms_build(agg, "key", width=512, depth=3,
                         weight=F.col("n"))
    assert raw == weighted


def test_literal_equals_broadcast_estimate(spark):
    df = _skewed(spark, 5_000)
    sk = cms_build(df, "key", width=512, depth=3)
    keys = df.distinct()
    lit = keys.withColumn("e", cms_estimate(spark, "key", sk, "literal"))
    brd = keys.withColumn("e", cms_estimate(spark, "key", sk, "broadcast"))
    assert sorted(map(tuple, lit.collect())) == \
        sorted(map(tuple, brd.collect()))


def test_frequent_lines_finds_boilerplate(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    boiler = "COPYRIGHT FOOTER all rights reserved"
    seeded = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.col("text"), F.lit("\n" + boiler)))
        .otherwise(F.col("text")))
    n_expected = seeded.where(F.col("doc_id") % 2 == 0).count()
    hot = {r["line"]: r["n_occurrences"] for r in
           frequent_lines_exact(seeded, "text",
                                threshold=n_expected).collect()}
    assert hot.get(boiler) == n_expected
    # matches the ungated plain plan exactly
    want = {r["line"]: r["n"] for r in
            seeded.select(F.explode(F.split("text", "\n")).alias("line"))
            .groupBy("line").agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= n_expected).collect()}
    assert hot == want


def test_gate_sits_before_the_aggregate(spark):
    df = _skewed(spark, 5_000)
    sk = cms_build(df, "key", width=512, depth=3)
    plan = heavy_hitters_exact(df, "key", 50, sk, mode="literal") \
        ._jdf.queryExecution().executedPlan().toString()
    # the literal-mode gate (array_min over the folded counter array)
    # must appear as a Filter feeding the aggregate's exchange
    assert "array_min" in plan and "Exchange" in plan


def test_json_round_trip():
    sk = CMSketch((5, 0, 7, 1, 2, 3), 3, 2)
    assert CMSketch.from_json(sk.to_json()) == sk


def test_merge_equals_build_over_union(spark):
    from realtime_olap_spark.operators.cms import cms_merge
    import pytest
    a = _skewed(spark, 3_000)
    b = _skewed(spark, 2_000).select(
        F.concat(F.lit("x"), F.col("key")).alias("key"))
    merged = cms_merge(cms_build(a, "key", 512, 3),
                       cms_build(b, "key", 512, 3))
    assert merged == cms_build(a.unionByName(b), "key", 512, 3)
    with pytest.raises(ValueError):
        cms_merge(merged, cms_build(a, "key", 256, 3))


def test_total_mass_and_error_bound(spark):
    from realtime_olap_spark.operators.cms import (cms_error_bound,
                                                   cms_total_mass)
    df = _skewed(spark, 10_000)
    sk = cms_build(df, "key", width=1024, depth=4)
    assert cms_total_mass(sk) == 10_000
    # every row of the matrix holds the full mass
    for r in range(sk.depth):
        assert sum(sk.counters[r * sk.width:(r + 1) * sk.width]) == 10_000
    # the additive bound covers every observed overshoot (prob e^-4)
    import pyspark.sql.functions as F2
    true = df.groupBy("key").agg(F2.count(F2.lit(1)).alias("t"))
    est = true.withColumn("e", cms_estimate(spark, "key", sk))
    worst = est.agg(F2.max(F2.col("e") - F2.col("t"))).first()[0]
    assert worst <= cms_error_bound(sk)
