"""Bloom-gated against-corpus exact dedup: no false negatives, bounded
false positives, literal ≡ broadcast probe, gated ≡ ungated anti-join
(batch and availableNow stream), plan shape, JSON round-trip."""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import functions as F

from realtime_olap_spark.operators.bloom import (BloomFilter, bloom_build,
                                                 bloom_might_contain,
                                                 dedup_exact_against_bloom,
                                                 optimal_params)

from tests.conftest import SF_DIR


def _corpus_keys(spark, n=400):
    return (spark.range(n)
            .select(F.md5(F.concat(F.lit("corpus-"), F.col("id")))
                    .alias("__ck")))


def _build(spark, n=400, fpp=1e-3):
    keys = _corpus_keys(spark, n)
    m, k = optimal_params(n, fpp)
    return keys, bloom_build(keys, "__ck", m, k)


def test_optimal_params_shape():
    m, k = optimal_params(1000, 0.01)
    assert m % 64 == 0 and m >= 9000  # ~9.6 bits/key at 1% fpp
    assert 1 <= k <= 16


def test_no_false_negatives_both_modes(spark):
    keys, bf = _build(spark)
    for mode in ("literal", "broadcast"):
        hits = (keys.where(bloom_might_contain(spark, "__ck", bf, mode))
                .count())
        assert hits == keys.count(), mode


def test_false_positive_rate_bounded(spark):
    _, bf = _build(spark, n=400, fpp=1e-2)
    fresh = (spark.range(20_000)
             .select(F.md5(F.concat(F.lit("fresh-"), F.col("id")))
                     .alias("__ck")))
    fp = fresh.where(bloom_might_contain(spark, "__ck", bf)).count()
    # generous 4x slack over the configured 1%: sizing is asymptotic and
    # the draw is one sample, but an off-by-bit bug lands at ~50%
    assert fp / 20_000 < 0.04


def test_literal_equals_broadcast(spark):
    _, bf = _build(spark, n=300, fpp=5e-2)
    probe = (spark.range(5_000)
             .select(F.md5(F.concat(F.lit("mix-"),
                                    (F.col("id") % 700).cast("string")))
                     .alias("__ck")))
    lit = probe.withColumn("m", bloom_might_contain(spark, "__ck", bf,
                                                    "literal"))
    brd = probe.withColumn("m", bloom_might_contain(spark, "__ck", bf,
                                                    "broadcast"))
    assert (lit.collect() == brd.collect())


def test_gated_dedup_equals_plain_anti_join(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 0) \
        .unionByName(spark.createDataFrame(
            [(10**9, None)],
            "doc_id long, text string"))  # NULL-key row survives
    corpus_keys = corpus.select(F.md5("text").alias("__ck")).distinct()
    m, k = optimal_params(corpus_keys.count(), 1e-3)
    bf = bloom_build(corpus_keys, "__ck", m, k)
    for mode in ("literal", "broadcast"):
        got = sorted(r["doc_id"] for r in dedup_exact_against_bloom(
            batch, corpus_keys, F.md5("text"), bf, mode=mode).collect())
        want = sorted(r["doc_id"] for r in batch
                      .withColumn("__ck", F.md5("text"))
                      .join(corpus_keys, "__ck", "left_anti")
                      .drop("__ck").collect())
        assert got == want and 10**9 in got, mode


def test_gate_prunes_join_input(spark):
    """The plan must show exactly ONE join, fed only by the maybe-filtered
    branch — the definitely-new branch bypasses it entirely."""
    _, bf = _build(spark, n=100, fpp=1e-2)
    batch = _corpus_keys(spark, 50).select(F.col("__ck").alias("text"))
    out = dedup_exact_against_bloom(
        batch, _corpus_keys(spark, 100), F.col("text"), bf, mode="literal")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") >= 1
    # the gate predicate (forall over the literal word array) sits in a
    # Filter on BOTH branches: positive side feeding the join, negated
    # side feeding the union directly
    assert plan.count("forall") >= 2


def test_json_round_trip():
    bf = BloomFilter((1, -2, 3), 192, 4)
    assert BloomFilter.from_json(bf.to_json()) == bf


def test_streaming_gate_equals_batch(spark, tmpdir):
    """availableNow drain of the gated dedup ≡ the batch operator on the
    same files — the gate is stateless scan-side work plus a
    stream-static anti join, so it is streaming-legal as-is."""
    src, sink, ckpt = f"{tmpdir}/src", f"{tmpdir}/sink", f"{tmpdir}/ckpt"
    corpus = spark.createDataFrame(
        [("alpha",), ("beta",)], ["text"])
    corpus_keys = corpus.select(F.md5("text").alias("__ck")).distinct()
    m, k = optimal_params(2, 1e-2)
    bf = bloom_build(corpus_keys, "__ck", m, k)
    rows = [(1, "alpha"), (2, "gamma"), (3, "beta"), (4, "delta")]
    spark.createDataFrame(rows, ["doc_id", "text"]) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    gated = dedup_exact_against_bloom(stream, corpus_keys, F.md5("text"),
                                      bf, mode="literal")
    q = (gated.writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in
                 spark.read.schema(schema).parquet(sink).collect())
    batch = spark.read.schema(schema).parquet(src)
    want = sorted(r["doc_id"] for r in dedup_exact_against_bloom(
        batch, corpus_keys, F.md5("text"), bf, mode="literal").collect())
    assert got == want == [2, 4]


def test_merge_equals_build_over_union(spark):
    from realtime_olap_spark.operators.bloom import bloom_merge
    import pytest
    a = _corpus_keys(spark, 200)
    b = (spark.range(150)
         .select(F.md5(F.concat(F.lit("other-"), F.col("id")))
                 .alias("__ck")))
    m, k = optimal_params(350, 1e-2)
    merged = bloom_merge(bloom_build(a, "__ck", m, k),
                         bloom_build(b, "__ck", m, k))
    assert merged == bloom_build(a.unionByName(b), "__ck", m, k)
    with pytest.raises(ValueError):
        bloom_merge(merged, bloom_build(a, "__ck", m + 64, k))


def test_fill_ratio_and_fpp_estimate_track_measured_rate(spark):
    from realtime_olap_spark.operators.bloom import (bloom_fill_ratio,
                                                     bloom_fpp_estimate)
    keys, bf = _build(spark, n=400, fpp=1e-2)
    fill = bloom_fill_ratio(bf)
    assert 0.3 < fill < 0.7  # optimal sizing lands near 0.5
    est = bloom_fpp_estimate(bf)
    fresh = (spark.range(20_000)
             .select(F.md5(F.concat(F.lit("probe-"), F.col("id")))
                     .alias("__ck")))
    measured = fresh.where(bloom_might_contain(spark, "__ck", bf)) \
        .count() / 20_000
    # estimate and measurement agree within a loose multiplicative band
    assert est / 4 < max(measured, 1e-4) < est * 4 + 1e-3
