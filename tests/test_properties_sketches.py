"""Randomized + edge-case sweeps for the sketch-gate family: on every
corpus shape, the gated operators must equal their exact ungated twins
(the gate moves cost, never semantics)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from realtime_olap_spark.operators.bloom import (bloom_build,
                                                 dedup_exact_against_bloom,
                                                 optimal_params)
from realtime_olap_spark.operators.cms import cms_build, heavy_hitters_exact

WORDS = ["a", "b", "κλμ", "", " ", "x y", "ünïcode", "0", "tail"]


def _random_corpus(rng, n):
    return [(i, " ".join(rng.choices(WORDS, k=rng.randint(0, 4))))
            for i in range(n)]


def test_gated_dedup_equals_anti_join_random_sweep(spark):
    rng = random.Random(77)
    for trial in range(6):
        corpus_rows = _random_corpus(rng, rng.randint(0, 40))
        batch_rows = _random_corpus(rng, rng.randint(0, 40))
        corpus = spark.createDataFrame(corpus_rows or [(0, "seed")],
                                       "doc_id long, text string")
        if not corpus_rows:
            corpus = corpus.where(F.lit(False))  # truly empty corpus
        batch = spark.createDataFrame(batch_rows or [(0, "seed")],
                                      "doc_id long, text string")
        if not batch_rows:
            batch = batch.where(F.lit(False))
        keys = corpus.select(F.md5("text").alias("__ck")).distinct()
        m, k = optimal_params(max(1, len(corpus_rows)), 1e-2)
        bf = bloom_build(keys, "__ck", m, k)
        for large in (False, True):
            got = sorted(r["doc_id"] for r in dedup_exact_against_bloom(
                batch, keys, F.md5("text"), bf,
                large_corpus=large).collect())
            want = sorted(r["doc_id"] for r in batch
                          .withColumn("__ck", F.md5("text"))
                          .join(keys, "__ck", "left_anti").collect())
            assert got == want, f"trial {trial} large={large}"


def test_heavy_hitters_equals_groupby_random_sweep(spark):
    rng = random.Random(99)
    for trial in range(6):
        rows = [(w,) for w in
                rng.choices(WORDS, k=rng.randint(1, 300))]
        df = spark.createDataFrame(rows, "key string")
        sk = cms_build(df, "key", width=64, depth=3)
        thr = rng.randint(1, 40)
        got = sorted(map(tuple, heavy_hitters_exact(
            df, "key", thr, sk).collect()))
        want = sorted(map(tuple, df.groupBy("key")
                          .agg(F.count(F.lit(1)).alias("n"))
                          .where(F.col("n") >= thr).collect()))
        assert got == want, f"trial {trial} thr={thr}"


def test_empty_corpus_filter_rejects_everything(spark):
    empty = spark.createDataFrame([], "__ck string")
    m, k = optimal_params(1, 1e-2)
    bf = bloom_build(empty, "__ck", m, k)
    assert all(w == 0 for w in bf.words)
    batch = spark.createDataFrame([(1, "x"), (2, "")],
                                  "doc_id long, text string")
    out = dedup_exact_against_bloom(batch, empty, F.md5("text"), bf)
    assert out.count() == 2  # nothing can be a duplicate of nothing


def test_theta_algebra_random_sweep():
    """Pure-algebra sweep (no Spark): on random hash sets, sketch set
    ops must agree with ground truth computed on the full sets —
    build(A) from entries, union ≡ build(A∪B), and below the common
    theta the intersect/a-not-b samples are EXACTLY the true sets'
    restrictions."""
    from realtime_olap_spark.operators.theta import (HASH_DOMAIN,
                                                     _from_sorted,
                                                     theta_a_not_b,
                                                     theta_estimate,
                                                     theta_intersect,
                                                     theta_union)

    rng = random.Random(1234)
    for trial in range(200):
        k = rng.choice([2, 3, 8, 64])
        na, nb = rng.randint(0, 300), rng.randint(0, 300)
        pool = rng.randint(1, 400)  # small pool forces collisions/overlap
        A = {rng.randrange(HASH_DOMAIN // pool) for _ in range(na)}
        B = {rng.randrange(HASH_DOMAIN // pool) for _ in range(nb)}
        sa = _from_sorted(sorted(A), HASH_DOMAIN, k)
        sb = _from_sorted(sorted(B), HASH_DOMAIN, k)
        # build-from-entries invariants
        assert list(sa.entries) == sorted(A)[:len(sa.entries)]
        assert all(e < sa.theta for e in sa.entries)
        # union merge law vs direct build over A ∪ B
        assert theta_union(sa, sb) == _from_sorted(sorted(A | B),
                                                   HASH_DOMAIN, k), trial
        # below the common theta the set-op samples are exact
        tc = min(sa.theta, sb.theta)
        inter = theta_intersect(sa, sb)
        anb = theta_a_not_b(sa, sb)
        assert set(inter.entries) == {x for x in A & B if x < tc}, trial
        assert set(anb.entries) == {x for x in A - B if x < tc}, trial
        # exact mode: estimates are exact counts
        if sa.theta >= HASH_DOMAIN:
            assert theta_estimate(sa) == len(A)
