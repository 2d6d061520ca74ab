"""Unigram-LM quality scoring — DuckDB differential (1e-9 tolerance on the
mean of doubles; token counts exact) + OOV smoothing and bucket shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.lm_score import (perplexity_buckets,
                                                    train_unigram_freqs,
                                                    unigram_logprob)
from tests.conftest import SF_DIR

_WS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '')"


def test_self_scores_match_duckdb(spark, duck):
    d = Catalog(spark, SF_DIR).table("documents")
    got = {r["doc_id"]: r for r in
           unigram_logprob(d, "doc_id", "text").collect()}
    con = duck(SF_DIR)
    want = con.execute(f"""
        WITH toks AS (SELECT doc_id, unnest({_WS}) AS word FROM documents),
        freqs AS (SELECT word, COUNT(*) AS n_occ FROM toks GROUP BY word),
        tot AS (SELECT SUM(n_occ) AS n FROM freqs)
        SELECT doc_id, COUNT(*) AS n_tokens,
               AVG(ln(n_occ / (SELECT n FROM tot))) AS mean_logprob
        FROM toks JOIN freqs USING (word)
        GROUP BY doc_id
        """).df()
    assert len(got) == len(want)
    for _, row in want.iterrows():
        g = got[row["doc_id"]]
        assert g["n_tokens"] == int(row["n_tokens"])
        assert math.isclose(g["mean_logprob"], row["mean_logprob"],
                            rel_tol=1e-9), row["doc_id"]


def test_oov_smoothing_against_fixed_reference(spark):
    """Scoring a new batch against a persisted frequency table: unseen
    words cost log(1/N) — strictly below any in-vocabulary word's cost."""
    ref = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, "alpha beta beta")],
        ["doc_id", "text"])
    freqs = train_unigram_freqs(ref, "text")
    n_total = freqs.agg(F.max("n_total")).first()[0]
    assert n_total == 7
    new = spark.createDataFrame(
        [(10, "alpha alpha"), (11, "zzz unseen"), (12, "alpha zzz")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["mean_logprob"] for r in
           unigram_logprob(new, "doc_id", "text", freqs=freqs).collect()}
    lp = lambda k: math.log(k / 7)  # noqa: E731
    assert math.isclose(got[10], lp(3), rel_tol=1e-12)       # alpha ×2
    assert math.isclose(got[11], lp(1), rel_tol=1e-12)       # both OOV
    assert math.isclose(got[12], (lp(3) + lp(1)) / 2, rel_tol=1e-12)
    assert got[11] < got[10]  # rare-token soup scores worst


def test_perplexity_buckets_shape(spark):
    d = Catalog(spark, SF_DIR).table("documents")
    scores = unigram_logprob(d, "doc_id", "text")
    b = perplexity_buckets(scores, n_buckets=3, method="ntile")
    agg = (b.groupBy("bucket")
           .agg(F.count(F.lit(1)).alias("n"),
                F.min("mean_logprob").alias("mn"),
                F.max("mean_logprob").alias("mx"))
           .orderBy("bucket").collect())
    assert [r["bucket"] for r in agg] == [0, 1, 2]
    sizes = [r["n"] for r in agg]
    assert max(sizes) - min(sizes) <= 1  # ntile balance
    # bucket 0 = most typical (highest scores); boundaries ordered
    assert agg[0]["mn"] >= agg[1]["mx"] - 1e-12
    assert agg[1]["mn"] >= agg[2]["mx"] - 1e-12


def test_cutoff_buckets_default_has_no_window(spark):
    """The DEFAULT bucketing path must never plan a global window: one
    approxQuantile aggregate + scan-side comparisons (the r5-flagged
    single-partition ntile sort is opt-in only)."""
    d = Catalog(spark, SF_DIR).table("documents")
    scores = unigram_logprob(d, "doc_id", "text")
    b = perplexity_buckets(scores, n_buckets=3)
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:2000]
    assert "ntile" not in plan


def test_cutoff_buckets_equal_ntile_off_boundaries(spark):
    """Exact-quantile cutoffs (relative_error=0) reproduce ntile buckets
    for every row NOT tied with a cutoff value (ties are split arbitrarily
    by rank in ntile, by value in cutoffs — the only defined difference)."""
    d = Catalog(spark, SF_DIR).table("documents")
    scores = unigram_logprob(d, "doc_id", "text")
    via_cut = perplexity_buckets(scores, n_buckets=3, relative_error=0.0)
    via_ntile = perplexity_buckets(scores, n_buckets=3, method="ntile")
    cut_rows = {r["doc_id"]: r for r in via_cut.collect()}
    probs = [1 / 3, 2 / 3]
    cuts = set(scores.where(F.col("mean_logprob").isNotNull())
               .approxQuantile("mean_logprob", probs, 0.0))
    mismatches = 0
    for r in via_ntile.collect():
        c = cut_rows[r["doc_id"]]
        if r["mean_logprob"] in cuts:
            continue  # boundary tie — defined divergence
        if c["bucket"] != r["bucket"]:
            mismatches += 1
    assert mismatches == 0


def test_fixed_cutoffs_sit_far_from_every_doc_score(spark):
    """The driver-oracled lm_bucket (suite/text.py) relies on the doc
    means never lying within float noise of a FIXED cutoff — a cross-
    engine ULP difference in the order-dependent double mean must not be
    able to flip a bucket. Margin ≥ 1e-6 for every doc at this SF (a
    double mean of ~300 logs carries ~1e-13 of order noise)."""
    from realtime_olap_spark.suite.text import LM_BUCKET_CUTOFFS
    d = Catalog(spark, SF_DIR).table("documents")
    scores = [r["mean_logprob"] for r in
              unigram_logprob(d, "doc_id", "text").collect()
              if r["mean_logprob"] is not None]
    assert scores
    for cut in LM_BUCKET_CUTOFFS:
        assert min(abs(s - cut) for s in scores) > 1e-6, cut


def test_zero_token_docs_survive_scoring_and_bucketing(spark):
    """Empty / whitespace-only docs appear in the output (n_tokens=0,
    NULL score) and land in the worst bucket — never silently dropped
    (r5 advisory)."""
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "   "), (4, "alpha zzz")],
        ["doc_id", "text"])
    scored = unigram_logprob(df, "doc_id", "text")
    rows = {r["doc_id"]: r for r in scored.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2]["n_tokens"] == 0 and rows[2]["mean_logprob"] is None
    assert rows[3]["n_tokens"] == 0 and rows[3]["mean_logprob"] is None
    b = {r["doc_id"]: r["bucket"] for r in
         perplexity_buckets(scored, n_buckets=2).collect()}
    assert b[2] == 1 and b[3] == 1  # worst bucket, concrete id


def test_bigram_logprob_matches_duckdb(spark, duck):
    """Interpolated bigram LM vs a full in-SQL refit: bigram and unigram
    tables trained on the same corpus, identical smoothing algebra —
    1e-9 relative tolerance (order-dependent double mean)."""
    from realtime_olap_spark.operators.lm_score import bigram_logprob

    d = Catalog(spark, SF_DIR).table("documents")
    got = {r["doc_id"]: (r["n_scored"], r["mean_logprob2"])
           for r in bigram_logprob(d, "doc_id", "text", lam=0.7).collect()}

    con = duck(SF_DIR)
    ws = (r"list_filter(string_split_regex(lower(text), '\s+'), "
          r"x -> x <> '')")
    rows = con.execute(f"""
WITH toks AS (SELECT doc_id, {ws} AS ws FROM documents),
uni AS (SELECT w, COUNT(*) AS n_occ FROM
        (SELECT unnest(ws) AS w FROM toks) GROUP BY w),
tot AS (SELECT CAST(SUM(n_occ) AS DOUBLE) AS nt FROM uni),
pairs AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
          FROM toks, UNNEST(range(1, len(ws))) AS u(i)),
big AS (SELECT w1, w2, COUNT(*) AS n_pair FROM pairs GROUP BY w1, w2),
scored AS (
  SELECT p.doc_id,
         ln(0.7 * (CAST(COALESCE(b.n_pair, 0) AS DOUBLE)
                   / CAST(COALESCE(c.n_occ, 1) AS DOUBLE))
            + 0.3 * (CAST(COALESCE(w.n_occ, 1) AS DOUBLE)
                     / (SELECT nt FROM tot))) AS lp
  FROM pairs p
  LEFT JOIN uni c ON c.w = p.w1
  LEFT JOIN uni w ON w.w = p.w2
  LEFT JOIN big b ON b.w1 = p.w1 AND b.w2 = p.w2)
SELECT doc_id, COUNT(*) AS n, AVG(lp) AS mlp FROM scored GROUP BY doc_id
""").fetchall()
    want = {r[0]: (r[1], r[2]) for r in rows}
    assert set(got) >= set(want)
    for did, (n, mlp) in want.items():
        gn, gm = got[did]
        assert gn == n, did
        assert abs(gm - mlp) <= 1e-9 * max(1.0, abs(mlp)), did
    # docs with < 2 tokens appear with zero scored pairs, NULL score
    for did, (gn, gm) in got.items():
        if did not in want:
            assert gn == 0 and gm is None


def test_bigram_backoff_behaviour(spark):
    """An unseen bigram of two seen words scores exactly the unigram
    interpolation term; a seen bigram scores strictly higher."""
    from realtime_olap_spark.operators.lm_score import (bigram_logprob,
                                                        train_bigram_freqs,
                                                        train_unigram_freqs)
    import math

    corpus = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "b a")], ["doc_id", "text"])
    uni = train_unigram_freqs(corpus, "text")
    big = train_bigram_freqs(corpus, "text")
    probe = spark.createDataFrame([(10, "a b"), (11, "b a")],
                                  ["doc_id", "text"])
    got = {r["doc_id"]: r["mean_logprob2"]
           for r in bigram_logprob(probe, "doc_id", "text", lam=0.7,
                                   unigram_freqs=uni,
                                   bigram_freqs=big).collect()}
    # corpus: 6 tokens (a:3, b:3); bigrams: (a,b):2, (b,a):1
    nt = 6.0
    p_ab = 0.7 * (2 / 3) + 0.3 * (3 / nt)
    p_ba = 0.7 * (1 / 3) + 0.3 * (3 / nt)
    assert abs(got[10] - math.log(p_ab)) < 1e-12
    assert abs(got[11] - math.log(p_ba)) < 1e-12
    assert got[10] > got[11]
