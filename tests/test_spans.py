"""Exact-substring span dedup — python content twin (no hashing: exact
window strings), removal semantics, coverage algebra, and the
corpus-never-shuffled plan shape."""

from __future__ import annotations

import re
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.spans import (covered_token_count,
                                                 duplicated_window_positions,
                                                 remove_duplicated_spans,
                                                 span_dup_stats)
from tests.conftest import SF_DIR

K = 8


def _docs(spark):
    return (Catalog(spark, SF_DIR).table("documents")
            .select("doc_id", "text"))


def _py_words(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w != ""]


def _py_marks(corpus: dict[int, str], k: int, keep: str) -> dict[int, list[int]]:
    """Content-exact twin: duplicated k-token windows by their STRINGS
    (stronger than the operator's hashes — a mismatch would surface a
    collision or an algebra bug)."""
    occ = defaultdict(list)
    for did in sorted(corpus):
        ws = _py_words(corpus[did])
        for p in range(len(ws) - k + 1):
            occ[" ".join(ws[p:p + k])].append((did, p))
    marks = defaultdict(list)
    for sites in occ.values():
        if len(sites) < 2:
            continue
        survivors = sites if keep == "none" else sorted(sites)[1:]
        for did, p in survivors:
            marks[did].append(p)
    return {d: sorted(ps) for d, ps in marks.items()}


@pytest.fixture(scope="module")
def corpus(spark):
    return {r["doc_id"]: r["text"]
            for r in _docs(spark).orderBy("doc_id").limit(400).collect()}


def _df(spark, corpus):
    return spark.createDataFrame(sorted(corpus.items()),
                                 ["doc_id", "text"])


def test_marks_match_content_twin(spark, corpus):
    df = _df(spark, corpus)
    for keep in ("first", "none"):
        got = {r["doc_id"]: list(r["dup_pos"])
               for r in duplicated_window_positions(df, "doc_id", "text",
                                                    K, keep=keep).collect()}
        assert got == _py_marks(corpus, K, keep)


def test_stats_match_content_twin(spark, corpus):
    df = _df(spark, corpus)
    marks = _py_marks(corpus, K, "none")
    got = {r["doc_id"]: r
           for r in span_dup_stats(df, "doc_id", "text", K).collect()}
    assert set(got) == set(corpus)  # every doc appears
    for did, text in corpus.items():
        ws = _py_words(text)
        covered = set()
        for p in marks.get(did, []):
            covered.update(range(p, p + K))
        r = got[did]
        assert r["n_tokens"] == len(ws)
        assert r["n_windows"] == max(len(ws) - K + 1, 0)
        assert r["n_dup_windows"] == len(marks.get(did, []))
        assert r["dup_tokens"] == len(covered)
        want_frac = len(covered) / len(ws) if ws else 0.0
        assert abs(r["dup_token_frac"] - want_frac) < 1e-12


def test_removal_matches_content_twin(spark, corpus):
    df = _df(spark, corpus)
    marks = _py_marks(corpus, K, "first")
    got = {r["doc_id"]: r["text"]
           for r in remove_duplicated_spans(df, "doc_id", "text",
                                            K).collect()}
    for did, text in corpus.items():
        ws = _py_words(text)
        covered = set()
        for p in marks.get(did, []):
            covered.update(range(p, p + K))
        want = " ".join(w for i, w in enumerate(ws) if i not in covered)
        assert got[did] == want, did


def test_canonical_occurrence_survives(spark):
    """Two identical docs: the first keeps its text, the second loses
    the duplicated run entirely."""
    span = " ".join(f"w{i}" for i in range(K))
    df = spark.createDataFrame(
        [(1, span), (2, span), (3, "unique words only here")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["text"]
           for r in remove_duplicated_spans(df, "doc_id", "text",
                                            K).collect()}
    assert out[1] == span
    assert out[2] == ""
    assert out[3] == "unique words only here"


def test_covered_token_count_interval_union(spark):
    """Overlapping windows count union, not sum: starts [0, 2] at k=4
    cover tokens 0..5 → 6, not 8."""
    df = (spark.createDataFrame([([0, 2],), ([0, 10],), ([],)], ["ps"])
          .select(F.col("ps").cast("array<int>").alias("ps")))
    got = [r["c"] for r in
           df.select(covered_token_count(F.col("ps"), 4).alias("c"))
             .collect()]
    assert got == [6, 8, 0]


def test_short_docs_have_no_windows(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           span_dup_stats(df, "doc_id", "text", K).collect()}
    assert out[1]["n_windows"] == 0 and out[1]["dup_tokens"] == 0
    assert out[2]["n_tokens"] == 0 and out[2]["dup_token_frac"] == 0.0


def test_corpus_side_plan_never_shuffles_docs(spark, corpus):
    """The only Exchange below the final join is over the (hash,id,pos)
    tuples; the docs scan feeding the rebuild is Exchange-free when the
    marks side broadcasts. The default leaves the strategy to AQE (size-
    aware — pervasive duplication makes marks corpus-sized), so the
    static broadcast shape is asserted on the forced path and the AQE
    conversion on the executed default."""
    df = _df(spark, corpus)
    forced = (remove_duplicated_spans(df, "doc_id", "text", K,
                                      broadcast_marks=True)
              ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in forced
    assert "BatchEvalPython" not in forced and \
        "ArrowEvalPython" not in forced
    out = remove_duplicated_spans(df, "doc_id", "text", K)
    out.collect()  # materialize so AQE finalizes the plan
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "BroadcastHashJoin" in final  # tiny marks -> AQE broadcasts


def test_incremental_marks_equal_symmetric_keep_first(spark, corpus, tmp_path):
    """Ingestion shape: materialize the corpus window table once, probe
    it with a new batch — the batch's marks must equal the symmetric
    keep-first marks over (corpus ∪ batch) restricted to batch docs
    (corpus ids sort first, so corpus occurrences are canonical)."""
    from realtime_olap_spark.operators.spans import (
        duplicated_positions_against, window_table)

    ids = sorted(corpus)
    split = ids[len(ids) // 2]
    first = {d: t for d, t in corpus.items() if d < split}
    second = {d: t for d, t in corpus.items() if d >= split}
    df_first, df_second = _df(spark, first), _df(spark, second)

    path = str(tmp_path / "windows")
    window_table(df_first, "doc_id", "text", K).write.parquet(path)
    inc = {r["doc_id"]: list(r["dup_pos"])
           for r in duplicated_positions_against(
               df_second, spark.read.parquet(path),
               "doc_id", "text", K).collect()}

    full = _py_marks(corpus, K, "first")
    want = {d: ps for d, ps in full.items() if d >= split}
    assert inc == want
    assert inc  # the probe really fired on this corpus
