"""Benchmark decontamination — DuckDB differential on the real corpus (a
benchmark built from actual document texts guarantees overlap) plus the
plan property that makes it scale: benchmark broadcast, corpus never
shuffled before the join."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.decontam import (contamination_hits,
                                                    benchmark_gram_hashes,
                                                    decontaminate)
from tests.conftest import SF_DIR, assert_matches_oracle

# DuckDB n-gram twin (see test_text_ops.py)
_WS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '')"
_NTOK = f"len({_WS})"


def _duck_ngrams(n: int) -> str:
    parts = ", ".join(f"{_WS}[i + {j}]" for j in range(n))
    return (f"list_transform(generate_series(1, greatest({_NTOK} - {n - 1}, 0)), "
            f"i -> concat_ws(' ', {parts}))")


def _bench_fixture(spark, duck_con):
    """Benchmark = 5 real document texts (overlap guaranteed) + 2 rows of
    vocabulary that does not occur in the corpus."""
    d = Catalog(spark, SF_DIR).table("documents")
    real = [r["text"] for r in
            d.orderBy("doc_id").limit(5).select("text").collect()]
    fake = ["zzq wvx qqj pzk mmv nnw", "grault garply waldo fred plugh"]
    rows = [(i, t) for i, t in enumerate(real + fake)]
    sdf = spark.createDataFrame(rows, ["bench_id", "text"])
    duck_con.register("bench", pd.DataFrame(rows, columns=["bench_id", "text"]))
    return sdf


def test_contamination_hits_match_duckdb(spark, duck):
    con = duck(SF_DIR)
    bench = _bench_fixture(spark, con)
    d = Catalog(spark, SF_DIR).table("documents")
    out = contamination_hits(d, benchmark_gram_hashes(bench, "text", 3),
                             "doc_id", "text", 3)
    g = _duck_ngrams(3)
    assert_matches_oracle(out, con, f"""
        WITH bg AS (SELECT DISTINCT unnest({g}) AS gram FROM bench),
        dg AS (SELECT DISTINCT doc_id, unnest(list_distinct({g})) AS gram
               FROM documents)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM dg JOIN bg USING (gram)
        GROUP BY doc_id
        """, name="contamination_hits")


def test_decontaminate_partitions_corpus(spark, duck):
    """clean + dirty partition the corpus exactly; dirty ⊇ the 5 seeded
    documents (a doc IS its own benchmark item); clean docs share no
    3-gram with the benchmark (checked via the DuckDB twin)."""
    con = duck(SF_DIR)
    bench = _bench_fixture(spark, con)
    d = Catalog(spark, SF_DIR).table("documents")
    clean = decontaminate(d, bench, "doc_id", "text", n=3)
    dirty = decontaminate(d, bench, "doc_id", "text", n=3, keep="dirty")
    n_total = d.count()
    clean_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    dirty_ids = {r["doc_id"] for r in dirty.select("doc_id").collect()}
    assert len(clean_ids) + len(dirty_ids) == n_total
    assert not clean_ids & dirty_ids
    seeded = {r["doc_id"] for r in
              d.orderBy("doc_id").limit(5).select("doc_id").collect()}
    assert seeded <= dirty_ids
    g = _duck_ngrams(3)
    # set-based anti-join, NOT a correlated list_contains probe: the
    # correlated NOT EXISTS formulation ran the gram scan per (doc,
    # benchmark-gram) pair — 254 s of the test suite's wall-clock for a
    # 500-doc corpus (r6 finding); this is equivalent and ~300× faster
    overlap_free = con.execute(f"""
        WITH bg AS (SELECT DISTINCT unnest({g}) AS gram FROM bench),
        dirty AS (SELECT DISTINCT doc_id
                  FROM (SELECT doc_id, unnest({g}) AS gram FROM documents)
                  JOIN bg USING (gram))
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
        """).df()
    assert clean_ids == set(overlap_free["doc_id"])


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark side must broadcast — the corpus is never exchanged
    to meet it (the property that keeps decontamination scan-side at
    100 TB)."""
    d = Catalog(spark, SF_DIR).table("documents")
    bench = d.limit(5).select(F.col("text"))
    out = contamination_hits(d, benchmark_gram_hashes(bench, "text", 3),
                             "doc_id", "text", 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # min_hits routing sanity
    flagged = decontaminate(d, bench, "doc_id", "text", n=3,
                            min_hits=10**9, keep="dirty")
    assert flagged.count() == 0


def test_remove_contaminated_spans_surgical(spark):
    """Span-level decontamination: only the tokens inside benchmark-
    matching n-gram windows are cut; clean docs keep every token; every
    doc survives. Checked against a python content twin."""
    import re
    from realtime_olap_spark.operators.decontam import \
        remove_contaminated_spans

    n = 3
    corpus = {
        1: "alpha beta gamma delta epsilon zeta",   # head contaminated
        2: "one two three four five six seven",     # clean
        3: "x alpha beta gamma y z q",              # middle contaminated
        4: "alpha beta",                            # too short to match
    }
    docs = spark.createDataFrame(sorted(corpus.items()),
                                 ["doc_id", "text"])
    bench = spark.createDataFrame(
        [("the eval asks about alpha beta gamma here",)], ["text"])
    got = {r["doc_id"]: r["text"]
           for r in remove_contaminated_spans(docs, bench, "doc_id",
                                              "text", n=n).collect()}

    bench_grams = set()
    bws = [w for w in re.split(r"\s+",
                               "the eval asks about alpha beta gamma here"
                               .lower()) if w]
    for p in range(len(bws) - n + 1):
        bench_grams.add(" ".join(bws[p:p + n]))
    for did, text in corpus.items():
        ws = [w for w in re.split(r"\s+", text.lower()) if w]
        covered = set()
        for p in range(len(ws) - n + 1):
            if " ".join(ws[p:p + n]) in bench_grams:
                covered.update(range(p, p + n))
        want = " ".join(w for i, w in enumerate(ws) if i not in covered)
        assert got[did] == want, did
    assert set(got) == set(corpus)
    assert got[2] == corpus[2]            # clean doc untouched
    assert "alpha" not in got[1] and "zeta" in got[1]
    assert got[4] == corpus[4]            # sub-n doc has no windows


def test_remove_contaminated_spans_on_corpus(spark):
    """On the real corpus with its self-benchmark: surgical removal
    keeps every doc, shrinks exactly the flagged ones, and removes
    every flagged window."""
    from realtime_olap_spark.operators.decontam import (
        benchmark_gram_hashes, contamination_hits,
        remove_contaminated_spans)

    d = (Catalog(spark, SF_DIR).table("documents")
         .select("doc_id", "text"))
    bench = d.orderBy("doc_id").limit(3).select("text")
    out = remove_contaminated_spans(d, bench, "doc_id", "text", n=3)
    assert out.count() == d.count()
    flagged = {r["doc_id"] for r in contamination_hits(
        d, benchmark_gram_hashes(bench, "text", 3),
        "doc_id", "text", 3).collect()}
    assert flagged
    # re-scanning the REBUILT corpus finds no remaining benchmark grams
    left = contamination_hits(out, benchmark_gram_hashes(bench, "text", 3),
                              "doc_id", "text", 3).count()
    assert left == 0
