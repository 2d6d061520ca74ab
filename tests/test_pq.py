"""Product quantization — codebook training, numpy-twin encoding, ADC
scoring algebra, recall vs the full-precision ranking, and the
probe-time plan shape (code-only scan, no Python, TakeOrdered)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.pq import (pq_encode, pq_scores, pq_topk,
                                              pq_topk_rerank, pq_train)
from realtime_olap_spark.operators.similarity import cosine_topk
from tests.conftest import SF_DIR


def _emb(spark):
    return Catalog(spark, SF_DIR).table("embeddings")


@pytest.fixture(scope="module")
def books(spark):
    """One trained codebook set per module: m=8 subspaces of 8 dims,
    16 centroids each — 8 bytes per 64-dim vector (32× compression),
    trained once (~20 s) and shared across the algebra/recall tests."""
    return pq_train(_emb(spark), "embedding", m=8, ksub=16, iters=3)


def _py_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _py_encode(vec, books):
    """Driver twin of pq_encode with the SAME float algebra and order:
    aa − 2·(sequential-fold dot) + (python-sum c·c), first-min argmin."""
    m, dsub = len(books), len(books[0][0])
    codes = []
    for i in range(m):
        sub = vec[i * dsub:(i + 1) * dsub]
        aa = _py_dot(sub, sub)
        dists = [aa - 2.0 * _py_dot(sub, c) + sum(x * x for x in c)
                 for c in books[i]]
        codes.append(dists.index(min(dists)))
    return codes


def test_codebook_shapes(books):
    assert len(books) == 8
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)


def test_encode_matches_python_twin(spark, books):
    rows = (pq_encode(_emb(spark), "embedding", books)
            .orderBy("vec_id").limit(80).collect())
    for r in rows:
        assert list(r["pq_codes"]) == _py_encode(r["embedding"], books), \
            r["vec_id"]


def test_adc_dot_matches_python_lut(spark, books):
    df = pq_encode(_emb(spark), "embedding", books)
    query = [float(x) for x in df.orderBy("vec_id").first()["embedding"]]
    got = (df.select("vec_id", "embedding",
                     pq_scores(F.col("pq_codes"), query, books, "dot")
                     .alias("s"))
             .orderBy("vec_id").limit(60).collect())
    m, dsub = len(books), len(books[0][0])
    for r in got:
        codes = _py_encode(r["embedding"], books)
        want = 0.0
        for i in range(m):
            c = books[i][codes[i]]
            q = query[i * dsub:(i + 1) * dsub]
            want = want + _py_dot(q, c)
        assert abs(r["s"] - want) <= 1e-9 * max(1.0, abs(want))


def test_adc_l2_is_exact_to_reconstruction(spark, books):
    """l2 metric = ‖q − reconstruction‖² up to the fixed-order algebra."""
    df = pq_encode(_emb(spark), "embedding", books)
    query = [float(x) for x in df.orderBy("vec_id").first()["embedding"]]
    got = (df.select("embedding",
                     pq_scores(F.col("pq_codes"), query, books, "l2")
                     .alias("s"))
             .orderBy("vec_id").limit(30).collect())
    m, dsub = len(books), len(books[0][0])
    for r in got:
        codes = _py_encode(r["embedding"], books)
        recon = [x for i in range(m) for x in books[i][codes[i]]]
        want = sum((float(q) - float(c)) ** 2 for q, c in zip(query, recon))
        assert abs(r["s"] - want) <= 1e-6 * max(1.0, abs(want))


def test_recall_vs_full_precision(spark, books):
    """The two-stage probe (ADC shortlist → exact re-rank) must recover
    most of the exact top-10; the raw ADC shortlist must already contain
    them. Floors are conservative vs measured recall (8/10 and 8/10 at
    m=8, ksub=16 on this corpus)."""
    df = _emb(spark)
    query = [float(x) for x in df.orderBy("vec_id").first()["embedding"]]
    exact = {r["vec_id"]
             for r in cosine_topk(df, query, "vec_id", "embedding",
                                  10).collect()}
    enc = pq_encode(df, "embedding", books)
    shortlist = {r["vec_id"]
                 for r in pq_topk(enc, query, books, 100).collect()}
    reranked = {r["vec_id"]
                for r in pq_topk_rerank(enc, query, books, 10,
                                        shortlist=100).collect()}
    assert len(exact & shortlist) >= 6
    assert len(exact & reranked) >= 6
    # the re-rank is exact on the shortlist: its scores order like the
    # full-precision ranking restricted to candidates
    assert reranked <= shortlist


def test_probe_plan_reads_codes_only(spark, books, tmp_path):
    """After the index is written, the probe scan reads (id, codes) —
    the float vector column is pruned — and stays JVM-side with a
    TakeOrderedAndProject top-k."""
    path = str(tmp_path / "pq_index")
    (pq_encode(_emb(spark), "embedding", books)
     .select("vec_id", "pq_codes").write.mode("overwrite").parquet(path))
    df = spark.read.parquet(path)
    query = [1.0] * 64
    plan = pq_topk(df, query, books, 5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "embedding" not in plan


def test_ivfpq_index_probe(spark, books, tmp_path):
    """IVF-PQ composition: the indexed probe equals running the same
    two-stage ADC+re-rank restricted to the probed cells, the partition
    filter actually prunes (PartitionFilters over `cell`), and recall
    stays near the cells' exact restriction."""
    from realtime_olap_spark.operators.pq import (ivfpq_index_write,
                                                  ivfpq_topk)
    from realtime_olap_spark.operators.similarity import (_nearest_centroids,
                                                          ivf_assign)
    from realtime_olap_spark.suite.similarity import CENTROIDS

    df = _emb(spark)
    path = str(tmp_path / "ivfpq")
    ivfpq_index_write(df, path, CENTROIDS, books)
    query = [float(x) for x in df.orderBy("vec_id").first()["embedding"]]

    got = ivfpq_topk(spark, path, query, CENTROIDS, books,
                     k=10, nprobe=2, shortlist=50)
    rows = got.collect()
    assert len(rows) == 10

    # twin: same shortlist+rerank over an in-memory cell restriction
    probes = _nearest_centroids(query, CENTROIDS, 2)
    cells = pq_encode(df, "embedding", books).where(
        ivf_assign(F.col("embedding"), CENTROIDS).isin(probes))
    want = pq_topk_rerank(cells, query, books, 10, shortlist=50).collect()
    assert [(r["vec_id"], round(r["score"], 9)) for r in rows] == \
        [(r["vec_id"], round(r["score"], 9)) for r in want]

    # the probe is partition-pruned and exact-vector-free until re-rank
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan


def test_ivfpq_incremental_append_equals_rebuild(spark, books, tmp_path):
    """r6 directive #7: appending a new batch against the EXISTING
    centroids+codebooks (no retrain, no corpus read) gives a probe
    identical to a full rebuild of old ∪ new, and never rewrites the
    existing index files — the consuming→immutable segment analog for
    the vector index."""
    import os

    from realtime_olap_spark.operators.pq import (ivfpq_index_append,
                                                  ivfpq_index_write,
                                                  ivfpq_topk)
    from realtime_olap_spark.suite.similarity import CENTROIDS

    df = _emb(spark)
    n = df.count()
    base = df.where(F.col("vec_id") % 5 != 0)      # ~80% initial corpus
    batch = df.where(F.col("vec_id") % 5 == 0)     # the new ingest batch

    inc_path = str(tmp_path / "inc")
    ivfpq_index_write(base, inc_path, CENTROIDS, books)
    before = {os.path.join(r, f) for r, _, fs in os.walk(inc_path)
              for f in fs if f.endswith(".parquet")}
    ivfpq_index_append(batch, inc_path, CENTROIDS, books)
    after = {os.path.join(r, f) for r, _, fs in os.walk(inc_path)
             for f in fs if f.endswith(".parquet")}
    assert before <= after                 # old files untouched
    assert len(after) > len(before)        # batch files landed
    assert spark.read.parquet(inc_path).count() == n

    full_path = str(tmp_path / "full")
    ivfpq_index_write(df, full_path, CENTROIDS, books)

    for probe_row in df.orderBy("vec_id").limit(3).collect():
        query = [float(x) for x in probe_row["embedding"]]
        got = ivfpq_topk(spark, inc_path, query, CENTROIDS, books,
                         k=10, nprobe=2, shortlist=50).collect()
        want = ivfpq_topk(spark, full_path, query, CENTROIDS, books,
                          k=10, nprobe=2, shortlist=50).collect()
        assert [(r["vec_id"], round(r["score"], 9)) for r in got] == \
            [(r["vec_id"], round(r["score"], 9)) for r in want]


def test_joint_training_equals_per_subspace(spark):
    """pq_train's one-scan-per-iteration joint trainer must reproduce
    the per-subspace kmeans_fit codebooks (same seeds, same update
    algebra; tolerance covers aggregation-order float noise)."""
    from realtime_olap_spark.operators.clustering import kmeans_fit
    from realtime_olap_spark.operators.pq import _subvec

    df = _emb(spark)
    joint = pq_train(df, "embedding", m=2, ksub=4, iters=2)
    for i in range(2):
        sub = df.select("vec_id",
                        _subvec(F.col("embedding"), i, 32).alias("sub"))
        sep, _ = kmeans_fit(sub, "sub", 4, iters=2, id_col="vec_id")
        for cj, cs in zip(joint[i], sep):
            assert all(abs(a - b) <= 1e-9 * max(1.0, abs(b))
                       for a, b in zip(cj, cs))


def test_suggest_cells_sqrt_rule():
    from realtime_olap_spark.operators.pq import suggest_cells
    assert suggest_cells(0) == 8
    assert suggest_cells(2_000) == 32       # sqrt(2000) ~ 45 -> 32
    assert suggest_cells(2_000_000) == 1024  # sqrt(2M) ~ 1414 -> 1024
    assert suggest_cells(10**12) == 65536    # clamped
    # monotone non-decreasing over decades
    vals = [suggest_cells(10**e) for e in range(0, 13)]
    assert vals == sorted(vals)
