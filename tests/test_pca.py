"""PCA / Frequent Directions: exact Gram vs numpy, projection twin +
Exchange-free plan, FD covariance bound + mergeability, fd_pca
direction recovery, shortlist-rerank recall, reconstruction identity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.operators.pca import (PCAModel, fd_merge, fd_pca,
                                               fd_sketch, gram_stats,
                                               pca_fit, pca_shortlist_topk,
                                               project,
                                               explained_variance_ratio,
                                               reconstruction_mse)

D = 20


def _lowrank(n=400, d=D, rank=3, noise=0.05, seed=11):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, rank)) * np.array([5.0, 3.0, 1.5])
    basis = np.linalg.qr(rng.normal(size=(d, rank)))[0].T
    return w @ basis + noise * rng.normal(size=(n, d))


@pytest.fixture(scope="module")
def xdf(spark):
    x = _lowrank()
    df = spark.createDataFrame([(i, row.tolist()) for i, row in enumerate(x)],
                               "id long, vec array<double>").repartition(5)
    return x, df


def test_gram_stats_exact(spark, xdf):
    x, df = xdf
    g, s, n = gram_stats(df, "vec", D)
    assert n == x.shape[0]
    assert np.allclose(g, x.T @ x, atol=1e-8)
    assert np.allclose(s, x.sum(axis=0), atol=1e-9)


def test_pca_fit_matches_numpy_twin(spark, xdf):
    x, df = xdf
    m = pca_fit(df, "vec", D, r=3)
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / x.shape[0]
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    want = vecs[:, order].T
    got = np.asarray(m.components)
    for i in range(3):  # same subspace, sign-fixed
        wi = want[i] if want[i][np.argmax(np.abs(want[i]))] > 0 else -want[i]
        assert np.allclose(got[i], wi, atol=1e-6), i
    assert np.allclose(m.explained_variance, vals[order], atol=1e-8)
    ratios = explained_variance_ratio(pca_fit(df, "vec", D, r=D))
    assert abs(sum(ratios) - 1.0) < 1e-9


def test_projection_twin_and_nulls(spark, xdf):
    x, df = xdf
    m = pca_fit(df, "vec", D, r=4)
    got = {r["id"]: r["proj"]
           for r in project(df, "vec", m).collect()}
    comps, mu = np.asarray(m.components), np.asarray(m.mean)
    for i, row in enumerate(x):
        assert np.allclose(got[i], (row - mu) @ comps.T, atol=1e-9)
    bad = spark.createDataFrame(
        [(0, None), (1, [1.0, 2.0])], "id long, vec array<double>")
    vals = {r["id"]: r["proj"] for r in project(bad, "vec", m).collect()}
    assert vals[0] is None and vals[1] is None


def test_projection_plan_is_exchange_free(spark, xdf):
    x, df = xdf
    m = pca_fit(df, "vec", D, r=4)
    flat = spark.createDataFrame(  # fixture df carries its own
        [(0, x[0].tolist())], "id long, vec array<double>")  # repartition
    plan = (project(flat, "vec", m)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


def test_fd_bound_and_distributed_merge(spark, xdf):
    x, df = xdf
    ell = 10
    b = fd_sketch(df, "vec", D, ell)
    assert b.shape == (ell, D)
    err = np.linalg.norm(x.T @ x - b.T @ b, 2)
    for k in (3, 6):
        u, sv, vt = np.linalg.svd(x, full_matrices=False)
        tail = (sv[k:] ** 2).sum()  # ||A - A_k||_F^2
        assert err <= tail / (ell - k) + 1e-6, k


def test_fd_merge_law_bound(spark):
    rng = np.random.default_rng(3)
    a, b = _lowrank(seed=1), _lowrank(seed=2)
    ell, k = 10, 5

    def sketch_local(x):
        s = np.zeros((ell, D))
        for row in x:
            s = fd_merge(s, np.vstack([row[None, :],
                                       np.zeros((ell - 1, D))]))
        return s

    # merge of two per-half sketches still satisfies the bound on the
    # CONCATENATED matrix
    merged = fd_merge(sketch_local(a), sketch_local(b))
    x = np.vstack([a, b])
    err = np.linalg.norm(x.T @ x - merged.T @ merged, 2)
    sv = np.linalg.svd(x, compute_uv=False)
    assert err <= (sv[k:] ** 2).sum() / (ell - k) + 1e-6
    with pytest.raises(ValueError):
        fd_merge(np.zeros((4, D)), np.zeros((5, D)))


def test_fd_pca_recovers_top_direction(spark, xdf):
    x, df = xdf
    m = fd_pca(fd_sketch(df, "vec", D, ell=12), r=2)
    # compare against the exact top uncentered direction
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    cos = abs(np.dot(m.components[0], vt[0]))
    assert cos > 0.98


def test_shortlist_rerank_recall_and_exactness(spark, xdf):
    x, df = xdf
    from realtime_olap_spark.operators.similarity import cosine_topk
    m = pca_fit(df, "vec", D, r=3)
    q = x[7] + 0.01  # a near-corpus query
    brute = [r["id"] for r in
             cosine_topk(df, q.tolist(), "id", "vec", 10).collect()]
    # full shortlist == brute exactly
    full = [r["id"] for r in pca_shortlist_topk(
        df, q.tolist(), m, "id", "vec", 10, shortlist=x.shape[0]).collect()]
    assert full == brute
    # modest shortlist keeps high recall on low-rank data
    short = [r["id"] for r in pca_shortlist_topk(
        df, q.tolist(), m, "id", "vec", 10, shortlist=60).collect()]
    assert len(set(short) & set(brute)) >= 9


def test_reconstruction_identity_and_json(spark, xdf):
    x, df = xdf
    full = pca_fit(df, "vec", D, r=D)
    m3 = pca_fit(df, "vec", D, r=3)
    mse = reconstruction_mse(df, "vec", m3)
    dropped = sum(full.explained_variance) - sum(m3.explained_variance)
    assert abs(mse - dropped) < 1e-8
    assert PCAModel.from_json(m3.to_json()) == m3


def test_whitened_projection_unit_variance(spark, xdf):
    x, df = xdf
    m = pca_fit(df, "vec", D, r=3)
    rows = project(df, "vec", m, whiten=True).collect()
    p = np.asarray([r["proj"] for r in rows])
    # each whitened coordinate has ~unit variance (exactly 1 up to the
    # fit's own float error, since the fit and the data coincide)
    assert np.allclose(p.var(axis=0), 1.0, atol=1e-6)
    # and whitening is exactly a per-coordinate rescale of the plain
    # projection by 1/sqrt(eigenvalue)
    plain = np.asarray([r["proj"] for r in
                        project(df, "vec", m).collect()])
    scale = 1.0 / np.sqrt(np.asarray(m.explained_variance))
    assert np.allclose(p, plain * scale, atol=1e-9)


def test_suggest_rank(spark, xdf):
    from realtime_olap_spark.operators.pca import suggest_rank
    _, df = xdf
    full = pca_fit(df, "vec", D, r=D)
    # the fixture corpus is rank-3 + small noise: 3 components carry
    # ~all variance
    assert suggest_rank(full, 0.95) == 3
    assert suggest_rank(full, 1.0) == D
    r9 = suggest_rank(full, 0.9)
    assert 1 <= r9 <= 3
    with pytest.raises(ValueError):
        suggest_rank(full, 0.0)


def test_gram_stats_merge_refit_equals_scratch(spark):
    from realtime_olap_spark.operators.pca import (GramStats,
                                                   collect_gram_stats,
                                                   pca_from_stats)
    a, b = _lowrank(seed=21), _lowrank(seed=22)
    da = spark.createDataFrame([(r.tolist(),) for r in a],
                               "vec array<double>")
    db = spark.createDataFrame([(r.tolist(),) for r in b],
                               "vec array<double>")
    merged = collect_gram_stats(da, "vec", D).merge(
        collect_gram_stats(db, "vec", D))
    scratch = pca_fit(da.unionAll(db), "vec", D, r=3)
    refit = pca_from_stats(merged, r=3)
    assert merged.n == 2 * a.shape[0]
    assert np.allclose(refit.components, scratch.components, atol=1e-9)
    assert np.allclose(refit.mean, scratch.mean, atol=1e-12)
    assert np.allclose(refit.explained_variance,
                       scratch.explained_variance, atol=1e-9)
    assert GramStats.from_json(merged.to_json()) == merged
    with pytest.raises(ValueError):
        merged.merge(GramStats((0.0,), (0.0,), 1))


def test_gram_stats_streaming_fold_equals_batch(spark, tmpdir):
    """Per-microbatch sufficient statistics folded in foreachBatch refit
    to the same model as one batch fit — PCA's consuming->immutable
    path, like the Bloom/CMS/theta per-batch merges."""
    import pyspark.sql.types as T
    from realtime_olap_spark.operators.pca import (collect_gram_stats,
                                                   pca_from_stats)
    src, ckpt = f"{tmpdir}/src", f"{tmpdir}/ckpt"
    x = _lowrank(n=300, seed=31)
    df = spark.createDataFrame([(r.tolist(),) for r in x],
                               "vec array<double>")
    df.repartition(3).write.mode("overwrite").parquet(src)
    schema = T.StructType([T.StructField("vec",
                                         T.ArrayType(T.DoubleType()))])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    folded = []

    def fold(batch_df, _bid):
        folded.append(collect_gram_stats(batch_df, "vec", D))

    q = (stream.writeStream.foreachBatch(fold)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert len(folded) >= 2
    acc = folded[0]
    for st in folded[1:]:
        acc = acc.merge(st)
    got = pca_from_stats(acc, r=3)
    want = pca_fit(spark.read.schema(schema).parquet(src), "vec", D, r=3)
    assert np.allclose(got.components, want.components, atol=1e-8)
    assert got.n_rows == want.n_rows == 300
