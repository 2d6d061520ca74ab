"""Distributed k-means trainer — Lloyd's invariants + recovery of
well-separated synthetic clusters + agreement with a numpy reference
running the identical algorithm from the identical seeds."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.clustering import (assign_with_distance,
                                                      kmeans_fit, kmeans_init,
                                                      kmeans_sse)
from realtime_olap_spark.operators.similarity import ivf_assign
from tests.conftest import SF_DIR


def _emb(spark):
    return Catalog(spark, SF_DIR).table("embeddings")


def test_sse_history_is_non_increasing(spark):
    cents, hist = kmeans_fit(_emb(spark), "embedding", k=4, iters=4)
    assert len(hist) == 4
    assert all(hist[i + 1] <= hist[i] * (1 + 1e-9) for i in range(3)), hist
    assert len(cents) == 4 and len(cents[0]) == 64


def test_final_centroids_not_worse_than_init(spark):
    df = _emb(spark)
    init = kmeans_init(df, "embedding", k=4)
    cents, _ = kmeans_fit(df, "embedding", k=4, iters=3, init=init)
    assert kmeans_sse(df, "embedding", cents) <= \
        kmeans_sse(df, "embedding", init) * (1 + 1e-9)


def _numpy_lloyd(X, init, iters):
    cents = np.array(init, dtype=np.float64)
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cell = d2.argmin(axis=1)
        new = []
        for i in range(len(cents)):
            m = cell == i
            new.append(X[m].mean(axis=0) if m.any() else cents[i])
        cents = np.array(new)
    return cents, cell


def test_recovers_separated_clusters(spark):
    rng = np.random.RandomState(7)
    centers = np.array([[0.0] * 8, [50.0] * 8, [-50.0, 50.0] * 4])
    X = np.vstack([c + rng.randn(40, 8) for c in centers])
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    init = [[float(x) for x in X[j]] for j in (0, 40, 80)]  # one per blob
    cents, hist = kmeans_fit(df, "embedding", k=3, iters=4, init=init)
    got = [r["cell"] for r in
           df.select(ivf_assign(F.col("embedding"), cents).alias("cell"))
             .orderBy("vec_id").collect()]
    # every blob lands in exactly one cell
    for b in range(3):
        assert len(set(got[b * 40:(b + 1) * 40])) == 1
    assert len(set(got[::40])) == 3
    # centroids sit on the true centers
    for c, true in zip(cents, centers):
        assert np.abs(np.array(c) - true).max() < 1.0


def test_matches_numpy_reference_assignments(spark):
    """Same init, same iteration count → same final ASSIGNMENTS as the
    numpy twin (float sums may differ in last-bit order, so compare the
    discrete structure, not raw floats)."""
    df = _emb(spark).limit(200)
    X = np.array([[float(x) for x in r["embedding"]]
                  for r in df.orderBy("vec_id").collect()], dtype=np.float64)
    init = kmeans_init(df, "embedding", k=3)
    cents, _ = kmeans_fit(df, "embedding", k=3, iters=3, init=init)
    ref_cents, _ = _numpy_lloyd(X, init, iters=3)
    d2 = ((X[:, None, :] - np.array(cents)[None, :, :]) ** 2).sum(axis=2)
    ref_d2 = ((X[:, None, :] - ref_cents[None, :, :]) ** 2).sum(axis=2)
    assert (d2.argmin(axis=1) == ref_d2.argmin(axis=1)).mean() > 0.99


def test_assignment_is_single_fold_family(spark):
    """The per-iteration scan evaluates exactly K+1 folds per row (one a·a
    + K a·c against literal centroids): cell and d2 both read the SAME
    materialized distance array — not a second least(K folds) family (the
    r3→r5 2× defect), and the shared a·a is an alias, not a pasted subtree
    (higher-order folds are interpreted, so plan-level duplication is real
    per-row work, not codegen-CSE'd away)."""
    df = _emb(spark).limit(50)
    init = kmeans_init(df, "embedding", k=3)
    plan = (assign_with_distance(df, "embedding", init)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert plan.count("aggregate(") == len(init) + 1, plan[:2000]


def test_assignment_matches_ivf_assign(spark):
    """cell from the materialized array == similarity.ivf_assign (same
    shared-fold float order, same first-minimal tie-breaking) — the
    trainer and the probe side agree bit-for-bit."""
    df = _emb(spark).limit(100)
    init = kmeans_init(df, "embedding", k=4)
    got = assign_with_distance(df, "embedding", init).select(
        "embedding", "cell")
    ref = df.select("embedding",
                    ivf_assign(F.col("embedding"), init).alias("cell_ref"))
    joined = got.join(ref, "embedding")
    assert joined.where(F.col("cell") != F.col("cell_ref")).count() == 0


def test_init_requires_enough_rows(spark):
    df = _emb(spark).limit(2)
    with pytest.raises(ValueError, match="at least k"):
        kmeans_init(df, "embedding", k=5)
