"""SemDeDup composition — injected duplicates are removed keep-one,
clean rows pass through, determinism, and the corpus-side plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.semdedup import (semantic_dedup,
                                                    semantic_dup_clusters)
from tests.conftest import SF_DIR

TAU = 0.999  # exact copies score cosine 1.0; the base corpus is random


def _emb(spark):
    return (Catalog(spark, SF_DIR).table("embeddings")
            .select("vec_id", "embedding"))


@pytest.fixture(scope="module")
def with_dups(spark):
    """Base corpus + exact copies of 10 vectors under new ids (+100000):
    each copy must land in its original's cell (identical vector) and
    pair at cosine 1.0."""
    base = _emb(spark)
    dups = (base.orderBy("vec_id").limit(10)
            .select((F.col("vec_id") + 100000).alias("vec_id"),
                    "embedding"))
    return base.unionByName(dups), base


def test_exact_copies_removed_keep_original(spark, with_dups):
    corpus, base = with_dups
    n_base = base.count()
    out = semantic_dedup(corpus, "vec_id", "embedding", threshold=TAU)
    kept = {r["vec_id"] for r in out.select("vec_id").collect()}
    # every injected copy (id >= 100000) is dropped; its original kept
    assert all(i < 100000 for i in kept)
    orig = {r["vec_id"] for r in base.orderBy("vec_id").limit(10)
            .select("vec_id").collect()}
    assert orig <= kept
    # nothing else vanished unless the base corpus itself has τ-dups
    dropped_base = n_base - len(kept)
    assert 0 <= dropped_base <= 5  # random 64-dim corpus: ~none at τ=0.999


def test_dup_clusters_pair_copy_with_original(spark, with_dups):
    corpus, base = with_dups
    clusters = semantic_dup_clusters(corpus, "vec_id", "embedding",
                                     threshold=TAU)
    comp = {r["node"]: r["component"] for r in clusters.collect()}
    for r in base.orderBy("vec_id").limit(10).collect():
        i = r["vec_id"]
        assert comp.get(i + 100000) == comp.get(i) == min(
            c for n, c in comp.items() if n in (i, i + 100000))


def test_deterministic(spark, with_dups):
    corpus, _ = with_dups
    a = sorted(r["vec_id"] for r in
               semantic_dedup(corpus, "vec_id", "embedding",
                              threshold=TAU).collect())
    b = sorted(r["vec_id"] for r in
               semantic_dedup(corpus, "vec_id", "embedding",
                              threshold=TAU).collect())
    assert a == b


def test_literal_centroids_skip_training(spark, with_dups):
    """With persisted centroids the operator runs no k-means jobs and
    the keep anti-join broadcasts the drop list."""
    corpus, _ = with_dups
    cents = [[float(i == j) for j in range(64)] for i in range(4)]
    out = semantic_dedup(corpus, "vec_id", "embedding",
                         centroids=cents, threshold=TAU)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert out.count() > 0
