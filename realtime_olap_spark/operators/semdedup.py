"""SemDeDup-style semantic deduplication — cluster, pair, keep one.

SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", 2023 — public) removes *semantic*
duplicates: embeddings are k-means-clustered, cosine similarity is
computed only WITHIN a cluster, and every group of near-duplicates
keeps a single representative.

This module is a thin composition of machinery the engine already
ships, wired into the SemDeDup recipe:

- coarse cells from ``operators/clustering.kmeans_fit`` (or literal
  centroids supplied by an offline job),
- within-cell exact-cosine pairs from
  ``dedup.embedding_near_dup_pairs`` (equi-join on the cell — O(Σ c²)
  in cell sizes, never a corpus cross join; per-row norms precomputed),
- connected components + keep-min-id from ``operators/components``,
- the final keep is an anti-join of the (small) drop list against the
  corpus — broadcast by default, so the corpus itself never shuffles.

Scale: one scan to assign cells, one cell-keyed equi-join for pairs,
O(log n) CC rounds over pair-sized frames, one anti-join. Identical
shapes to the text MinHash pipeline, over vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_olap_spark.operators.clustering import kmeans_fit
from realtime_olap_spark.operators.components import duplicate_clusters
from realtime_olap_spark.operators.dedup import embedding_near_dup_pairs
from realtime_olap_spark.operators.similarity import ivf_assign


def semantic_dup_clusters(df: DataFrame, id_col: str, vec_col: str,
                          centroids: list[list[float]] | None = None,
                          k: int = 16, iters: int = 3,
                          threshold: float = 0.95) -> DataFrame:
    """``(node, component)`` for every embedding in a semantic near-dup
    group (cosine ≥ ``threshold`` to some chain of neighbors within its
    cell; component id = min member id). ``centroids`` defaults to a
    k-means fit on the corpus itself — pass a persisted codebook to make
    the blocking deterministic across runs/batches."""
    cents = centroids or kmeans_fit(df, vec_col, k, iters=iters,
                                    id_col=id_col)[0]
    cells = df.select(F.col(id_col), F.col(vec_col),
                      ivf_assign(F.col(vec_col), cents).alias("__cell"))
    pairs = embedding_near_dup_pairs(cells, id_col, vec_col, "__cell",
                                     threshold=threshold)
    return duplicate_clusters(pairs, "id_a", "id_b")


def semantic_dedup(df: DataFrame, id_col: str, vec_col: str,
                   centroids: list[list[float]] | None = None,
                   k: int = 16, iters: int = 3,
                   threshold: float = 0.95,
                   broadcast_drops: bool = True) -> DataFrame:
    """The SemDeDup keep: every semantic near-dup group keeps its
    min-id representative; all other members are anti-joined away. Rows
    outside any dup group pass through untouched. The drop list is
    near-dup-sized (small on real corpora) — broadcast by default."""
    clusters = semantic_dup_clusters(df, id_col, vec_col, centroids,
                                     k, iters, threshold)
    drops = (clusters.where(F.col("node") != F.col("component"))
             .select(F.col("node").alias(id_col)))
    if broadcast_drops:
        drops = F.broadcast(drops)
    return df.join(drops, id_col, "left_anti")
