"""Distributed k-means (Lloyd's) — the trainer behind the IVF index.

`operators/similarity.py` probes against literal centroids "from an
offline sampling/KMeans job"; this module IS that job, as the canonical
Spark iterative pattern:

    per iteration:  assign = scan-side argmin fold against broadcast-
                    literal centroids (no UDF, no shuffle);
                    update  = ONE groupBy(cell) with d per-dimension
                    partial SUMs (map-side combine → k tiny rows to the
                    driver); empty cells keep their centroid.

At 100 TB each iteration is one scan + one k-row shuffle; centroids live
in the PLAN (literals), never in a join — the same contract as the probe
side. Iteration count is small and fixed (Lloyd's converges fast for the
coarse quantizer an IVF needs; this is not a general ML library).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_olap_spark.operators.dedup import dot
from realtime_olap_spark.operators.similarity import _lit_vec, _self_dot


def _dists_array(vec: str, aa: Column, cents: list[list[float]]) -> Column:
    """All K squared distances ``||v − c_k||²`` as ONE array column, in the
    shared-fold form ``a·a − 2·a·c + c·c`` (``aa`` is a pre-staged alias —
    passing the raw fold expression would paste its subtree into every
    array element, and higher-order-function folds are interpreted, not
    codegen-CSE'd; c·c is a driver-side literal): K+1 folds per row total.
    Alias the array once and reference the alias for both the argmin (cell)
    and the min (d2) — a multi-referenced non-cheap alias is NOT inlined by
    CollapseProject, so the plan carries exactly one fold family
    (plan-asserted in tests/test_clustering.py). Identical float order to
    ``similarity.ivf_assign``, so assignments agree with the probe side
    bit-for-bit."""
    return F.array(*[
        aa - F.lit(2.0) * dot(F.col(vec), _lit_vec(c)) + F.lit(_self_dot(c))
        for c in cents])


def assign_with_distance(df: DataFrame, vec_col: str,
                         cents: list[list[float]]) -> DataFrame:
    """``(vec_col, cell, d2)``: nearest-centroid index plus its squared
    distance, from ONE materialized K-distance array per row; cell and d2
    both read the alias — a single fold family per row (was two through
    r5: ivf_assign's array AND a least(K zip_with folds) for d2)."""
    return (df.select(F.col(vec_col),
                      dot(F.col(vec_col), F.col(vec_col)).alias("__aa"))
            .select(F.col(vec_col),
                    _dists_array(vec_col, F.col("__aa"), cents)
                    .alias("__dists"))
            .select(
                F.col(vec_col),
                (F.array_position(F.col("__dists"),
                                  F.array_min(F.col("__dists"))) - 1)
                .cast("int").alias("cell"),
                F.array_min(F.col("__dists")).alias("d2")))


def kmeans_init(df: DataFrame, vec_col: str, k: int,
                id_col: str = "vec_id") -> list[list[float]]:
    """Deterministic seeding: the k rows with the smallest xxhash64(id) —
    a stable pseudo-random sample independent of partitioning."""
    rows = (df.select(F.col(vec_col).alias("v"),
                      F.xxhash64(F.col(id_col)).alias("h"))
              .orderBy("h").limit(k).collect())
    if len(rows) < k:
        raise ValueError(f"need at least k={k} rows, got {len(rows)}")
    return [[float(x) for x in r["v"]] for r in rows]


def kmeans_fit(df: DataFrame, vec_col: str, k: int, iters: int = 5,
               id_col: str = "vec_id",
               init: list[list[float]] | None = None
               ) -> tuple[list[list[float]], list[float]]:
    """Lloyd's iterations; returns (centroids, per-iteration SSE history).
    SSE is measured against the centroids BEFORE each update, so the
    history is non-increasing (the Lloyd's invariant the test pins)."""
    cents = init or kmeans_init(df, vec_col, k, id_col)
    d = len(cents[0])
    dim_sums = [F.sum(F.element_at(F.col(vec_col), j + 1)).alias(f"s{j}")
                for j in range(d)]
    history: list[float] = []
    for _ in range(iters):
        assigned = assign_with_distance(df, vec_col, cents)
        stats = (assigned.groupBy("cell")
                 .agg(F.count(F.lit(1)).alias("n"), F.sum("d2").alias("sse"),
                      *dim_sums)
                 .collect())
        history.append(float(sum(r["sse"] for r in stats)))
        by_cell = {r["cell"]: r for r in stats}
        cents = [
            [by_cell[i][f"s{j}"] / by_cell[i]["n"] for j in range(d)]
            if i in by_cell else cents[i]          # empty cell: keep
            for i in range(k)]
    return cents, history


def kmeans_sse(df: DataFrame, vec_col: str,
               cents: list[list[float]]) -> float:
    """Total within-cluster squared error against fixed centroids (same
    single shared-fold distance family as the training loop)."""
    return float(assign_with_distance(df, vec_col, cents)
                 .agg(F.sum("d2")).first()[0])
