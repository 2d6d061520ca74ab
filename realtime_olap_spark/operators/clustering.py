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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_olap_spark.operators.similarity import ivf_assign


def _sq_dist(vec: str, c: list[float]):
    """|v - c|^2 as a scan-side fold (sequential, deterministic)."""
    arr = F.array(*[F.lit(float(x)) for x in c])
    return F.aggregate(
        F.zip_with(F.col(vec), arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, x: acc + x)


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
        assigned = df.select(
            F.col(vec_col),
            ivf_assign(F.col(vec_col), cents).alias("cell"),
            F.least(*[_sq_dist(vec_col, c) for c in cents]).alias("d2"))
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
    """Total within-cluster squared error against fixed centroids."""
    return float(df.select(
        F.least(*[_sq_dist(vec_col, c) for c in cents]).alias("d2"))
        .agg(F.sum("d2")).first()[0])
