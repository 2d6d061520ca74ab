"""Similarity-search suite over the embeddings table.

Query vector, LSH hyperplanes, and IVF centroids are deterministic seeded
literals rendered identically into the Spark plan and the DuckDB oracle, so
even the approximate (bucketed) paths are value-verified end-to-end: both
engines evaluate the same IEEE-double expressions (sequential-fold dot
products) over the same data.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators import similarity as S
from realtime_olap_spark.operators.dedup import cosine
from realtime_olap_spark.suite.registry import query

_DIM = 64

_rng = random.Random(42)
QUERY_VEC = [round(_rng.gauss(0.0, 1.0), 3) for _ in range(_DIM)]
PLANES = [[round(_rng.gauss(0.0, 1.0), 3) for _ in range(_DIM)] for _ in range(6)]
CENTROIDS = [[round(_rng.gauss(0.0, 1.0), 3) for _ in range(_DIM)] for _ in range(8)]


def _sql_vec(v: list[float]) -> str:
    return "[" + ", ".join(repr(float(x)) for x in v) + "]::DOUBLE[]"


_E = "embedding::DOUBLE[]"
_Q = _sql_vec(QUERY_VEC)
_COS_Q = (f"list_inner_product({_E}, {_Q})"
          f" / (sqrt(list_inner_product({_E}, {_E})) * sqrt(list_inner_product({_Q}, {_Q})))")


@query("sim_topk_brute", f"""
SELECT vec_id, {_COS_Q} AS cos
FROM embeddings
ORDER BY cos DESC, vec_id ASC
LIMIT 10
""")
def sim_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 — one scan, TakeOrderedAndProject."""
    e = Catalog(spark, sf_dir).table("embeddings")
    return S.cosine_topk(e, QUERY_VEC, "vec_id", "embedding", k=10)


def _lsh_oracle() -> str:
    qb = S._query_bucket(QUERY_VEC, PLANES)
    bits = " + ".join(
        f"(CASE WHEN list_inner_product({_E}, {_sql_vec(p)}) > 0 THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(PLANES))
    return f"""
SELECT vec_id, {_COS_Q} AS cos
FROM embeddings
WHERE ({bits}) = {qb}
ORDER BY cos DESC, vec_id ASC
LIMIT 10
"""


@query("sim_topk_lsh", _lsh_oracle())
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via 6-bit random-hyperplane LSH: score only the query's bucket
    (~1/64 of the corpus once the bucket is a write-time partition key)."""
    e = Catalog(spark, sf_dir).table("embeddings")
    return S.lsh_topk(e, QUERY_VEC, PLANES, "vec_id", "embedding", k=10)


def sql_ivf_assign(centroids: list[list[float]] = CENTROIDS,
                   vec_expr: str = _E) -> str:
    """DuckDB rendering of operators.similarity.ivf_assign — b·b constants
    are the engine-side fold rendered at full precision (repr round-trips
    doubles exactly), so both engines assign identical cells."""
    aa = f"list_inner_product({vec_expr}, {vec_expr})"
    dists = ", ".join(
        f"{aa} - 2.0 * list_inner_product({vec_expr}, {_sql_vec(c)})"
        f" + {S._self_dot(c)!r}"
        for c in centroids)
    return f"(list_indexof([{dists}], list_min([{dists}])) - 1)"


def _ivf_oracle() -> str:
    probes = S._nearest_centroids(QUERY_VEC, CENTROIDS, nprobe=2)
    assign = sql_ivf_assign()
    in_list = ", ".join(str(p) for p in probes)
    return f"""
SELECT vec_id, {_COS_Q} AS cos
FROM embeddings
WHERE {assign} IN ({in_list})
ORDER BY cos DESC, vec_id ASC
LIMIT 10
"""


@query("sim_topk_ivf", _ivf_oracle())
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe: nearest-centroid cells (nprobe=2 of 8), exact cosine
    top-10 within them — the write-time-partitioned scale path."""
    e = Catalog(spark, sf_dir).table("embeddings")
    return S.ivf_topk(e, QUERY_VEC, CENTROIDS, "vec_id", "embedding", k=10, nprobe=2)


@query("sim_topk_per_label", f"""
SELECT label, vec_id, cos FROM (
  SELECT label, vec_id, {_COS_Q} AS cos,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY {_COS_Q} DESC, vec_id ASC) AS rn
  FROM embeddings)
WHERE rn <= 3
ORDER BY label ASC, cos DESC, vec_id ASC
""")
def sim_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k (k-nearest within every label partition) via a ranking
    window — one shuffle on the partition key."""
    e = Catalog(spark, sf_dir).table("embeddings")
    scored = e.select("label", "vec_id",
                      cosine(F.col("embedding"), S._lit_vec(QUERY_VEC)).alias("cos"))
    w = Window.partitionBy("label").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("label", "vec_id", "cos")
            .orderBy(F.col("label").asc(), F.col("cos").desc(), F.col("vec_id").asc()))
