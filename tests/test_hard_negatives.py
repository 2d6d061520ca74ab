"""Hard-negative mining — DuckDB differential (same IVF cell blocking and
cosine rendered into SQL) plus the contract properties: never a same-label
pair, ranks dense from 1, candidates blocked on cell."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.similarity import hard_negative_pairs
from realtime_olap_spark.suite.similarity import CENTROIDS, sql_ivf_assign
from tests.conftest import SF_DIR, assert_matches_oracle

K = 3


def _oracle() -> str:
    assign = sql_ivf_assign(vec_expr="embedding::DOUBLE[]")
    return f"""
WITH cells AS (SELECT vec_id, label, embedding, {assign} AS cell,
                      sqrt(list_inner_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[])) AS nrm
               FROM embeddings),
cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                a.label AS label_a, b.label AS label_b,
                list_inner_product(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[])
                / (a.nrm * b.nrm) AS cos
         FROM cells a JOIN cells b
           ON a.cell = b.cell AND a.label != b.label),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id_a
                                        ORDER BY cos DESC, id_b ASC) AS rk
           FROM cand)
SELECT id_a, id_b, label_a, label_b, cos, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {K}
"""


def test_hard_negatives_match_duckdb(spark, duck):
    e = Catalog(spark, SF_DIR).table("embeddings")
    out = hard_negative_pairs(e, "vec_id", "embedding", "label",
                              CENTROIDS, k=K) \
        .withColumn("rk", F.col("rk").cast("long"))
    assert_matches_oracle(out, duck(SF_DIR), _oracle(),
                          name="hard_negatives")


def test_hard_negatives_contract(spark):
    e = Catalog(spark, SF_DIR).table("embeddings")
    out = hard_negative_pairs(e, "vec_id", "embedding", "label",
                              CENTROIDS, k=K).cache()
    assert out.where(F.col("label_a") == F.col("label_b")).count() == 0
    ranks = (out.groupBy("id_a")
             .agg(F.min("rk").alias("mn"), F.max("rk").alias("mx"),
                  F.count(F.lit(1)).alias("n")))
    # dense ranks starting at 1, at most K per anchor
    assert ranks.where((F.col("mn") != 1) | (F.col("mx") != F.col("n"))
                       | (F.col("n") > K)).count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    join_lines = [ln for ln in plan.splitlines()
                  if "Join" in ln and "cell" in ln]
    assert join_lines, f"candidate join not keyed on cell:\n{plan}"
    out.unpersist()
