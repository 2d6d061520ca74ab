"""Int8 embedding quantization — reconstruction error bounds, numpy
round-trip agreement, and ANN recall@k vs the full-precision ranking."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.quantization import (dequantize, topk_q8,
                                                        with_quantized)
from realtime_olap_spark.operators.similarity import cosine_topk
from tests.conftest import SF_DIR


def _emb(spark):
    return Catalog(spark, SF_DIR).table("embeddings")


def test_quantize_roundtrip_error_bounded(spark):
    q = with_quantized(_emb(spark), "embedding")
    err = (q.select(
        F.array_max(F.transform(
            F.zip_with(F.col("embedding"),
                       dequantize(F.col("q8"), F.col("q8_scale")),
                       lambda a, b: F.abs(a - b)),
            lambda x: x)).alias("max_err"),
        (F.array_max(F.transform("embedding", lambda x: F.abs(x)))
         / F.lit(254.0)).alias("half_step")).collect())
    # symmetric SQ8: |v - deq(q(v))| <= scale/2 per component
    for r in err:
        assert r["max_err"] <= r["half_step"] * (1 + 1e-5)


def test_quantize_matches_numpy(spark):
    rows = (with_quantized(_emb(spark), "embedding")
            .orderBy("vec_id").limit(50).collect())
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float32)
        scale = np.float32(np.abs(v).max() / 127.0)
        want = np.round(v / scale).astype(np.int8)
        assert (np.array(r["q8"], dtype=np.int8) == want).all()
        assert abs(r["q8_scale"] - scale) <= 1e-7 * abs(scale)


def test_zero_vector_is_safe(spark):
    df = spark.createDataFrame([(1, [0.0] * 8), (2, [1.0] * 8)],
                               ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in with_quantized(df, "embedding").collect()}
    assert out[1]["q8_scale"] == 0.0
    assert list(out[1]["q8"]) == [0] * 8
    assert topk_q8(with_quantized(df, "embedding"), [1.0] * 8, 2) \
        .collect()[0]["vec_id"] == 2


def test_ann_recall_vs_full_precision(spark):
    df = _emb(spark)
    query = [float(x) for x in
             df.orderBy("vec_id").first()["embedding"]]
    full = [r["vec_id"] for r in cosine_topk(df, query, "vec_id",
                                             "embedding", 10).collect()]
    quant = [r["vec_id"] for r in
             topk_q8(with_quantized(df, "embedding"), query, 10).collect()]
    recall = len(set(full) & set(quant)) / 10.0
    assert recall >= 0.9, (recall, full, quant)
