"""Embedding quantization — int8 storage/compute for the ANN path.

Symmetric per-vector scalar quantization (the standard faiss-style SQ8
baseline): ``scale = max|v| / 127``, ``q[i] = round(v[i] / scale)`` —
4× smaller vectors through storage, shuffles, and broadcast, with
recall@k close to full precision (pinned by test on the real corpus).

Scale design: quantize/dequantize/score are pure JVM array expressions
(transform / zip_with folds — no UDF), so the quantized index is built
scan-side at write time and probed scan-side at read time, exactly like
the full-precision path in ``operators/similarity.py``. The asymmetric
scorer (full-precision query × int8 database vector) avoids quantizing
the query — the standard accuracy-preserving trick.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_quantized(df: DataFrame, vec_col: str, q_col: str = "q8",
                   scale_col: str = "q8_scale") -> DataFrame:
    """Attach int8 codes + per-vector scale. Zero vectors get scale 0 and
    all-zero codes (dequantizes back to the zero vector)."""
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = (amax / F.lit(127.0)).cast("float")
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.round(x / scale).cast("tinyint"))
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return df.withColumn(scale_col, scale).withColumn(q_col, q)


def dequantize(q: Column, scale: Column) -> Column:
    """Back to float: ``q[i] * scale``."""
    return F.transform(q, lambda x: (x.cast("float") * scale).cast("float"))


def dot_q8(query: list[float], q: Column, scale: Column) -> Column:
    """Asymmetric dot product: full-precision literal query × int8 codes.
    The integer-ish fold stays sequential and deterministic; one multiply
    by ``scale`` at the end."""
    lit_q = F.array(*[F.lit(float(x)) for x in query])
    acc = F.aggregate(
        F.zip_with(q, lit_q, lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda a, x: a + x)
    return acc * scale.cast("double")


def cosine_q8(query: list[float], q: Column, scale: Column) -> Column:
    """Asymmetric cosine: normalize by the literal query norm and the
    reconstructed database-vector norm."""
    qn = sum(x * x for x in query) ** 0.5
    dbn = F.sqrt(F.aggregate(
        F.zip_with(q, q, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda a, x: a + x)) * scale.cast("double")
    return F.when(dbn > 0, dot_q8(query, q, scale) / (F.lit(float(qn)) * dbn)) \
        .otherwise(F.lit(0.0))


def topk_q8(df: DataFrame, query: list[float], k: int,
            id_col: str = "vec_id", q_col: str = "q8",
            scale_col: str = "q8_scale") -> DataFrame:
    """Top-k by asymmetric int8 cosine — same TakeOrderedAndProject shape
    as the full-precision ``topk_brute``."""
    return (df.select(F.col(id_col),
                      cosine_q8(query, F.col(q_col), F.col(scale_col))
                      .alias("score"))
              .orderBy(F.col("score").desc(), F.col(id_col).asc())
              .limit(k))
