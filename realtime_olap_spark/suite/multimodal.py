"""Multimodal suite: the media view (opaque binary payload + typed
metadata) and its pipeline passes. The corpus text is pure ASCII (verified:
no bytes outside 0x20-0x7e), so the UTF-8 payload bytes equal the character
codes and even the Arrow/mapInPandas byte-histogram pass has a full SQL
oracle. The stubbed real decoder is covered by tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators import multimodal as M
from realtime_olap_spark.suite.registry import query

# media_view derivation, rendered for DuckDB
_MTYPE = "(['image', 'audio', 'video'])[(doc_id % 3) + 1]"
_NBYTES = "octet_length(encode(text))"
_DUR = "(n_chars * 10)"


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.media_view(Catalog(spark, sf_dir).table("documents"))


@query("mm_inventory", f"""
SELECT {_MTYPE} AS media_type,
       COUNT(*) AS n_media,
       CAST(SUM({_NBYTES}) AS BIGINT) AS total_bytes,
       CAST(SUM((n_chars % 640) + 16) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_width
FROM documents
GROUP BY media_type
ORDER BY media_type ASC
""")
def mm_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus inventory by modality — metadata-only aggregation; the
    payload column is pruned out of the scan entirely."""
    m = _media(spark, sf_dir)
    return (m.groupBy("media_type")
            .agg(F.count(F.lit(1)).alias("n_media"),
                 F.sum(F.length("payload")).alias("total_bytes"),
                 (F.sum(F.col("meta.width")).cast("double")
                  / F.count(F.lit(1)).cast("double")).alias("avg_width"))
            .orderBy(F.col("media_type").asc()))


@query("mm_decode_resize", f"""
SELECT doc_id AS media_id, {_MTYPE} AS media_type,
       ({_NBYTES} % 640) + 1 AS decoded_width,
       ({_NBYTES} % 480) + 1 AS decoded_height,
       {_NBYTES} AS n_bytes,
       least((n_chars % 640) + 16, 224) AS width,
       least((doc_id % 480) + 16, 224) AS height
FROM documents
ORDER BY media_id ASC
LIMIT 30
""")
def mm_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode pass through the deterministic fake codec (exercises the real
    mapInPandas/Arrow path end-to-end; the 'real' codec is the
    clearly-marked NotImplementedError stub) joined with the resize pass to
    a 224×224 train budget (stub codec: pure JVM metadata rewrite)."""
    m = _media(spark, sf_dir)
    decoded = M.decode_media(m, decoder="fake")
    resized = M.resize_images(m, 224, 224).select(
        "media_id", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"))
    return (decoded.join(resized, "media_id")
            .orderBy(F.col("media_id").asc()).limit(30))


_BINW = 256 // M.FEATURE_BINS
_CHARS = "string_split(text, '')"
_HIST = "[" + ", ".join(
    f"CAST(len(list_filter({_CHARS}, c -> ascii(c) // {_BINW} = {b})) AS BIGINT)"
    for b in range(M.FEATURE_BINS)) + "]"


@query("mm_byte_histogram", f"""
SELECT doc_id AS media_id, {_NBYTES} AS n_bytes,
       array_to_string({_HIST}, ',') AS byte_hist
FROM documents
ORDER BY media_id ASC
LIMIT 30
""")
def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over Arrow batches (numpy bincount per payload)
    — value-checked against a pure-SQL histogram (ASCII ⇒ bytes = chars).
    The histogram array is serialized to a comma-joined string on BOTH
    sides: the driver canonicalizes through pandas, which cannot
    sort/factorize list-valued columns. Entropy from the same pass is
    covered rows-only below."""
    feats = M.extract_features(_media(spark, sf_dir))
    return (feats.select(
                "media_id", "n_bytes",
                F.array_join(F.col("byte_hist").cast("array<string>"), ",")
                .alias("byte_hist"))
            .orderBy(F.col("media_id").asc()).limit(30))


@query("mm_feature_entropy")  # float fold order is numpy's → rows-only check
def mm_feature_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-entropy scoring (vectorized numpy over Arrow batches): the
    highest-entropy payloads — a stand-in for model-based media scoring."""
    feats = M.extract_features(_media(spark, sf_dir))
    return (feats.select("media_id", "byte_entropy")
            .orderBy(F.col("byte_entropy").desc(), F.col("media_id").asc())
            .limit(20))


@query("mm_frame_sample", f"""
SELECT doc_id AS media_id, ts AS frame_ts_ms
FROM documents, unnest(generate_series(0, {_DUR} - 1, 1000)) AS t(ts)
WHERE (doc_id % 3) = 2
ORDER BY media_id ASC, frame_ts_ms ASC
LIMIT 100
""")
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling of video rows (1 fps): sequence+explode over the
    duration metadata — payload bytes never enter the exploded rows."""
    frames = M.sample_frames(_media(spark, sf_dir), every_ms=1000)
    return frames.orderBy(F.col("media_id").asc(), F.col("frame_ts_ms").asc()).limit(100)


