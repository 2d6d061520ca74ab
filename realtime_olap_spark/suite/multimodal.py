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


# log2 of every integer count enters BOTH plans as the same driver-
# rendered literal (shortest-repr round-trip is bit-exact), so the entropy
# fold is hash-comparable — see entropy_from_hist's docstring for the
# measured JVM-vs-libm log divergence that rules out engine log2. The
# literals are rendered as VARCHAR and cast: a bare decimal literal parses
# as DECIMAL in DuckDB and decimal-multiplies (overflows, and its
# decimal→double cast is not correctly rounded — the sqlgen gotcha);
# string→double is correctly-rounded strtod, bit-exact with F.lit.
_LUT = ("list_transform(string_split('"
        + ",".join(repr(v) for v in M.log2_lut())
        + "', ','), x -> CAST(x AS DOUBLE))")


@query("mm_feature_entropy", f"""
WITH lut AS (SELECT {_LUT} AS lg),
h AS (SELECT doc_id, {_NBYTES} AS n, {_HIST} AS hist FROM documents)
SELECT doc_id AS media_id,
       CASE WHEN n BETWEEN 1 AND {M.LOG2_LUT_SIZE} THEN
         lg[n] - list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                     [CASE WHEN c > 0 THEN c * lg[c] ELSE CAST(0.0 AS DOUBLE) END
                      for c in hist]),
                   (acc, x) -> acc + x) / n
       ELSE NULL END AS byte_entropy
FROM h, lut
ORDER BY byte_entropy DESC NULLS LAST, media_id ASC
LIMIT 20
""")
def mm_feature_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-entropy scoring — the highest-entropy payloads, a stand-in for
    model-based media scoring. The histogram comes out of the Arrow/
    mapInPandas feature pass (numpy bincount, hash-verified above); the
    entropy itself is the JVM-side fixed-order integer-count fold
    ``log2(n) − (1/n)·Σ c_i·log2(c_i)`` with literal-table logarithms
    (operators/multimodal.entropy_from_hist), which makes this query
    hash-comparable — numpy's pairwise-summed float entropy (still
    emitted by extract_features) cannot be."""
    feats = M.extract_features(_media(spark, sf_dir))
    ent = M.entropy_from_hist(F.col("byte_hist"), F.col("n_bytes"))
    return (feats.select("media_id", ent.alias("byte_entropy"))
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




def _bench_template_pngs(k: int = 16, w: int = 48, h: int = 16) -> list:
    """k small deterministic filter-0 RGB PNGs rendered driver-side —
    the payload templates the decode bench fans out over the corpus.
    Pure stdlib zlib + numpy; byte layout per the public PNG spec."""
    import struct
    import zlib

    import numpy as np

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    out = []
    for i in range(k):
        rng = np.random.RandomState(1000 + i)
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        out.append(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(raw))
                   + chunk(b"IEND", b""))
    return out


def media_decode_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only (not in the 50-query correctness window): the REAL
    pure-Python PNG codec over one payload per corpus document — 16
    template PNGs fanned out by ``element_at(literal array,
    pmod(doc_id, 16))`` (constant-folded; the per-row cost measured is
    the mapInPandas decode itself). Result is the tiny
    (width, height) → count histogram; every row must decode, so a NULL
    group appearing here would flag a codec regression in the bench
    record itself."""
    docs = Catalog(spark, sf_dir).table("documents").select("doc_id")
    arr = F.array(*[F.lit(p) for p in _bench_template_pngs()])
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.element_at(arr, (F.pmod(F.col("doc_id"), F.lit(16)) + 1)
                     .cast("int")).alias("payload"))
    out = M.decode_media(media, decoder="png")
    return (out.groupBy("decoded_width", "decoded_height")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_bytes").alias("total_bytes"))
            .orderBy("decoded_width"))
