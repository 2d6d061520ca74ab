"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, plus the decode / feature-extract / resize / frame-sample
passes a training-data pipeline runs over them.

The reference (Pinot ~2019) stores BYTES columns but has no operations over
them beyond equality (SURVEY.md §1.3); everything here is an extension.

Scale design (100 TB of media):
- payloads stay opaque ``BinaryType`` — never parsed by Catalyst, never a
  join/group key; all pruning happens on the typed metadata struct, which
  parquet stores as separate (stat-bearing, prunable) leaf columns;
- per-payload compute is ``mapInPandas`` — Arrow-batched columnar transfer,
  one Python worker per partition, vectorized numpy inside; batch size is
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
  partition of large blobs streams through in fixed memory;
- frame sampling is a pure JVM `sequence`+`explode` on metadata — row
  explosion never touches the payload bytes.

The actual codec step (PIL/librosa/ffmpeg) is STUBBED: the container has no
media libraries, so `decode_media` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested — the Spark-side plumbing (schemas,
UDF signatures, Arrow batch shapes, partitioning) is real and tested.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, LongType,
                               StringType, StructField, StructType)

if TYPE_CHECKING:
    import pandas as pd

MEDIA_TYPES = ["image", "audio", "video"]

# Typed metadata carried next to the opaque payload. Parquet keeps each
# struct field a separate column chunk with min/max stats, so filters like
# meta.width > 1024 prune row groups without touching payload bytes.
MEDIA_META_SCHEMA = StructType([
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("duration_ms", LongType()),
    StructField("sample_rate", LongType()),
])

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload", BinaryType()),
    StructField("meta", MEDIA_META_SCHEMA),
])

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("decoded_width", LongType()),
    StructField("decoded_height", LongType()),
    StructField("n_bytes", LongType()),
])

FEATURE_BINS = 16

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("byte_hist", ArrayType(LongType())),
    StructField("byte_entropy", DoubleType()),
])


def media_view(documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents corpus (the
    container ships no real media): payload = UTF-8 bytes of the text,
    media_type cycles by id, metadata derived from (doc_id, n_chars). The
    derivation is plain SQL on both engines, so downstream passes stay
    oracle-comparable."""
    doc_id, n_chars = F.col("doc_id"), F.col("n_chars")
    return documents.select(
        doc_id.alias("media_id"),
        F.element_at(F.array(*[F.lit(t) for t in MEDIA_TYPES]),
                     (doc_id % 3 + 1).cast("int")).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            ((n_chars % 640) + 16).alias("width"),
            ((doc_id % 480) + 16).alias("height"),
            (n_chars * 10).alias("duration_ms"),
            F.lit(16000).cast("long").alias("sample_rate"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Decode (stubbed codec, real plumbing)
# ---------------------------------------------------------------------------

def decode_media(df: DataFrame, decoder: str = "real") -> DataFrame:
    """Decode payloads via ``mapInPandas``. ``decoder='real'`` needs PIL
    (absent in this container → NotImplementedError at plan-build time, not
    mid-job); ``decoder='fake'`` derives dimensions deterministically from
    the byte stream, exercising the identical Arrow path."""
    if decoder == "real":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - container has no PIL
            raise NotImplementedError(
                "real media decode needs PIL/librosa/ffmpeg (not in this "
                "container); use decoder='fake' for the deterministic stub"
            ) from exc

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            n = pdf["payload"].map(len)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                # fake codec: dims from byte-length (stands in for the
                # PIL.Image.open(...).size call at the same batch shape)
                "decoded_width": n % 640 + 1,
                "decoded_height": n % 480 + 1,
                "n_bytes": n,
            })

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Feature extraction (vectorized numpy over Arrow batches)
# ---------------------------------------------------------------------------

def extract_features(df: DataFrame, bins: int = FEATURE_BINS) -> DataFrame:
    """Per-payload byte histogram (``256/bins``-wide buckets) + Shannon
    entropy — a deterministic stand-in for an embedding model with the real
    batch shape: Arrow in, numpy bincount per row, Arrow out."""
    width = 256 // bins

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            hists, ents, sizes = [], [], []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=bins)[:bins]
                p = hist[hist > 0] / max(len(arr), 1)
                hists.append(hist.astype("int64").tolist())
                ents.append(float(-(p * np.log2(p)).sum()) if len(arr) else 0.0)
                sizes.append(len(arr))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "byte_hist": hists,
                "byte_entropy": ents,
            })

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Resize (stub) and frame sampling (pure JVM)
# ---------------------------------------------------------------------------

def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize pass: real pipelines re-encode payload bytes; the stub keeps
    the payload and rewrites the metadata struct (letterbox-preserving
    aspect is the decoder's job). Metadata-only → pure JVM expressions."""
    meta = F.col("meta")
    scaled = F.struct(
        F.least(meta["width"], F.lit(target_w)).alias("width"),
        F.least(meta["height"], F.lit(target_h)).alias("height"),
        meta["duration_ms"].alias("duration_ms"),
        meta["sample_rate"].alias("sample_rate"),
    )
    return df.withColumn("meta", scaled)


def sample_frames(df: DataFrame, every_ms: int) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled timestamp
    0, every_ms, 2·every_ms … < duration_ms. `sequence`+`explode` on the
    metadata only — the payload column is pruned before the explode, so the
    row explosion never copies blob bytes."""
    ts = F.sequence(F.lit(0).cast("long"),
                    F.col("meta.duration_ms") - 1,
                    F.lit(every_ms).cast("long"))
    return (df.where(F.col("media_type") == "video")
              .select("media_id", F.explode(ts).alias("frame_ts_ms")))


#: Size of the literal log2 lookup used by ``entropy_from_hist``. Covers
#: every integer count that can appear in a histogram of a payload up to
#: this many bytes (corpus max ≈ 577 across all SFs; 3.5× headroom).
#: Larger payloads yield NULL entropy on BOTH engines (guarded, never an
#: out-of-bounds error), so a regenerated corpus can't silently diverge.
LOG2_LUT_SIZE = 2048


def log2_lut() -> list[float]:
    """``log2(i)`` for i = 1..LOG2_LUT_SIZE, computed ONCE driver-side
    (Python libm) and rendered as literals into both engines' plans."""
    return [math.log2(i) for i in range(1, LOG2_LUT_SIZE + 1)]


def entropy_from_hist(hist: Column, n: Column) -> Column:
    """Shannon entropy (bits) of an integer count histogram, in the
    algebraic form ``log2(n) − (1/n)·Σ c_i·log2(c_i)`` with a FIXED-ORDER
    left fold over the counts in index order.

    Hash-exact across engines by construction, not by luck: ``log2`` of an
    integer is NOT reproducible between JVMs and libm (measured r6:
    Spark's log2 differs from DuckDB's on 7634 of the first 20000 integers
    — e.g. log2(9) = 0x1.95c01a39fbd69p+1 on the JVM vs
    0x1.95c01a39fbd68p+1 in DuckDB; even ln differs on 195 of 20000), so
    NEITHER engine's libm is allowed in the loop. Every needed logarithm —
    the c_i and n are integers bounded by LOG2_LUT_SIZE — enters the plan
    as a driver-rendered literal (``log2_lut``; shortest-repr round-trip
    is bit-exact in both engines), leaving only correctly-rounded IEEE
    +/×/÷ in an identical fold order. DuckDB twin: index the same literal
    list and ``list_reduce`` the terms (suite/multimodal.py).

    The literal array constant-folds to a single ArrayData; per-row cost
    is ``bins`` lookups + one fold — scan-side, no shuffle, no UDF."""
    lut = F.array(*[F.lit(v) for v in log2_lut()])
    nn = n.cast("int")
    terms = F.transform(hist, lambda c: F.when(
        c > 0, c.cast("double") * F.element_at(lut, c.cast("int")))
        .otherwise(F.lit(0.0)))
    s = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    return (F.when((nn >= 1) & (nn <= LOG2_LUT_SIZE),
                   F.element_at(lut, nn) - s / n.cast("double"))
            .otherwise(F.lit(None).cast("double")))


def payload_checksum(payload: Column, mod: int = 1_000_000_007) -> Column:
    """Order-sensitive byte checksum (same fold discipline as
    text.rolling_fingerprint) — cheap integrity/dedup key over opaque
    payloads, JVM-side. Folds over the HEX rendering (two chars per byte),
    which is well-defined for ANY binary — decoding arbitrary bytes as
    UTF-8 is not. Python twin (tests/test_multimodal.py):
    ``for c in payload.hex().upper(): h = (h*31 + ord(c)) % mod``."""
    chars = F.filter(F.split(F.hex(payload), ""), lambda c: c != "")
    codes = F.transform(chars, lambda c: F.ascii(c).cast("long"))
    return F.aggregate(codes, F.lit(0).cast("long"),
                       lambda acc, c: (acc * 31 + c) % F.lit(mod).cast("long"))
