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
# Decode (PNG: real pure-Python codec; other formats stubbed)
# ---------------------------------------------------------------------------

def _make_png_decoder():
    """Build the clean-room PNG decoder (PNG spec / RFC 2083: chunk
    stream → IHDR dims → concatenated-IDAT zlib inflate → per-scanline
    defilter). Returned as a NESTED function so worker closures capture
    it by value (cloudpickle) — the house rule that module-level package
    functions must never be referenced from executors.

    Supports bit depth 8, color types 0/2/3/4/6 (gray, RGB, palette,
    gray+alpha, RGBA), non-interlaced. Adam7 interlace and other depths
    raise ``NotImplementedError``; malformed bytes return ``None``
    (corrupt media is routine at corpus scale — the caller NULLs the
    row, never kills the job). Filters: none/up/sub vectorized in numpy
    (sub via per-channel-stripe cumulative sum mod 256); average/paeth
    are inherently sequential in x (each pixel needs the RECONSTRUCTED
    left neighbor) and run as per-scanline loops."""
    import struct
    import zlib

    import numpy as np

    SIG = b"\x89PNG\r\n\x1a\n"
    CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

    def decode(data):
        if not isinstance(data, (bytes, bytearray)):
            return None
        data = bytes(data)
        if len(data) < 8 or data[:8] != SIG:
            return None
        pos, idat, hdr = 8, [], None
        while pos + 8 <= len(data):
            ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
            pos += 8
            if pos + ln + 4 > len(data):
                return None
            chunk = data[pos:pos + ln]
            pos += ln + 4  # payload + CRC (integrity not re-verified)
            if typ == b"IHDR":
                if ln != 13:
                    return None
                hdr = struct.unpack(">IIBBBBB", chunk)
            elif typ == b"IDAT":
                idat.append(chunk)
            elif typ == b"IEND":
                break
        if hdr is None or not idat:
            return None
        w, h, depth, ctype, comp, filt, interlace = hdr
        if ctype not in CHANNELS or comp != 0 or filt != 0:
            return None
        if depth != 8 or interlace != 0:
            raise NotImplementedError(
                f"png decoder: bit depth {depth} / interlace {interlace} "
                "not supported (8-bit non-interlaced only)")
        ch = CHANNELS[ctype]
        stride = w * ch
        try:
            raw = zlib.decompress(b"".join(idat))
        except zlib.error:
            return None
        if len(raw) != (stride + 1) * h or w == 0 or h == 0:
            return None
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
        filters = rows[:, 0]
        out = np.zeros((h, stride), dtype=np.uint8)
        for y in range(h):
            f = int(filters[y])
            line = rows[y, 1:].astype(np.int32)
            prior = out[y - 1].astype(np.int32) if y else np.zeros(
                stride, np.int32)
            if f == 0:
                rec = line
            elif f == 1:  # sub: cumulative sum per channel stripe
                rec = line.reshape(w, ch).cumsum(axis=0).reshape(stride)
            elif f == 2:  # up
                rec = line + prior
            elif f == 3:  # average (sequential: needs reconstructed left)
                rec = line
                for x in range(stride):
                    left = rec[x - ch] & 0xFF if x >= ch else 0
                    rec[x] += (left + prior[x]) >> 1
            elif f == 4:  # paeth (sequential)
                rec = line
                pu = prior
                for x in range(stride):
                    a = rec[x - ch] & 0xFF if x >= ch else 0
                    b = pu[x]
                    c = int(out[y - 1, x - ch]) if (y and x >= ch) else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    rec[x] += pr
            else:
                return None
            out[y] = (rec & 0xFF).astype(np.uint8)
        return int(w), int(h), int(ch), out.reshape(h, w, ch)

    return decode


def decode_media(df: DataFrame, decoder: str = "real") -> DataFrame:
    """Decode payloads via ``mapInPandas``:

    - ``decoder='png'`` — the REAL pure-Python PNG codec
      (:func:`_make_png_decoder`: stdlib zlib + numpy defilter); rows
      whose payload is not a well-formed 8-bit PNG decode to NULL dims.
    - ``decoder='real'`` — general codecs need PIL/librosa/ffmpeg
      (absent in this container → NotImplementedError at plan-build
      time, not mid-job).
    - ``decoder='fake'`` — dimensions derived deterministically from
      the byte stream; exercises the identical Arrow path and stays
      oracle-comparable (mm_decode_resize)."""
    if decoder == "real":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - container has no PIL
            raise NotImplementedError(
                "real media decode needs PIL/librosa/ffmpeg (not in this "
                "container); use decoder='png' for the pure-Python PNG "
                "codec or decoder='fake' for the deterministic stub"
            ) from exc
    if decoder == "png":
        png = _make_png_decoder()  # driver-built, captured by value

        def png_batches(it: Iterator["pd.DataFrame"]
                        ) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            for pdf in it:
                ws, hs = [], []
                for payload in pdf["payload"]:
                    d = png(payload)
                    ws.append(d[0] if d else None)
                    hs.append(d[1] if d else None)
                yield pd.DataFrame({
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "decoded_width": pd.array(ws, dtype="Int64"),
                    "decoded_height": pd.array(hs, dtype="Int64"),
                    "n_bytes": pdf["payload"].map(len),
                })

        return df.mapInPandas(png_batches, schema=DECODED_SCHEMA)

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
