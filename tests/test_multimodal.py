"""Multimodal plumbing tests: schema contract, Arrow batch path, stub
gating for the real codec (absent in this container)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import BinaryType

from realtime_olap_spark.operators import multimodal as M
from tests.conftest import SF_DIR as SF_DIR_SMALL


def _media(spark):
    docs = spark.read.parquet(f"{SF_DIR_SMALL}/documents.parquet")
    return M.media_view(docs)


def test_media_view_schema(spark):
    m = _media(spark)
    # nullability is not part of the contract; compare the type shape
    assert m.schema.simpleString() == M.MEDIA_SCHEMA.simpleString()
    assert isinstance(m.schema["payload"].dataType, BinaryType)
    types = {r["media_type"] for r in m.select("media_type").distinct().collect()}
    assert types == set(M.MEDIA_TYPES)


def test_real_decoder_is_gated(spark):
    with pytest.raises(NotImplementedError, match="fake"):
        M.decode_media(_media(spark), decoder="real")


def test_fake_decoder_arrow_path(spark):
    out = M.decode_media(_media(spark), decoder="fake")
    assert out.schema == M.DECODED_SCHEMA
    rows = out.orderBy("media_id").limit(5).collect()
    assert all(r["decoded_width"] == r["n_bytes"] % 640 + 1 for r in rows)


def test_extract_features_hist_sums_to_bytes(spark):
    feats = M.extract_features(_media(spark)).limit(20).collect()
    for r in feats:
        assert len(r["byte_hist"]) == M.FEATURE_BINS
        assert sum(r["byte_hist"]) == r["n_bytes"]
        assert r["byte_entropy"] >= 0.0


def test_sample_frames_counts(spark):
    m = _media(spark)
    frames = M.sample_frames(m, every_ms=1000)
    got = {r["media_id"]: r["n"] for r in
           frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()}
    durs = {r["media_id"]: r["d"] for r in
            m.where("media_type = 'video'")
             .select("media_id", M.F.col("meta.duration_ms").alias("d")).collect()}
    assert set(got) == set(durs)
    for mid, d in durs.items():
        assert got[mid] == (d - 1) // 1000 + 1


def test_sessionize_pandas_agrees_with_window(spark):
    """The applyInPandas custom-operator path must produce exactly the
    declarative window result."""
    from realtime_olap_spark.catalog import Catalog
    from realtime_olap_spark.operators.sessions import (sessionize,
                                                        sessionize_pandas)

    ev = Catalog(spark, SF_DIR_SMALL).table("events")
    key = ["user_id", "session_id"]
    a = sorted([tuple(r) for r in
                sessionize(ev).select(*key, "session_start", "session_end",
                                      "n_events", "duration_us").collect()])
    b = sorted([tuple(r) for r in
                sessionize_pandas(ev).select(*key, "session_start", "session_end",
                                             "n_events", "duration_us").collect()])
    assert a == b and len(a) > 0


def test_entropy_fold_agrees_with_numpy(spark):
    """The literal-table fold entropy (oracle-comparable) and numpy's
    pairwise-summed entropy (extract_features) are the same mathematical
    quantity — equal to float noise on every payload, and NULL-guarded
    above the LUT bound."""
    import math

    from pyspark.sql import functions as F
    feats = M.extract_features(_media(spark))
    both = feats.select(
        "byte_entropy",
        M.entropy_from_hist(F.col("byte_hist"), F.col("n_bytes"))
        .alias("fold_e")).collect()
    assert both
    for r in both:
        assert math.isclose(r["byte_entropy"], r["fold_e"],
                            rel_tol=1e-12, abs_tol=1e-12)
    # out-of-LUT guard: oversized n yields NULL, never an index error
    big = spark.createDataFrame(
        [([M.LOG2_LUT_SIZE + 5] + [0] * 15, M.LOG2_LUT_SIZE + 5)],
        "byte_hist array<long>, n_bytes long")
    assert big.select(
        M.entropy_from_hist(F.col("byte_hist"), F.col("n_bytes"))
        .alias("e")).first()["e"] is None


def test_payload_checksum_matches_python_reference(spark):
    """Byte checksum defined over the hex rendering — well-formed for any
    binary (incl. invalid-UTF-8 bytes) and equal to the Python fold."""
    from pyspark.sql import functions as F
    from realtime_olap_spark.operators.multimodal import payload_checksum

    payloads = [bytes([0, 255, 128, 7, 9]), b"", b"abc123",
                bytes(range(256)), b"\xff\xfe\x00\x01"]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)],
                               "i long, payload binary")
    got = {r["i"]: r["c"] for r in
           df.select("i", payload_checksum(F.col("payload")).alias("c"))
           .collect()}
    mod = 1_000_000_007
    for i, p in enumerate(payloads):
        h = 0
        for ch in p.hex().upper():
            h = (h * 31 + ord(ch)) % mod
        assert got[i] == h, (i, got[i], h)


# ---------------------------------------------------------------------------
# Pure-Python PNG decoder (clean-room, PNG spec / RFC 2083)
# ---------------------------------------------------------------------------

def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _encode_png(pixels, filters, ctype):
    """Minimal golden-image ENCODER (independent of the decoder): apply
    the chosen filter per scanline, deflate, wrap in chunks."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = pixels.shape
    raw = bytearray()
    prior = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        line = pixels[y].reshape(w * ch).astype(np.int32)
        out = line.copy()
        for x in range(w * ch):
            a = int(line[x - ch]) if x >= ch else 0
            b = int(prior[x])
            c = int(prior[x - ch]) if x >= ch else 0
            if f == 1:
                out[x] = line[x] - a
            elif f == 2:
                out[x] = line[x] - b
            elif f == 3:
                out[x] = line[x] - ((a + b) >> 1)
            elif f == 4:
                out[x] = line[x] - _paeth(a, b, c)
        raw.append(f)
        raw += (out & 0xFF).astype(np.uint8).tobytes()
        prior = line

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("ctype,ch,filters", [
    (2, 3, [0, 1, 2, 3, 4]),   # RGB, every filter type in one image
    (0, 1, [4, 3, 1]),         # grayscale
    (6, 4, [2, 4]),            # RGBA
    (4, 2, [1, 3, 4]),         # gray+alpha
])
def test_png_decode_golden_roundtrip(ctype, ch, filters):
    import numpy as np

    rng = np.random.RandomState(ctype * 10 + ch)
    pixels = rng.randint(0, 256, size=(7, 5, ch), dtype=np.uint8)
    png = _encode_png(pixels, filters, ctype)
    decode = M._make_png_decoder()
    w, h, nch, out = decode(png)
    assert (w, h, nch) == (5, 7, ch)
    assert (out == pixels).all()


def test_png_decode_split_idat_and_rejects():
    import struct
    import zlib

    import numpy as np

    decode = M._make_png_decoder()
    pixels = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    png = _encode_png(pixels, [0, 1, 4], 2)
    # split the IDAT into two chunks — decoders must concatenate before
    # inflating (the spec allows arbitrary IDAT segmentation)
    sig, rest = png[:8], png[8:]
    ln = struct.unpack(">I", rest[:4])[0]
    ihdr, idat = rest[:ln + 12], rest[ln + 12:]
    dlen = struct.unpack(">I", idat[:4])[0]
    payload = idat[8:8 + dlen]
    a, b = payload[:5], payload[5:]

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    split = (sig + ihdr + chunk(b"IDAT", a) + chunk(b"IDAT", b)
             + chunk(b"IEND", b""))
    w, h, nch, out = decode(split)
    assert (w, h) == (4, 3) and (out == pixels).all()
    # malformed inputs: NULL, never a crash
    assert decode(b"not a png at all") is None
    assert decode(png[:20]) is None
    assert decode(b"") is None
    # unsupported depth raises the honest gate
    ihdr16 = struct.pack(">IIBBBBB", 4, 3, 16, 2, 0, 0, 0)
    png16 = (sig + chunk(b"IHDR", ihdr16) + chunk(b"IDAT", b"x")
             + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode(png16)


def test_png_decoder_through_map_in_pandas(spark):
    """decode_media(decoder='png'): real PNG payloads decode to their
    true dims through the Arrow path; non-PNG payloads NULL out."""
    import numpy as np

    pngs = []
    for i, (hh, ww) in enumerate([(3, 4), (6, 2), (5, 5)]):
        px = np.full((hh, ww, 3), i * 20, dtype=np.uint8)
        px[:, :, 0] = np.arange(ww, dtype=np.uint8)
        pngs.append((i, "image", bytearray(_encode_png(px, [0, 1, 2, 3, 4],
                                                       2)),
                     (ww, hh)))
    rows = [(i, t, bytes(p)) for i, t, p, _ in pngs]
    rows.append((99, "image", b"corrupt payload"))
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary")
    got = {r["media_id"]: (r["decoded_width"], r["decoded_height"],
                           r["n_bytes"])
           for r in M.decode_media(df, decoder="png").collect()}
    for i, _, p, (ww, hh) in pngs:
        assert got[i] == (ww, hh, len(p)), i
    assert got[99] == (None, None, len(b"corrupt payload"))
