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
