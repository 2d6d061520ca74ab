"""Perceptual image hashing + banded near-dup (r14): robustness
properties (re-encode, mild noise, rescale, brightness), sensitivity
to genuinely different images, the exact pigeonhole guarantee of the
banded join against a brute-force python twin, and the raise/NULL
contract."""

from __future__ import annotations

import os
import random

import numpy as np
import pytest

from realtime_olap_spark.operators import multimodal as M
from realtime_olap_spark.operators.phash import (
    hamming, hash_bands, image_perceptual_hash, phash_near_dup_pairs)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _fix(name):
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


def _hashes(spark, rows, method="phash"):
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = image_perceptual_hash(df, method=method, with_status=True)
    return {r["media_id"]: r for r in out.collect()}


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_robust_to_reencode_noise_rescale(spark):
    png_enc = M._make_png_encoder()
    base = M._make_png_decoder()(_fix("python.png"))[3]
    rng = np.random.default_rng(7)
    noised = base.astype(np.int16) + rng.integers(
        -3, 4, base.shape, dtype=np.int16)
    noised = np.clip(noised, 0, 255).astype(np.uint8)
    half = M._resize_pixels(base, base.shape[1] // 2,
                            base.shape[0] // 2, "area", np)
    bright = np.clip(base.astype(np.int16) + 12, 0,
                     255).astype(np.uint8)
    other = M._make_png_decoder()(_fix("file.png"))[3]
    rows = [(1, png_enc(base)), (2, png_enc(noised)),
            (3, png_enc(half)), (4, png_enc(bright)),
            (5, png_enc(other)), (6, _fix("python.png"))]
    for method, tol in (("phash", 6), ("dhash", 6), ("ahash", 6)):
        got = _hashes(spark, rows, method)
        assert all(r["status"] == "ok" for r in got.values())
        h = {k: r[method] for k, r in got.items()}
        # identical pixels, different container bytes: SAME hash
        assert h[1] == h[6]
        # near-identical variants: within a few bits
        assert _ham(h[1], h[2]) <= tol, method      # noise
        assert _ham(h[1], h[3]) <= tol, method      # rescale
        assert _ham(h[1], h[4]) <= tol, method      # brightness
        # a genuinely different image: far away
        assert _ham(h[1], h[5]) >= 16, method


def test_phash_null_contract_and_formats(spark):
    rows = [(1, _fix("python.jpg")), (2, _fix("python.bmp")),
            (3, b"\x00garbage"), (4, _fix("python.gif")),
            (5, _fix("variant-planar16.tiff"))]
    got = _hashes(spark, rows)
    assert got[3]["phash"] is None
    assert got[3]["status"].startswith("unsupported")
    for k in (1, 2, 4, 5):
        assert got[k]["phash"] is not None and got[k]["status"] == "ok"
    with pytest.raises(ValueError, match="method"):
        image_perceptual_hash(None, method="nope")


def test_banded_near_dup_matches_bruteforce(spark):
    """The pigeonhole guarantee, checked against a python brute force:
    every pair within max_hamming is returned, nothing above it, on
    randomized hash populations engineered to have near pairs."""
    rnd = random.Random(42)
    hashes = []
    base_vals = [rnd.getrandbits(64) for _ in range(30)]
    hid = 0
    for v in base_vals:
        hashes.append((hid, v)); hid += 1
        # a handful of perturbed variants at controlled distances
        for nbits in (1, 3, 7, 12):
            if rnd.random() < 0.5:
                w = v
                for pos in rnd.sample(range(64), nbits):
                    w ^= 1 << pos
                hashes.append((hid, w)); hid += 1

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    df = spark.createDataFrame(
        [(i, signed(v)) for i, v in hashes], "id long, h long")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in phash_near_dup_pairs(df, "id", "h",
                                         max_hamming=7).collect()}
    want = {}
    for i, (ia, va) in enumerate(hashes):
        for ib, vb in hashes[i + 1:]:
            d = bin(va ^ vb).count("1")
            if d <= 7:
                key = (ia, ib) if ia < ib else (ib, ia)
                want[key] = d
    assert got == want
    with pytest.raises(ValueError, match="guarantee"):
        phash_near_dup_pairs(df, "id", "h", max_hamming=8, n_bands=8)


def test_band_keys_and_hamming_jvm_side(spark):
    """hash_bands slices agree with python shifts (incl. negative
    longs); hamming == python popcount of xor; the near-dup plan has
    no UDF nodes and never touches a payload column."""
    vals = [0, -1, 123456789, -(1 << 63), (1 << 62) + 5]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, h long")
    import pyspark.sql.functions as F
    rows = df.select("id", hash_bands(F.col("h")).alias("b"),
                     hamming(F.col("h"), F.lit(0)).alias("d")).collect()
    for r in rows:
        v = vals[r["id"]] & ((1 << 64) - 1)
        want = [i * (1 << 9) + ((v >> (i * 8)) & 0xFF)
                for i in range(8)]
        assert list(r["b"]) == want, vals[r["id"]]
        assert r["d"] == bin(v).count("1")
    plan = phash_near_dup_pairs(df, "id", "h")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan and "payload" not in plan


def test_video_near_dup_signatures(spark):
    """Aligned-copy video detection: the same MJPEG footage re-muxed
    (rec-grouped, db ids, audio-first numbering) matches on every
    sampled frame; a video of the same frames in reversed order —
    different content at each timestamp — matches on none."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_multimodal import (_assemble_mjpeg_avi,
                                 _encode_flat_jpeg)

    from realtime_olap_spark.operators.phash import (
        frame_hash_signature, video_near_dup_pairs)

    def gradient_frame(shift):
        # smooth content so pHash is meaningful (flat blocks with a
        # moving step edge)
        levels = [(40 if c < 2 + shift else 200) for c in range(4)]
        return _encode_flat_jpeg([levels], 32, 8)

    fA = [gradient_frame(0), gradient_frame(1), gradient_frame(2)]
    fB = [gradient_frame(2), gradient_frame(1), gradient_frame(0)]
    a1 = _assemble_mjpeg_avi(fA, 32, 8, us_per_frame=40_000)
    a2 = _assemble_mjpeg_avi(fA, 32, 8, us_per_frame=40_000,
                             rec_group=True, suffix=b"db",
                             audio_first=True)
    b1 = _assemble_mjpeg_avi(fB, 32, 8, us_per_frame=40_000)
    df = spark.createDataFrame(
        [(1, "video", a1), (2, "video", a2), (3, "video", b1)],
        "media_id long, media_type string, payload binary")
    sig = frame_hash_signature(df, every_ms=40)
    rows = sig.collect()
    assert all(r["phash"] is not None for r in rows)
    assert len({r["media_id"] for r in rows}) == 3
    pairs = {(r["id_a"], r["id_b"]): r["matched_frames"]
             for r in video_near_dup_pairs(sig, max_hamming=3,
                                           min_matched_frames=2)
             .collect()}
    assert pairs.get((1, 2)) == 3          # identical footage: all 3
    assert (1, 3) not in pairs             # reversed frames at same ts
    # no UDF re-enters after the hashing stage; payload never joins
    plan = video_near_dup_pairs(sig)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "payload" not in plan.split("MapInPandas")[0]


def test_near_dup_bucket_cap(spark):
    """The corpus-scale hot-bucket cap: a degenerate population that
    shares one band value stays bounded; capped pairs still meet
    through their other bands (the MinHash-LSH cap semantics)."""
    # 50 hashes identical in band 0 (low byte 0x55) but random
    # elsewhere, plus one true near pair differing in 1 bit
    import random
    rnd = random.Random(3)

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = []
    for i in range(50):
        v = (rnd.getrandbits(56) << 8) | 0x55
        rows.append((i, signed(v)))
    near_a = rows[0][1]
    rows.append((100, signed((near_a ^ (1 << 40))
                             & ((1 << 64) - 1))))
    df = spark.createDataFrame(rows, "id long, h long")
    from realtime_olap_spark.operators.phash import phash_near_dup_pairs
    capped = phash_near_dup_pairs(df, "id", "h", max_hamming=7,
                                  max_bucket_size=10).collect()
    uncapped = phash_near_dup_pairs(df, "id", "h",
                                    max_hamming=7).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    # the true near pair survives the cap through its OTHER bands
    assert (0, 100) in got
    assert {(r["id_a"], r["id_b"]) for r in uncapped} >= got


def test_video_near_dup_any_offset(spark):
    """Shifted-copy detection: the same footage with the first frame
    trimmed matches at one consistent delta under align='any_offset'
    (and NOT under the aligned detector), with the winning offset
    reported."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_multimodal import _assemble_mjpeg_avi, _encode_flat_jpeg

    from realtime_olap_spark.operators.phash import (
        frame_hash_signature, video_near_dup_pairs)

    def frame(shift):
        levels = [(40 if c < 1 + (shift % 3) else 200)
                  for c in range(4)]
        return _encode_flat_jpeg([levels], 32, 8)

    full = [frame(i) for i in range(4)]
    trimmed = full[1:]                      # first 40 ms cut
    a = _assemble_mjpeg_avi(full, 32, 8, us_per_frame=40_000)
    b = _assemble_mjpeg_avi(trimmed, 32, 8, us_per_frame=40_000)
    df = spark.createDataFrame(
        [(1, "video", a), (2, "video", b)],
        "media_id long, media_type string, payload binary")
    sig = frame_hash_signature(df, every_ms=40)
    aligned = video_near_dup_pairs(sig, max_hamming=3,
                                   min_matched_frames=3).collect()
    # at the same ts the contents disagree (every frame differs from
    # its shifted neighbor in this construction)
    assert not [r for r in aligned
                if (r["id_a"], r["id_b"]) == (1, 2)]
    shifted = {(r["id_a"], r["id_b"]): r
               for r in video_near_dup_pairs(
                   sig, max_hamming=3, min_matched_frames=3,
                   align="any_offset").collect()}
    r = shifted[(1, 2)]
    assert r["matched_frames"] == 3 and r["offset_ms"] == 40
    with pytest.raises(ValueError, match="align"):
        video_near_dup_pairs(sig, align="sideways")
