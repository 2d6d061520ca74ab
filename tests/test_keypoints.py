"""Keypoint near-dup (FAST-9 + oriented BRIEF, r16): the crop /
arbitrary-rotation / rescale detector the pHash family cannot be.
Synthetic textured corpora (fixtures are 16x16 icons — no usable
texture), planted transformed copies, measured operating point."""

from __future__ import annotations

import os

import numpy as np
import pytest

from realtime_olap_spark.operators import keypoints as K
from realtime_olap_spark.operators import multimodal as M

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

_ENC = M._make_png_encoder()


def _synth(seed=5, n=256):
    """Deterministic textured test image: smoothed block noise +
    random blobs (corners for FAST, texture for BRIEF)."""
    rng = np.random.RandomState(seed)
    g = rng.randint(0, 256, (n // 8, n // 8, 3)).astype(np.float64)
    img = np.kron(g, np.ones((8, 8, 1)))
    img = ((img + np.roll(img, 3, 0) + np.roll(img, 3, 1)) / 3
           ).astype(np.uint8)
    rng2 = np.random.RandomState(seed + 1)
    px = img.copy()
    for _ in range(40):
        y, x = rng2.randint(20, n - 20, 2)
        r = rng2.randint(4, 12)
        c = rng2.randint(0, 256, 3)
        yy, xx = np.mgrid[y - r:y + r, x - r:x + r]
        m = (yy - y) ** 2 + (xx - x) ** 2 <= r * r
        px[y - r:y + r, x - r:x + r][m] = c
    return np.ascontiguousarray(px)


def _crop(px, frac=0.7, ox=0.1, oy=0.15):
    h, w = px.shape[:2]
    y0, x0 = int(h * oy), int(w * ox)
    return np.ascontiguousarray(
        px[y0:y0 + int(h * frac), x0:x0 + int(w * frac)])


def _rot(px, deg):
    h, w = px.shape[:2]
    th = np.deg2rad(deg)
    cy, cx = (h - 1) / 2, (w - 1) / 2
    yy, xx = np.mgrid[0:h, 0:w]
    sy = cy + (yy - cy) * np.cos(th) - (xx - cx) * np.sin(th)
    sx = cx + (yy - cy) * np.sin(th) + (xx - cx) * np.cos(th)
    yi = np.clip(np.round(sy).astype(int), 0, h - 1)
    xi = np.clip(np.round(sx).astype(int), 0, w - 1)
    return np.ascontiguousarray(px[yi, xi].astype(np.uint8))


def _half(px):
    h, w = px.shape[:2]
    return np.ascontiguousarray(px[::2, ::2])


def test_describer_contract_and_determinism():
    describe = K._make_keypoint_describer()
    data = _ENC(_synth())
    d1, d2 = describe(data), describe(data)
    assert isinstance(d1, list) and len(d1) >= 40
    assert d1 == d2  # bit-deterministic
    # icons carry no texture; foreign bytes keep the shared contract
    with open(os.path.join(FIXTURES, "python.png"), "rb") as f:
        assert describe(f.read()) == []
    assert describe(b"not an image") == \
        "unsupported: unrecognized format"
    assert describe(None) is None
    # truncation/bit-flip never raises (the mapInPandas contract)
    import random
    rng = random.Random(3)
    for _ in range(60):
        b = bytearray(data)
        cut = rng.randrange(len(b))
        r = describe(bytes(b[:cut]))
        assert r is None or isinstance(r, (list, str))
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        r = describe(bytes(b))
        assert r is None or isinstance(r, (list, str))


def test_keypoint_near_dups_e2e(spark, tmp_path):
    """Planted crop-70%, 135-degree-rotation and half-resolution
    copies pair with their source through the one-call pass; two
    unrelated textures never pair; pHash (the cheap pass) misses all
    three transforms — exactly the gap this operator closes."""
    from realtime_olap_spark.operators.phash import (
        image_perceptual_hash, phash_near_dup_pairs)
    from realtime_olap_spark.sources.media import read_media_dir

    base = _synth(seed=5)
    other = _synth(seed=77)
    corpus = tmp_path / "kp"
    corpus.mkdir()
    files = {
        "base.png": _ENC(base),
        "crop70.png": _ENC(_crop(base)),
        "rot135.png": _ENC(_rot(base, 135)),
        "half.png": _ENC(_half(base)),
        "other.png": _ENC(other),
        "other_crop.png": _ENC(_crop(other)),
    }
    for name, payload in files.items():
        (corpus / name).write_bytes(payload)
    listing = read_media_dir(spark, str(corpus))
    ids = {os.path.basename(r["path"]): r["media_id"]
           for r in listing.collect()}
    pairs = {frozenset((r["id_a"], r["id_b"])): r["n_matches"]
             for r in K.keypoint_near_dups(listing).collect()}
    for name in ("crop70.png", "rot135.png", "half.png"):
        assert frozenset((ids["base.png"], ids[name])) in pairs, name
    assert frozenset((ids["other.png"],
                      ids["other_crop.png"])) in pairs
    # no cross-image pair
    for a in ("base.png", "crop70.png", "rot135.png", "half.png"):
        for b in ("other.png", "other_crop.png"):
            assert frozenset((ids[a], ids[b])) not in pairs, (a, b)
    # the cheap pHash pass misses the crop and the arbitrary-angle
    # rotation (its two blind spots — rescales it handles itself via
    # the 32x32 normalization, and 90-degree multiples via dihedral)
    ph = image_perceptual_hash(
        listing.where("status = 'ok'")
        .select("media_id", "payload"))
    cheap = {frozenset((r["id_a"], r["id_b"]))
             for r in phash_near_dup_pairs(
                 ph, "media_id", "phash", max_hamming=10,
                 n_bands=16).collect()}
    for name in ("crop70.png", "rot135.png"):
        assert frozenset((ids["base.png"], ids[name])) not in cheap


def test_pair_plan_is_jvm_and_payload_free(spark):
    sigs = spark.createDataFrame(
        [(1, 0, 5, 5, 7, 8, 9, 10), (2, 0, 5, 5, 7, 8, 9, 10)],
        "media_id long, kp long, y long, x long, "
        "w0 long, w1 long, w2 long, w3 long")
    df = K.keypoint_near_dup_pairs(sigs, min_matches=1)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan
    assert "MapInPandas" not in plan and "PythonUDF" not in plan
    rows = df.collect()
    assert [(r["id_a"], r["id_b"], r["n_matches"])
            for r in rows] == [(1, 2, 1)]


def test_min_matches_and_bucket_cap_knobs(spark):
    # two images sharing exactly one identical descriptor: below the
    # default min_matches, found at min_matches=1; a binding bucket
    # cap of 0 suppresses every candidate
    rows = [(i, k, 0, 0, 7 * k, 8 * k, 9 * k, 10 * k)
            for i in (1, 2) for k in range(3)]
    sigs = spark.createDataFrame(
        rows, "media_id long, kp long, y long, x long, "
              "w0 long, w1 long, w2 long, w3 long")
    assert K.keypoint_near_dup_pairs(sigs).count() == 0
    got = K.keypoint_near_dup_pairs(sigs, min_matches=1).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    assert got[0]["n_matches"] == 3
    assert K.keypoint_near_dup_pairs(
        sigs, min_matches=1, max_bucket_size=0).count() == 0


def test_burst_matches_cannot_inflate_votes(spark):
    # one probe keypoint matching MANY build keypoints counts as ONE
    # vote (least of the two distinct sides)
    rows = [(1, 0, 0, 0, 7, 8, 9, 10)] + \
        [(2, k, 0, 0, 7, 8, 9, 10) for k in range(20)]
    sigs = spark.createDataFrame(
        rows, "media_id long, kp long, y long, x long, "
              "w0 long, w1 long, w2 long, w3 long")
    got = K.keypoint_near_dup_pairs(sigs, min_matches=1).collect()
    assert [(r["id_a"], r["id_b"], r["n_matches"])
            for r in got] == [(1, 2, 1)]
