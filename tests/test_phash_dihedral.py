"""Dihedral (rotation/mirror) image near-dup (r15 verdict directive
#3): dHash/pHash are not rotation-invariant, so a 90°-rotated or
mirrored crawl duplicate was invisible to the near-dup pass. Now all
8 D4 orientations are hashed at ingest (8 resamples of ONE decode)
and the banded join probes every orientation against identity hashes
— the pigeonhole guarantee holds per orientation pair."""

from __future__ import annotations

import os
import random

import numpy as np
import pytest

from realtime_olap_spark.operators import multimodal as M
from realtime_olap_spark.operators.phash import (
    _make_perceptual_hasher, image_dihedral_hashes,
    image_perceptual_hash, phash_near_dup_pairs,
    phash_near_dup_pairs_dihedral)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _fix(name):
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_orientation_zero_is_bit_identical_to_plain(spark):
    rows = [(1, _fix("python.png")), (2, _fix("python.jpg")),
            (3, b"\x00garbage")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    for method in ("phash", "dhash", "ahash"):
        plain = {r["media_id"]: r[method]
                 for r in image_perceptual_hash(df, method=method)
                 .collect() if r[method] is not None}
        dih = image_dihedral_hashes(df, method=method).collect()
        by_id: dict = {}
        for r in dih:
            by_id.setdefault(r["media_id"], {})[r["orient"]] = r[method]
        # undecodable rows emit nothing; decodable emit all 8
        assert set(by_id) == {1, 2}
        for mid, orients in by_id.items():
            assert sorted(orients) == list(range(8))
            assert orients[0] == plain[mid]
    with pytest.raises(ValueError, match="method"):
        image_dihedral_hashes(df, method="nope")


def test_dihedral_hashes_exact_under_rotation_and_mirror():
    """Each orientation hash equals the PLAIN hash of the actually
    transformed image, bit for bit (transform applied to full-res
    luma before resampling), for every method incl. the non-square
    dHash grid; and a noisy rotation stays within the lossy re-encode
    distance."""
    enc = M._make_png_encoder()
    base = M._make_png_decoder()(_fix("python.png"))[3]
    rng = np.random.default_rng(3)
    for method in ("phash", "dhash", "ahash"):
        plain = _make_perceptual_hasher(method)
        lst = _make_perceptual_hasher(method, dihedral=True)(enc(base))
        assert isinstance(lst, list) and len(lst) == 8
        for flip in (0, 1):
            px = np.fliplr(base) if flip else base
            for k in range(4):
                t = np.ascontiguousarray(np.rot90(px, k))
                assert lst[flip * 4 + k] == plain(enc(t)), \
                    (method, flip, k)
        # rotation + mild sensor noise: pinned at/below the lossy
        # re-encode distance (<= 6 bits, the test_phash tolerance)
        r1 = np.rot90(base, 1)
        noisy = np.clip(
            r1.astype(np.int16) + rng.integers(-3, 4, r1.shape,
                                               dtype=np.int16),
            0, 255).astype(np.uint8)
        d = _ham(lst[1], plain(enc(np.ascontiguousarray(noisy))))
        assert d <= 6, method
        # while the PLAIN pass sits far beyond the pairing threshold
        assert _ham(lst[0], lst[1]) >= 16, method


def test_dihedral_pairs_find_rotated_duplicates(spark):
    """e2e: a corpus with rotated/mirrored PNG copies — the plain
    banded join misses every one, the dihedral join finds each at
    Hamming 0 with the correct orientation reported."""
    enc = M._make_png_encoder()
    base = M._make_png_decoder()(_fix("python.png"))[3]
    other = M._make_png_decoder()(_fix("file.png"))[3]
    rows = [(1, enc(base)),
            (2, enc(np.ascontiguousarray(np.rot90(base, 1)))),
            (3, enc(np.ascontiguousarray(np.rot90(base, 2)))),
            (4, enc(np.ascontiguousarray(np.fliplr(base)))),
            (5, enc(other))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    plain = image_perceptual_hash(df)
    plain_pairs = {(r["id_a"], r["id_b"])
                   for r in phash_near_dup_pairs(
                       plain, "media_id", "phash", max_hamming=10,
                       n_bands=16).collect()}
    assert not any(1 in p for p in plain_pairs)  # the blind spot
    dih = image_dihedral_hashes(df)
    got = {(r["id_a"], r["id_b"]): r
           for r in phash_near_dup_pairs_dihedral(
               dih, "media_id", "phash", max_hamming=10,
               n_bands=16).collect()}
    for b in (2, 3, 4):
        assert got[(1, b)]["hamming"] == 0, b
    # the rotated copies also pair with EACH OTHER (both rotated)
    assert (2, 3) in got and (2, 4) in got and (3, 4) in got
    # the genuinely different image pairs with nothing
    assert not any(5 in p for p in got)
    with pytest.raises(ValueError, match="guarantee"):
        phash_near_dup_pairs_dihedral(dih, "media_id", "phash",
                                      max_hamming=8, n_bands=8)


def test_dihedral_pairs_match_bruteforce_twin(spark):
    """The banded dihedral join against a python brute force: a pair
    is reported iff SOME orientation of one member is within
    max_hamming of the OTHER member's identity hash, at the minimum
    such distance."""
    rnd = random.Random(11)

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    def perturb(v, nbits):
        for pos in rnd.sample(range(64), nbits):
            v ^= 1 << pos
        return v

    # each "image" = 8 random orientation hashes; plant relations by
    # copying a source's orientation hash into a target's identity
    imgs = {}
    for i in range(20):
        imgs[i] = [rnd.getrandbits(64) for _ in range(8)]
    # image 20 = image 0 rotated by orient 3, 2 bits of noise
    imgs[20] = [rnd.getrandbits(64) for _ in range(8)]
    imgs[20][0] = perturb(imgs[0][3], 2)
    # make the reverse direction hold too (the group property the
    # real hasher guarantees): 0's identity ≈ 20's orient 1
    imgs[0][0] = imgs[0][0]  # identity stays
    imgs[20][1] = perturb(imgs[0][0], 1)
    # image 21 = far from everything (no planted relation)
    imgs[21] = [rnd.getrandbits(64) for _ in range(8)]
    rows = [(i, o, signed(h)) for i, hs in imgs.items()
            for o, h in enumerate(hs)]
    df = spark.createDataFrame(rows, "id long, orient long, h long")
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in phash_near_dup_pairs_dihedral(
               df, "id", "h", max_hamming=7, n_bands=8).collect()}
    want = {}
    ids = sorted(imgs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ds = [bin(imgs[a][o] ^ imgs[b][0]).count("1")
                  for o in range(8)] \
                + [bin(imgs[b][o] ^ imgs[a][0]).count("1")
                   for o in range(8)]
            d = min(ds)
            if d <= 7:
                want[(a, b)] = d
    assert got == want
    assert (0, 20) in want  # the planted relation was exercised


def test_media_dir_near_dups_orientations_e2e(spark, tmp_path):
    """One-call pass over a crawl directory containing a rotated
    duplicate: found BY DEFAULT (r16 — image_orientations defaults on
    for the conveniences), invisible only under the explicit
    image_orientations=False opt-out — same single-payload-scan
    shape."""
    import shutil

    from realtime_olap_spark.sources.media import (media_dir_near_dups,
                                                   read_media_dir)

    corpus = tmp_path / "crawl"
    corpus.mkdir()
    shutil.copy(os.path.join(FIXTURES, "python.png"),
                corpus / "orig.png")
    enc = M._make_png_encoder()
    base = M._make_png_decoder()(_fix("python.png"))[3]
    (corpus / "rot.png").write_bytes(
        enc(np.ascontiguousarray(np.rot90(base, 1))))
    shutil.copy(os.path.join(FIXTURES, "pluck-pcm16.wav"),
                corpus / "a.wav")
    shutil.copy(os.path.join(FIXTURES, "pluck-pcm16.flac"),
                corpus / "b.flac")
    ids = {os.path.basename(r["path"]): r["media_id"]
           for r in read_media_dir(spark, str(corpus)).collect()}
    plain = media_dir_near_dups(spark, str(corpus),
                                image_orientations=False).collect()
    assert not [r for r in plain if r["modality"] == "image"]
    got = media_dir_near_dups(spark, str(corpus)).collect()
    img = {frozenset((r["id_a"], r["id_b"])): r["hamming"]
           for r in got if r["modality"] == "image"}
    assert img == {frozenset((ids["orig.png"], ids["rot.png"])): 0}
    # the audio family is unaffected by the image orientation knob
    aud = {frozenset((r["id_a"], r["id_b"]))
           for r in got if r["modality"] == "audio"}
    assert frozenset((ids["a.wav"], ids["b.flac"])) in aud


def test_video_near_dup_rotated_copy(spark):
    """A consistently 90°-rotated video copy (every frame rotated,
    re-encoded, re-muxed) is invisible to the plain frame-voting pass
    and found by the orientation-probing one, at full frame count —
    under both alignments, including a trimmed+rotated copy whose
    offset is still reported."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_multimodal import _assemble_mjpeg_avi, _encode_flat_jpeg

    from realtime_olap_spark.operators.phash import (
        frame_hash_signature, video_near_dup_pairs)

    def frame(shift):
        levels = [(40 if c < 1 + (shift % 3) else 200)
                  for c in range(4)]
        return _encode_flat_jpeg([levels], 32, 8)

    def frame_rot(shift):
        # np.rot90(32x8 img) == 8x32 with the block column order
        # reversed down the rows: [l3, l2, l1, l0]
        levels = [(40 if c < 1 + (shift % 3) else 200)
                  for c in range(4)]
        return _encode_flat_jpeg([levels[::-1]], 8, 32)

    # pixel-level sanity: the rotated frame IS np.rot90 of the frame
    dec = M._make_jpeg_decoder()
    a_px = dec(frame(1))[3]
    b_px = dec(frame_rot(1))[3]
    assert np.array_equal(np.rot90(a_px), b_px)

    fA = [frame(i) for i in range(3)]
    fB = [frame_rot(i) for i in range(3)]
    a = _assemble_mjpeg_avi(fA, 32, 8, us_per_frame=40_000)
    b = _assemble_mjpeg_avi(fB, 8, 32, us_per_frame=40_000)
    df = spark.createDataFrame(
        [(1, "video", a), (2, "video", b)],
        "media_id long, media_type string, payload binary")
    plain = frame_hash_signature(df, every_ms=40)
    assert not [r for r in video_near_dup_pairs(
        plain, max_hamming=3, min_matched_frames=2).collect()
        if (r["id_a"], r["id_b"]) == (1, 2)]
    sig = frame_hash_signature(df, every_ms=40, orientations=True)
    rows = sig.collect()
    assert {r["orient"] for r in rows} == set(range(8))
    got = {(r["id_a"], r["id_b"]): r["matched_frames"]
           for r in video_near_dup_pairs(
               sig, max_hamming=3, min_matched_frames=3,
               orientations=True).collect()}
    assert got.get((1, 2)) == 3
    # trimmed + rotated: any_offset still votes one delta
    c = _assemble_mjpeg_avi(fB[1:], 8, 32, us_per_frame=40_000)
    df2 = spark.createDataFrame(
        [(1, "video", a), (3, "video", c)],
        "media_id long, media_type string, payload binary")
    sig2 = frame_hash_signature(df2, every_ms=40, orientations=True)
    shifted = {(r["id_a"], r["id_b"]): r
               for r in video_near_dup_pairs(
                   sig2, max_hamming=3, min_matched_frames=2,
                   align="any_offset", orientations=True).collect()}
    r = shifted[(1, 3)]
    assert r["matched_frames"] == 2 and abs(r["offset_ms"]) == 40
