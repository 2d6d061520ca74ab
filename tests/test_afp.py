"""Audio fingerprinting (r14): the ten pluck fixtures are the SAME
recording shipped by real encoders in ten formats (PCM 8/16/24/32,
G.711 mu/A-law, FLAC, AIFF/AIFC, AU) — the Haitsma-Kalker sign bits
must survive every one of them, while different material decorrelates.
Plus determinism, the NULL/short contract, and the near-dup voting."""

from __future__ import annotations

import math
import os
import struct

import pytest

from realtime_olap_spark.operators.afp import (audio_fingerprint,
                                               audio_near_dup_pairs)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

PLUCKS = ["pluck-pcm16.wav", "pluck-pcm8.wav", "pluck-pcm24.wav",
          "pluck-pcm32.wav", "pluck-pcm16.flac", "pluck-pcm16.aiff",
          "pluck-pcm8.aiff", "pluck-ulaw.aifc", "pluck-alaw.aifc",
          "pluck-ulaw.au"]


def _fix(name):
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


def _sine_wav(freq, ms=400, rate=11025):
    n = rate * ms // 1000
    samp = b"".join(
        struct.pack("<h", int(12000 * math.sin(2 * math.pi * freq
                                               * i / rate)))
        for i in range(n))
    return (b"RIFF" + struct.pack("<I", 36 + len(samp)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                    rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(samp)) + samp)


def test_fingerprints_survive_all_ten_formats(spark):
    rows = [(i, _fix(n)) for i, n in enumerate(PLUCKS)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = audio_fingerprint(df).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], {})[r["frame_ts_ms"]] = r["afp"]
    assert len(by_id) == len(PLUCKS)
    ref = by_id[0]
    assert len(ref) >= 2 and all(v is not None for v in ref.values())
    for i in range(1, len(PLUCKS)):
        other = by_id[i]
        assert set(other) == set(ref), PLUCKS[i]
        worst = max(bin((ref[t] ^ other[t]) & 0xFFFFFFFF).count("1")
                    for t in ref)
        # HK robustness: lossy G.711 / 8-bit depth flip a few sign
        # bits; identical-PCM containers flip none
        assert worst <= 7, (PLUCKS[i], worst)
    # determinism: a second run is identical
    again = {(r["media_id"], r["frame_ts_ms"]): r["afp"]
             for r in audio_fingerprint(df).collect()}
    for r in got:
        assert again[(r["media_id"], r["frame_ts_ms"])] == r["afp"]


def test_different_material_decorrelates(spark):
    df = spark.createDataFrame(
        [(1, _fix("pluck-pcm16.wav")), (2, _sine_wav(440)),
         (3, _sine_wav(1200))],
        "media_id long, payload binary")
    fps = audio_fingerprint(df)
    pairs = {(r["id_a"], r["id_b"]): r
             for r in audio_near_dup_pairs(
                 fps, max_hamming=5, min_matched_frames=2).collect()}
    assert (1, 2) not in pairs and (1, 3) not in pairs
    # the two sines differ from each other too
    assert (2, 3) not in pairs


def test_near_dup_votes_across_formats(spark):
    rows = [(i, _fix(n)) for i, n in enumerate(PLUCKS)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    fps = audio_fingerprint(df)
    pairs = {(r["id_a"], r["id_b"]): r
             for r in audio_near_dup_pairs(
                 fps, max_hamming=7, min_matched_frames=2).collect()}
    # every format pair of the same recording matches at offset 0
    n = len(PLUCKS)
    for a in range(n):
        for b in range(a + 1, n):
            r = pairs.get((a, b))
            assert r is not None, (PLUCKS[a], PLUCKS[b])
            assert r["offset_ms"] == 0
            assert r["matched_frames"] >= 2


def test_contract_short_and_corrupt(spark):
    df = spark.createDataFrame(
        [(1, b"\x00junk"), (2, _sine_wav(440, ms=50)),
         (3, _fix("pluck-pcm16.wav"))],
        "media_id long, payload binary")
    rows = audio_fingerprint(df, with_status=True).collect()
    one = [r for r in rows if r["media_id"] == 1]
    assert len(one) == 1 and one[0]["afp"] is None
    assert one[0]["status"].startswith("unsupported")
    two = [r for r in rows if r["media_id"] == 2]
    assert len(two) == 1 and two[0]["afp"] is None
    assert "shorter" in two[0]["status"]
    three = [r for r in rows if r["media_id"] == 3]
    assert len(three) >= 2
    assert all(r["status"] == "ok" for r in three)
