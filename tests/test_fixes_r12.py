"""Round-12 ADVICE regressions: FLAC frame/STREAMINFO bit-depth
agreement, WebP RIFF trailing-byte tolerance (decode + probe +
animation), and NULL frame_count for an animated-flagged WebP with no
ANMF chunks. The VP8 loop-filter gate fix (filter_level==0 +
segmentation) is covered differentially in
tests/test_webp_config_sweep.py ("filter-off-4-segments")."""

from __future__ import annotations

import os
import struct

import numpy as np

from realtime_olap_spark.operators.multimodal import _make_png_decoder
from realtime_olap_spark.operators.webp import (
    _make_webp_animation_decoder, _make_webp_decoder, _make_webp_prober)

from test_flac import _dec, _encode_flac, _expect

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
MAXPX = 1 << 24


def _fix(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


# ---------------------------------------------------------------------------
# FLAC: frame-header bit depth must agree with STREAMINFO (RFC 9639)
# ---------------------------------------------------------------------------

def test_flac_honors_frame_header_bit_depth_over_streaminfo():
    """r13 ADVICE: libFLAC honors the PER-FRAME header bit depth when
    it differs from STREAMINFO's, so we normalize each frame by its
    own header depth instead of rejecting. Build a valid 8-bit stream
    (frames carry the explicit 8-bit size code), then patch only the
    STREAMINFO depth field to claim 16-bit: the decode must still
    equal the 8-bit-normalized expectation — the frame header won."""
    x = (np.arange(64, dtype=np.int64).reshape(-1, 1) % 100) - 50
    good = bytearray(_encode_flac(x, 44100, bps=8))
    res = _dec(bytes(good))
    assert isinstance(res, tuple)
    assert (res[3] == _expect(x, 8)).all()
    # STREAMINFO body starts at 8 (fLaC + block header); bits [103:108]
    # are bps-1, split 1 bit in byte 12 / 4 bits in byte 13.
    si = 8
    bps_m1 = ((good[si + 12] & 1) << 4) | (good[si + 13] >> 4)
    assert bps_m1 + 1 == 8
    good[si + 12] &= ~1          # bps-1 = 15 -> bit4 = 0
    good[si + 13] = (good[si + 13] & 0x0F) | (0xF << 4)
    res2 = _dec(bytes(good))
    assert isinstance(res2, tuple), res2
    assert (res2[3] == _expect(x, 8)).all()


# ---------------------------------------------------------------------------
# WebP: trailing bytes beyond the declared RIFF payload are ignored
# ---------------------------------------------------------------------------

def test_webp_decode_ignores_trailing_bytes():
    dec = _make_webp_decoder(MAXPX)
    clean = dec(_fix("python.webp"))
    assert isinstance(clean, tuple)
    noisy = dec(_fix("python.webp") + b"XMP appended metadata\x00\x01")
    assert isinstance(noisy, tuple), noisy
    assert noisy[:3] == clean[:3]
    assert (noisy[3] == clean[3]).all()


def test_webp_probe_ignores_trailing_bytes():
    probe = _make_webp_prober()
    clean = probe(_fix("python.webp"))
    noisy = probe(_fix("python.webp") + b"\x00" * 37)
    assert clean == noisy
    assert clean[2:5] == (16, 16, "vp8")


def _vp8l_1x1(argb=0xFF112233):
    """Minimal VP8L chunk payload: 1x1 literal pixel via the simple
    one-symbol prefix codes (the same layout the roundtrip suite's
    writer emits for single-color images)."""
    from test_webp import _BW, _Vp8lWriter
    bw = _BW()
    bw.put(0x2F, 8)
    bw.put(0, 14)  # w-1
    bw.put(0, 14)  # h-1
    bw.put(0, 1)   # alpha hint
    bw.put(0, 3)   # version
    bw.put(0, 1)   # no transforms
    bw.put(0, 1)   # no color cache
    bw.put(0, 1)   # no meta prefix
    wr = _Vp8lWriter(bw)
    a, r, g, b = (argb >> 24) & 0xFF, (argb >> 16) & 0xFF, \
        (argb >> 8) & 0xFF, argb & 0xFF
    codes = [wr.write_prefix_code([g], alphabet=280),
             wr.write_prefix_code([r]), wr.write_prefix_code([b]),
             wr.write_prefix_code([a]),
             wr.write_prefix_code([0], alphabet=40)]
    wr.emit(codes[0], g)
    wr.emit(codes[1], r)
    wr.emit(codes[2], b)
    wr.emit(codes[3], a)
    return bw.bytes()


def _chunk(tag, payload):
    return tag + struct.pack("<I", len(payload)) + payload \
        + (b"\x00" if len(payload) & 1 else b"")


def _riff(chunks_bytes):
    return b"RIFF" + struct.pack("<I", 4 + len(chunks_bytes)) \
        + b"WEBP" + chunks_bytes


def _animated_webp():
    sub = _chunk(b"VP8L", _vp8l_1x1())
    anmf = _chunk(b"ANMF", bytes(6)           # x=0,y=0 (2px units)
                  + b"\x00\x00\x00"           # fw-1 = 0
                  + b"\x00\x00\x00"           # fh-1 = 0
                  + b"\x64\x00\x00"           # 100 ms
                  + b"\x00" + sub)            # blend, keep
    vp8x = _chunk(b"VP8X", bytes([0x02]) + bytes(3)
                  + b"\x00\x00\x00" + b"\x00\x00\x00")  # 1x1 canvas
    anim = _chunk(b"ANIM", bytes(6))
    return _riff(vp8x + anim + anmf)


def test_webp_animation_ignores_trailing_bytes():
    dec = _make_webp_animation_decoder(MAXPX)
    data = _animated_webp()
    clean = dec(data)
    assert isinstance(clean, tuple), clean
    w, h, frames = clean
    assert (w, h, len(frames)) == (1, 1, 1)
    assert frames[0][:2] == (0, 100)
    assert tuple(frames[0][2][0, 0]) == (0x11, 0x22, 0x33, 0xFF)
    noisy = dec(data + b"trailing junk after RIFF payload")
    assert isinstance(noisy, tuple), noisy
    assert len(noisy[2]) == 1
    assert (noisy[2][0][2] == frames[0][2]).all()


def test_webp_probe_animated_without_anmf_nulls_frame_count():
    """ANIM flag set but zero ANMF chunks: the frame count is unknown
    — NULL, not 0-as-fact (r11 ADVICE)."""
    probe = _make_webp_prober()
    vp8x = _chunk(b"VP8X", bytes([0x02]) + bytes(3)
                  + b"\x00\x00\x00" + b"\x00\x00\x00")
    data = _riff(vp8x + _chunk(b"ANIM", bytes(6))
                 + _chunk(b"VP8L", _vp8l_1x1()))
    res = probe(data)
    assert isinstance(res, tuple), res
    assert res[7] is None
    assert res[2:5] == (1, 1, "vp8l")
    # sanity: the real animated container still counts its frames
    res2 = probe(_animated_webp())
    assert res2[7] == 1 and res2[1] == 100
