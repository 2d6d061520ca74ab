"""VP8 (lossy WebP) decoder tests — RFC 6386 key frames.

The evidence standard here is PLANE-LEVEL BIT-EXACTNESS against the
system libwebp's own decoder (`WebPDecodeYUV`): VP8 decoding is fully
deterministic, so a correct implementation reproduces the reference
decoder's Y/U/V planes exactly — predictors, boolean decoder, token
trees, dequantization, inverse DCT/WHT and the in-loop deblocking
filter all have to be right for even one plane to match. The encoder
side of the differential is also the real libwebp (random sizes,
qualities 5-95, four content classes, which at default config also
exercises segmentation and per-segment quantizers/filter levels).

The committed `python.webp` golden (CPython test suite) is decoded
end-to-end without the library in `test_webp.py`; here its three
planes are pinned bit-exactly when the library is present.
"""

from __future__ import annotations

import os
import random
import struct

import numpy as np
import pytest

from realtime_olap_spark.operators.vp8 import (
    _make_vp8_decoder,
    _make_vp8_planes_decoder,
)
from realtime_olap_spark.operators.webp import _make_webp_decoder

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
MAXPX = 16_000_000


def _fix(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


def _libwebp():
    import ctypes
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:  # pragma: no cover - env without libwebp
        return None
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
    return lib


def _encode_rgb(lib, px, q):
    import ctypes
    h, w, _ = px.shape
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = lib.WebPEncodeRGB(np.ascontiguousarray(px, np.uint8).tobytes(),
                          w, h, w * 3, ctypes.c_float(q),
                          ctypes.byref(out))
    assert n > 0
    data = bytes(bytearray(out[i] for i in range(n)))
    lib.WebPFree(out)
    return data


def _decode_yuv_ref(lib, data):
    import ctypes
    wi, hi = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_ubyte)()
    vp = ctypes.POINTER(ctypes.c_ubyte)()
    st, uvst = ctypes.c_int(), ctypes.c_int()
    yp = lib.WebPDecodeYUV(data, len(data), ctypes.byref(wi),
                           ctypes.byref(hi), ctypes.byref(up),
                           ctypes.byref(vp), ctypes.byref(st),
                           ctypes.byref(uvst))
    w, h = wi.value, hi.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = np.array([[yp[r * st.value + c] for c in range(w)]
                  for r in range(h)], np.uint8)
    u = np.array([[up[r * uvst.value + c] for c in range(cw)]
                  for r in range(ch)], np.uint8)
    v = np.array([[vp[r * uvst.value + c] for c in range(cw)]
                  for r in range(ch)], np.uint8)
    import ctypes as _c
    lib.WebPFree(yp)
    return w, h, y, u, v


def _vp8_payload(data):
    off = 12
    while off + 8 <= len(data):
        tag = data[off:off + 4]
        ln = struct.unpack("<I", data[off + 4:off + 8])[0]
        if tag == b"VP8 ":
            return data[off + 8:off + 8 + ln]
        off += 8 + ln + (ln & 1)
    raise AssertionError("no VP8 chunk")


def _image(rng, w, h, kind):
    if kind == "noise":
        return np.array([[[rng.randrange(256) for _ in range(3)]
                          for _ in range(w)] for _ in range(h)],
                        np.uint8)
    if kind == "gray-noise":  # flat chroma, busy luma
        return np.array([[[rng.randrange(256)] * 3 for _ in range(w)]
                         for _ in range(h)], np.uint8)
    if kind == "gradient":
        xs = np.arange(w)
        ys = np.arange(h)[:, None]
        px = np.zeros((h, w, 3), np.uint8)
        px[:, :, 0] = (xs * 7 + ys * 3) & 0xFF
        px[:, :, 1] = (xs ^ ys) & 0xFF
        px[:, :, 2] = (xs * 2 + ys * 5) & 0xFF
        return px
    px = np.zeros((h, w, 3), np.uint8)  # "blocks"
    for by in range(0, h, 4):
        for bx in range(0, w, 4):
            px[by:by + 4, bx:bx + 4] = [rng.randrange(256)
                                        for _ in range(3)]
    return px


def test_python_webp_planes_bit_exact_vs_libwebp():
    lib = _libwebp()
    if lib is None:  # pragma: no cover
        pytest.skip("libwebp.so.7 not present")
    data = _fix("python.webp")
    w, h, ry, ru, rv = _decode_yuv_ref(lib, data)
    res = _make_vp8_planes_decoder(MAXPX)(_vp8_payload(data))
    assert isinstance(res, tuple)
    gw, gh, gy, gu, gv = res
    assert (gw, gh) == (w, h) == (16, 16)
    assert (gy == ry).all()
    assert (gu == ru).all()
    assert (gv == rv).all()


@pytest.mark.parametrize("kind", ["noise", "gray-noise", "gradient",
                                  "blocks"])
def test_vp8_planes_bit_exact_random_encodes(kind):
    """Real-encoder differential: random sizes and qualities; every
    stream must reproduce libwebp's planes exactly. Default encoder
    config enables segmentation on complex content, so per-segment
    quantizers and loop-filter levels are exercised too."""
    lib = _libwebp()
    if lib is None:  # pragma: no cover
        pytest.skip("libwebp.so.7 not present")
    dec = _make_vp8_planes_decoder(MAXPX)
    rng = random.Random(hash(kind) & 0xFFFF)
    for _ in range(5):
        w = rng.randrange(1, 130)
        h = rng.randrange(1, 100)
        q = rng.choice([5, 20, 40, 60, 75, 95])
        px = _image(rng, w, h, kind)
        data = _encode_rgb(lib, px, q)
        rw, rh, ry, ru, rv = _decode_yuv_ref(lib, data)
        res = dec(_vp8_payload(data))
        assert isinstance(res, tuple), f"{kind} {w}x{h} q{q}: {res}"
        gw, gh, gy, gu, gv = res
        assert (gw, gh) == (rw, rh) == (w, h)
        assert (gy == ry).all(), f"{kind} {w}x{h} q{q} Y"
        assert (gu == ru).all(), f"{kind} {w}x{h} q{q} U"
        assert (gv == rv).all(), f"{kind} {w}x{h} q{q} V"


def test_vp8_gates():
    payload = bytearray(_vp8_payload(_fix("python.webp")))
    dec = _make_vp8_decoder(MAXPX)
    # inter-frame bit set -> named gate, not a wrong decode
    inter = bytearray(payload)
    inter[0] |= 1
    assert dec(bytes(inter)) == "unsupported: WebP inter frame"
    # version > 3 -> named gate
    ver = bytearray(payload)
    ver[0] = (ver[0] & ~0x0F) | (4 << 1)
    assert dec(bytes(ver)) == "unsupported: VP8 version 4"
    # bad start code -> malformed
    bad = bytearray(payload)
    bad[3] ^= 0xFF
    assert dec(bytes(bad)) is None
    # bomb guard fires before allocation
    big = bytearray(payload)
    big[6] = 0xFF
    big[7] = 0x3F
    big[8] = 0xFF
    big[9] = 0x3F
    out = dec(bytes(big))
    assert out == "unsupported: image too large (16383x16383)"


def test_vp8_fuzz_truncation_and_bit_flips():
    """Three-valued contract on the lossy path: every truncation
    offset of the VP8 payload and random bit flips return
    tuple/None/reason — nothing raises (one bad file never kills a
    corpus job)."""
    payload = _vp8_payload(_fix("python.webp"))
    dec = _make_vp8_decoder(MAXPX)
    for cut in range(len(payload)):
        out = dec(payload[:cut])
        assert out is None or isinstance(out, (tuple, str))
    rng = random.Random(7)
    for _ in range(600):
        b = bytearray(payload)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        out = dec(bytes(b))
        assert out is None or isinstance(out, (tuple, str))


def test_full_container_rgba_via_alpha_merge():
    """webp.py merges the VP8 RGB with the ALPH plane into RGBA."""
    res = _make_webp_decoder(MAXPX)(_fix("python.webp"))
    assert isinstance(res, tuple)
    w, h, ch, px = res
    assert (w, h, ch) == (16, 16, 4)
    assert px.shape == (16, 16, 4)


# --------------------------------------------------------------------
# WebM video keyframe sampling: real libwebp-encoded VP8 keyframes
# muxed by a spec-written EBML muxer, demuxed + decoded by webp.py
# --------------------------------------------------------------------

def _el(eid, body):
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(body)
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:
            return idb + ((1 << (7 * ln)) | n).to_bytes(ln, "big") + body
    raise AssertionError


def _mux_webm(vp8_keyframes, duration_ms, with_inter_stub=False):
    """(ts_ms, vp8_payload) list -> minimal Matroska stream."""
    header = _el(0x1A45DFA3, _el(0x4282, b"webm"))
    info = _el(0x1549A966,
               _el(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
               + _el(0x4489, struct.pack(">d", float(duration_ms))))
    track = _el(0xAE, _el(0xD7, b"\x01") + _el(0x83, b"\x01")
                + _el(0x86, b"V_VP8"))
    tracks = _el(0x1654AE6B, track)
    blocks = b""
    for ts, payload in vp8_keyframes:
        blk = b"\x81" + struct.pack(">h", ts) + b"\x80" + payload
        blocks += _el(0xA3, blk)
    if with_inter_stub:
        # non-keyframe SimpleBlock (flags 0x00) with a truncated
        # payload: now that every block is DECODED (r12 inter-frame
        # support), a corrupt mid-stream block makes the video
        # corrupt (None) instead of being silently skipped
        blocks += _el(0xA3, b"\x81" + struct.pack(">h", 5) + b"\x00"
                      + b"\x11\x22\x33")
    cluster = _el(0x1F43B675, _el(0xE7, b"\x00") + blocks)
    return header + _el(0x18538067, info + tracks + cluster)


def _encode_vp8_payload(lib, px, q=80.0):
    data = _encode_rgb(lib, px, q)
    return _vp8_payload(data)


def test_webm_keyframe_video_decodes_bit_exact_frames():
    lib = _libwebp()
    if lib is None:  # pragma: no cover
        pytest.skip("libwebp.so.7 not present")
    from realtime_olap_spark.operators.webp import \
        _make_webm_video_decoder
    dec = _make_webm_video_decoder(MAXPX)
    rng = random.Random(11)
    w, h = 32, 24
    frames_px = []
    payloads = []
    for i in range(3):
        px = np.full((h, w, 3), [(40 * i + 30) % 256,
                                 (90 * i + 10) % 256, 200], np.uint8)
        px[4:12, 6:20] = [255 - 60 * i, 30, 60 * i]
        frames_px.append(px)
        payloads.append(_encode_vp8_payload(lib, px))
    data = _mux_webm([(0, payloads[0]), (400, payloads[1]),
                      (900, payloads[2])], 1500)
    res = dec(data)
    assert isinstance(res, tuple), res
    gw, gh, frames = res
    assert (gw, gh) == (w, h)
    # keyframe spans: [0,400) [400,900) [900,1500)
    assert [(s, d) for s, d, _ in frames] == [(0, 400), (400, 500),
                                              (900, 600)]
    # each frame's pixels == the VP8 core's own decode of that payload
    # (the core itself is pinned bit-exactly elsewhere; this pins the
    # DEMUX routing: right payload at right timestamp)
    from realtime_olap_spark.operators.vp8 import _make_vp8_decoder
    core = _make_vp8_decoder(MAXPX)
    for (ts, _, rgba), payload in zip(frames, payloads):
        cw, chh, rgb = core(payload)
        assert (rgba[:, :, :3] == rgb).all(), ts
        assert (rgba[:, :, 3] == 255).all()


def test_webm_video_gates_and_fuzz():
    lib = _libwebp()
    if lib is None:  # pragma: no cover
        pytest.skip("libwebp.so.7 not present")
    from realtime_olap_spark.operators.webp import \
        _make_webm_video_decoder
    dec = _make_webm_video_decoder(MAXPX)
    px = np.zeros((16, 16, 3), np.uint8)
    payload = _encode_vp8_payload(lib, px)
    data = _mux_webm([(0, payload)], 100)
    assert isinstance(dec(data), tuple)
    # foreign codec gated by name
    vp9 = data.replace(b"V_VP8", b"V_VP9")
    assert dec(vp9) == "unsupported: video codec V_VP9"
    assert dec(b"RIFFxxxxWEBP") == "unsupported: not EBML"
    for cut in range(len(data)):
        out = dec(data[:cut])
        assert out is None or isinstance(out, (tuple, str))
    rng = random.Random(12)
    for _ in range(800):
        b = bytearray(data)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        out = dec(bytes(b))
        assert out is None or isinstance(out, (tuple, str))


def test_decode_frames_samples_webm_video(spark):
    lib = _libwebp()
    if lib is None:  # pragma: no cover
        pytest.skip("libwebp.so.7 not present")
    from realtime_olap_spark.operators import multimodal as M
    p1 = _encode_vp8_payload(
        lib, np.full((16, 16, 3), [200, 0, 0], np.uint8))
    p2 = _encode_vp8_payload(
        lib, np.full((16, 16, 3), [0, 200, 0], np.uint8))
    data = _mux_webm([(0, p1), (100, p2)], 200)
    df = spark.createDataFrame(
        [(1, "video", data)],
        "media_id long, media_type string, payload binary")
    rows = M.decode_frames(df, every_ms=50).collect()
    ts = sorted(r["frame_ts_ms"] for r in rows)
    assert ts == [0, 50, 100, 150]
    dec = M._make_png_decoder()
    px0 = dec(bytes(next(r for r in rows
                         if r["frame_ts_ms"] == 0)["payload"]))[3]
    px3 = dec(bytes(next(r for r in rows
                         if r["frame_ts_ms"] == 150)["payload"]))[3]
    assert px0[8, 8, 0] > 150 and px0[8, 8, 1] < 60   # red keyframe
    assert px3[8, 8, 1] > 150 and px3[8, 8, 0] < 60   # green keyframe
