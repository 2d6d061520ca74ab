"""Full-config libwebp differential sweep for the VP8/VP8L decoders.

The simple ``WebPEncodeRGB``/``WebPEncodeLosslessRGBA`` API (used by
`test_webp_lossy.py`) never exercises several decoder paths: the
SIMPLE in-loop filter, nonzero filter sharpness, multiple token
partitions, explicit segment counts, autofilter, and the ALPH alpha
FILTERING methods. This module drives the library's full encoder API
via ctypes (``WebPConfig`` + ``WebPPicture`` + ``WebPEncode``,
ABI-checked through ``WebPConfigInitInternal`` so a mismatched library
skips instead of corrupting) and pins plane-level bit-exactness across
a grid of those knobs. Every stream here is real encoder output; the
decode comparison baseline is the same library's own decoder.
"""

from __future__ import annotations

import ctypes
import os
import struct

import numpy as np
import pytest

from realtime_olap_spark.operators.vp8 import _make_vp8_planes_decoder
from realtime_olap_spark.operators.webp import _make_webp_decoder

MAXPX = 16_000_000
_ABI_ENC = 0x020F

_WRITER = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
                           ctypes.c_size_t, ctypes.c_void_p)


class _WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int),
        ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int),
        ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int),
        ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int),
        ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int),
        ("pad", ctypes.c_uint32 * 32),  # generous tail guard
    ]


class _WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.c_void_p), ("u", ctypes.c_void_p),
        ("v", ctypes.c_void_p),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", _WRITER), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int),
        ("extra_info", ctypes.c_void_p),
        ("stats", ctypes.c_void_p),
        ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p),
        ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8),
        ("tail_guard", ctypes.c_uint8 * 256),  # overflow safety
    ]


def _libwebp():
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError:  # pragma: no cover
        return None
    cfg = _WebPConfig()
    if not lib.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(75.0), _ABI_ENC):
        return None  # pragma: no cover - ABI drift: skip, don't crash
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    return lib


def _encode(lib, px, rgba=False, **knobs):
    """Encode with explicit config knobs; returns the WebP bytes."""
    h, w = px.shape[:2]
    cfg = _WebPConfig()
    assert lib.WebPConfigInitInternal(ctypes.byref(cfg), 0,
                                      ctypes.c_float(
                                          knobs.pop("quality", 75.0)),
                                      _ABI_ENC)
    for k, v in knobs.items():
        setattr(cfg, k, v)
    pic = _WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), _ABI_ENC)
    pic.width, pic.height = w, h
    pic.use_argb = 1 if cfg.lossless else 0
    buf = np.ascontiguousarray(px, np.uint8).tobytes()
    if rgba:
        assert lib.WebPPictureImportRGBA(ctypes.byref(pic), buf, w * 4)
    else:
        assert lib.WebPPictureImportRGB(ctypes.byref(pic), buf, w * 3)
    out = bytearray()

    @_WRITER
    def writer(data, size, _pic):
        out.extend(bytes(bytearray(data[i] for i in range(size))))
        return 1

    pic.writer = writer
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    lib.WebPPictureFree(ctypes.byref(pic))
    assert ok, f"encode failed: error_code={pic.error_code}"
    return bytes(out)


def _ref_yuv(lib, data, w, h):
    wi, hi = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_ubyte)()
    vp = ctypes.POINTER(ctypes.c_ubyte)()
    st, uvst = ctypes.c_int(), ctypes.c_int()
    yp = lib.WebPDecodeYUV(data, len(data), ctypes.byref(wi),
                           ctypes.byref(hi), ctypes.byref(up),
                           ctypes.byref(vp), ctypes.byref(st),
                           ctypes.byref(uvst))
    assert (wi.value, hi.value) == (w, h)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = np.array([[yp[r * st.value + c] for c in range(w)]
                  for r in range(h)], np.uint8)
    u = np.array([[up[r * uvst.value + c] for c in range(cw)]
                  for r in range(ch)], np.uint8)
    v = np.array([[vp[r * uvst.value + c] for c in range(cw)]
                  for r in range(ch)], np.uint8)
    lib.WebPFree(yp)
    return y, u, v


def _ref_rgba(lib, data, w, h):
    wi, hi = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(wi),
                           ctypes.byref(hi))
    assert (wi.value, hi.value) == (w, h)
    arr = np.ctypeslib.as_array(p, shape=(h, w, 4)).copy()
    lib.WebPFree(p)
    return arr


def _vp8_payload(data):
    off = 12
    while off + 8 <= len(data):
        tag = data[off:off + 4]
        ln = struct.unpack("<I", data[off + 4:off + 8])[0]
        if tag == b"VP8 ":
            return data[off + 8:off + 8 + ln]
        off += 8 + ln + (ln & 1)
    raise AssertionError("no VP8 chunk")


def _photo(w, h, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 200, (h // 8 + 1, w // 8 + 1, 3))
    px = base.repeat(8, 0).repeat(8, 1)[:h, :w]
    return np.ascontiguousarray(
        np.clip(px + rng.integers(0, 40, (h, w, 3)), 0, 255), np.uint8)


LOSSY_GRID = [
    # (knobs, label)
    (dict(partitions=1), "2-partitions"),
    (dict(partitions=2), "4-partitions"),
    (dict(partitions=3), "8-partitions"),
    (dict(filter_type=0, filter_strength=35), "simple-filter"),
    (dict(filter_type=0, filter_strength=63, filter_sharpness=2),
     "simple-sharp"),
    (dict(filter_sharpness=3, filter_strength=50), "normal-sharp3"),
    (dict(filter_sharpness=7, filter_strength=63), "normal-sharp7"),
    (dict(filter_strength=0), "filter-off"),
    # filter_level==0 in the frame header WITH segmentation active:
    # reference decoders skip the loop-filter pass entirely here even
    # if segment LF data is present (r11 ADVICE) — must stay bit-exact
    (dict(filter_strength=0, segments=4, quality=12.0,
          sns_strength=90), "filter-off-4-segments"),
    (dict(autofilter=1), "autofilter"),
    (dict(segments=1), "1-segment"),
    (dict(segments=2, quality=30.0), "2-segments-q30"),
    (dict(segments=4, quality=10.0, sns_strength=90), "4-segments-q10"),
    (dict(quality=95.0, method=6), "q95-method6"),
    (dict(quality=5.0, method=0), "q5-method0"),
    (dict(partitions=3, filter_type=0, filter_sharpness=5,
          segments=3, quality=40.0), "kitchen-sink"),
]


@pytest.mark.parametrize("knobs,label", LOSSY_GRID,
                         ids=[l for _, l in LOSSY_GRID])
def test_vp8_bit_exact_across_encoder_configs(knobs, label):
    lib = _libwebp()
    if lib is None:  # pragma: no cover
        pytest.skip("libwebp.so.7 / encoder ABI not available")
    dec = _make_vp8_planes_decoder(MAXPX)
    for seed, (w, h) in ((1, (80, 64)), (2, (53, 37))):
        px = _photo(w, h, seed)
        data = _encode(lib, px, **dict(knobs))
        ry, ru, rv = _ref_yuv(lib, data, w, h)
        res = dec(_vp8_payload(data))
        assert isinstance(res, tuple), f"{label} {w}x{h}: {res}"
        gw, gh, gy, gu, gv = res
        assert (gw, gh) == (w, h)
        assert (gy == ry).all(), f"{label} {w}x{h} Y"
        assert (gu == ru).all(), f"{label} {w}x{h} U"
        assert (gv == rv).all(), f"{label} {w}x{h} V"


@pytest.mark.parametrize("alpha_filtering", [0, 1, 2])
def test_alpha_plane_filter_methods_bit_exact(alpha_filtering):
    """RGBA lossy encodes: the ALPH chunk's VP8L payload + filtering
    method decode to exactly the alpha plane libwebp reproduces."""
    lib = _libwebp()
    if lib is None:  # pragma: no cover
        pytest.skip("libwebp.so.7 / encoder ABI not available")
    dec = _make_webp_decoder(MAXPX)
    rng = np.random.default_rng(40 + alpha_filtering)
    w, h = 64, 48
    rgb = _photo(w, h, 9)
    alpha = rng.integers(0, 256, (h, w, 1)).astype(np.uint8)
    alpha[:8] = 255  # a fully-opaque band keeps RGB comparable there
    px = np.ascontiguousarray(np.dstack([rgb, alpha]), np.uint8)
    data = _encode(lib, px, rgba=True,
                   alpha_filtering=alpha_filtering)
    want = _ref_rgba(lib, data, w, h)
    res = dec(data)
    assert isinstance(res, tuple), res
    gw, gh, ch, gpx = res
    assert (gw, gh, ch) == (w, h, 4)
    assert (gpx[:, :, 3] == want[:, :, 3]).all(), "alpha plane"


@pytest.mark.parametrize("knobs,label", [
    (dict(lossless=1, exact=1), "lossless-exact"),
    (dict(lossless=1, near_lossless=60), "near-lossless-60"),
    (dict(lossless=1, method=0, quality=0.0), "lossless-fast"),
    (dict(lossless=1, method=6, quality=100.0), "lossless-max-effort"),
], ids=["exact", "near60", "fast", "max-effort"])
def test_vp8l_bit_exact_across_encoder_configs(knobs, label):
    lib = _libwebp()
    if lib is None:  # pragma: no cover
        pytest.skip("libwebp.so.7 / encoder ABI not available")
    dec = _make_webp_decoder(MAXPX)
    rng = np.random.default_rng(77)
    w, h = 70, 46
    rgb = _photo(w, h, 5)
    alpha = rng.integers(100, 256, (h, w, 1)).astype(np.uint8)
    px = np.ascontiguousarray(np.dstack([rgb, alpha]), np.uint8)
    data = _encode(lib, px, rgba=True, **dict(knobs))
    want = _ref_rgba(lib, data, w, h)
    res = dec(data)
    assert isinstance(res, tuple), f"{label}: {res}"
    gw, gh, ch, gpx = res
    assert (gw, gh) == (w, h)
    if ch == 3:
        gpx = np.dstack([gpx, np.full((h, w), 255, np.uint8)])
    assert (gpx == want).all(), label
