"""Property-based tests (hypothesis) for the media codec surface —
driver-side, no SparkSession: the decoder/encoder/resize closures are
the exact objects the mapInPandas workers capture, so these invariants
transfer to the executors verbatim.

Laws:
- PNG encode→decode is the identity for every shape/channel count
  (lossless transcode output);
- Adam7 encode→decode is the identity for arbitrary geometry
  (empty-pass arithmetic included);
- aspect-fit resize: never upscales, obeys the shared-scale dim law,
  `nearest` emits only source values, `bilinear` stays inside the
  source value range (convex combination);
- EXIF orientation transforms invert the camera transforms exactly
  and are bijections on positions (all 8 tags, arbitrary dims);
- the G.711 decompanding tables are odd-symmetric under the sign bit
  and strictly monotone in (segment, mantissa) within each half.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_olap_spark.operators import multimodal as M
from tests.test_multimodal import _encode_png_adam7

_decode = M._make_png_decoder()
_encode = M._make_png_encoder()


@st.composite
def _images(draw, max_side=24):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    ch = draw(st.sampled_from([1, 2, 3, 4]))
    seed = draw(st.integers(0, 2 ** 31 - 1))
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, ch), dtype=np.uint8)


@given(_images())
@settings(max_examples=60, deadline=None)
def test_png_encode_decode_identity(px):
    w, h, ch, out = _decode(_encode(px))
    assert (h, w, ch) == px.shape
    assert (out == px).all()


@given(_images(max_side=16))
@settings(max_examples=40, deadline=None)
def test_adam7_roundtrip_identity_any_geometry(px):
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[px.shape[2]]
    got = _decode(_encode_png_adam7(px, ctype))
    assert isinstance(got, tuple)
    assert (got[3] == px).all()


@given(_images(max_side=20), st.integers(1, 16), st.integers(1, 16),
       st.sampled_from(["nearest", "bilinear", "area"]))
@settings(max_examples=120, deadline=None)
def test_resize_invariants(px, tw, th, method):
    out = M._resize_pixels(px, tw, th, method, np)
    h, w = px.shape[:2]
    oh, ow = out.shape[:2]
    # the shared-scale dim law (covers both never-upscale and box fit)
    scale = min(tw / w, th / h, 1.0)
    assert ow == max(1, int(round(w * scale)))
    assert oh == max(1, int(round(h * scale)))
    if method == "nearest":
        assert set(np.unique(out)) <= set(np.unique(px))
    else:
        # bilinear and area are convex combinations of source values
        assert out.min() >= px.min() and out.max() <= px.max()


@given(_images(max_side=12), st.integers(1, 8))
@settings(max_examples=60, deadline=None)
def test_exif_transforms_are_bijections(px, ori):
    """Each orientation transform is a bijection on pixel positions:
    round-tripping through the forward (camera) transform restores the
    array exactly, and the value multiset is preserved."""
    fwd = {
        1: lambda p: p, 2: lambda p: p[:, ::-1],
        3: lambda p: p[::-1, ::-1], 4: lambda p: p[::-1],
        5: lambda p: p.transpose(1, 0, 2),
        6: lambda p: p.transpose(1, 0, 2)[::-1],
        7: lambda p: p.transpose(1, 0, 2)[::-1, ::-1],
        8: lambda p: p.transpose(1, 0, 2)[:, ::-1],
    }
    stored = fwd[ori](px)
    righted = M._apply_exif_orientation(stored, ori, np)
    assert (righted == px).all()
    assert sorted(stored.reshape(-1).tolist()) \
        == sorted(px.reshape(-1).tolist())


def test_g711_tables_structural_laws():
    """Spec-structure laws, independent of stdlib: both tables are
    odd-symmetric under the companded sign bit (flipping byte^0x80
    flips the sign, same magnitude), and magnitude is strictly
    monotone in the (segment, mantissa) code within each half —
    order preservation is the point of companding, and a segment-shift
    transcription error breaks it instantly."""
    ulaw, alaw = M._g711_tables()
    for table in (ulaw, alaw):
        for byte in range(256):
            assert int(table[byte]) == -int(table[byte ^ 0x80])
    # mu-law: byte order within each half IS (seg, mantissa) order on
    # the complemented byte, so the halves are strictly monotone
    neg, pos = ulaw[:128].astype(np.int64), ulaw[128:].astype(np.int64)
    assert (np.diff(neg) > 0).all()   # -32124 .. 0, strictly rising
    assert (np.diff(pos) < 0).all()   # +32124 .. 0, strictly falling
    assert neg[0] == -32124 and pos[0] == 32124
    assert neg[-1] == 0 and pos[-1] == 0
    # A-law: order positive-half entries by their (seg, mantissa) code
    # a&0x7F (a = byte^0x55); magnitudes must strictly increase
    pos_bytes = [b for b in range(256) if (b ^ 0x55) & 0x80]
    mags = [int(alaw[b]) for b in sorted(pos_bytes,
                                         key=lambda b: (b ^ 0x55) & 0x7F)]
    assert all(y > x for x, y in zip(mags, mags[1:]))
    assert mags[0] == 8 and mags[-1] == 32256  # G.711 A-law extremes
