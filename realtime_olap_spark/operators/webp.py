"""Clean-room WebP container decoder (RIFF walk + alpha plane).

Implements the public "WebP Container Specification": the RIFF/WEBP
chunk walk, the simple-lossless layout (a single ``VP8L`` chunk,
decoded by :mod:`.vp8l`), the extended ``VP8X`` layout (canvas
dimensions, feature flags, an optional ``ALPH`` lossless-compressed
alpha plane in front of a lossy ``VP8 `` image), and the ``ALPH``
chunk's own header: compression method (raw / VP8L image-stream whose
green channel carries the alpha values) and the three alpha filters
(horizontal, vertical, gradient) applied after decompression.

The lossy ``VP8 `` key-frame payload is decoded by :mod:`.vp8`
(RFC 6386) when that module is importable; the container code merges
its RGB output with the ``ALPH`` plane into RGBA.

Same house rules as the sibling codecs in ``operators/multimodal.py``:
factory + nested closures, the three-valued per-row contract
(``(w, h, ch, ndarray)`` / ``None`` / ``"unsupported: …"``), a pixel
guard before any allocation, and nothing raising per-row.
"""

from __future__ import annotations

from .vp8l import _make_vp8l_stream_decoder


def _make_alpha_unfilter():
    """Inverse alpha filters (container spec §"Alpha filtering
    method"): per-byte predictors added mod 256. Row 0 of every
    method reduces to the horizontal filter; the gradient predictor
    is clip(left + top - top_left)."""
    import numpy as np

    def unfilter(plane, method):
        h, w = plane.shape
        if method == 0:
            return plane
        out = plane.astype(np.int32)
        if method == 1:  # horizontal
            for y in range(h):
                prev = out[y - 1, 0] if y else 0
                row = np.cumsum(out[y] + np.concatenate(
                    ([prev], np.zeros(w - 1, np.int32)))) & 0xFF
                out[y] = row
        elif method == 2:  # vertical
            first = np.cumsum(out[0]) & 0xFF  # row 0 is horizontal
            out[0] = first
            out[1:] = (np.cumsum(out[1:], axis=0) + first) & 0xFF
        else:  # gradient
            row0 = np.cumsum(out[0]) & 0xFF
            out[0] = row0
            for y in range(1, h):
                left = int(out[y - 1, 0])
                top_left = left
                for x in range(w):
                    top = int(out[y - 1, x])
                    g = left + top - top_left
                    g = 0 if g < 0 else 255 if g > 255 else g
                    left = (int(out[y, x]) + g) & 0xFF
                    top_left = top
                    out[y, x] = left
        return out.astype(np.uint8)

    return unfilter


def _make_alph_decoder(max_pixels: int):
    """Decode an ``ALPH`` chunk payload at canvas dimensions into a
    uint8 alpha plane. Three-valued: plane / None / reason string."""
    import numpy as np

    vp8l = _make_vp8l_stream_decoder(max_pixels)
    unfilter = _make_alpha_unfilter()

    def decode(payload, w, h):
        if len(payload) < 1:
            return None
        b0 = payload[0]
        comp = b0 & 3
        filt = (b0 >> 2) & 3
        pre = (b0 >> 4) & 3
        if b0 >> 6:
            return None  # reserved bits must be zero
        if pre != 0:
            return "unsupported: preprocessed alpha"
        if comp == 0:
            raw = payload[1:1 + w * h]
            if len(raw) < w * h:
                return None
            plane = np.frombuffer(raw, np.uint8).reshape(h, w)
        elif comp == 1:
            res = vp8l(payload[1:], w, h)
            if not isinstance(res, tuple):
                return res
            plane = ((res[2] >> 8) & 0xFF).astype(np.uint8)
        else:
            return None
        return unfilter(plane, filt)

    return decode


def _make_webp_decoder(max_pixels: int):
    """Build the WebP decoder: sniffs the RIFF layout and routes to
    the VP8L lossless core, the RFC 6386 lossy core (if built), or an
    honest ``"unsupported: …"`` gate. Animated files (``ANIM``/
    ``ANMF``) and preprocessed alpha are gated, not mis-decoded."""
    import struct

    import numpy as np

    vp8l = _make_vp8l_stream_decoder(max_pixels)
    alph = _make_alph_decoder(max_pixels)
    try:
        from .vp8 import _make_vp8_decoder
        vp8 = _make_vp8_decoder(max_pixels)
    except ImportError:  # pragma: no cover - lossy core not built
        vp8 = None

    def from_argb(res):
        w, h, arr = res
        a = (arr >> 24).astype(np.uint8)
        px = np.dstack([
            ((arr >> 16) & 0xFF).astype(np.uint8),
            ((arr >> 8) & 0xFF).astype(np.uint8),
            (arr & 0xFF).astype(np.uint8),
            a,
        ])
        if bool((a == 255).all()):
            return w, h, 3, np.ascontiguousarray(px[:, :, :3])
        return w, h, 4, px

    def lossy(payload, alpha_payload, cw, ch):
        if vp8 is None:
            return "unsupported: lossy WebP (VP8)"
        res = vp8(payload)
        if not isinstance(res, tuple):
            return res
        w, h, px = res
        if alpha_payload is None:
            return w, h, 3, px
        if cw != w or ch != h:
            return None
        plane = alph(alpha_payload, w, h)
        if not isinstance(plane, np.ndarray):
            return plane
        return w, h, 4, np.dstack([px, plane])

    def decode(data):
        if not isinstance(data, (bytes, bytearray)):
            return None
        data = bytes(data)
        if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
            return None
        try:
            chunks = []
            off = 12
            while off + 8 <= len(data):
                tag = data[off:off + 4]
                ln = struct.unpack("<I", data[off + 4:off + 8])[0]
                payload = data[off + 8:off + 8 + ln]
                if len(payload) < ln:
                    return None  # truncated chunk
                chunks.append((tag, payload))
                off += 8 + ln + (ln & 1)
            if not chunks:
                return None
            tag0, payload0 = chunks[0]
            if tag0 == b"VP8L":
                res = vp8l(payload0)
                return from_argb(res) if isinstance(res, tuple) else res
            if tag0 == b"VP8 ":
                return lossy(payload0, None, 0, 0)
            if tag0 != b"VP8X" or len(payload0) < 10:
                return None
            flags = payload0[0]
            if flags & 0x02 or any(t in (b"ANIM", b"ANMF")
                                   for t, _ in chunks):
                return "unsupported: animated WebP"
            cw = 1 + int.from_bytes(payload0[4:7], "little")
            chh = 1 + int.from_bytes(payload0[7:10], "little")
            if cw * chh > max_pixels:
                return f"unsupported: image too large ({cw}x{chh})"
            alpha_payload = None
            for tag, payload in chunks[1:]:
                if tag == b"ALPH":
                    alpha_payload = payload
                elif tag == b"VP8L":
                    res = vp8l(payload)
                    if isinstance(res, tuple):
                        return from_argb(res)
                    return res
                elif tag == b"VP8 ":
                    return lossy(payload, alpha_payload, cw, chh)
            return None  # extended layout with no image chunk
        except (struct.error, IndexError, ValueError):
            return None

    return decode
