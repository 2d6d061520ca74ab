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
            # Chunks live inside the declared RIFF payload; bytes
            # past 8+riff_size are trailing data (appended metadata,
            # padding) that libwebp ignores — clamp, don't reject.
            end = min(len(data),
                      8 + struct.unpack("<I", data[4:8])[0])
            chunks = []
            off = 12
            while off + 8 <= end:
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


def _make_webp_prober():
    """Metadata-only WebP prober (container spec): RIFF chunk walk —
    canvas dims from the VP8L header / VP8 frame tag / VP8X fields,
    ``video_codec`` = 'vp8' or 'vp8l', animation frame count and total
    duration from ``ANMF`` headers (24-bit milliseconds each) —
    without entropy-decoding anything, so cost is O(chunk headers).
    Same tuple shape as the BMFF/GIF probers, with ``major_brand`` =
    'webp'; ``None`` for malformed, ``"unsupported: not WebP"`` for
    foreign magic. Nested function, captured by value (house rule)."""
    import struct

    def probe(data):
        if not isinstance(data, (bytes, bytearray)):
            return None
        data = bytes(data)
        if len(data) < 12 or data[:4] != b"RIFF" \
                or data[8:12] != b"WEBP":
            return "unsupported: not WebP"
        try:
            # Trailing bytes past the declared RIFF payload are
            # ignored (libwebp behavior), not treated as malformed.
            end = min(len(data),
                      8 + struct.unpack("<I", data[4:8])[0])
            w = h = None
            codec = None
            frames = 0
            total_ms = 0
            animated = False
            off = 12
            while off + 8 <= end:
                tag = data[off:off + 4]
                ln = struct.unpack("<I", data[off + 4:off + 8])[0]
                payload = data[off + 8:off + 8 + ln]
                if len(payload) < ln:
                    return None
                if tag == b"VP8X" and ln >= 10:
                    if w is None:
                        w = 1 + int.from_bytes(payload[4:7], "little")
                        h = 1 + int.from_bytes(payload[7:10], "little")
                    animated = bool(payload[0] & 0x02)
                elif tag == b"VP8L" and ln >= 5:
                    if payload[0] != 0x2F:
                        return None
                    bits = int.from_bytes(payload[1:5], "little")
                    if w is None:
                        w = (bits & 0x3FFF) + 1
                        h = ((bits >> 14) & 0x3FFF) + 1
                    if codec is None:
                        codec = "vp8l"
                elif tag == b"VP8 " and ln >= 10:
                    if payload[3:6] != b"\x9d\x01\x2a":
                        return None
                    if w is None:
                        w = (payload[6] | (payload[7] << 8)) & 0x3FFF
                        h = (payload[8] | (payload[9] << 8)) & 0x3FFF
                    if codec is None:
                        codec = "vp8"
                elif tag == b"ANMF" and ln >= 16:
                    frames += 1
                    total_ms += int.from_bytes(payload[12:15],
                                               "little")
                    if codec is None and ln >= 24:
                        sub = payload[16:20]
                        if sub == b"VP8L":
                            codec = "vp8l"
                        elif sub == b"VP8 ":
                            codec = "vp8"
                off += 8 + ln + (ln & 1)
            if w is None:
                return None
            if not animated:
                frames = 1
            elif frames == 0:
                # ANIM flag set but no ANMF chunks: the frame count
                # is unknown, not zero — NULL it rather than assert
                # a fact the container doesn't support.
                frames = None
            return ("webp", total_ms if total_ms else None,
                    int(w), int(h), codec, None, 1, frames)
        except (struct.error, IndexError, ValueError):
            return None

    return probe


def _make_webp_animation_decoder(max_pixels: int,
                                 max_frames: int = 1024):
    """Animated-WebP decoder (container spec ``ANIM``/``ANMF``):
    composites each frame onto the canvas per its blending method
    (0 = straight-alpha 'over', the spec's formula; 1 = overwrite)
    and disposal method (1 = fill the frame rectangle with the
    ``ANIM`` background color after display). Frame offsets are
    stored in 2-pixel units; inner image data is VP8L or ALPH+VP8.

    Returns ``(w, h, [(start_ms, duration_ms, rgba_canvas), …])`` —
    the same contract as the GIF animation decoder, so
    ``decode_frames`` composites both formats identically — ``None``
    for malformed bytes, ``"unsupported: …"`` for still WebP (route
    those through ``decode_media``) and past the bomb guards. Nothing
    raises per-row."""
    import struct

    import numpy as np

    vp8l = _make_vp8l_stream_decoder(max_pixels)
    alph = _make_alph_decoder(max_pixels)
    try:
        from .vp8 import _make_vp8_decoder
        vp8 = _make_vp8_decoder(max_pixels)
    except ImportError:  # pragma: no cover - lossy core not built
        vp8 = None

    def decode_subimage(chunks):
        """ALPH?+VP8 or VP8L subchunks of one ANMF -> RGBA or None/str."""
        alpha_payload = None
        for tag, payload in chunks:
            if tag == b"ALPH":
                alpha_payload = payload
            elif tag == b"VP8L":
                res = vp8l(payload)
                if not isinstance(res, tuple):
                    return res
                w, h, arr = res
                return np.dstack([
                    ((arr >> 16) & 0xFF).astype(np.uint8),
                    ((arr >> 8) & 0xFF).astype(np.uint8),
                    (arr & 0xFF).astype(np.uint8),
                    (arr >> 24).astype(np.uint8)])
            elif tag == b"VP8 ":
                if vp8 is None:  # pragma: no cover
                    return "unsupported: lossy WebP (VP8)"
                res = vp8(payload)
                if not isinstance(res, tuple):
                    return res
                w, h, px = res
                if alpha_payload is None:
                    a = np.full((h, w), 255, np.uint8)
                else:
                    a = alph(alpha_payload, w, h)
                    if not isinstance(a, np.ndarray):
                        return a
                return np.dstack([px, a])
        return None

    def blend_over(canvas_rect, src):
        """Container-spec straight-alpha 'over' compositing."""
        sa = src[:, :, 3].astype(np.float64) / 255.0
        da = canvas_rect[:, :, 3].astype(np.float64) / 255.0
        oa = sa + da * (1.0 - sa)
        out = np.zeros_like(src, np.float64)
        for c in range(3):
            num = (src[:, :, c] * sa
                   + canvas_rect[:, :, c] * da * (1.0 - sa))
            out[:, :, c] = np.divide(num, oa, out=np.zeros_like(num),
                                     where=oa > 0)
        out[:, :, 3] = oa * 255.0
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)

    def decode(data):
        if not isinstance(data, (bytes, bytearray)):
            return None
        data = bytes(data)
        if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
            return None
        try:
            # Ignore trailing bytes past the declared RIFF payload
            # (libwebp behavior).
            end = min(len(data),
                      8 + struct.unpack("<I", data[4:8])[0])
            chunks = []
            off = 12
            while off + 8 <= end:
                tag = data[off:off + 4]
                ln = struct.unpack("<I", data[off + 4:off + 8])[0]
                payload = data[off + 8:off + 8 + ln]
                if len(payload) < ln:
                    return None
                chunks.append((tag, payload))
                off += 8 + ln + (ln & 1)
            if not chunks or chunks[0][0] != b"VP8X" \
                    or len(chunks[0][1]) < 10 \
                    or not (chunks[0][1][0] & 0x02):
                return ("unsupported: still WebP (use decode_media)"
                        if chunks else None)
            hdr = chunks[0][1]
            cw = 1 + int.from_bytes(hdr[4:7], "little")
            ch = 1 + int.from_bytes(hdr[7:10], "little")
            if cw * ch > max_pixels:
                return f"unsupported: image too large ({cw}x{ch})"
            bg = (0, 0, 0, 0)
            canvas = np.zeros((ch, cw, 4), np.uint8)
            frames = []
            t = 0
            for tag, payload in chunks[1:]:
                if tag == b"ANIM":
                    if len(payload) < 6:
                        return None
                    # stored BGRA; keep as RGBA for the fill
                    bg = (payload[2], payload[1], payload[0],
                          payload[3])
                elif tag == b"ANMF":
                    if len(payload) < 16:
                        return None
                    fx = int.from_bytes(payload[0:3], "little") * 2
                    fy = int.from_bytes(payload[3:6], "little") * 2
                    fw = 1 + int.from_bytes(payload[6:9], "little")
                    fh = 1 + int.from_bytes(payload[9:12], "little")
                    dur = int.from_bytes(payload[12:15], "little")
                    flags = payload[15]
                    if fx + fw > cw or fy + fh > ch:
                        return None
                    if fw * fh > max_pixels:
                        return ("unsupported: image too large "
                                f"({fw}x{fh})")
                    if len(frames) >= max_frames:
                        return (f"unsupported: more than {max_frames} "
                                "frames")
                    sub = []
                    p = 16
                    while p + 8 <= len(payload):
                        stag = payload[p:p + 4]
                        sln = struct.unpack("<I",
                                            payload[p + 4:p + 8])[0]
                        sp = payload[p + 8:p + 8 + sln]
                        if len(sp) < sln:
                            return None
                        sub.append((stag, sp))
                        p += 8 + sln + (sln & 1)
                    px = decode_subimage(sub)
                    if not isinstance(px, np.ndarray):
                        return px
                    if px.shape[:2] != (fh, fw):
                        return None
                    rect = canvas[fy:fy + fh, fx:fx + fw]
                    if flags & 0x02:  # do-not-blend: overwrite
                        canvas[fy:fy + fh, fx:fx + fw] = px
                    else:
                        canvas[fy:fy + fh, fx:fx + fw] = \
                            blend_over(rect, px)
                    frames.append((t, dur, canvas.copy()))
                    t += dur
                    if flags & 0x01:  # dispose to background color
                        canvas[fy:fy + fh, fx:fx + fw] = bg
            if not frames:
                return None
            return cw, ch, frames
        except (struct.error, IndexError, ValueError):
            return None

    return decode


def _make_webm_video_decoder(max_pixels: int, max_frames: int = 4096):
    """Matroska/WebM VIDEO decoder (RFC 8794 EBML walk + the public
    Matroska block layout): finds the first ``V_VP8`` track, walks
    ``Cluster``/``SimpleBlock`` elements, and decodes EVERY block —
    key frames and inter frames — through the stateful RFC 6386
    sequence decoder (``vp8._make_vp8_sequence_decoder``: reference
    buffers, motion compensation, persistent entropy). Blocks are
    decoded in file (decode) order; hidden altref-update frames
    (show_frame=0) refresh reference state without producing an
    output frame. Each shown frame spans from its timestamp to the
    next shown frame's (or the Segment duration). ``max_frames``
    bounds the number of SHOWN frames (hidden altref blocks are not
    counted toward it); a second guard bounds TOTAL decoded blocks at
    ``4 * max_frames`` so a crafted stream of tiny hidden
    (show_frame=0) inter blocks cannot force unbounded full-frame
    reconstructions — real encoders emit at most one hidden altref
    per a group of shown frames, so 4× is generous. Blocks are
    decoded streaming, so the walk stops as soon as either cap is
    exceeded. The default 4096 covers ~2¼ minutes at 30 fps — longer
    videos return an ``unsupported:`` status rather than an unbounded
    decode.

    Returns ``(w, h, [(start_ms, duration_ms, rgba_canvas), …])`` —
    the same contract as the GIF/WebP animation decoders so
    ``decode_frames`` treats all three identically — ``None`` for
    malformed bytes, ``"unsupported: …"`` for non-EBML payloads,
    non-VP8 video codecs, laced blocks, or past the bomb guards.
    Nothing raises per-row."""
    import struct

    import numpy as np

    try:
        from .vp8 import _make_vp8_sequence_decoder
        vp8_seq = _make_vp8_sequence_decoder(max_pixels)
    except ImportError:  # pragma: no cover - lossy core not built
        vp8_seq = None

    def to_rgb(y, u, v):
        # nearest-neighbor chroma upsample + integer BT.601 — the
        # same documented rendering choice as vp8._make_vp8_decoder
        h, w = y.shape
        uu = u.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
        vv = v.repeat(2, 0).repeat(2, 1)[:h, :w].astype(np.int32) - 128
        c = y.astype(np.int32) - 16
        r = np.clip((298 * c + 409 * vv + 128) >> 8, 0, 255)
        g = np.clip((298 * c - 100 * uu - 208 * vv + 128) >> 8, 0, 255)
        b = np.clip((298 * c + 516 * uu + 128) >> 8, 0, 255)
        return np.dstack([r, g, b]).astype(np.uint8)

    def vint(data, pos, keep_marker):
        if pos >= len(data):
            raise ValueError("eof")
        first = data[pos]
        if first == 0:
            raise ValueError("bad vint")
        n = 1
        mask = 0x80
        while not (first & mask):
            mask >>= 1
            n += 1
        if pos + n > len(data):
            raise ValueError("eof")
        if keep_marker:
            v = 0
            for i in range(n):
                v = (v << 8) | data[pos + i]
        else:
            v = first & (mask - 1)
            all_ones = v == mask - 1
            for i in range(1, n):
                v = (v << 8) | data[pos + i]
                all_ones &= data[pos + i] == 0xFF
            if all_ones:
                v = -1
        return v, pos + n

    def elements(data, start, end):
        pos = start
        while pos < end:
            eid, pos = vint(data, pos, True)
            size, pos = vint(data, pos, False)
            body_end = end if size < 0 else pos + size
            if body_end > end:
                raise ValueError("overruns parent")
            yield eid, pos, body_end
            pos = body_end

    def uint_at(data, s, e):
        v = 0
        for i in range(s, e):
            v = (v << 8) | data[i]
        return v

    def decode(data):
        if not isinstance(data, (bytes, bytearray)):
            return None
        data = bytes(data)
        if len(data) < 4 or data[:4] != b"\x1a\x45\xdf\xa3":
            return "unsupported: not EBML"
        if vp8_seq is None:  # pragma: no cover
            return "unsupported: lossy WebP (VP8)"
        try:
            tscale = 1_000_000
            duration_raw = None
            video_track = None
            # streaming decode state: blocks are decoded in file
            # (decode) order as the walk reaches them, so the cap on
            # SHOWN frames stops the walk without buffering payloads
            vp8_seq.reset()
            shown = []  # (ts_ms, rgb)
            w = h = None
            decoded_blocks = 0
            max_blocks = 4 * max_frames
            for eid, s, e in elements(data, 0, len(data)):
                if eid != 0x18538067:  # Segment
                    continue
                for sid, ss, se in elements(data, s, e):
                    if sid == 0x1549A966:  # Info
                        for iid, i_s, i_e in elements(data, ss, se):
                            if iid == 0x2AD7B1:
                                tscale = uint_at(data, i_s, i_e)
                            elif iid == 0x4489:
                                n = i_e - i_s
                                if n == 4:
                                    duration_raw = struct.unpack(
                                        ">f", data[i_s:i_e])[0]
                                elif n == 8:
                                    duration_raw = struct.unpack(
                                        ">d", data[i_s:i_e])[0]
                    elif sid == 0x1654AE6B:  # Tracks
                        for tid, ts, te in elements(data, ss, se):
                            if tid != 0xAE:
                                continue
                            tnum = ttype = None
                            codec = None
                            for fid, fs, fe in elements(data, ts, te):
                                if fid == 0xD7:
                                    tnum = uint_at(data, fs, fe)
                                elif fid == 0x83:
                                    ttype = uint_at(data, fs, fe)
                                elif fid == 0x86:
                                    codec = data[fs:fe].rstrip(
                                        b"\x00").decode("ascii",
                                                        "replace")
                            if ttype == 1 and video_track is None:
                                if codec != "V_VP8":
                                    return ("unsupported: video codec "
                                            f"{codec}")
                                video_track = tnum
                    elif sid == 0x1F43B675:  # Cluster
                        cluster_ts = 0
                        for cid, cs, ce in elements(data, ss, se):
                            if cid == 0xE7:  # cluster Timestamp
                                cluster_ts = uint_at(data, cs, ce)
                            elif cid == 0xA3:  # SimpleBlock
                                tnum, p = vint(data, cs, False)
                                if tnum != video_track:
                                    continue
                                if p + 3 > ce:
                                    return None
                                rel = struct.unpack(
                                    ">h", data[p:p + 2])[0]
                                flags = data[p + 2]
                                if flags & 0x06:
                                    return "unsupported: laced block"
                                ticks = cluster_ts + rel
                                ts_ms = ticks * tscale // 1_000_000
                                decoded_blocks += 1
                                if decoded_blocks > max_blocks:
                                    return ("unsupported: more than "
                                            f"{max_blocks} decoded "
                                            "blocks")
                                res = vp8_seq(data[p + 3:ce])
                                if not isinstance(res, tuple):
                                    return res
                                fw, fh = res[0], res[1]
                                if w is None:
                                    w, h = fw, fh
                                elif (fw, fh) != (w, h):
                                    # mid-stream dimension change
                                    return None
                                if res[5]:
                                    if len(shown) >= max_frames:
                                        return ("unsupported: more "
                                                f"than {max_frames} "
                                                "shown frames")
                                    shown.append(
                                        (ts_ms, to_rgb(*res[2:5])))
            if video_track is None or not shown:
                return None
            total_ms = None
            if duration_raw is not None and duration_raw >= 0:
                total_ms = int(duration_raw * tscale / 1_000_000)
            shown.sort(key=lambda kv: kv[0])
            frames = []
            for i, (ts, px) in enumerate(shown):
                nxt = (shown[i + 1][0] if i + 1 < len(shown)
                       else (total_ms if total_ms and total_ms > ts
                             else ts + 1))
                rgba = np.dstack(
                    [px, np.full((h, w), 255, np.uint8)])
                frames.append((ts, max(1, nxt - ts), rgba))
            return w, h, frames
        except (ValueError, struct.error, IndexError):
            return None

    return decode
