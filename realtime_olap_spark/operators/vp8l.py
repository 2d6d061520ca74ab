"""Clean-room VP8L (WebP lossless) bitstream decoder.

Implements the public "WebP Lossless Bitstream Specification"
(Google, also published as an IETF draft) from scratch: LSB-first bit
reading, canonical prefix codes (simple two-symbol form and the
code-length-coded form with symbols 16/17/18, as in RFC 1951 §3.2),
an optional color cache keyed by the spec's 0x1e35a7bd multiplicative
hash, optional meta prefix-code groups selected by a sub-sampled
entropy image, LZ77 backward references whose short distances route
through the 120-entry two-dimensional "plane code" neighborhood map,
and the four inverse transforms (predictor with 14 modes, color
transform, subtract-green, color-indexing with sub-byte pixel
bundling).

Two entry shapes are produced by the factory:

- full VP8L streams (the payload of a ``VP8L`` RIFF chunk): 1-byte
  0x2f signature, 14-bit width-1 / height-1, alpha hint, 3-bit
  version;
- headerless image streams at caller-supplied dimensions — the form
  used by the WebP container's ``ALPH`` chunk (lossless-compressed
  alpha plane of a lossy VP8 image).

The reference engine has no media codecs; this extends the
training-data multimodal surface (SURVEY.md LLM-pipeline ops) the
same way the PNG/JPEG/GIF/BMP/TIFF decoders in
``operators/multimodal.py`` do, and follows the same house rules:
nested functions captured by value, the three-valued per-row contract
(``(w, h, argb-array)`` / ``None`` for malformed / ``"unsupported:
…"`` string), a decompression-bomb pixel guard applied BEFORE any
pixel allocation, and nothing raising per-row — malformed bytes are
funneled through one internal exception type that the top-level
``except`` converts to ``None``.

Pure-Python entropy decoding is the documented correctness baseline
(same stance as the JPEG codec): per-pixel cost is flat and the
payload never enters a shuffle, but this is not a libwebp
replacement.
"""

from __future__ import annotations

#: Order in which code-length code lengths are stored in the stream
#: (spec §"Decoding the Code Lengths").
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: Two-dimensional neighborhood map for LZ77 distance codes 1..120
#: (spec §"Decoding of Distances"): (dx, dy) with the linear distance
#: being dy * width + dx, clamped to at least 1. Ordered by Euclidean
#: closeness as published in the spec's table.
_PLANE_CODES = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _make_vp8l_stream_decoder(max_pixels: int):
    """Build the VP8L stream decoder closure (house rule: nested
    functions, captured by value, no per-call module lookups).

    The returned callable is
    ``decode(buf, width=None, height=None) ->``:

    - ``(w, h, ndarray)`` — uint32 ARGB pixels, shape ``(h, w)``;
    - ``None`` — malformed / truncated bytes;
    - ``"unsupported: …"`` — valid but outside the decoder's gates
      (nonzero version, over-``max_pixels`` images).

    With ``width is None`` the 5-byte VP8L header (0x2f signature +
    packed dimensions) is parsed from the stream; otherwise the buffer
    is a headerless image-stream at the given dimensions (the ALPH
    chunk form).
    """
    import numpy as np

    # capture the module tables by value (house closure rule: worker
    # closures must not depend on the package being importable)
    cl_order = _CL_ORDER
    plane_codes = _PLANE_CODES

    class _Bad(Exception):
        """Internal malformed-bitstream signal; never escapes."""

    def decode(buf, width=None, height=None):
        if not isinstance(buf, (bytes, bytearray)):
            return None
        buf = bytes(buf)

        # ---- LSB-first accumulator bit reader (same treatment as the
        # GIF LZW / JPEG fast paths: byte-fed, one mask+shift per read).
        state = [0, 0, 0]  # acc, nbits, pos

        def bits(n):
            acc, nb, pos = state
            while nb < n:
                if pos >= len(buf):
                    raise _Bad
                acc |= buf[pos] << nb
                pos += 1
                nb += 8
            state[0] = acc >> n
            state[1] = nb - n
            state[2] = pos
            return acc & ((1 << n) - 1)

        # ---- canonical prefix codes -----------------------------------
        def build_code(lengths):
            """Code lengths -> decode table.

            Returns ``("one", sym)`` for a single-symbol code (decodes
            without consuming bits) or ``("tab", dict, max_len, lut)``
            with ``dict[(len, code)] = symbol`` for RFC 1951-canonical
            codes plus a 256-entry fast table over the next 8 stream
            bits — the zlib trick: codes of length <= 8 resolve with
            ONE indexed lookup (entry = sym * 16 + length), longer
            codes leave ``-1`` and take the bit-walk slow path.
            Over/under-subscribed length sets are malformed.
            """
            nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
            if not nz:
                raise _Bad
            if len(nz) == 1:
                return ("one", nz[0][0])
            max_l = max(l for _, l in nz)
            if max_l > 15:
                raise _Bad
            count = [0] * (max_l + 1)
            for _, l in nz:
                count[l] += 1
            # Kraft equality: a complete code, exactly.
            if sum(c << (max_l - l) for l, c in enumerate(count) if l) \
                    != (1 << max_l):
                raise _Bad
            next_code = [0] * (max_l + 1)
            code = 0
            for l in range(1, max_l + 1):
                code = (code + count[l - 1]) << 1
                next_code[l] = code
            table = {}
            lut = [-1] * 256
            for s, l in nz:
                c = next_code[l]
                table[(l, c)] = s
                next_code[l] += 1
                if l <= 8:
                    # stream bits arrive LSB-first; the walked code is
                    # MSB-first — store under the bit-reversed prefix
                    rev = 0
                    for i in range(l):
                        rev |= ((c >> i) & 1) << (l - 1 - i)
                    entry = s * 16 + l
                    for filler in range(1 << (8 - l)):
                        lut[rev | (filler << l)] = entry
            return ("tab", table, max_l, lut)

        def read_sym(tree):
            if tree[0] == "one":
                return tree[1]
            # fast path: resolve <=8-bit codes on the next 8 stream
            # bits in one lookup (padding zeros at stream end only
            # ever turn "would hit end-of-stream" into _Bad later)
            acc, nb, pos = state
            while nb < 8 and pos < len(buf):
                acc |= buf[pos] << nb
                pos += 1
                nb += 8
            state[0] = acc
            state[1] = nb
            state[2] = pos
            entry = tree[3][acc & 0xFF]
            if entry >= 0:
                l = entry & 15
                if l > nb:
                    raise _Bad
                state[0] = acc >> l
                state[1] = nb - l
                return entry >> 4
            table, max_l = tree[1], tree[2]
            code = 0
            length = 0
            while True:
                code = (code << 1) | bits(1)
                length += 1
                sym = table.get((length, code))
                if sym is not None:
                    return sym
                if length >= max_l:
                    raise _Bad

        def read_code(alphabet_size):
            """One prefix code: simple form or code-length-coded form."""
            if bits(1):  # simple code
                num_symbols = bits(1) + 1
                if bits(1):  # first symbol is 8 bits
                    sym0 = bits(8)
                else:
                    sym0 = bits(1)
                if sym0 >= alphabet_size:
                    raise _Bad
                if num_symbols == 1:
                    return ("one", sym0)
                sym1 = bits(8)
                if sym1 >= alphabet_size or sym1 == sym0:
                    raise _Bad
                lengths = [0] * alphabet_size
                lengths[sym0] = 1
                lengths[sym1] = 1
                return build_code(lengths)
            # normal: code lengths are themselves prefix-coded
            num_cl = bits(4) + 4
            cl_lengths = [0] * 19
            for i in range(num_cl):
                cl_lengths[cl_order[i]] = bits(3)
            cl_tree = build_code(cl_lengths)
            if bits(1):  # explicit token budget
                length_nbits = 2 + 2 * bits(3)
                max_tokens = 2 + bits(length_nbits)
            else:
                max_tokens = alphabet_size
            lengths = [0] * alphabet_size
            pos = 0
            prev_len = 8
            while pos < alphabet_size and max_tokens > 0:
                max_tokens -= 1
                s = read_sym(cl_tree)
                if s < 16:
                    lengths[pos] = s
                    pos += 1
                    if s:
                        prev_len = s
                elif s == 16:
                    rep, val = 3 + bits(2), prev_len
                elif s == 17:
                    rep, val = 3 + bits(3), 0
                else:
                    rep, val = 11 + bits(7), 0
                if s >= 16:
                    if pos + rep > alphabet_size:
                        raise _Bad
                    for _ in range(rep):
                        lengths[pos] = val
                        pos += 1
            return build_code(lengths)

        def lz77_value(code):
            """Length/distance prefix coding (spec §"LZ77 Backward
            Reference"): 4 direct values then exponential extra bits."""
            if code < 4:
                return code + 1
            extra = (code - 2) >> 1
            return ((2 + (code & 1)) << extra) + bits(extra) + 1

        def subsample(n, b):
            return (n + (1 << b) - 1) >> b

        def read_image(w, h, allow_meta):
            """Entropy-coded image: color-cache info, optional meta
            prefix groups (main image only), prefix codes, LZ77 pixel
            stream. Returns a flat python list of w*h uint32 ARGB."""
            cache_bits = 0
            if bits(1):
                cache_bits = bits(4)
                if not 1 <= cache_bits <= 11:
                    raise _Bad
            meta = None
            meta_bits = 0
            meta_w = 0
            n_groups = 1
            if allow_meta and bits(1):
                meta_bits = bits(3) + 2
                meta_w = subsample(w, meta_bits)
                meta_img = read_image(meta_w, subsample(h, meta_bits),
                                      False)
                # group index = (red << 8) | green
                meta = [(p >> 8) & 0xFFFF for p in meta_img]
                n_groups = max(meta) + 1
            cache_size = (1 << cache_bits) if cache_bits else 0
            green_alpha = 256 + 24 + cache_size
            groups = [
                (read_code(green_alpha), read_code(256), read_code(256),
                 read_code(256), read_code(40))
                for _ in range(n_groups)
            ]
            cache = [0] * cache_size
            cache_shift = 32 - cache_bits if cache_bits else 0

            npix = w * h
            pix = [0] * npix
            pos = 0
            x = 0
            y = 0
            codes = groups[0]
            while pos < npix:
                if meta is not None:
                    codes = groups[meta[(y >> meta_bits) * meta_w
                                        + (x >> meta_bits)]]
                s = read_sym(codes[0])
                if s < 256:  # literal ARGB
                    r = read_sym(codes[1])
                    b = read_sym(codes[2])
                    a = read_sym(codes[3])
                    p = (a << 24) | (r << 16) | (s << 8) | b
                    pix[pos] = p
                    pos += 1
                    x += 1
                    if cache_bits:
                        cache[((0x1E35A7BD * p) & 0xFFFFFFFF)
                              >> cache_shift] = p
                elif s < 280:  # LZ77 backward reference
                    length = lz77_value(s - 256)
                    dist_code = lz77_value(read_sym(codes[4]))
                    if dist_code > 120:
                        dist = dist_code - 120
                    else:
                        dx, dy = plane_codes[dist_code - 1]
                        dist = dy * w + dx
                        if dist < 1:
                            dist = 1
                    if dist > pos or pos + length > npix:
                        raise _Bad
                    if cache_bits:
                        for _ in range(length):
                            p = pix[pos - dist]
                            pix[pos] = p
                            pos += 1
                            cache[((0x1E35A7BD * p) & 0xFFFFFFFF)
                                  >> cache_shift] = p
                    else:
                        for _ in range(length):
                            pix[pos] = pix[pos - dist]
                            pos += 1
                    x += length
                else:  # color-cache reference
                    idx = s - 280
                    if idx >= cache_size:
                        raise _Bad
                    pix[pos] = cache[idx]
                    pos += 1
                    x += 1
                while x >= w:
                    x -= w
                    y += 1
            return pix

        # ---- inverse transforms ---------------------------------------
        def add_packed(a, b):
            """Per-channel mod-256 add of two packed ARGB values."""
            lo = ((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF
            hi = (((a >> 8) & 0x00FF00FF) + ((b >> 8) & 0x00FF00FF)) \
                & 0x00FF00FF
            return lo | (hi << 8)

        def avg2(a, b):
            """Per-channel floor average of packed ARGB (carry-safe)."""
            return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)

        def _clamp_full(l, t, tl):
            p = 0
            for sh in (24, 16, 8, 0):
                v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) \
                    - ((tl >> sh) & 0xFF)
                p |= (0 if v < 0 else 255 if v > 255 else v) << sh
            return p

        def _clamp_half(l, t, tl):
            av = avg2(l, t)
            p = 0
            for sh in (24, 16, 8, 0):
                a = (av >> sh) & 0xFF
                d = a - ((tl >> sh) & 0xFF)
                # C-style truncation toward zero, as in the spec.
                v = a + (d // 2 if d >= 0 else -((-d) // 2))
                p |= (0 if v < 0 else 255 if v > 255 else v) << sh
            return p

        def _select(t, l, tl):
            # Distance of the gradient estimate L+T-TL to T is |L-TL|
            # per channel, and to L is |T-TL|; ties go to T.
            p_t = p_l = 0
            for sh in (24, 16, 8, 0):
                lc = (l >> sh) & 0xFF
                tc = (t >> sh) & 0xFF
                tlc = (tl >> sh) & 0xFF
                p_t += abs(lc - tlc)
                p_l += abs(tc - tlc)
            return t if p_t <= p_l else l

        def inv_predictor(pix, w, h, sub_bits, tiles_w, tile_img):
            """Predictor transform inverse (spec §"Predictor
            Transform"): residuals become pixels by adding one of 14
            neighborhood predictions, chosen per tile by the green
            channel of the transform's sub-image. Sequential by
            definition (each pixel needs its decoded LEFT neighbor in
            all the modes real encoders favor — libwebp picks mode 10
            almost exclusively on photo content), so the r15 pass
            keeps the scalar loop and cuts its constant factor: row
            iteration instead of per-pixel divmod, the tile mode
            hoisted per 2^sub_bits span, the left pixel carried in a
            register, and avg2/add_packed inlined for the hot modes
            (the two call frames were ~40% of the loop). Bit-identity
            pinned by the libwebp round-trip differential and the
            goldens."""
            if not pix:
                return
            if w * h == 0:
                return
            pix[0] = add_packed(pix[0], 0xFF000000)
            lp = pix[0]
            for x in range(1, w):                     # row 0: left
                p = pix[x]
                lo = ((p & 0x00FF00FF) + (lp & 0x00FF00FF)) \
                    & 0x00FF00FF
                hi = (((p >> 8) & 0x00FF00FF)
                      + ((lp >> 8) & 0x00FF00FF)) & 0x00FF00FF
                lp = lo | (hi << 8)
                pix[x] = lp
            span = 1 << sub_bits
            for y in range(1, h):
                row = y * w
                trow = (y >> sub_bits) * tiles_w
                lp = add_packed(pix[row], pix[row - w])  # x == 0: top
                pix[row] = lp
                x = 1
                while x < w:
                    mode = (tile_img[trow + (x >> sub_bits)]
                            >> 8) & 0xFF
                    xe = ((x >> sub_bits) + 1) << sub_bits
                    if xe > w:
                        xe = w
                    if mode > 13:
                        raise _Bad
                    up = row - w
                    for xx in range(x, xe):
                        t = pix[up + xx]
                        if mode == 10:
                            tl = pix[up + xx - 1]
                            tr = pix[up + xx + 1]
                            a = (((lp ^ tl) & 0xFEFEFEFE) >> 1) \
                                + (lp & tl)
                            b = (((t ^ tr) & 0xFEFEFEFE) >> 1) \
                                + (t & tr)
                            pred = (((a ^ b) & 0xFEFEFEFE) >> 1) \
                                + (a & b)
                        elif mode == 0:
                            pred = 0xFF000000
                        elif mode == 1:
                            pred = lp
                        elif mode == 2:
                            pred = t
                        elif mode == 3:
                            pred = pix[up + xx + 1]
                        elif mode == 4:
                            pred = pix[up + xx - 1]
                        elif mode == 5:
                            tr = pix[up + xx + 1]
                            a = (((lp ^ tr) & 0xFEFEFEFE) >> 1) \
                                + (lp & tr)
                            pred = (((a ^ t) & 0xFEFEFEFE) >> 1) \
                                + (a & t)
                        elif mode == 6:
                            tl = pix[up + xx - 1]
                            pred = (((lp ^ tl) & 0xFEFEFEFE) >> 1) \
                                + (lp & tl)
                        elif mode == 7:
                            pred = (((lp ^ t) & 0xFEFEFEFE) >> 1) \
                                + (lp & t)
                        elif mode == 8:
                            tl = pix[up + xx - 1]
                            pred = (((tl ^ t) & 0xFEFEFEFE) >> 1) \
                                + (tl & t)
                        elif mode == 9:
                            tr = pix[up + xx + 1]
                            pred = (((t ^ tr) & 0xFEFEFEFE) >> 1) \
                                + (t & tr)
                        elif mode == 11:
                            pred = _select(t, lp, pix[up + xx - 1])
                        elif mode == 12:
                            pred = _clamp_full(lp, t, pix[up + xx - 1])
                        else:
                            pred = _clamp_half(lp, t, pix[up + xx - 1])
                        p = pix[row + xx]
                        lo = ((p & 0x00FF00FF) + (pred & 0x00FF00FF)) \
                            & 0x00FF00FF
                        hi = (((p >> 8) & 0x00FF00FF)
                              + ((pred >> 8) & 0x00FF00FF)) \
                            & 0x00FF00FF
                        lp = lo | (hi << 8)
                        pix[row + xx] = lp
                    x = xe

        def inv_color(pix, w, h, sub_bits, tiles_w, tile_img):
            """Color transform inverse: signed 3.5 fixed-point
            cross-channel deltas, red first then blue (which sees the
            updated red), per the spec's ColorTransformDelta. Every
            pixel is independent (unlike the predictor inverse), so
            the whole pass vectorizes (r15: was ~35% of a 0.3 MP
            lossless decode as a per-pixel loop); numpy's arithmetic
            ``>>`` on negative int64 floors exactly like Python's, so
            the signed 3.5 products are bit-identical."""
            def s8v(v):
                return np.where(v >= 128, v - 256, v)

            a = np.array(pix[:w * h], dtype=np.int64)
            tix = ((np.arange(h)[:, None] >> sub_bits) * tiles_w
                   + (np.arange(w)[None, :] >> sub_bits)).reshape(-1)
            cte = np.array(tile_img, dtype=np.int64)[tix]
            g2r = s8v(cte & 0xFF)          # blue channel of the tile
            g2b = s8v((cte >> 8) & 0xFF)   # green channel
            r2b = s8v((cte >> 16) & 0xFF)  # red channel
            g = s8v((a >> 8) & 0xFF)
            r = (((a >> 16) & 0xFF) + ((g2r * g) >> 5)) & 0xFF
            b = ((a & 0xFF) + ((g2b * g) >> 5)
                 + ((r2b * s8v(r)) >> 5)) & 0xFF
            pix[:w * h] = ((a & 0xFF00FF00) | (r << 16) | b).tolist()

        def inv_subtract_green(pix):
            a = np.array(pix, dtype=np.int64)
            g = (a >> 8) & 0xFF
            r = (((a >> 16) & 0xFF) + g) & 0xFF
            b = ((a & 0xFF) + g) & 0xFF
            pix[:] = ((a & 0xFF00FF00) | (r << 16) | b).tolist()

        def inv_color_index(pix, packed_w, h, width_bits, palette,
                            out_w):
            """Color-indexing inverse: green channel is the palette
            index; for small palettes several indices are bundled into
            one green byte (spec §"Color Indexing Transform")."""
            lut = [0] * 256
            for i, p in enumerate(palette):
                if i < 256:
                    lut[i] = p
            if width_bits == 0:
                return [lut[(p >> 8) & 0xFF] for p in pix]
            bits_per = 8 >> width_bits
            mask = (1 << bits_per) - 1
            out = [0] * (out_w * h)
            for y in range(h):
                row = y * packed_w
                orow = y * out_w
                for x in range(out_w):
                    g = (pix[row + (x >> width_bits)] >> 8) & 0xFF
                    idx = (g >> ((x & ((1 << width_bits) - 1))
                                 * bits_per)) & mask
                    out[orow + x] = lut[idx]
            return out

        # ---- stream-level decode --------------------------------------
        try:
            if width is None:
                if len(buf) < 5 or buf[0] != 0x2F:
                    return None
                state[2] = 1  # bit reader starts after the signature
                w = bits(14) + 1
                h = bits(14) + 1
                bits(1)  # alpha-is-used hint (informative)
                version = bits(3)
                if version != 0:
                    return f"unsupported: VP8L version {version}"
            else:
                w, h = width, height
                if w <= 0 or h <= 0:
                    return None
            if w * h > max_pixels:
                return f"unsupported: image too large ({w}x{h})"

            # transforms (level-0 only), each at most once
            transforms = []
            seen = set()
            cur_w = w
            while bits(1):
                ttype = bits(2)
                if ttype in seen:
                    raise _Bad
                seen.add(ttype)
                if ttype in (0, 1):  # predictor / color
                    sub_bits = bits(3) + 2
                    tiles_w = subsample(cur_w, sub_bits)
                    tile_img = read_image(
                        tiles_w, subsample(h, sub_bits), False)
                    transforms.append(
                        (ttype, cur_w, sub_bits, tiles_w, tile_img))
                elif ttype == 2:  # subtract green
                    transforms.append((2, cur_w))
                else:  # color indexing
                    n_colors = bits(8) + 1
                    raw_pal = read_image(n_colors, 1, False)
                    palette = []
                    prev = 0
                    for p in raw_pal:  # palette entries are delta-coded
                        prev = add_packed(prev, p)
                        palette.append(prev)
                    width_bits = (3 if n_colors <= 2 else
                                  2 if n_colors <= 4 else
                                  1 if n_colors <= 16 else 0)
                    transforms.append(
                        (3, cur_w, width_bits, palette))
                    if width_bits:
                        cur_w = subsample(cur_w, width_bits)

            pix = read_image(cur_w, h, True)

            for t in reversed(transforms):
                if t[0] == 0:
                    inv_predictor(pix, t[1], h, t[2], t[3], t[4])
                elif t[0] == 1:
                    inv_color(pix, t[1], h, t[2], t[3], t[4])
                elif t[0] == 2:
                    inv_subtract_green(pix)
                else:
                    packed_w = (subsample(t[1], t[2]) if t[2]
                                else t[1])
                    pix = inv_color_index(pix, packed_w, h, t[2],
                                          t[3], t[1])
                    cur_w = t[1]

            arr = np.array(pix, dtype=np.uint32).reshape(h, w)
            return w, h, arr
        except (_Bad, IndexError, ValueError):
            return None

    return decode
