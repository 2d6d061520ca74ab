"""Clean-room FLAC decoder (RFC 9639 / the published FLAC format).

Implements the full lossless decode path from the spec: the ``fLaC``
marker and metadata-block walk (STREAMINFO parsed, everything else
skipped), frame headers with UTF-8-coded frame/sample numbers and
CRC-8 verification, all four subframe types (CONSTANT, VERBATIM,
FIXED orders 0-4, LPC orders 1-32 with quantized coefficients and
arithmetic shift), wasted-bits unpacking, partitioned Rice residuals
(both 4- and 5-bit parameter methods, escape partitions), and the
four stereo decorrelation modes (independent, left-side, right-side,
mid-side).

Same house rules as the audio codecs in ``operators/multimodal.py``:
factory + nested closures, three-valued per-row contract —
``(n_frames, n_channels, sample_rate, float32 ndarray in [-1, 1])``
/ ``None`` for malformed / ``"unsupported: …"`` — a sample-count bomb
guard before allocation, and nothing raising per-row.

Pure-Python Rice decoding is the documented correctness baseline, the
same stance as the image codecs.

Reference parity: none — the reference engine has no audio handling
(SURVEY.md §1.3); this extends the training-data multimodal surface.
"""

from __future__ import annotations

#: Fixed-predictor coefficients by order (RFC 9639 §9.2.2).
_FIXED_COEFS = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))

def _build_crc8_table():
    """CRC-8 (poly 0x07) table for frame-header verification
    (§9.1.8). Import-time only; closures capture the tuple."""
    tab = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 \
                else (c << 1) & 0xFF
        tab.append(c)
    return tuple(tab)


_CRC8_TABLE = _build_crc8_table()


def _make_flac_decoder(max_samples: int = 600_000_000):
    """Build the FLAC decoder closure:
    ``decode(data) -> (n_frames, n_channels, sample_rate, x)`` with
    ``x`` float32 shaped ``(n_frames, n_channels)`` in [-1, 1] — or
    ``None`` / ``"unsupported: …"``. ``max_samples`` bounds
    frames x channels before any allocation."""
    import numpy as np

    crc8_table = _CRC8_TABLE
    fixed_coefs = _FIXED_COEFS

    class _Bad(Exception):
        """Internal malformed-stream signal; never escapes."""

    class _BR:
        """MSB-first bit reader (FLAC bit order)."""

        __slots__ = ("buf", "pos", "acc", "nbits")

        def __init__(self, buf, pos):
            self.buf = buf
            self.pos = pos
            self.acc = 0
            self.nbits = 0

        def bits(self, n):
            acc, nb, pos, buf = self.acc, self.nbits, self.pos, self.buf
            while nb < n:
                if pos >= len(buf):
                    raise _Bad
                acc = (acc << 8) | buf[pos]
                pos += 1
                nb += 8
            nb -= n
            self.acc = acc & ((1 << nb) - 1)
            self.nbits = nb
            self.pos = pos
            return acc >> nb

        def sbits(self, n):
            v = self.bits(n)
            return v - (1 << n) if v >> (n - 1) else v

        def unary(self):
            q = 0
            while not self.bits(1):
                q += 1
                if q > 1 << 20:  # corrupt-run bound
                    raise _Bad
            return q

        def align(self):
            self.nbits -= self.nbits % 8
            self.acc &= (1 << self.nbits) - 1

    def utf8_coded(br):
        """Frame/sample number: UTF-8-style variable length (§9.1.5),
        up to 7 bytes (36-bit values)."""
        b0 = br.bits(8)
        if b0 < 0x80:
            return b0
        n = 0
        mask = 0x40
        while b0 & mask:
            n += 1
            mask >>= 1
        if n < 1 or n > 6:
            raise _Bad
        v = b0 & (mask - 1)
        for _ in range(n):
            c = br.bits(8)
            if c >> 6 != 2:
                raise _Bad
            v = (v << 6) | (c & 0x3F)
        return v

    def rice_residuals(br, blocksize, order, out):
        """Partitioned Rice residuals (§9.2.7) appended to ``out``
        starting after the warm-up samples."""
        method = br.bits(2)
        if method > 1:
            raise _Bad
        pbits = 4 + method
        escape = (1 << pbits) - 1
        porder = br.bits(4)
        nparts = 1 << porder
        if nparts > 1 and blocksize % nparts:
            raise _Bad  # partitions must divide the block evenly
        for p in range(nparts):
            n = (blocksize >> porder) - (order if p == 0 else 0)
            if n < 0:
                raise _Bad
            param = br.bits(pbits)
            if param == escape:
                nbits = br.bits(5)
                if nbits == 0:
                    out.extend([0] * n)
                else:
                    for _ in range(n):
                        out.append(br.sbits(nbits))
                continue
            for _ in range(n):
                q = br.unary()
                v = (q << param) | br.bits(param) if param else q
                out.append((v >> 1) ^ -(v & 1))  # zigzag -> signed

    def subframe(br, blocksize, bps):
        if br.bits(1):
            raise _Bad  # padding bit must be zero
        stype = br.bits(6)
        wasted = 0
        if br.bits(1):
            wasted = 1 + br.unary()
        eff = bps - wasted
        if eff <= 0:
            raise _Bad
        if stype == 0:  # CONSTANT
            samples = [br.sbits(eff)] * blocksize
        elif stype == 1:  # VERBATIM
            samples = [br.sbits(eff) for _ in range(blocksize)]
        elif 8 <= stype <= 12:  # FIXED, order = stype - 8
            order = stype - 8
            if order > blocksize:
                raise _Bad
            samples = [br.sbits(eff) for _ in range(order)]
            rice_residuals(br, blocksize, order, samples)
            coefs = fixed_coefs[order]
            # crafted coefficients/residuals can make the prediction
            # FEEDBACK grow exponentially (Python ints are unbounded,
            # so this is both a contract raise at the np.int64
            # conversion and a bignum CPU bomb — r15 fuzz catch, seed
            # 1050946). Valid streams stay far inside int64 (|s| <
            # 2^33, coefs < 2^15, order <= 32 -> acc < 2^53); the
            # first sample past 2^62 marks the stream malformed.
            for i in range(order, blocksize):
                v = samples[i] + sum(c * samples[i - 1 - k]
                                     for k, c in enumerate(coefs))
                if v > 0x4000000000000000 or \
                        v < -0x4000000000000000:
                    raise _Bad
                samples[i] = v
        elif stype >= 32:  # LPC, order = (stype & 31) + 1
            order = (stype & 31) + 1
            if order > blocksize:
                raise _Bad
            samples = [br.sbits(eff) for _ in range(order)]
            precision = br.bits(4) + 1
            if precision == 16:  # 0b1111 is invalid (§9.2.3)
                raise _Bad
            shift = br.sbits(5)
            if shift < 0:
                raise _Bad
            coefs = [br.sbits(precision) for _ in range(order)]
            rice_residuals(br, blocksize, order, samples)
            for i in range(order, blocksize):
                acc = 0
                for k in range(order):
                    acc += coefs[k] * samples[i - 1 - k]
                v = samples[i] + (acc >> shift)
                # same feedback bound as the FIXED path (fuzz catch)
                if v > 0x4000000000000000 or \
                        v < -0x4000000000000000:
                    raise _Bad
                samples[i] = v
        else:
            raise _Bad  # reserved subframe types
        if wasted:
            samples = [s << wasted for s in samples]
        return samples

    BLOCKSIZES = (0, 192, 576, 1152, 2304, 4608, 0, 0,
                  256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
    RATES = (0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
             32000, 44100, 48000, 96000, 0, 0, 0, 0)
    SIZES = (0, 8, 12, 0, 16, 20, 24, 32)

    def decode(data):
        if not isinstance(data, (bytes, bytearray)):
            return None
        data = bytes(data)
        if len(data) < 42 or data[:4] != b"fLaC":
            return None
        try:
            # ---- metadata walk; STREAMINFO must come first (§8.1)
            pos = 4
            first = True
            si = None
            while True:
                if pos + 4 > len(data):
                    return None
                last = data[pos] >> 7
                btype = data[pos] & 0x7F
                blen = int.from_bytes(data[pos + 1:pos + 4], "big")
                body = data[pos + 4:pos + 4 + blen]
                if len(body) < blen:
                    return None
                if first:
                    if btype != 0 or blen < 34:
                        return None
                    si = body
                    first = False
                pos += 4 + blen
                if last:
                    break
            rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
            channels = ((si[12] >> 1) & 7) + 1
            bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
            total = ((si[13] & 0x0F) << 32) | int.from_bytes(
                si[14:18], "big")
            if rate == 0:
                return None
            if bps not in (8, 12, 16, 20, 24, 32):
                return f"unsupported: {bps}-bit FLAC"
            if total and total * channels > max_samples:
                return (f"unsupported: stream too long "
                        f"({total} samples)")

            # ---- frames
            out = []  # per-frame channel lists
            got = 0
            while pos < len(data):
                if pos + 2 > len(data):
                    break
                sync = (data[pos] << 6) | (data[pos + 1] >> 2)
                if sync != 0x3FFE:
                    return None
                hdr_start = pos
                br = _BR(data, pos)
                br.bits(14)
                br.bits(1)  # reserved
                br.bits(1)  # blocking strategy
                bs_code = br.bits(4)
                sr_code = br.bits(4)
                ch_code = br.bits(4)
                sz_code = br.bits(3)
                br.bits(1)  # reserved
                utf8_coded(br)
                if bs_code == 0:
                    raise _Bad
                elif bs_code == 6:
                    blocksize = br.bits(8) + 1
                elif bs_code == 7:
                    blocksize = br.bits(16) + 1
                else:
                    blocksize = BLOCKSIZES[bs_code]
                if sr_code == 12:
                    br.bits(8)
                elif sr_code in (13, 14):
                    br.bits(16)
                elif sr_code == 15:
                    raise _Bad
                # CRC-8 over the header bytes (§9.1.8)
                crc_pos = br.pos
                crc = 0
                for i in range(hdr_start, crc_pos):
                    crc = crc8_table[crc ^ data[i]]
                if br.bits(8) != crc:
                    raise _Bad
                if ch_code < 8:
                    nch = ch_code + 1
                    mode = 0
                elif ch_code < 11:
                    nch = 2
                    mode = ch_code - 7  # 1 L/S, 2 R/S, 3 M/S
                else:
                    raise _Bad
                if nch != channels:
                    raise _Bad
                sz = SIZES[sz_code] if sz_code not in (0,) else bps
                if sz == 0:
                    raise _Bad
                # RFC 9639 says the frame-header bit depth SHOULD
                # match STREAMINFO's, but libFLAC honors the
                # per-frame value — so each frame is normalized to
                # [-1,1] with ITS OWN header bit depth below, rather
                # than rejecting the mismatch.
                if (got + blocksize) * channels > max_samples:
                    return ("unsupported: stream too long "
                            f"(>{max_samples} samples)")
                chans = []
                for c in range(nch):
                    ebps = sz
                    # the difference channel carries one extra bit
                    if (mode == 1 and c == 1) or \
                            (mode == 2 and c == 0) or \
                            (mode == 3 and c == 1):
                        ebps += 1
                    chans.append(subframe(br, blocksize, ebps))
                br.align()
                br.bits(16)  # frame CRC-16 (not re-verified)
                if mode == 1:  # left/side
                    left, side = chans
                    chans = [left, [l - s for l, s in zip(left, side)]]
                elif mode == 2:  # right/side
                    side, right = chans
                    chans = [[r + s for r, s in zip(right, side)],
                             right]
                elif mode == 3:  # mid/side
                    mid, side = chans
                    lr = []
                    rr = []
                    for m, s in zip(mid, side):
                        mm = (m << 1) | (s & 1)
                        lr.append((mm + s) >> 1)
                        rr.append((mm - s) >> 1)
                    chans = [lr, rr]
                out.append((sz, chans))
                got += blocksize
                pos = br.pos
                if total and got >= total:
                    break
            if not out:
                return None
            # per-frame normalization with the frame header's bit
            # depth (libFLAC behavior when it differs from STREAMINFO)
            x = np.concatenate(
                [np.array(ch, np.int64).T / float(1 << (fsz - 1))
                 for fsz, ch in out])
            if total:
                x = x[:total]
            xf = x.astype(np.float32)
            return int(x.shape[0]), int(channels), int(rate), xf
        except (_Bad, IndexError, ValueError):
            return None

    return decode
