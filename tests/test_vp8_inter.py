"""VP8 inter-frame decoder tests (RFC 6386 §14.2 / §16 / §17).

Evidence stance (documented in COVERAGE.md): the container ships NO
independent VP8 inter codec — libvpx is absent and libwebp both
encodes and decodes still key frames only (verified by symbol
inspection), so a libwebp differential like the key-frame suite's is
impossible for inter frames. The standard here is therefore the same
forward/inverse discipline as the FLAC and VP8L suites: a spec-written
inter-frame ENCODER below (boolean arithmetic writer, header
assembly, mirrored mode/MV prediction contexts, token writing), plus
INDEPENDENT expectations — zero-MV identity against the reference
frame, full-pel motion against plain numpy shifts of an
edge-replicated reference, sub-pel motion against a per-pixel
filter reimplementation, split-MV piecewise expectations, and buffer
management cross-checks. Key frames (the machinery inter frames
build on) remain bit-exact against libwebp in
tests/test_webp_lossy.py / test_webp_config_sweep.py; the initial
key frame of every sequence here is a REAL libwebp encode.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from realtime_olap_spark.operators import vp8 as V
from realtime_olap_spark.operators.vp8 import (
    _COEFF_UPDATE_PROBS, _IF_YMODE_PROBS, _IF_UV_PROBS, _MBSPLIT_COUNT,
    _MBSPLIT_OFFSET, _MBSPLIT_PROBS, _MBSPLIT_TREE, _MBSPLITS,
    _MODE_CONTEXTS, _MV_DEFAULT_PROBS, _MV_REF_TREE, _MV_UPDATE_PROBS,
    _SMALL_MV_TREE, _SUB_MV_REF_PROBS, _SUB_MV_REF_TREE,
    _SUBPEL_FILTERS, _BILINEAR_FILTERS, _IF_YMODE_TREE, _UV_MODE_TREE,
    _make_vp8_sequence_decoder)

from test_webp_config_sweep import _encode, _libwebp, _photo, _vp8_payload

MAXPX = 1 << 24
BORDER = 32


# ---------------------------------------------------------------------------
# Spec-written boolean arithmetic ENCODER (§7) — the inverse of the
# decoder's _Bool; carry propagation and the 32-bit flush included.
# ---------------------------------------------------------------------------

class BW:
    def __init__(self):
        self.low = 0
        self.range = 255
        self.count = -24
        self.buf = bytearray()

    def put(self, bit, prob):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        shift = 0
        while self.range < 128:
            self.range <<= 1
            shift += 1
        self.count += shift
        if self.count >= 0:
            offset = shift - self.count
            if (self.low << (offset - 1)) & 0x80000000:
                x = len(self.buf) - 1
                while x >= 0 and self.buf[x] == 0xFF:
                    self.buf[x] = 0
                    x -= 1
                if x >= 0:
                    self.buf[x] += 1
            self.buf.append((self.low >> (24 - offset)) & 0xFF)
            self.low = (self.low << offset) & 0xFFFFFF
            shift = self.count
            self.count -= 8
        self.low = (self.low << shift) & 0xFFFFFFFF

    def literal(self, v, n):
        for i in reversed(range(n)):
            self.put((v >> i) & 1, 128)

    def stop(self):
        for _ in range(32):
            self.put(0, 128)
        return bytes(self.buf)


def tree_write(bw, tree, probs, value, prob_offset=0):
    path = []

    def walk(i):
        for b in (0, 1):
            t = tree[i + b]
            if t <= 0:
                if -t == value:
                    path.append((i >> 1, b))
                    return True
            else:
                path.append((i >> 1, b))
                if walk(t):
                    return True
                path.pop()
        return False

    assert walk(0), (tree, value)
    for pi, b in path:
        bw.put(b, probs[prob_offset + pi])


def write_mvcomponent(bw, p, v):
    x = abs(v)
    if x < 8:
        bw.put(0, p[0])
        tree_write(bw, _SMALL_MV_TREE, p, x, prob_offset=2)
    else:
        bw.put(1, p[0])
        for i in range(3):
            bw.put((x >> i) & 1, p[9 + i])
        for i in range(9, 3, -1):
            bw.put((x >> i) & 1, p[9 + i])
        if x & 0xFFF0:
            bw.put((x >> 3) & 1, p[12])
        else:
            assert x & 8  # bit 3 implicit for 8..15
    if x:
        bw.put(1 if v < 0 else 0, p[1])


def test_bool_encoder_roundtrip_against_decoder():
    """The §7 writer must be the exact inverse of the decoder's §7
    reader on arbitrary (bit, prob) streams."""
    # the reader side below replicates the decoder's §7 arithmetic
    # verbatim (value/range/renormalization) so the writer is pinned
    # against the exact semantics the frames are decoded with
    rng = random.Random(1234)
    for trial in range(50):
        items = [(rng.randint(0, 1), rng.randint(1, 254))
                 for _ in range(rng.randint(1, 400))]
        bw = BW()
        for bit, prob in items:
            bw.put(bit, prob)
        data = bw.stop()
        # decoder-side: reimplement the reader contract via the
        # sequence decoder's exact arithmetic (copied semantics)
        value = (data[0] << 8 | data[1]) if len(data) >= 2 else \
            ((data[0] << 8) if data else 0)
        pos, rng_ = min(2, len(data)), 255
        bits = 0
        for bit, prob in items:
            split = 1 + (((rng_ - 1) * prob) >> 8)
            big = split << 8
            if value >= big:
                got = 1
                rng_ -= split
                value -= big
            else:
                got = 0
                rng_ = split
            assert got == bit, f"trial {trial}"
            while rng_ < 128:
                value <<= 1
                rng_ <<= 1
                bits += 1
                if bits == 8:
                    bits = 0
                    if pos < len(data):
                        value |= data[pos]
                        pos += 1


# ---------------------------------------------------------------------------
# Inter-frame assembler: mirrors the decoder's prediction contexts
# (an independent reimplementation of find_near_mvs) and entropy state.
# ---------------------------------------------------------------------------

def clamp2(mv, my, mx, mb_w, mb_h):
    r, c = mv
    lo_c, hi_c = -(mx << 7) - 128, ((mb_w - 1 - mx) << 7) + 128
    lo_r, hi_r = -(my << 7) - 128, ((mb_h - 1 - my) << 7) + 128
    return (min(max(r, lo_r), hi_r), min(max(c, lo_c), hi_c))


def find_near_mvs(above, left, al, my, mx, mb_w, mb_h, ref, bias):
    """Independent (test-side) §16.3 reimplementation. above/left/al:
    (ref, mv, is_split)."""
    cand = [(0, 0), (0, 0), (0, 0), (0, 0)]
    cnt = [0, 0, 0, 0]
    i = 0

    def b(mv, nref):
        return (-mv[0], -mv[1]) if bias[nref] != bias[ref] else mv

    if above[0]:
        if above[1] != (0, 0):
            i = 1
            cand[1] = b(above[1], above[0])
        cnt[i] += 2
    if left[0]:
        if left[1] != (0, 0):
            m = b(left[1], left[0])
            if m != cand[i]:
                i += 1
                cand[i] = m
            cnt[i] += 2
        else:
            cnt[0] += 2
    if al[0]:
        if al[1] != (0, 0):
            m = b(al[1], al[0])
            if m != cand[i]:
                i += 1
                cand[i] = m
            cnt[i] += 1
        else:
            cnt[0] += 1
    if i == 3 and cand[3] == cand[1]:
        cnt[1] += 1
    cnt[3] = 2 * (above[2] + left[2]) + al[2]
    if cnt[2] > cnt[1]:
        cnt[1], cnt[2] = cnt[2], cnt[1]
        cand[1], cand[2] = cand[2], cand[1]
    if cnt[1] >= cnt[0]:
        cand[0] = cand[1]
    return (clamp2(cand[0], my, mx, mb_w, mb_h),
            clamp2(cand[1], my, mx, mb_w, mb_h),
            clamp2(cand[2], my, mx, mb_w, mb_h), cnt)


class InterFrameEncoder:
    """Assemble one inter frame. mbs: list (row-major) of dicts:
    {"mode": "zero"|"nearest"|"near"|"new"|"split"|"intra_dc",
     "mv": (r,c) eighth-pel for "new", "submvs": 16 MVs for "split",
     "ref": 1|2|3, "skip": bool, "coeffs": optional per-MB dict
     {"y2": [...16], "y": [[...16]x16], "u": [[...]x4], "v": [...]}
     of quantized scan-order levels}."""

    def __init__(self, mb_w, mb_h, fc=None):
        self.mb_w, self.mb_h = mb_w, mb_h
        self.fc = fc if fc is not None else {
            "coef": [[[list(V._COEFF_PROBS[
                (((t * 8 + b) * 3 + c) * 11):
                (((t * 8 + b) * 3 + c) * 11) + 11])
                for c in range(3)] for b in range(8)]
                for t in range(4)],
            "mv": [list(_MV_DEFAULT_PROBS[0]),
                   list(_MV_DEFAULT_PROBS[1])],
        }

    def assemble(self, version=0, show=1, filter_level=0,
                 refresh_last=1, refresh_golden=0, refresh_alt=0,
                 copy_to_gf=0, copy_to_arf=0, refresh_entropy=1,
                 coef_updates=(), mbs=(), prob_skip=200,
                 prob_intra=32, prob_last=128, prob_gf=128,
                 sign_bias_golden=0, sign_bias_alt=0,
                 lf_deltas=None, segmentation=None, n_parts=1,
                 record=None):
        # record (optional list): appends one entry per MB —
        # ("intra", None) or (mode, resolved_mv) or
        # ("split", submvs16) — so property tests can build
        # independent pixel expectations from the RESOLVED motion
        # segmentation: dict(update_map=0/1, update_data=0/1, abs=0/1,
        # quant=[4], lf=[4], ids=[per-MB seg ids] (required when
        # update_map), probs=[3] seg tree probs)
        mb_w, mb_h = self.mb_w, self.mb_h
        bias = [0, 0, sign_bias_golden, sign_bias_alt]
        bw = BW()
        seg = segmentation
        if seg is None:
            bw.put(0, 128)                   # segmentation disabled
        else:
            bw.put(1, 128)
            bw.put(seg.get("update_map", 0), 128)
            bw.put(seg.get("update_data", 0), 128)
            if seg.get("update_data"):
                bw.put(seg.get("abs", 0), 128)
                for v in seg.get("quant", [0] * 4):
                    if v:
                        bw.put(1, 128)
                        bw.literal(abs(v), 7)
                        bw.put(1 if v < 0 else 0, 128)
                    else:
                        bw.put(0, 128)
                for v in seg.get("lf", [0] * 4):
                    if v:
                        bw.put(1, 128)
                        bw.literal(abs(v), 6)
                        bw.put(1 if v < 0 else 0, 128)
                    else:
                        bw.put(0, 128)
            if seg.get("update_map"):
                for pv in seg.get("probs", [255, 255, 255]):
                    if pv != 255:
                        bw.put(1, 128)
                        bw.literal(pv, 8)
                    else:
                        bw.put(0, 128)
        bw.put(0, 128)                       # normal loop filter
        bw.literal(filter_level, 6)
        bw.literal(0, 3)                     # sharpness
        if lf_deltas is None:
            bw.put(0, 128)                   # lf deltas disabled
        else:
            ref_d, mode_d = lf_deltas
            bw.put(1, 128)                   # enabled
            bw.put(1, 128)                   # updated this frame
            for v in ref_d:
                if v:
                    bw.put(1, 128)
                    bw.literal(abs(v), 6)
                    bw.put(1 if v < 0 else 0, 128)
                else:
                    bw.put(0, 128)
            for v in mode_d:
                if v:
                    bw.put(1, 128)
                    bw.literal(abs(v), 6)
                    bw.put(1 if v < 0 else 0, 128)
                else:
                    bw.put(0, 128)
        assert n_parts in (1, 2, 4, 8)
        bw.literal({1: 0, 2: 1, 4: 2, 8: 3}[n_parts], 2)
        bw.literal(0, 7)                     # y_ac_qi = 0 (q small)
        for _ in range(5):
            bw.put(0, 128)                   # no quant deltas
        bw.put(refresh_golden, 128)
        bw.put(refresh_alt, 128)
        if not refresh_golden:
            bw.literal(copy_to_gf, 2)
        if not refresh_alt:
            bw.literal(copy_to_arf, 2)
        bw.put(sign_bias_golden, 128)
        bw.put(sign_bias_alt, 128)
        bw.put(refresh_entropy, 128)
        bw.put(refresh_last, 128)
        updates = {(t, b, c, l): val
                   for t, b, c, l, val in coef_updates}
        if not refresh_entropy:
            import copy
            saved = copy.deepcopy(self.fc)
        for t in range(4):
            for b in range(8):
                for c in range(3):
                    base = ((t * 8 + b) * 3 + c) * 11
                    for l in range(11):
                        up = _COEFF_UPDATE_PROBS[base + l]
                        if (t, b, c, l) in updates:
                            bw.put(1, up)
                            bw.literal(updates[(t, b, c, l)], 8)
                            self.fc["coef"][t][b][c][l] = \
                                updates[(t, b, c, l)]
                        else:
                            bw.put(0, up)
        bw.put(1, 128)                       # mb_no_skip enabled
        bw.literal(prob_skip, 8)
        bw.literal(prob_intra, 8)
        bw.literal(prob_last, 8)
        bw.literal(prob_gf, 8)
        bw.put(0, 128)                       # no ymode update
        bw.put(0, 128)                       # no uv mode update
        for comp in range(2):                # no mv prob updates
            for i in range(19):
                bw.put(0, _MV_UPDATE_PROBS[comp][i])

        # per-MB headers (first partition) + tokens (row my goes to
        # token partition my % n_parts, the spec's striping)
        tws = [BW() for _ in range(n_parts)]
        intra = (0, (0, 0), False)
        above = [intra] * mb_w
        above_smv = [[(0, 0)] * 4] * mb_w
        above_nz = [[0] * 9 for _ in range(mb_w)]
        mvp = self.fc["mv"]
        for my in range(mb_h):
            left = intra
            left_smv = [(0, 0)] * 4
            al = intra
            left_nz = [0] * 9
            tw = tws[my % n_parts]
            for mx in range(mb_w):
                spec = mbs[my * mb_w + mx]
                if seg is not None and seg.get("update_map"):
                    from realtime_olap_spark.operators.vp8 import \
                        _SEG_TREE
                    tree_write(bw, _SEG_TREE,
                               seg.get("probs", [255, 255, 255]),
                               seg["ids"][my * mb_w + mx])
                skip = 1 if spec.get("skip", True) else 0
                bw.put(skip, prob_skip)
                mode = spec["mode"]
                is_split = mode == "split"
                if mode == "intra_dc":
                    bw.put(0, prob_intra)
                    tree_write(bw, _IF_YMODE_TREE, _IF_YMODE_PROBS, 0)
                    tree_write(bw, _UV_MODE_TREE, _IF_UV_PROBS, 0)
                    cur = intra
                    cur_bottom = cur_right = [(0, 0)] * 4
                    if record is not None:
                        record.append(("intra", None))
                else:
                    bw.put(1, prob_intra)
                    ref = spec.get("ref", 1)
                    if ref == 1:
                        bw.put(0, prob_last)
                    else:
                        bw.put(1, prob_last)
                        bw.put(ref - 2, prob_gf)
                    best, nearest, near, cnt = find_near_mvs(
                        above[mx], left, al, my, mx, mb_w, mb_h,
                        ref, bias)
                    p = tuple(_MODE_CONTEXTS[cnt[k]][k]
                              for k in range(4))
                    if mode == "zero":
                        tree_write(bw, _MV_REF_TREE, p, 0)
                        mv = (0, 0)
                    elif mode == "nearest":
                        tree_write(bw, _MV_REF_TREE, p, 1)
                        mv = nearest
                    elif mode == "near":
                        tree_write(bw, _MV_REF_TREE, p, 2)
                        mv = near
                    elif mode == "new":
                        tree_write(bw, _MV_REF_TREE, p, 3)
                        mv = spec["mv"]
                        dr, dc = mv[0] - best[0], mv[1] - best[1]
                        assert dr % 2 == 0 and dc % 2 == 0
                        write_mvcomponent(bw, mvp[0], dr // 2)
                        write_mvcomponent(bw, mvp[1], dc // 2)
                    else:  # split
                        tree_write(bw, _MV_REF_TREE, p, 4)
                        s = spec.get("split_type", 2)
                        tree_write(bw, _MBSPLIT_TREE, _MBSPLIT_PROBS,
                                   s)
                        smap = _MBSPLITS[s]
                        submvs = [None] * 16
                        want = spec["submvs"]
                        for j in range(_MBSPLIT_COUNT[s]):
                            k = _MBSPLIT_OFFSET[s][j]
                            if k & 3:
                                lmv = submvs[k - 1]
                            elif left[2]:
                                lmv = left_smv[k >> 2]
                            else:
                                lmv = left[1]
                            if k >> 2:
                                amv = submvs[k - 4]
                            elif above[mx][2]:
                                amv = above_smv[mx][k & 3]
                            else:
                                amv = above[mx][1]
                            lez = lmv == (0, 0)
                            aez = amv == (0, 0)
                            lea = lmv == amv
                            ctx = (4 if lea and lez else 3 if lea
                                   else 2 if aez else 1 if lez else 0)
                            pr = _SUB_MV_REF_PROBS[ctx]
                            bmv = want[k]
                            if bmv == lmv:
                                tree_write(bw, _SUB_MV_REF_TREE, pr, 0)
                            elif bmv == amv:
                                tree_write(bw, _SUB_MV_REF_TREE, pr, 1)
                            elif bmv == (0, 0):
                                tree_write(bw, _SUB_MV_REF_TREE, pr, 2)
                            else:
                                tree_write(bw, _SUB_MV_REF_TREE, pr, 3)
                                dr = bmv[0] - best[0]
                                dc = bmv[1] - best[1]
                                write_mvcomponent(bw, mvp[0], dr // 2)
                                write_mvcomponent(bw, mvp[1], dc // 2)
                            for sb in range(16):
                                if smap[sb] == j:
                                    submvs[sb] = bmv
                        mv = submvs[15]
                    if record is not None:
                        record.append(("split", list(submvs))
                                      if is_split else (mode, mv))
                    cur = (ref, mv, is_split)
                    if is_split:
                        cur_bottom = submvs[12:16]
                        cur_right = [submvs[3], submvs[7],
                                     submvs[11], submvs[15]]
                    else:
                        cur_bottom = cur_right = [mv] * 4
                # tokens
                has_y2 = mode != "split"
                anz = above_nz[mx]
                if skip:
                    for i in range(8):
                        anz[i] = 0
                        left_nz[i] = 0
                    if has_y2:
                        anz[8] = 0
                        left_nz[8] = 0
                else:
                    co = spec.get("coeffs", {})
                    coef = self.fc["coef"]
                    if has_y2:
                        y2 = co.get("y2", [0] * 16)
                        ctx = anz[8] + left_nz[8]
                        nz = self._write_block(tw, coef[1], ctx, 0, y2)
                        anz[8] = left_nz[8] = nz
                        ytype, first = 0, 1
                    else:
                        ytype, first = 3, 0
                    yb = co.get("y", [[0] * 16 for _ in range(16)])
                    for r in range(4):
                        l = left_nz[r]
                        for c in range(4):
                            nz = self._write_block(
                                tw, coef[ytype], anz[c] + l, first,
                                yb[r * 4 + c])
                            anz[c] = l = nz
                        left_nz[r] = l
                    for key, base in (("u", 4), ("v", 6)):
                        cb = co.get(key, [[0] * 16 for _ in range(4)])
                        for r in range(2):
                            l = left_nz[base + r]
                            for c in range(2):
                                nz = self._write_block(
                                    tw, coef[2], anz[base + c] + l, 0,
                                    cb[r * 2 + c])
                                anz[base + c] = l = nz
                            left_nz[base + r] = l
                al = above[mx]
                above[mx] = cur
                above_smv[mx] = cur_bottom
                left = cur
                left_smv = cur_right
        part1 = bw.stop()
        parts = [t.stop() for t in tws]
        sizes = b"".join(len(pp).to_bytes(3, "little")
                         for pp in parts[:-1])
        if not refresh_entropy:
            self.fc = saved
        tag = 1 | (version << 1) | (show << 4) | (len(part1) << 5)
        return bytes((tag & 0xFF, (tag >> 8) & 0xFF,
                      (tag >> 16) & 0xFF)) + part1 + sizes \
            + b"".join(parts)

    @staticmethod
    def _write_block(tw, tprobs, ctx, first, levels):
        """Token-encode one 4x4 block (scan-order quantized levels);
        returns the nonzero flag for context tracking."""
        bands = V._COEFF_BANDS
        cat_probs = V._CAT_PROBS
        cat_bases = V._CAT_BASES
        lastnz = -1
        for i in range(first, 16):
            if levels[i]:
                lastnz = i
        n = first
        skip_eob = False
        while n <= lastnz:
            p = tprobs[bands[n]][ctx]
            if not skip_eob:
                tw.put(1, p[0])
            v = levels[n]
            if v == 0:
                tw.put(0, p[1])
                ctx = 0
                skip_eob = True
                n += 1
                continue
            tw.put(1, p[1])
            skip_eob = False
            a = abs(v)
            if a == 1:
                tw.put(0, p[2])
                ctx = 1
            else:
                tw.put(1, p[2])
                ctx = 2
                if a <= 4:
                    tw.put(0, p[3])
                    if a == 2:
                        tw.put(0, p[4])
                    else:
                        tw.put(1, p[4])
                        tw.put(a - 3, p[5])
                else:
                    cat = next(k for k in reversed(range(6))
                               if a >= cat_bases[k])
                    tw.put(1, p[3])
                    if cat < 2:
                        tw.put(0, p[6])
                        tw.put(cat, p[7])
                    elif cat < 4:
                        tw.put(1, p[6])
                        tw.put(0, p[8])
                        tw.put(cat - 2, p[9])
                    else:
                        tw.put(1, p[6])
                        tw.put(1, p[8])
                        tw.put(cat - 4, p[10])
                    extra = a - cat_bases[cat]
                    cp = cat_probs[cat]
                    for bi, cpb in enumerate(cp):
                        tw.put((extra >> (len(cp) - 1 - bi)) & 1, cpb)
            tw.put(1 if v < 0 else 0, 128)
            n += 1
        if lastnz < 15:
            p = tprobs[bands[n]][ctx]
            tw.put(0, p[0])
        return 1 if lastnz >= first else 0


# ---------------------------------------------------------------------------
# Fixtures: a real libwebp key frame starts every sequence
# ---------------------------------------------------------------------------

def _keyframe_and_planes(w=64, h=48, seed=7):
    lib = _libwebp()
    if lib is None:  # pragma: no cover
        pytest.skip("libwebp.so.7 / encoder ABI not available")
    px = _photo(w, h, seed)
    payload = _vp8_payload(_encode(lib, px, quality=60.0))
    seq = _make_vp8_sequence_decoder(MAXPX)
    res = seq(payload)
    assert isinstance(res, tuple) and res[5] == 1
    return payload, seq, res


def _pad_ref(plane):
    return np.pad(plane, BORDER, mode="edge")


def test_inter_zeromv_skip_is_identity():
    """An all-ZEROMV, all-skip, filter-off inter frame must reproduce
    the reference frame exactly — the strongest no-op invariant."""
    payload, seq, kf = _keyframe_and_planes()
    w, h = kf[0], kf[1]
    enc = InterFrameEncoder(w // 16, h // 16)
    frame = enc.assemble(mbs=[{"mode": "zero"}] * ((w // 16)
                                                   * (h // 16)))
    res = seq(frame)
    assert isinstance(res, tuple), res
    assert res[5] == 1
    for a, b in zip(res[2:5], kf[2:5]):
        assert (a == b).all()


def test_inter_fullpel_newmv_matches_numpy_shift():
    """Full-pel NEWMV everywhere: output == plain numpy indexing into
    the edge-replicated reference (an independent expectation that
    never touches the decoder's MC code)."""
    payload, seq, kf = _keyframe_and_planes()
    w, h = kf[0], kf[1]
    ry, ru, rv = (_pad_ref(p) for p in kf[2:5])
    for mvr, mvc in ((16, 24), (-16, 8), (-24, -40), (160, -160)):
        seq.reset()
        assert isinstance(seq(payload), tuple)
        enc = InterFrameEncoder(w // 16, h // 16)
        frame = enc.assemble(mbs=[{"mode": "new", "mv": (mvr, mvc)}]
                             * ((w // 16) * (h // 16)))
        res = seq(frame)
        assert isinstance(res, tuple), (mvr, mvc, res)
        fy, fx = mvr >> 3, mvc >> 3
        exp_y = ry[BORDER + fy:BORDER + fy + h,
                   BORDER + fx:BORDER + fx + w]
        assert (res[2] == exp_y).all(), (mvr, mvc)
        # chroma mv: (v + sign)/2 truncated — may be SUB-pel even for
        # a full-pel luma MV (halving), so route through the
        # independent six-tap when fractional
        ur = (abs(mvr) + 1) >> 1
        ur = -ur if mvr < 0 else ur
        uc = (abs(mvc) + 1) >> 1
        uc = -uc if mvc < 0 else uc

        def cexp(plane):
            if ur & 7 or uc & 7:
                return _sixtap_ref(plane, BORDER + (ur >> 3),
                                   BORDER + (uc >> 3), ur & 7, uc & 7,
                                   h // 2, w // 2, _SUBPEL_FILTERS)
            return plane[BORDER + (ur >> 3):BORDER + (ur >> 3) + h // 2,
                         BORDER + (uc >> 3):BORDER + (uc >> 3) + w // 2]

        assert (res[3] == cexp(ru)).all(), (mvr, mvc)
        assert (res[4] == cexp(rv)).all(), (mvr, mvc)


def _sixtap_ref(plane, fy, fx, yf, xf, h, w, taps):
    """Independent per-pixel six-tap reimplementation (both passes
    rounded and clamped, per the RFC)."""
    def f1d(vals, t):
        s = sum(int(vals[k]) * t[k] for k in range(6))
        s = (s + 64) >> 7
        return 0 if s < 0 else 255 if s > 255 else s

    tx, ty = taps[xf], taps[yf]
    if xf and yf:
        tmp = np.zeros((h + 5, w), np.int32)
        for r in range(h + 5):
            for c in range(w):
                tmp[r, c] = f1d(plane[fy + r - 2, fx + c - 2:fx + c + 4],
                                tx)
        out = np.zeros((h, w), np.uint8)
        for r in range(h):
            for c in range(w):
                out[r, c] = f1d(tmp[r:r + 6, c], ty)
        return out
    if xf:
        out = np.zeros((h, w), np.uint8)
        for r in range(h):
            for c in range(w):
                out[r, c] = f1d(plane[fy + r, fx + c - 2:fx + c + 4],
                                tx)
        return out
    out = np.zeros((h, w), np.uint8)
    for r in range(h):
        for c in range(w):
            out[r, c] = f1d(plane[fy + r - 2:fy + r + 4, fx + c], ty)
    return out


def test_inter_subpel_newmv_matches_independent_sixtap():
    payload, seq, kf = _keyframe_and_planes(w=48, h=32)
    w, h = kf[0], kf[1]
    ry, ru, rv = (_pad_ref(p) for p in kf[2:5])
    for mvr, mvc in ((10, 0), (0, 6), (12, 22), (-14, 10)):
        seq.reset()
        assert isinstance(seq(payload), tuple)
        enc = InterFrameEncoder(w // 16, h // 16)
        frame = enc.assemble(mbs=[{"mode": "new", "mv": (mvr, mvc)}]
                             * ((w // 16) * (h // 16)))
        res = seq(frame)
        assert isinstance(res, tuple), (mvr, mvc, res)
        exp_y = _sixtap_ref(ry, BORDER + (mvr >> 3), BORDER + (mvc >> 3),
                            mvr & 7, mvc & 7, h, w, _SUBPEL_FILTERS)
        if not (mvr & 7 or mvc & 7):
            exp_y = ry[BORDER + (mvr >> 3):BORDER + (mvr >> 3) + h,
                       BORDER + (mvc >> 3):BORDER + (mvc >> 3) + w]
        assert (res[2] == exp_y).all(), (mvr, mvc)
        ur = (abs(mvr) + 1) >> 1
        ur = -ur if mvr < 0 else ur
        uc = (abs(mvc) + 1) >> 1
        uc = -uc if mvc < 0 else uc
        exp_u = _sixtap_ref(ru, BORDER + (ur >> 3), BORDER + (uc >> 3),
                            ur & 7, uc & 7, h // 2, w // 2,
                            _SUBPEL_FILTERS) \
            if (ur & 7 or uc & 7) else \
            ru[BORDER + (ur >> 3):BORDER + (ur >> 3) + h // 2,
               BORDER + (uc >> 3):BORDER + (uc >> 3) + w // 2]
        assert (res[3] == exp_u).all(), (mvr, mvc)


def test_inter_bilinear_version1():
    """Version-1 frames reconstruct with the bilinear filters."""
    payload, seq, kf = _keyframe_and_planes(w=32, h=32)
    w, h = kf[0], kf[1]
    ry = _pad_ref(kf[2])
    mvr, mvc = 10, 6
    enc = InterFrameEncoder(w // 16, h // 16)
    frame = enc.assemble(version=1,
                         mbs=[{"mode": "new", "mv": (mvr, mvc)}]
                         * ((w // 16) * (h // 16)))
    res = seq(frame)
    assert isinstance(res, tuple), res
    tx, ty = _BILINEAR_FILTERS[mvc & 7], _BILINEAR_FILTERS[mvr & 7]
    fy, fx = BORDER + (mvr >> 3), BORDER + (mvc >> 3)
    exp = np.zeros((h, w), np.uint8)
    for r in range(h):
        for c in range(w):
            # two-pass: horizontal on rows r and r+1, then vertical
            a0 = (int(ry[fy + r, fx + c]) * tx[0]
                  + int(ry[fy + r, fx + c + 1]) * tx[1] + 64) >> 7
            a1 = (int(ry[fy + r + 1, fx + c]) * tx[0]
                  + int(ry[fy + r + 1, fx + c + 1]) * tx[1] + 64) >> 7
            exp[r, c] = (a0 * ty[0] + a1 * ty[1] + 64) >> 7
    assert (res[2] == exp).all()


def test_splitmv_quadrants_and_chroma_average():
    payload, seq, kf = _keyframe_and_planes(w=32, h=32)
    w, h = kf[0], kf[1]
    ry, ru, rv = (_pad_ref(p) for p in kf[2:5])
    # multiples of 16 so the halved chroma MVs stay full-pel too
    quad = [(16, 32), (-16, 48), (32, -16), (-32, -16)]
    submvs = [None] * 16
    for sb in range(16):
        qi = (sb >> 3) * 2 + ((sb & 3) >> 1)
        submvs[sb] = quad[qi]
    mbs = [{"mode": "split", "split_type": 2, "submvs": submvs}
           for _ in range((w // 16) * (h // 16))]
    enc = InterFrameEncoder(w // 16, h // 16)
    res = seq(enc.assemble(mbs=mbs))
    assert isinstance(res, tuple), res
    exp_y = np.zeros((h, w), np.uint8)
    for my in range(h // 16):
        for mx in range(w // 16):
            for sb in range(16):
                mvr, mvc = submvs[sb]
                py = my * 16 + 4 * (sb >> 2)
                px = mx * 16 + 4 * (sb & 3)
                exp_y[py:py + 4, px:px + 4] = ry[
                    BORDER + py + (mvr >> 3):BORDER + py + (mvr >> 3) + 4,
                    BORDER + px + (mvc >> 3):BORDER + px + (mvc >> 3) + 4]
    assert (res[2] == exp_y).all()
    # chroma: per 2x2 group average with the +4-sign-trunc rule
    exp_u = np.zeros((h // 2, w // 2), np.uint8)
    for my in range(h // 16):
        for mx in range(w // 16):
            for i in range(2):
                for j in range(2):
                    b0 = i * 8 + j * 2
                    tr = sum(submvs[b][0] for b in
                             (b0, b0 + 1, b0 + 4, b0 + 5))
                    tc = sum(submvs[b][1] for b in
                             (b0, b0 + 1, b0 + 4, b0 + 5))

                    def avg8(t):
                        t2 = t + (4 if t >= 0 else -4)
                        q = abs(t2) >> 3
                        return q if t2 >= 0 else -q

                    ur, uc = avg8(tr), avg8(tc)
                    cy = my * 8 + 4 * i
                    cx = mx * 8 + 4 * j
                    assert ur & 7 == 0 and uc & 7 == 0
                    exp_u[cy:cy + 4, cx:cx + 4] = ru[
                        BORDER + cy + (ur >> 3):
                        BORDER + cy + (ur >> 3) + 4,
                        BORDER + cx + (uc >> 3):
                        BORDER + cx + (uc >> 3) + 4]
    assert (res[3] == exp_u).all()


def test_golden_altref_buffers_and_show_frame():
    """Buffer management: an inter frame refreshing only LAST leaves
    golden/altref at the key frame; a later ZEROMV frame from golden
    reproduces the key frame; a hidden (show=0) altref refresh is
    decodable, not displayed, and referenced by the next frame."""
    payload, seq, kf = _keyframe_and_planes(w=32, h=16)
    w, h = kf[0], kf[1]
    nmb = (w // 16) * (h // 16)
    # frame B: gray it out (all intra-DC with no neighbors context —
    # deterministic content change), refresh last only
    enc = InterFrameEncoder(w // 16, h // 16)
    b = seq(enc.assemble(mbs=[{"mode": "intra_dc"}] * nmb))
    assert isinstance(b, tuple)
    assert not (b[2] == kf[2]).all()
    # frame C: ZEROMV from GOLDEN == key frame exactly
    enc = InterFrameEncoder(w // 16, h // 16)
    c = seq(enc.assemble(mbs=[{"mode": "zero", "ref": 2}] * nmb,
                         refresh_last=0))
    assert isinstance(c, tuple)
    for p, q in zip(c[2:5], kf[2:5]):
        assert (p == q).all()
    # frame D: hidden altref refresh from LAST (which is still B)
    enc = InterFrameEncoder(w // 16, h // 16)
    d = seq(enc.assemble(mbs=[{"mode": "zero", "ref": 1}] * nmb,
                         refresh_last=0, refresh_alt=1, show=0))
    assert isinstance(d, tuple)
    assert d[5] == 0  # not shown
    # frame E: ZEROMV from ALTREF == B
    enc = InterFrameEncoder(w // 16, h // 16)
    e = seq(enc.assemble(mbs=[{"mode": "zero", "ref": 3}] * nmb,
                         refresh_last=0))
    assert isinstance(e, tuple)
    for p, q in zip(e[2:5], b[2:5]):
        assert (p == q).all()
    # copy_buffer_to_golden = 1 (last -> golden): after copying, a
    # golden reference reproduces B (the current last), not the KF
    enc = InterFrameEncoder(w // 16, h // 16)
    f = seq(enc.assemble(mbs=[{"mode": "zero", "ref": 1}] * nmb,
                         refresh_last=0, copy_to_gf=1))
    assert isinstance(f, tuple)
    enc = InterFrameEncoder(w // 16, h // 16)
    g = seq(enc.assemble(mbs=[{"mode": "zero", "ref": 2}] * nmb,
                         refresh_last=0))
    assert isinstance(g, tuple)
    for p, q in zip(g[2:5], b[2:5]):
        assert (p == q).all()


def _idct_ref(block):
    """Independent §14.4 inverse DCT for the residual expectation."""
    t = [0] * 16
    for i in range(4):
        x0, x4, x8, x12 = block[i], block[i + 4], block[i + 8], \
            block[i + 12]
        a1 = x0 + x8
        b1 = x0 - x8
        c1 = ((x4 * 35468) >> 16) - (x12 + ((x12 * 20091) >> 16))
        d1 = (x4 + ((x4 * 20091) >> 16)) + ((x12 * 35468) >> 16)
        t[i], t[i + 12] = a1 + d1, a1 - d1
        t[i + 4], t[i + 8] = b1 + c1, b1 - c1
    out = [0] * 16
    for i in range(4):
        r = i * 4
        x0, x1, x2, x3 = t[r], t[r + 1], t[r + 2], t[r + 3]
        a1 = x0 + x2
        b1 = x0 - x2
        c1 = ((x1 * 35468) >> 16) - (x3 + ((x3 * 20091) >> 16))
        d1 = (x1 + ((x1 * 20091) >> 16)) + ((x3 * 35468) >> 16)
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


def test_residuals_on_inter_mb():
    """ZEROMV + coded residual: output == clip(ref + idct(dequant))
    on the touched block, untouched elsewhere. y_ac_qi=0 -> qdc=4,
    qac=4 (the §14.1 tables' row 0)."""
    payload, seq, kf = _keyframe_and_planes(w=16, h=16)
    w, h = kf[0], kf[1]
    levels = [0] * 16
    levels[1] = 3   # one AC coefficient in scan position 1
    levels[5] = -2
    yblocks = [[0] * 16 for _ in range(16)]
    yblocks[0] = list(levels)
    enc = InterFrameEncoder(1, 1)
    frame = enc.assemble(mbs=[{"mode": "zero", "skip": False,
                               "coeffs": {"y": yblocks}}])
    res = seq(frame)
    assert isinstance(res, tuple), res
    zz = V._ZIGZAG
    deq = [0] * 16
    for n, lv in enumerate(levels):
        if lv:
            deq[zz[n]] = lv * 4  # qdc=4 for n==0 else qac=4 (both 4)
    resid = np.array(_idct_ref(deq), np.int32).reshape(4, 4)
    exp = kf[2].astype(np.int32).copy()
    exp[0:4, 0:4] = np.clip(exp[0:4, 0:4] + resid, 0, 255)
    assert (res[2] == exp.astype(np.uint8)).all()
    assert (res[3] == kf[3]).all() and (res[4] == kf[4]).all()


def test_coef_prob_update_persistence():
    """A frame-1 coefficient-probability update with
    refresh_entropy_probs=1 must persist into frame 2 (the frame-2
    tokens are encoded against the UPDATED table — a decoder that
    reverts desynchronizes and cannot reproduce the expected pixels);
    with refresh_entropy_probs=0 the update must NOT persist."""
    payload, seq, kf = _keyframe_and_planes(w=16, h=16)
    levels = [0] * 16
    levels[1] = 5  # AC (Y blocks start at scan 1 when Y2 is present)
    yb = [[0] * 16 for _ in range(16)]
    yb[0] = list(levels)
    zz = V._ZIGZAG
    deq = [0] * 16
    deq[zz[1]] = 5 * 4
    resid = np.array(_idct_ref(deq), np.int32).reshape(4, 4)

    def expected(base):
        e = base.astype(np.int32).copy()
        e[0:4, 0:4] = np.clip(e[0:4, 0:4] + resid, 0, 255)
        return e.astype(np.uint8)

    for persist in (1, 0):
        seq.reset()
        assert isinstance(seq(payload), tuple)
        enc = InterFrameEncoder(1, 1)
        f1 = enc.assemble(refresh_entropy=persist,
                          coef_updates=((0, 1, 0, 0, 17),),
                          mbs=[{"mode": "zero", "skip": False,
                                "coeffs": {"y": yb}}])
        r1 = seq(f1)
        assert isinstance(r1, tuple), (persist, r1)
        assert (r1[2] == expected(kf[2])).all()
        # frame 2 encodes the same tokens against the encoder's OWN
        # post-frame-1 state (updated iff persist)
        f2 = enc.assemble(mbs=[{"mode": "zero", "skip": False,
                                "coeffs": {"y": yb}}])
        r2 = seq(f2)
        assert isinstance(r2, tuple), (persist, r2)
        assert (r2[2] == expected(r1[2])).all(), f"persist={persist}"


def test_inter_without_reference_and_contract_fuzz():
    """Contract: inter-before-keyframe is a named unsupported; every
    truncation offset and seeded bit flips of a 2-frame sequence
    return tuple/None/'unsupported: …' and never raise."""
    seq = _make_vp8_sequence_decoder(MAXPX)
    enc = InterFrameEncoder(1, 1)
    inter = enc.assemble(mbs=[{"mode": "zero"}])
    out = seq(inter)
    assert out == ("unsupported: VP8 inter frame without reference "
                   "frames")
    payload, seq, kf = _keyframe_and_planes(w=16, h=16)
    for k in range(len(inter) + 1):
        seq.reset()
        seq(payload)
        got = seq(inter[:k])
        assert got is None or isinstance(got, (tuple, str)), k
    rnd = random.Random("r12-vp8-inter")
    for _ in range(400):
        i = rnd.randrange(len(inter))
        mutated = bytearray(inter)
        mutated[i] ^= 1 << rnd.randrange(8)
        seq.reset()
        seq(payload)
        got = seq(bytes(mutated))
        assert got is None or isinstance(got, (tuple, str)), i


def test_still_wrapper_still_rejects_inter():
    from realtime_olap_spark.operators.vp8 import \
        _make_vp8_planes_decoder
    enc = InterFrameEncoder(1, 1)
    inter = enc.assemble(mbs=[{"mode": "zero"}])
    assert _make_vp8_planes_decoder(MAXPX)(inter) \
        == "unsupported: WebP inter frame"


# ---------------------------------------------------------------------------
# WebM end-to-end: every block decodes (keyframes AND inter frames),
# hidden altref blocks update state without emitting frames, and
# decode_frames samples inter-frame content (r11 verdict directive #1)
# ---------------------------------------------------------------------------

def _mux_webm_mixed(block_list, duration_ms):
    """(ts_ms, payload, is_key) -> minimal Matroska stream (the same
    spec-written muxer shape as test_webp_lossy's, plus the keyframe
    flag bit driven per block)."""
    import struct

    from test_webp_lossy import _el
    header = _el(0x1A45DFA3, _el(0x4282, b"webm"))
    info = _el(0x1549A966,
               _el(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
               + _el(0x4489, struct.pack(">d", float(duration_ms))))
    track = _el(0xAE, _el(0xD7, b"\x01") + _el(0x83, b"\x01")
                + _el(0x86, b"V_VP8"))
    blocks = b""
    for ts, payload, key in block_list:
        blocks += _el(0xA3, b"\x81" + struct.pack(">h", ts)
                      + (b"\x80" if key else b"\x00") + payload)
    cluster = _el(0x1F43B675, _el(0xE7, b"\x00") + blocks)
    return header + _el(0x18538067,
                        info + _el(0x1654AE6B, track) + cluster)


def test_webm_decodes_inter_frames_and_hidden_altref():
    from realtime_olap_spark.operators.webp import \
        _make_webm_video_decoder
    payload, seq, kf = _keyframe_and_planes(w=32, h=16)
    w, h = kf[0], kf[1]
    nmb = (w // 16) * (h // 16)
    enc = InterFrameEncoder(w // 16, h // 16)
    inter_same = enc.assemble(mbs=[{"mode": "zero"}] * nmb)
    enc = InterFrameEncoder(w // 16, h // 16)
    inter_gray = enc.assemble(mbs=[{"mode": "intra_dc"}] * nmb)
    enc = InterFrameEncoder(w // 16, h // 16)
    hidden_alt = enc.assemble(mbs=[{"mode": "intra_dc"}] * nmb,
                              refresh_last=0, refresh_alt=1, show=0)
    enc = InterFrameEncoder(w // 16, h // 16)
    from_alt = enc.assemble(mbs=[{"mode": "zero", "ref": 3}] * nmb,
                            refresh_last=0)
    data = _mux_webm_mixed(
        [(0, payload, True), (100, inter_same, False),
         (200, hidden_alt, False), (300, from_alt, False)], 400)
    dec = _make_webm_video_decoder(MAXPX)
    res = dec(data)
    assert isinstance(res, tuple), res
    gw, gh, frames = res
    assert (gw, gh) == (w, h)
    # 4 blocks, 3 SHOWN frames (the altref update emits nothing)
    assert [(s, d) for s, d, _ in frames] == [(0, 100), (100, 200),
                                              (300, 100)]
    # frame@100 is ZEROMV/skip == the key frame's pixels exactly
    assert (frames[1][2] == frames[0][2]).all()
    # frame@300 references the HIDDEN altref (gray intra-DC) — it
    # must differ from the key frame and equal the gray frame's
    # sequence-decoded pixels
    assert not (frames[2][2][:, :, :3] == frames[0][2][:, :, :3]).all()
    seq.reset()
    assert isinstance(seq(payload), tuple)
    g = seq(inter_gray)
    assert isinstance(g, tuple)
    uu = np.repeat(np.repeat(g[3], 2, 0), 2, 1)[:h, :w].astype(
        np.int32) - 128
    vv = np.repeat(np.repeat(g[4], 2, 0), 2, 1)[:h, :w].astype(
        np.int32) - 128
    c = g[2].astype(np.int32) - 16
    exp = np.dstack([
        np.clip((298 * c + 409 * vv + 128) >> 8, 0, 255),
        np.clip((298 * c - 100 * uu - 208 * vv + 128) >> 8, 0, 255),
        np.clip((298 * c + 516 * uu + 128) >> 8, 0, 255),
    ]).astype(np.uint8)
    assert (frames[2][2][:, :, :3] == exp).all()
    # corrupt mid-stream inter block -> whole video is corrupt (None),
    # never a silent skip
    bad = _mux_webm_mixed(
        [(0, payload, True), (100, inter_same[:10], False)], 200)
    assert dec(bad) is None


def test_decode_frames_samples_inter_frame_content(spark):
    """The r11 gap, closed: a sample timestamp landing after an inter
    frame returns THAT frame's pixels (previously keyframes only)."""
    from realtime_olap_spark.operators import multimodal as M
    payload, seq, kf = _keyframe_and_planes(w=16, h=16)
    enc = InterFrameEncoder(1, 1)
    inter_gray = enc.assemble(mbs=[{"mode": "intra_dc"}])
    data = _mux_webm_mixed(
        [(0, payload, True), (100, inter_gray, False)], 200)
    df = spark.createDataFrame(
        [(1, "video", data)],
        "media_id long, media_type string, payload binary")
    rows = M.decode_frames(df, every_ms=50).collect()
    ts = sorted(r["frame_ts_ms"] for r in rows)
    assert ts == [0, 50, 100, 150]
    png = M._make_png_decoder()
    by_ts = {r["frame_ts_ms"]: r for r in rows}
    px0 = png(bytes(by_ts[0]["payload"]))[3]
    px100 = png(bytes(by_ts[100]["payload"]))[3]
    px150 = png(bytes(by_ts[150]["payload"]))[3]
    assert not (px100 == px0).all()      # inter content, not the KF
    assert (px150 == px100).all()        # still inside the inter span


def test_inter_webm_fixture_matches_assembler():
    """tests/fixtures/inter.webm is the committed output of this
    suite's own assembler (libwebp key frame + spec-assembled
    NEWMV / hidden-altref / SPLITMV inter frames) — its provenance is
    this function; the media fuzz sweep mutates it."""
    import os

    payload, seq, kf = _keyframe_and_planes(w=32, h=16, seed=7)
    w, h = kf[0], kf[1]
    nmb = (w // 16) * (h // 16)
    enc = InterFrameEncoder(w // 16, h // 16)
    inter1 = enc.assemble(mbs=[{"mode": "new", "mv": (16, 24)}] * nmb)
    enc = InterFrameEncoder(w // 16, h // 16)
    hidden = enc.assemble(mbs=[{"mode": "intra_dc"}] * nmb,
                          refresh_last=0, refresh_alt=1, show=0)
    enc = InterFrameEncoder(w // 16, h // 16)
    split = enc.assemble(
        mbs=[{"mode": "split", "split_type": 2,
              "submvs": [((16, 32) if sb % 2 else (-16, 48))
                         for sb in range(16)]}] * nmb,
        refresh_last=0)
    data = _mux_webm_mixed(
        [(0, payload, True), (100, inter1, False),
         (200, hidden, False), (300, split, False)], 400)
    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       "inter.webm")
    with open(fix, "rb") as f:
        assert f.read() == data
    from realtime_olap_spark.operators.webp import \
        _make_webm_video_decoder
    res = _make_webm_video_decoder(MAXPX)(data)
    assert isinstance(res, tuple) and len(res[2]) == 3


def test_nearest_near_modes_follow_candidate_survey():
    """NEARESTMV/NEARMV select the surveyed candidates: a first
    column of NEWMV macroblocks plants two distinct MVs; MBs coded
    NEARESTMV/NEARMV must reproduce the matching motion — decoded
    against the same independent numpy-shift expectation as NEWMV."""
    payload, seq, kf = _keyframe_and_planes(w=48, h=32)
    w, h = kf[0], kf[1]
    ry = _pad_ref(kf[2])
    mv_a = (16, 24)   # full-pel
    # layout (3x2 MBs): MB(0,0) NEWMV mv_a; MB(0,1) NEAREST (above
    # intra, left=mv_a -> nearest=mv_a); MB(0,2) NEAREST (left=mv_a);
    # row 1: MB(1,0) NEAREST (above=mv_a), MB(1,1)/(1,2) NEAR/NEAREST
    mbs = [{"mode": "new", "mv": mv_a}, {"mode": "nearest"},
           {"mode": "nearest"},
           {"mode": "nearest"}, {"mode": "nearest"},
           {"mode": "nearest"}]
    enc = InterFrameEncoder(w // 16, h // 16)
    res = seq(enc.assemble(mbs=mbs))
    assert isinstance(res, tuple), res
    fy, fx = mv_a[0] >> 3, mv_a[1] >> 3
    exp_y = ry[BORDER + fy:BORDER + fy + h,
               BORDER + fx:BORDER + fx + w]
    assert (res[2] == exp_y).all()


def test_near_mode_second_candidate():
    """NEARMV picks the SECOND distinct candidate: above carries mv_a,
    left carries mv_b — near == the lesser-counted distinct MV."""
    payload, seq, kf = _keyframe_and_planes(w=48, h=32)
    w, h = kf[0], kf[1]
    ry = _pad_ref(kf[2])
    mv_a, mv_b = (16, 24), (-16, 8)
    # row 0: NEWMV mv_a at (0,0) and (0,1); NEWMV mv_b at (0,2)
    # row 1: (1,0) NEWMV mv_b (left intra? no - (1,0) has above mv_a);
    # target: MB(1,2): above=(0,2)=mv_b, left=(1,1)=mv_a,
    # al=(0,1)=mv_a -> candidates: above pushes mv_b (cnt 2), left
    # pushes mv_a (cnt 2), al matches mv_a (+1) -> nearest=mv_a
    # (after swap: cnt mv_a=3 > mv_b=2), near=mv_b
    mbs = [{"mode": "new", "mv": mv_a}, {"mode": "new", "mv": mv_a},
           {"mode": "new", "mv": mv_b},
           {"mode": "new", "mv": mv_a}, {"mode": "new", "mv": mv_a},
           {"mode": "near"}]
    enc = InterFrameEncoder(w // 16, h // 16)
    res = seq(enc.assemble(mbs=mbs))
    assert isinstance(res, tuple), res
    # verify via the test-side survey that "near" really is mv_b, then
    # check MB(1,2)'s pixels against the mv_b shift expectation
    _, nearest, near, _ = find_near_mvs(
        (1, mv_b, False), (1, mv_a, False), (1, mv_a, False),
        1, 2, 3, 2, 1, [0, 0, 0, 0])
    assert nearest == mv_a and near == mv_b
    fy, fx = mv_b[0] >> 3, mv_b[1] >> 3
    py, px = 16, 32
    exp = ry[BORDER + py + fy:BORDER + py + fy + 16,
             BORDER + px + fx:BORDER + px + fx + 16]
    assert (res[2][py:py + 16, px:px + 16] == exp).all()


def test_golden_reference_sign_bias_negates_candidates():
    """sign_bias[golden] != sign_bias[last]: a golden-ref MB surveying
    a last-ref neighbor must see the NEGATED candidate (§16.3
    mv_bias). Encoded with the mirrored encoder (which applies the
    same rule), decoded pixels prove the decoder's survey agrees."""
    payload, seq, kf = _keyframe_and_planes(w=48, h=16)
    w, h = kf[0], kf[1]
    ry = _pad_ref(kf[2])
    mv_a = (16, 24)
    # enable golden sign bias in the frame header; MB(0,0) NEWMV mv_a
    # from LAST; MB(0,1) NEAREST from GOLDEN: candidate = -mv_a.
    # golden == last == the key frame here, so pixels follow -mv_a.
    mbs = [{"mode": "new", "mv": mv_a}, {"mode": "nearest", "ref": 2},
           {"mode": "zero"}]
    enc = InterFrameEncoder(w // 16, h // 16)
    res = seq(enc.assemble(mbs=mbs, sign_bias_golden=1))
    assert isinstance(res, tuple), res
    # MB(0,1) (golden ref, biased survey): nearest == -mv_a, and
    # golden == last == the key frame, so its pixels follow -mv_a
    fy, fx = -mv_a[0] >> 3, -mv_a[1] >> 3
    exp = ry[BORDER + fy:BORDER + fy + 16,
             BORDER + 16 + fx:BORDER + 16 + fx + 16]
    assert (res[2][0:16, 16:32] == exp).all()
    # sanity: without the bias bit the same stream layout would give
    # +mv_a pixels, which differ on this content
    enc = InterFrameEncoder(w // 16, h // 16)
    res2 = seq(enc.assemble(mbs=[{"mode": "new", "mv": mv_a},
                                 {"mode": "nearest", "ref": 2},
                                 {"mode": "zero"}]))
    assert isinstance(res2, tuple), res2
    assert not (res2[2][0:16, 16:32] == exp).all()


@pytest.mark.parametrize("case", ["intra_ref0", "zeromv_ref_mode",
                                  "newmv_mode2"])
def test_loop_filter_deltas_equal_adjusted_base_level(case):
    """Per-MB loop-filter level on inter frames: ref-frame delta
    (index = reference) + mode delta (ZEROMV=1, other inter=2) must
    equal a plain frame whose base filter_level is pre-adjusted by
    the same amount — a self-consistency proof of the delta indexing
    without an independent filter implementation."""
    payload, seq, kf = _keyframe_and_planes(w=48, h=32)
    w, h = kf[0], kf[1]
    nmb = (w // 16) * (h // 16)
    if case == "intra_ref0":
        # flat DC content is a loop-filter no-op — vary each MB's DC
        # through the Y2 block so MB edges actually filter
        mbs = []
        for i in range(nmb):
            y2 = [0] * 16
            y2[0] = 5 + 7 * (i % 4)
            mbs.append({"mode": "intra_dc", "skip": False,
                        "coeffs": {"y2": y2}})
        deltas = ([6, 0, 0, 0], [0, 0, 0, 0])   # intra ref delta
        base, adjusted = 26, 20
    elif case == "zeromv_ref_mode":
        mbs = [{"mode": "zero"}] * nmb
        deltas = ([0, 4, 0, 0], [0, 3, 0, 0])   # last ref + ZEROMV
        base, adjusted = 27, 20
    else:
        mbs = [{"mode": "new", "mv": (16, 8)}] * nmb
        deltas = ([0, -5, 0, 0], [0, 0, 9, 0])  # last ref + inter
        base, adjusted = 24, 20
    enc = InterFrameEncoder(w // 16, h // 16)
    with_deltas = seq(enc.assemble(mbs=mbs, filter_level=adjusted,
                                   lf_deltas=deltas))
    assert isinstance(with_deltas, tuple), with_deltas
    seq.reset()
    assert isinstance(seq(payload), tuple)
    enc = InterFrameEncoder(w // 16, h // 16)
    plain = seq(enc.assemble(mbs=mbs, filter_level=base))
    assert isinstance(plain, tuple), plain
    for a, b in zip(with_deltas[2:5], plain[2:5]):
        assert (a == b).all(), case
    # control: the filter genuinely ran (differs from unfiltered)
    seq.reset()
    assert isinstance(seq(payload), tuple)
    enc = InterFrameEncoder(w // 16, h // 16)
    unfiltered = seq(enc.assemble(mbs=mbs, filter_level=0))
    assert isinstance(unfiltered, tuple)
    assert not all((a == b).all() for a, b in
                   zip(with_deltas[2:5], unfiltered[2:5])), case


def test_midstream_keyframe_resets_sequence_state():
    """A key frame arriving after inter frames resets entropy state,
    segment/LF persistence and all three reference buffers — a
    following golden/altref-ref ZEROMV frame reproduces the NEW key
    frame, not anything older; and a frame-1 entropy update with
    refresh_entropy_probs=1 does NOT survive the key frame."""
    payload, seq, kf = _keyframe_and_planes(w=16, h=16)
    # advance state: inter frame updating a coef prob persistently
    enc = InterFrameEncoder(1, 1)
    f1 = enc.assemble(refresh_entropy=1,
                      coef_updates=((0, 1, 0, 0, 17),),
                      mbs=[{"mode": "intra_dc"}])
    assert isinstance(seq(f1), tuple)
    # mid-stream keyframe (the SAME libwebp payload): decoder must
    # reset to defaults — its own output must equal the first decode
    kf2 = seq(payload)
    assert isinstance(kf2, tuple)
    for a, b in zip(kf2[2:5], kf[2:5]):
        assert (a == b).all()
    # all refs now point at the new key frame: golden/altref ZEROMV
    # frames reproduce it exactly (encoder uses DEFAULT probs — only
    # correct if the keyframe reset the entropy state)
    for ref in (2, 3):
        enc = InterFrameEncoder(1, 1)
        r = seq(enc.assemble(mbs=[{"mode": "zero", "ref": ref}],
                             refresh_last=0))
        assert isinstance(r, tuple), ref
        for a, b in zip(r[2:5], kf[2:5]):
            assert (a == b).all(), ref


def test_segmentation_quantizers_and_map_persistence_on_inter_frames():
    """Inter-frame segmentation, end to end: frame 1 WRITES a segment
    map (update_map=1) with ABSOLUTE per-segment quantizer indices and
    carries one AC residual per MB — each MB's pixel delta must equal
    the residual dequantized with ITS segment's quantizer (computed
    independently from the §14.1 tables). Frame 2 sets update_map=0:
    the map PERSISTS, proven by the same per-segment expectations."""
    from realtime_olap_spark.operators.vp8 import _AC_QLOOKUP

    payload, seq, kf = _keyframe_and_planes(w=48, h=16)
    w, h = kf[0], kf[1]
    nmb = (w // 16) * (h // 16)
    ids = [0, 1, 2]                 # one segment per MB
    seg_q = [0, 40, 80, 0]          # absolute qi per segment
    levels = [0] * 16
    levels[1] = 3                   # AC at scan 1 (zigzag[1] = raster 1)
    yb = [[0] * 16 for _ in range(16)]
    yb[0] = list(levels)
    mbs = [{"mode": "zero", "skip": False, "coeffs": {"y": yb}}
           for _ in range(nmb)]
    zz = V._ZIGZAG

    def expected(base):
        exp = base.astype(np.int32).copy()
        for i, sid in enumerate(ids):
            qac = _AC_QLOOKUP[seg_q[sid]]
            deq = [0] * 16
            deq[zz[1]] = levels[1] * qac
            resid = np.array(_idct_ref(deq), np.int32).reshape(4, 4)
            x0 = 16 * i
            exp[0:4, x0:x0 + 4] = np.clip(
                exp[0:4, x0:x0 + 4] + resid, 0, 255)
        return exp.astype(np.uint8)

    enc = InterFrameEncoder(w // 16, h // 16)
    f1 = enc.assemble(
        mbs=mbs,
        segmentation=dict(update_map=1, update_data=1, abs=1,
                          quant=seg_q, lf=[0] * 4, ids=ids))
    r1 = seq(f1)
    assert isinstance(r1, tuple), r1
    assert (r1[2] == expected(kf[2])).all()
    # frame 2: segmentation enabled, NO map update — persisted ids
    # must route the same per-segment quantizers
    f2 = enc.assemble(
        mbs=mbs,
        segmentation=dict(update_map=0, update_data=0))
    r2 = seq(f2)
    assert isinstance(r2, tuple), r2
    assert (r2[2] == expected(r1[2])).all()


@pytest.mark.parametrize("n_parts", [2, 4])
def test_multi_partition_inter_tokens_decode_identically(n_parts):
    """Token partitioning on inter frames: MB row my reads partition
    my % n_parts — a striped 2/4-partition encoding of the same
    residual content must decode identically to the 1-partition one."""
    payload, seq, kf = _keyframe_and_planes(w=32, h=64)
    w, h = kf[0], kf[1]
    nmb = (w // 16) * (h // 16)
    rng = random.Random(n_parts)
    mbs = []
    for i in range(nmb):
        yb = [[0] * 16 for _ in range(16)]
        blk = list([0] * 16)
        blk[1] = rng.randrange(1, 6)
        blk[3] = -rng.randrange(1, 4)
        yb[rng.randrange(16)] = blk
        mbs.append({"mode": "zero", "skip": False,
                    "coeffs": {"y": yb}})
    enc = InterFrameEncoder(w // 16, h // 16)
    one = seq(enc.assemble(mbs=mbs, refresh_last=0))
    assert isinstance(one, tuple), one
    enc = InterFrameEncoder(w // 16, h // 16)
    many = seq(enc.assemble(mbs=mbs, refresh_last=0,
                            n_parts=n_parts))
    assert isinstance(many, tuple), (n_parts, many)
    for a, b in zip(many[2:5], one[2:5]):
        assert (a == b).all(), n_parts


def test_inter2_webm_fixture_matches_assembler():
    """Second committed fuzz golden: segmented (absolute quantizers,
    update_map) 2-partition residual inter frame + a filtered NEWMV
    frame with ref/mode LF deltas — provenance is this function."""
    import os

    payload, seq, kf = _keyframe_and_planes(w=32, h=32, seed=21)
    w, h = kf[0], kf[1]
    nmb = (w // 16) * (h // 16)
    rng = random.Random(99)
    mbs = []
    for i in range(nmb):
        yb = [[0] * 16 for _ in range(16)]
        blk = [0] * 16
        blk[1] = rng.randrange(1, 6)
        yb[rng.randrange(16)] = blk
        mbs.append({"mode": "zero", "skip": False,
                    "coeffs": {"y": yb}})
    enc = InterFrameEncoder(w // 16, h // 16)
    seg_inter = enc.assemble(
        mbs=mbs, n_parts=2,
        segmentation=dict(update_map=1, update_data=1, abs=1,
                          quant=[0, 30, 60, 90], lf=[0] * 4,
                          ids=[i % 4 for i in range(nmb)]))
    enc = InterFrameEncoder(w // 16, h // 16)
    lf_inter = enc.assemble(
        mbs=[{"mode": "new", "mv": (8, -8)}] * nmb, filter_level=24,
        lf_deltas=([0, 4, 0, 0], [0, 0, -3, 0]))
    data = _mux_webm_mixed(
        [(0, payload, True), (100, seg_inter, False),
         (200, lf_inter, False)], 300)
    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       "inter2.webm")
    with open(fix, "rb") as f:
        assert f.read() == data
    from realtime_olap_spark.operators.webp import \
        _make_webm_video_decoder
    res = _make_webm_video_decoder(MAXPX)(data)
    assert isinstance(res, tuple) and len(res[2]) == 3


def test_version3_fullpel_masks_chroma_mvs():
    """Version-3 frames mask chroma MVs to full-pel (fullpixel_mask):
    a luma MV whose halved chroma MV is fractional must sample chroma
    at the MASKED (floor-to-full-pel) offset; the same stream as
    version 0 samples chroma sub-pel — the two must differ, and the
    v3 chroma must equal the plain full-pel expectation."""
    payload, seq, kf = _keyframe_and_planes(w=32, h=32)
    w, h = kf[0], kf[1]
    ru = _pad_ref(kf[3])
    mvr, mvc = 48, 48   # luma 6 px; chroma mv = 24 (3.0 px -> frac 0)
    mvr2, mvc2 = 40, 40  # luma 5 px; chroma mv = 20 -> frac 4 (sub-pel)
    nmb = (w // 16) * (h // 16)
    enc = InterFrameEncoder(w // 16, h // 16)
    v3 = seq(enc.assemble(version=3,
                          mbs=[{"mode": "new", "mv": (mvr2, mvc2)}]
                          * nmb))
    assert isinstance(v3, tuple), v3
    # masked chroma mv: 20 & ~7 = 16 -> exactly 2 px
    exp_u = ru[BORDER + 2:BORDER + 2 + h // 2,
               BORDER + 2:BORDER + 2 + w // 2]
    assert (v3[3] == exp_u).all()
    seq.reset()
    assert isinstance(seq(payload), tuple)
    enc = InterFrameEncoder(w // 16, h // 16)
    v0 = seq(enc.assemble(version=0,
                          mbs=[{"mode": "new", "mv": (mvr2, mvc2)}]
                          * nmb))
    assert isinstance(v0, tuple), v0
    assert not (v0[3] == v3[3]).all()  # v0 filtered sub-pel chroma


def test_copy_buffer_to_alternate_flags():
    """copy_to_arf: 1 copies LAST into altref, 2 copies GOLDEN —
    proven by later ZEROMV frames referencing the altref."""
    payload, seq, kf = _keyframe_and_planes(w=16, h=16)
    enc = InterFrameEncoder(1, 1)
    b = seq(enc.assemble(mbs=[{"mode": "intra_dc"}]))  # last := B
    assert isinstance(b, tuple)
    # copy_to_arf=1: altref := last (B)
    enc = InterFrameEncoder(1, 1)
    assert isinstance(seq(enc.assemble(
        mbs=[{"mode": "zero"}], refresh_last=0, copy_to_arf=1)), tuple)
    enc = InterFrameEncoder(1, 1)
    r = seq(enc.assemble(mbs=[{"mode": "zero", "ref": 3}],
                         refresh_last=0))
    assert isinstance(r, tuple)
    for a, c in zip(r[2:5], b[2:5]):
        assert (a == c).all()
    # copy_to_arf=2: altref := golden (still the key frame)
    enc = InterFrameEncoder(1, 1)
    assert isinstance(seq(enc.assemble(
        mbs=[{"mode": "zero"}], refresh_last=0, copy_to_arf=2)), tuple)
    enc = InterFrameEncoder(1, 1)
    r2 = seq(enc.assemble(mbs=[{"mode": "zero", "ref": 3}],
                          refresh_last=0))
    assert isinstance(r2, tuple)
    for a, c in zip(r2[2:5], kf[2:5]):
        assert (a == c).all()


def run_fullpel_property_seed(seed, seq, payload, kf):
    """One randomized full-pel inter frame over a 3x2 MB grid: random
    mode mix (zero / new / nearest / near / split with random split
    type), all MVs multiples of 16 eighth-pels so luma AND averaged
    chroma stay full-pel; the decoded frame must equal the plain
    numpy-shift expectation built from the encoder's RESOLVED motion
    — any encoder/decoder disagreement in the survey, contexts or
    fills desynchronizes the arithmetic and fails loudly."""
    rng = random.Random(f"vp8-prop-{seed}")
    w, h = kf[0], kf[1]
    mbw, mbh = w // 16, h // 16
    ry, ru, rv = (_pad_ref(p) for p in kf[2:5])

    def rmv():
        return (16 * rng.randrange(-3, 4), 16 * rng.randrange(-3, 4))

    mbs = []
    resid_plan = {}  # mb index -> (y block, scan pos, level)
    for i in range(mbw * mbh):
        mode = rng.choice(["zero", "new", "new", "nearest", "near",
                           "split", "intra_dc"])
        spec = {"mode": mode}
        if mode == "new":
            spec["mv"] = rmv()
        elif mode == "split":
            st = rng.randrange(4)
            spec["split_type"] = st
            per_part = [rmv() for _ in range(_MBSPLIT_COUNT[st])]
            spec["submvs"] = [per_part[_MBSPLITS[st][sb]]
                              for sb in range(16)]
        if mode in ("zero", "new", "nearest", "near") \
                and rng.random() < 0.5:
            # random AC residual on one Y block (has_y2 -> scan >= 1)
            blk = rng.randrange(16)
            pos = rng.randrange(1, 16)
            lvl = rng.choice([-3, -2, -1, 1, 2, 3])
            yb = [[0] * 16 for _ in range(16)]
            row = [0] * 16
            row[pos] = lvl
            yb[blk] = row
            spec["skip"] = False
            spec["coeffs"] = {"y": yb}
            resid_plan[i] = (blk, pos, lvl)
        mbs.append(spec)
    seq.reset()
    assert isinstance(seq(payload), tuple)
    rec = []
    enc = InterFrameEncoder(mbw, mbh)
    res = seq(enc.assemble(mbs=mbs, record=rec))
    assert isinstance(res, tuple), (seed, res)
    assert len(rec) == mbw * mbh
    for i, (mode, mv) in enumerate(rec):
        my, mx = divmod(i, mbw)
        py, px = 16 * my, 16 * mx
        if mode == "intra":
            continue  # intra content checked implicitly via desync
        subs = mv if mode == "split" else [mv] * 16
        for sb in range(16):
            mvr, mvc = subs[sb]
            by, bx = py + 4 * (sb >> 2), px + 4 * (sb & 3)
            exp = ry[BORDER + by + (mvr >> 3):
                     BORDER + by + (mvr >> 3) + 4,
                     BORDER + bx + (mvc >> 3):
                     BORDER + bx + (mvc >> 3) + 4]
            if i in resid_plan and resid_plan[i][0] == sb:
                _, pos, lvl = resid_plan[i]
                deq = [0] * 16
                deq[V._ZIGZAG[pos]] = lvl * 4  # qac=4 at qi 0
                resid = np.array(_idct_ref(deq),
                                 np.int32).reshape(4, 4)
                exp = np.clip(exp.astype(np.int32) + resid,
                              0, 255).astype(np.uint8)
            assert (res[2][by:by + 4, bx:bx + 4] == exp).all(), \
                (seed, i, sb, mode)
        # chroma: averaged (split) or same (else), all full-pel
        for ci in range(2):
            for cj in range(2):
                b0 = ci * 8 + cj * 2
                tr = sum(subs[b][0] for b in (b0, b0 + 1, b0 + 4,
                                              b0 + 5))
                tc = sum(subs[b][1] for b in (b0, b0 + 1, b0 + 4,
                                              b0 + 5))

                def avg8(t):
                    t2 = t + (4 if t >= 0 else -4)
                    q = abs(t2) >> 3
                    return q if t2 >= 0 else -q

                ur, uc = avg8(tr), avg8(tc)
                cy, cx = 8 * my + 4 * ci, 8 * mx + 4 * cj
                for plane, refp in ((res[3], ru), (res[4], rv)):
                    if (ur | uc) & 7:
                        # averaged split chroma MVs can be sub-pel
                        # even with full-pel luma — independent
                        # six-tap expectation
                        exp = _sixtap_ref(refp, BORDER + cy + (ur >> 3),
                                          BORDER + cx + (uc >> 3),
                                          ur & 7, uc & 7, 4, 4,
                                          _SUBPEL_FILTERS)
                    else:
                        exp = refp[BORDER + cy + (ur >> 3):
                                   BORDER + cy + (ur >> 3) + 4,
                                   BORDER + cx + (uc >> 3):
                                   BORDER + cx + (uc >> 3) + 4]
                    assert (plane[cy:cy + 4, cx:cx + 4] == exp).all(), \
                        (seed, i, ci, cj)


def test_randomized_fullpel_inter_property_sweep():
    payload, seq, kf = _keyframe_and_planes(w=48, h=32)
    for seed in range(60):
        run_fullpel_property_seed(seed, seq, payload, kf)


def run_subpel_property_seed(seed, seq, payload, kf):
    """One randomized SUB-PEL inter frame over the MB grid (RFC 6386
    §14.2 — where real encoder streams spend most macroblocks): random
    QUARTER-pel luma MVs (multiples of 2 eighth-pels, so chroma
    halving/averaging lands on any eighth-pel phase), random mode mix
    (zero / new / nearest / near / split with random split type),
    random single-coefficient AC residuals, random per-segment
    quantizers (absolute qi via a written segment map — the residual
    must dequantize with ITS MB's segment quantizer), and random
    LF-delta state (parsed + persisted, inert at filter_level=0).
    Every luma 4x4 and chroma 4x4 is checked against the INDEPENDENT
    per-pixel six-tap reimplementation (`_sixtap_ref`) — the decoder's
    MC code is never consulted for the expectation."""
    from realtime_olap_spark.operators.vp8 import _AC_QLOOKUP

    rng = random.Random(f"vp8-subpel-{seed}")
    w, h = kf[0], kf[1]
    mbw, mbh = w // 16, h // 16
    nmb = mbw * mbh
    ry, ru, rv = (_pad_ref(p) for p in kf[2:5])

    def rmv():
        # quarter-pel MVs, ±6 px: any eighth-pel chroma phase reachable
        return (2 * rng.randrange(-24, 25), 2 * rng.randrange(-24, 25))

    seg = None
    seg_q = [0, 0, 0, 0]
    ids = [0] * nmb
    if rng.random() < 0.5:
        seg_q = [rng.choice([0, 20, 40, 60, 80]) for _ in range(4)]
        ids = [rng.randrange(4) for _ in range(nmb)]
        seg = dict(update_map=1, update_data=1, abs=1,
                   quant=seg_q, lf=[0] * 4, ids=ids)
    lf_deltas = None
    if rng.random() < 0.5:
        lf_deltas = ([rng.randrange(-6, 7) for _ in range(4)],
                     [rng.randrange(-6, 7) for _ in range(4)])

    mbs = []
    resid_plan = {}  # mb index -> (y block, scan pos, level)
    for i in range(nmb):
        mode = rng.choice(["zero", "new", "new", "nearest", "near",
                           "split", "intra_dc"])
        spec = {"mode": mode}
        if mode == "new":
            spec["mv"] = rmv()
        elif mode == "split":
            st = rng.randrange(4)
            spec["split_type"] = st
            per_part = [rmv() for _ in range(_MBSPLIT_COUNT[st])]
            spec["submvs"] = [per_part[_MBSPLITS[st][sb]]
                              for sb in range(16)]
        if mode in ("zero", "new", "nearest", "near") \
                and rng.random() < 0.5:
            blk = rng.randrange(16)
            pos = rng.randrange(1, 16)
            lvl = rng.choice([-3, -2, -1, 1, 2, 3])
            yb = [[0] * 16 for _ in range(16)]
            row = [0] * 16
            row[pos] = lvl
            yb[blk] = row
            spec["skip"] = False
            spec["coeffs"] = {"y": yb}
            resid_plan[i] = (blk, pos, lvl)
        mbs.append(spec)
    seq.reset()
    assert isinstance(seq(payload), tuple)
    rec = []
    enc = InterFrameEncoder(mbw, mbh)
    res = seq(enc.assemble(mbs=mbs, record=rec, segmentation=seg,
                           lf_deltas=lf_deltas))
    assert isinstance(res, tuple), (seed, res)
    assert len(rec) == nmb
    zz = V._ZIGZAG
    for i, (mode, mv) in enumerate(rec):
        my, mx = divmod(i, mbw)
        py, px = 16 * my, 16 * mx
        if mode == "intra":
            continue  # intra content checked implicitly via desync
        qac = _AC_QLOOKUP[seg_q[ids[i]]] if seg is not None else 4
        subs = mv if mode == "split" else [mv] * 16
        for sb in range(16):
            mvr, mvc = subs[sb]
            by, bx = py + 4 * (sb >> 2), px + 4 * (sb & 3)
            if (mvr & 7) or (mvc & 7):
                exp = _sixtap_ref(ry, BORDER + by + (mvr >> 3),
                                  BORDER + bx + (mvc >> 3),
                                  mvr & 7, mvc & 7, 4, 4,
                                  _SUBPEL_FILTERS).astype(np.int32)
            else:
                exp = ry[BORDER + by + (mvr >> 3):
                         BORDER + by + (mvr >> 3) + 4,
                         BORDER + bx + (mvc >> 3):
                         BORDER + bx + (mvc >> 3) + 4].astype(np.int32)
            if i in resid_plan and resid_plan[i][0] == sb:
                _, pos, lvl = resid_plan[i]
                deq = [0] * 16
                deq[zz[pos]] = lvl * qac
                exp = exp + np.array(_idct_ref(deq),
                                     np.int32).reshape(4, 4)
            exp = np.clip(exp, 0, 255).astype(np.uint8)
            assert (res[2][by:by + 4, bx:bx + 4] == exp).all(), \
                (seed, i, sb, mode, (mvr, mvc))
        # chroma: averaged (split) or halved (else) MVs — any
        # eighth-pel phase routes through the independent six-tap
        for ci in range(2):
            for cj in range(2):
                b0 = ci * 8 + cj * 2
                tr = sum(subs[b][0] for b in (b0, b0 + 1, b0 + 4,
                                              b0 + 5))
                tc = sum(subs[b][1] for b in (b0, b0 + 1, b0 + 4,
                                              b0 + 5))

                def avg8(t):
                    t2 = t + (4 if t >= 0 else -4)
                    q = abs(t2) >> 3
                    return q if t2 >= 0 else -q

                ur, uc = avg8(tr), avg8(tc)
                cy, cx = 8 * my + 4 * ci, 8 * mx + 4 * cj
                for plane, refp in ((res[3], ru), (res[4], rv)):
                    if (ur & 7) or (uc & 7):
                        exp = _sixtap_ref(refp, BORDER + cy + (ur >> 3),
                                          BORDER + cx + (uc >> 3),
                                          ur & 7, uc & 7, 4, 4,
                                          _SUBPEL_FILTERS)
                    else:
                        exp = refp[BORDER + cy + (ur >> 3):
                                   BORDER + cy + (ur >> 3) + 4,
                                   BORDER + cx + (uc >> 3):
                                   BORDER + cx + (uc >> 3) + 4]
                    assert (plane[cy:cy + 4, cx:cx + 4] == exp).all(), \
                        (seed, i, ci, cj, (ur, uc))


def test_randomized_subpel_inter_property_sweep():
    payload, seq, kf = _keyframe_and_planes(w=48, h=32)
    for seed in range(40):
        run_subpel_property_seed(seed, seq, payload, kf)


def _bilinear_ref(plane, fy, fx, yf, xf, h, w):
    """Independent per-pixel two-tap bilinear reimplementation
    (horizontal pass on rows r and r+1, then vertical; both passes
    rounded +64 >> 7, per the RFC and the version-1 deterministic
    test's inline math)."""
    tx, ty = _BILINEAR_FILTERS[xf], _BILINEAR_FILTERS[yf]

    def f2(a, b, t):
        return (int(a) * t[0] + int(b) * t[1] + 64) >> 7

    out = np.zeros((h, w), np.uint8)
    if xf and yf:
        tmp = np.zeros((h + 1, w), np.int32)
        for r in range(h + 1):
            for c in range(w):
                tmp[r, c] = f2(plane[fy + r, fx + c],
                               plane[fy + r, fx + c + 1], tx)
        for r in range(h):
            for c in range(w):
                out[r, c] = f2(tmp[r, c], tmp[r + 1, c], ty)
    elif xf:
        for r in range(h):
            for c in range(w):
                out[r, c] = f2(plane[fy + r, fx + c],
                               plane[fy + r, fx + c + 1], tx)
    else:
        for r in range(h):
            for c in range(w):
                out[r, c] = f2(plane[fy + r, fx + c],
                               plane[fy + r + 1, fx + c], ty)
    return out


def run_bilinear_property_seed(seed, seq, payload, kf):
    """The sub-pel property family for VERSION-1 frames (bilinear
    reconstruction filter): same randomized quarter-pel MV / mode /
    residual / segment-quantizer / LF-delta space as
    run_subpel_property_seed, expectations routed through the
    INDEPENDENT two-tap bilinear reimplementation."""
    from realtime_olap_spark.operators.vp8 import _AC_QLOOKUP

    rng = random.Random(f"vp8-bilin-{seed}")
    w, h = kf[0], kf[1]
    mbw, mbh = w // 16, h // 16
    nmb = mbw * mbh
    ry, ru, rv = (_pad_ref(p) for p in kf[2:5])

    def rmv():
        return (2 * rng.randrange(-24, 25), 2 * rng.randrange(-24, 25))

    seg = None
    seg_q = [0, 0, 0, 0]
    ids = [0] * nmb
    if rng.random() < 0.5:
        seg_q = [rng.choice([0, 20, 40, 60, 80]) for _ in range(4)]
        ids = [rng.randrange(4) for _ in range(nmb)]
        seg = dict(update_map=1, update_data=1, abs=1,
                   quant=seg_q, lf=[0] * 4, ids=ids)
    lf_deltas = None
    if rng.random() < 0.5:
        lf_deltas = ([rng.randrange(-6, 7) for _ in range(4)],
                     [rng.randrange(-6, 7) for _ in range(4)])

    mbs = []
    resid_plan = {}
    for i in range(nmb):
        mode = rng.choice(["zero", "new", "new", "nearest", "near",
                           "split", "intra_dc"])
        spec = {"mode": mode}
        if mode == "new":
            spec["mv"] = rmv()
        elif mode == "split":
            st = rng.randrange(4)
            spec["split_type"] = st
            per_part = [rmv() for _ in range(_MBSPLIT_COUNT[st])]
            spec["submvs"] = [per_part[_MBSPLITS[st][sb]]
                              for sb in range(16)]
        if mode in ("zero", "new", "nearest", "near") \
                and rng.random() < 0.5:
            blk = rng.randrange(16)
            pos = rng.randrange(1, 16)
            lvl = rng.choice([-3, -2, -1, 1, 2, 3])
            yb = [[0] * 16 for _ in range(16)]
            row = [0] * 16
            row[pos] = lvl
            yb[blk] = row
            spec["skip"] = False
            spec["coeffs"] = {"y": yb}
            resid_plan[i] = (blk, pos, lvl)
        mbs.append(spec)
    seq.reset()
    assert isinstance(seq(payload), tuple)
    rec = []
    enc = InterFrameEncoder(mbw, mbh)
    res = seq(enc.assemble(version=1, mbs=mbs, record=rec,
                           segmentation=seg, lf_deltas=lf_deltas))
    assert isinstance(res, tuple), (seed, res)
    assert len(rec) == nmb
    zz = V._ZIGZAG
    for i, (mode, mv) in enumerate(rec):
        my, mx = divmod(i, mbw)
        py, px = 16 * my, 16 * mx
        if mode == "intra":
            continue
        qac = _AC_QLOOKUP[seg_q[ids[i]]] if seg is not None else 4
        subs = mv if mode == "split" else [mv] * 16
        for sb in range(16):
            mvr, mvc = subs[sb]
            by, bx = py + 4 * (sb >> 2), px + 4 * (sb & 3)
            if (mvr & 7) or (mvc & 7):
                exp = _bilinear_ref(ry, BORDER + by + (mvr >> 3),
                                    BORDER + bx + (mvc >> 3),
                                    mvr & 7, mvc & 7, 4,
                                    4).astype(np.int32)
            else:
                exp = ry[BORDER + by + (mvr >> 3):
                         BORDER + by + (mvr >> 3) + 4,
                         BORDER + bx + (mvc >> 3):
                         BORDER + bx + (mvc >> 3) + 4].astype(np.int32)
            if i in resid_plan and resid_plan[i][0] == sb:
                _, pos, lvl = resid_plan[i]
                deq = [0] * 16
                deq[zz[pos]] = lvl * qac
                exp = exp + np.array(_idct_ref(deq),
                                     np.int32).reshape(4, 4)
            exp = np.clip(exp, 0, 255).astype(np.uint8)
            assert (res[2][by:by + 4, bx:bx + 4] == exp).all(), \
                (seed, i, sb, mode, (mvr, mvc))
        for ci in range(2):
            for cj in range(2):
                b0 = ci * 8 + cj * 2
                tr = sum(subs[b][0] for b in (b0, b0 + 1, b0 + 4,
                                              b0 + 5))
                tc = sum(subs[b][1] for b in (b0, b0 + 1, b0 + 4,
                                              b0 + 5))

                def avg8(t):
                    t2 = t + (4 if t >= 0 else -4)
                    q = abs(t2) >> 3
                    return q if t2 >= 0 else -q

                ur, uc = avg8(tr), avg8(tc)
                cy, cx = 8 * my + 4 * ci, 8 * mx + 4 * cj
                for plane, refp in ((res[3], ru), (res[4], rv)):
                    if (ur & 7) or (uc & 7):
                        exp = _bilinear_ref(refp,
                                            BORDER + cy + (ur >> 3),
                                            BORDER + cx + (uc >> 3),
                                            ur & 7, uc & 7, 4, 4)
                    else:
                        exp = refp[BORDER + cy + (ur >> 3):
                                   BORDER + cy + (ur >> 3) + 4,
                                   BORDER + cx + (uc >> 3):
                                   BORDER + cx + (uc >> 3) + 4]
                    assert (plane[cy:cy + 4, cx:cx + 4] == exp).all(), \
                        (seed, i, ci, cj, (ur, uc))


def test_randomized_bilinear_inter_property_sweep():
    payload, seq, kf = _keyframe_and_planes(w=48, h=32)
    for seed in range(40):
        run_bilinear_property_seed(seed, seq, payload, kf)
