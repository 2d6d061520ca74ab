"""FLAC decoder tests (RFC 9639).

No FLAC encoder ships in this container, so the evidence is the same
forward/inverse standard as the VP8L and tiled-TIFF suites: a
spec-written ENCODER here (verbatim / constant / fixed-predictor
subframes, real Rice coding with partitions and escape codes,
mid-side decorrelation, CRC-8 and CRC-16 computed per spec) and the
decoder must reproduce the source samples exactly — including the
committed real-world `pluck-pcm16.wav` clip round-tripped through
FLAC and compared against the WAV decoder's output bit-for-bit.
"""

from __future__ import annotations

import os
import random

import numpy as np
import pytest

from realtime_olap_spark.operators import multimodal as M
from realtime_olap_spark.operators.flac import _make_flac_decoder

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


class _FW:
    """MSB-first bit writer (FLAC bit order)."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, v, n):
        assert 0 <= v < (1 << n) or n == 0
        self.acc = (self.acc << n) | v
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def sput(self, v, n):
        self.put(v & ((1 << n) - 1), n)

    def align(self):
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self):
        assert self.n == 0
        return bytes(self.out)


def _crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


_FIXED = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))


_LPC = dict(order=4, precision=12, shift=9,
            coefs=(1536, -768, 341, -120))  # spec-legal quantized set


def _write_subframe(fw, ch, bps, kind, porder=0, escape=False,
                    wasted=0, method=0):
    fw.put(0, 1)  # padding
    n = len(ch)
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in ch)
        ch = [v >> wasted for v in ch]
    bps_eff = bps - wasted

    def wasted_bits():
        if wasted:
            fw.put(1, 1)
            for _ in range(wasted - 1):
                fw.put(0, 1)
            fw.put(1, 1)
        else:
            fw.put(0, 1)

    if kind == "constant":
        assert all(v == ch[0] for v in ch)
        fw.put(0, 6)
        wasted_bits()
        fw.sput(ch[0], bps_eff)
        return
    if kind == "verbatim":
        fw.put(1, 6)
        wasted_bits()
        for v in ch:
            fw.sput(v, bps_eff)
        return
    if kind == "lpc":
        order = _LPC["order"]
        fw.put(32 | (order - 1), 6)
        wasted_bits()
        for v in ch[:order]:
            fw.sput(v, bps_eff)
        fw.put(_LPC["precision"] - 1, 4)
        fw.sput(_LPC["shift"], 5)
        for c in _LPC["coefs"]:
            fw.sput(c, _LPC["precision"])
        res = []
        for i in range(order, n):
            acc = sum(c * ch[i - 1 - k]
                      for k, c in enumerate(_LPC["coefs"]))
            res.append(ch[i] - (acc >> _LPC["shift"]))
    else:
        order = int(kind[-1])  # "fixed0".."fixed4"
        fw.put(8 | order, 6)
        wasted_bits()
        for v in ch[:order]:
            fw.sput(v, bps_eff)
        res = []
        for i in range(order, n):
            pred = sum(c * ch[i - 1 - k]
                       for k, c in enumerate(_FIXED[order]))
            res.append(ch[i] - pred)
    # partitioned Rice (method 0: 4-bit params, 1: 5-bit); degrade the
    # partition order when it does not divide the (last, short) block
    while porder and n % (1 << porder):
        porder -= 1
    fw.put(method, 2)
    fw.put(porder, 4)
    nparts = 1 << porder
    pos = 0
    for p in range(nparts):
        cnt = (n >> porder) - (order if p == 0 else 0)
        part = res[pos:pos + cnt]
        pos += cnt
        zz = [((v << 1) if v >= 0 else (((-v) << 1) - 1))
              for v in part]
        pb = 4 + method
        if escape:
            fw.put((1 << pb) - 1, pb)
            nbits = max((v.bit_length() + 1 for v in map(abs, part)),
                        default=1)
            fw.put(nbits, 5)
            for v in part:
                fw.sput(v, nbits)
            continue
        param = max((z.bit_length() - 3 for z in zz), default=0)
        param = max(0, min(param, (1 << pb) - 2))
        fw.put(param, pb)
        for z in zz:
            q = z >> param
            assert q < 1 << 16, "rice quotient blew up; raise param"
            for _ in range(q):
                fw.put(0, 1)
            fw.put(1, 1)
            if param:
                fw.put(z & ((1 << param) - 1), param)


def _encode_flac(x, rate, bps=16, blocksize=None, kind="verbatim",
                 mid_side=False, porder=0, escape=False, wasted=0,
                 method=0):
    """x: int array (n, ch). Returns FLAC bytes."""
    x = np.asarray(x, np.int64)
    n, nch = x.shape
    blocksize = blocksize or n
    # STREAMINFO
    si = _FW()
    si.put(blocksize, 16)
    si.put(blocksize, 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(rate, 20)
    si.put(nch - 1, 3)
    si.put(bps - 1, 5)
    si.put(n, 36)
    si.put(0, 128)  # md5 unset
    body = si.bytes()
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    for fi, start in enumerate(range(0, n, blocksize)):
        blk = x[start:start + blocksize]
        bs = blk.shape[0]
        fw = _FW()
        fw.put(0x3FFE, 14)
        fw.put(0, 1)
        fw.put(0, 1)  # fixed blocksize strategy
        fw.put(7, 4)  # 16-bit blocksize at end of header
        # 16-bit sample rate: code 13 = Hz, code 14 = tens of Hz
        sr_code, sr_val = (13, rate) if rate < 65536 \
            else (14, rate // 10)
        fw.put(sr_code, 4)
        fw.put(10 if mid_side else nch - 1, 4)
        fw.put({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        fw.put(0, 1)
        assert fi < 128
        fw.put(fi, 8)  # UTF-8 single byte
        fw.put(bs - 1, 16)
        fw.put(sr_val, 16)
        hdr = fw.bytes()
        fw = _FW()
        for b in hdr:
            fw.put(b, 8)
        fw.put(_crc8(hdr), 8)
        if mid_side:
            assert nch == 2
            left = blk[:, 0]
            right = blk[:, 1]
            mid = ((left + right) >> 1).tolist()
            side = (left - right).tolist()
            _write_subframe(fw, mid, bps, kind, porder, escape,
                            wasted, method)
            _write_subframe(fw, side, bps + 1, kind, porder, escape,
                            wasted, method)
        else:
            for c in range(nch):
                _write_subframe(fw, blk[:, c].tolist(), bps, kind,
                                porder, escape, wasted, method)
        fw.align()
        frame_wo_crc = fw.bytes()
        out += frame_wo_crc + _crc16(frame_wo_crc).to_bytes(2, "big")
    return bytes(out)


def _dec(data):
    return _make_flac_decoder()(data)


def _expect(x, bps):
    return (np.asarray(x, np.int64) / float(1 << (bps - 1))) \
        .astype(np.float32)


def test_flac_verbatim_roundtrip_vs_real_wav_clip():
    """The committed real-world clip: WAV decode == FLAC decode of the
    same samples, bit-for-bit in the shared float scaling."""
    with open(os.path.join(FIX, "pluck-pcm16.wav"), "rb") as f:
        wav_bytes = f.read()
    n, ch, rate, ref = M._make_wav_decoder()(wav_bytes)
    ints = np.rint(ref * 32768.0).astype(np.int64)
    data = _encode_flac(ints, rate, kind="verbatim", blocksize=1152)
    got = _dec(data)
    assert isinstance(got, tuple), got
    gn, gch, grate, gx = got
    assert (gn, gch, grate) == (n, ch, rate)
    assert (gx == ref).all()


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_flac_fixed_predictors_roundtrip(order):
    rng = np.random.default_rng(order)
    t = np.arange(1024)
    smooth = (3000 * np.sin(t / 40.0) + 500 * np.cos(t / 7.0)
              + rng.integers(-40, 41, 1024)).astype(np.int64)
    x = np.stack([smooth, np.roll(smooth, 13)], axis=1)
    data = _encode_flac(x, 16000, kind=f"fixed{order}",
                        blocksize=256, porder=2)
    got = _dec(data)
    assert isinstance(got, tuple), (order, got)
    assert got[:3] == (1024, 2, 16000)
    assert (got[3] == _expect(x, 16)).all()


def test_flac_constant_and_escape_partitions():
    x = np.full((512, 1), -1234, np.int64)
    data = _encode_flac(x, 8000, kind="constant")
    got = _dec(data)
    assert isinstance(got, tuple)
    assert (got[3] == _expect(x, 16)).all()
    rng = np.random.default_rng(5)
    y = rng.integers(-3000, 3000, (256, 1)).astype(np.int64)
    data = _encode_flac(y, 22050, kind="fixed1", escape=True)
    got = _dec(data)
    assert isinstance(got, tuple)
    assert (got[3] == _expect(y, 16)).all()


def test_flac_mid_side_roundtrip():
    rng = np.random.default_rng(9)
    base = (2000 * np.sin(np.arange(768) / 25.0)).astype(np.int64)
    x = np.stack([base + rng.integers(-100, 100, 768),
                  base + rng.integers(-100, 100, 768)], axis=1)
    data = _encode_flac(x, 44100, kind="fixed2", blocksize=384,
                        mid_side=True, porder=1)
    got = _dec(data)
    assert isinstance(got, tuple), got
    assert got[:3] == (768, 2, 44100)
    assert (got[3] == _expect(x, 16)).all()


@pytest.mark.parametrize("bps", [8, 12, 20, 24])
def test_flac_bit_depths(bps):
    rng = np.random.default_rng(bps)
    lim = 1 << (bps - 2)
    x = rng.integers(-lim, lim, (200, 1)).astype(np.int64)
    data = _encode_flac(x, 48000, bps=bps, kind="verbatim")
    got = _dec(data)
    assert isinstance(got, tuple), (bps, got)
    assert (got[3] == _expect(x, bps)).all()


def test_flac_gates_and_malformed():
    x = np.zeros((64, 1), np.int64)
    data = _encode_flac(x, 8000)
    # corrupt header CRC -> malformed, not garbage
    b = bytearray(data)
    b[-70] ^= 0xFF if len(b) > 70 else 0
    # (the header byte position varies; the fuzz test is the real net)
    assert _dec(b"fLaC") is None
    assert _dec(b"xxxx") is None
    bad_sync = bytearray(data)
    bad_sync[42] = 0  # fLaC(4) + block hdr(4) + 34B STREAMINFO = 42
    assert _dec(bytes(bad_sync)) is None


def test_flac_fuzz_truncation_and_flips():
    rng = np.random.default_rng(3)
    x = rng.integers(-2000, 2000, (300, 2)).astype(np.int64)
    data = _encode_flac(x, 44100, kind="fixed2", blocksize=100,
                        porder=1)
    assert isinstance(_dec(data), tuple)
    for cut in range(len(data)):
        out = _dec(data[:cut])
        assert out is None or isinstance(out, (tuple, str))
    rr = random.Random(4)
    for _ in range(1500):
        b = bytearray(data)
        for _ in range(rr.randrange(1, 4)):
            b[rr.randrange(len(b))] ^= 1 << rr.randrange(8)
        out = _dec(bytes(b))
        assert out is None or isinstance(out, (tuple, str))


def test_decode_audio_flac_and_auto_route(spark):
    rng = np.random.default_rng(7)
    x = rng.integers(-8000, 8000, (400, 2)).astype(np.int64)
    data = _encode_flac(x, 32000, kind="fixed1", blocksize=200)
    df = spark.createDataFrame(
        [(1, "audio", data), (2, "audio", b"fLaC broken")],
        "media_id long, media_type string, payload binary")
    for decoder in ("flac", "auto"):
        got = {r["media_id"]: r for r in
               M.decode_audio(df, decoder=decoder,
                              with_status=True).collect()}
        assert got[1]["status"] == "ok"
        assert got[1]["n_frames"] == 400
        assert got[1]["n_channels"] == 2
        assert got[1]["sample_rate"] == 32000
        assert got[2]["status"] == "corrupt"


def test_flac_fixture_matches_assembler():
    """pluck-pcm16.flac is the committed assembler output (fixed-2
    Rice-coded stereo of the real CPython clip) so the fuzz sweep can
    mutate a FLAC golden; byte-pinned like the other spec-assembled
    fixtures."""
    with open(os.path.join(FIX, "pluck-pcm16.wav"), "rb") as f:
        _, _, rate, ref = M._make_wav_decoder()(f.read())
    ints = np.rint(ref * 32768.0).astype(np.int64)
    data = _encode_flac(ints, rate, kind="fixed2", blocksize=1152,
                        porder=2)
    with open(os.path.join(FIX, "pluck-pcm16.flac"), "rb") as f:
        assert f.read() == data


def test_flac_lpc_subframes_roundtrip():
    """Quantized-LPC subframes (order 4, precision 12, shift 9): the
    decoder's coefficient loop and arithmetic shift must invert the
    encoder's forward prediction exactly."""
    rng = np.random.default_rng(21)
    t = np.arange(1024)
    sig = (6000 * np.sin(t / 30.0) + rng.integers(-200, 200, 1024)
           ).astype(np.int64)
    x = sig[:, None]
    data = _encode_flac(x, 44100, kind="lpc", blocksize=512, porder=2)
    got = _dec(data)
    assert isinstance(got, tuple), got
    assert got[:3] == (1024, 1, 44100)
    assert (got[3] == _expect(x, 16)).all()


def test_flac_wasted_bits_and_5bit_rice_method():
    rng = np.random.default_rng(22)
    x = (rng.integers(-900, 900, (384, 1)) << 3).astype(np.int64)
    data = _encode_flac(x, 48000, kind="fixed2", wasted=3, method=1,
                        porder=1)
    got = _dec(data)
    assert isinstance(got, tuple), got
    assert (got[3] == _expect(x, 16)).all()


def test_flac_32bit_depth_roundtrip():
    rng = np.random.default_rng(23)
    x = rng.integers(-(1 << 29), 1 << 29, (128, 2)).astype(np.int64)
    data = _encode_flac(x, 96000, bps=32, kind="verbatim")
    got = _dec(data)
    assert isinstance(got, tuple), got
    assert (got[3] == _expect(x, 32)).all()
