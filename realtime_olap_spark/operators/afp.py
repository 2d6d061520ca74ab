"""Audio fingerprinting + near-dup (r14) — the audio member of the
perceptual near-dup family (images/video: ``operators/phash.py``).

The published Haitsma-Kalker construction ("A Highly Robust Audio
Fingerprinting System", ISMIR 2002): decode → mono mix → resample to a
fixed rate → Hann-windowed overlapping frames → FFT energy in
log-spaced bands (300-2000 Hz, the speech/music energy core) → one bit
per band pair from the SIGN of the time-and-frequency double
difference ``(E[t][b]-E[t][b+1]) - (E[t-1][b]-E[t-1][b+1])``. The sign
survives re-encoding, bit-depth changes and G.711 companding (their
robustness result, re-verified here on the same recording shipped in
ten formats), while different material decorrelates to ~50% bit error.

Scale shape: fingerprinting is ONE ``mapInPandas`` over the payload
column (sample buffers never shuffle; per-row cost is decode + an
O(n log n) FFT). Near-dup matching reuses the video machinery
(``phash.video_near_dup_pairs``): band the 32-bit sub-fingerprints,
equi-join, Hamming-verify, and vote on the frame offset — a shifted
copy concentrates its matches at one delta.

Reference parity note: pinot-core has no audio operators — extension
surface for audio-corpus dedup before training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Fingerprint geometry (the HK paper's shape scaled to one 32-bit
#: sub-fingerprint per frame: 33 band edges -> 32 sign bits).
TARGET_RATE = 8000
FRAME = 1024
HOP = 512
N_BANDS = 33
FMIN, FMAX = 300.0, 2000.0
FP_BITS = 32


def _make_audio_fingerprinter():
    """Per-row payload -> [(ts_ms, 32-bit fp), …] closure (the worker
    body of :func:`audio_fingerprint`, exposed for the fuzz sweep's
    raise-contract coverage): returns a list on success, ``None`` for
    malformed bytes, ``"unsupported: …"`` otherwise. Nested function,
    captured by value (house rule)."""
    import numpy as np

    from .multimodal import _make_audio_auto_decoder

    dec = _make_audio_auto_decoder()
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(FRAME) / FRAME)
    edges = np.exp(np.linspace(np.log(FMIN), np.log(FMAX),
                               N_BANDS + 1))
    bin_hz = TARGET_RATE / FRAME
    bidx = np.clip((edges / bin_hz).astype(np.int64), 1, FRAME // 2)

    def fingerprints(payload):
        r = dec(payload)
        if not isinstance(r, tuple):
            return r
        n, nch, rate, x = r
        mono = x.mean(axis=1)
        # deterministic linear resample to TARGET_RATE
        if rate != TARGET_RATE:
            m = max(1, int(round(n * TARGET_RATE / rate)))
            src = np.arange(m) * (rate / TARGET_RATE)
            i0 = np.minimum(src.astype(np.int64), n - 1)
            i1 = np.minimum(i0 + 1, n - 1)
            fr = src - i0
            mono = mono[i0] * (1 - fr) + mono[i1] * fr
        if len(mono) < FRAME + HOP:
            return "unsupported: audio shorter than two frames"
        n_frames = 1 + (len(mono) - FRAME) // HOP
        idx = (np.arange(n_frames)[:, None] * HOP
               + np.arange(FRAME)[None, :])
        spec = np.abs(np.fft.rfft(mono[idx] * hann, axis=1)) ** 2
        # band energies: one cumulative sum, sliced at the edges
        cum = np.concatenate(
            [np.zeros((n_frames, 1)), np.cumsum(spec, axis=1)],
            axis=1)
        eb = cum[:, bidx[1:]] - cum[:, bidx[:-1]]  # (t, 33)
        d = eb[:, :-1] - eb[:, 1:]                 # (t, 32)
        bits = (d[1:] - d[:-1]) > 0                # (t-1, 32)
        out = []
        for t in range(bits.shape[0]):
            v = 0
            for b in range(FP_BITS):
                if bits[t, b]:
                    v |= 1 << b
            ts = (t + 1) * HOP * 1000 // TARGET_RATE
            out.append((ts, v))
        return out

    return fingerprints


def audio_fingerprint(df: DataFrame,
                      with_status: bool = False) -> DataFrame:
    """Sub-fingerprint rows per payload: (``media_id``,
    ``frame_ts_ms``, ``afp`` int 32-bit-in-long) — one row per
    ~64 ms hop starting at the second frame (the double difference
    needs a predecessor). Undecodable/too-short rows emit ONE row
    with NULL ``afp`` and the reason [+ ``status``]."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    fingerprints = _make_audio_fingerprinter()
    fields = [StructField("media_id", LongType()),
              StructField("frame_ts_ms", LongType()),
              StructField("afp", LongType())]
    if with_status:
        fields.append(StructField("status", StringType()))
    schema = StructType(fields)

    def batches(it):
        import pandas as pd

        for pdf in it:
            ids, tss, fps, sts = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                r = fingerprints(payload)
                if not isinstance(r, list):
                    ids.append(mid)
                    tss.append(None)
                    fps.append(None)
                    sts.append("corrupt" if r is None else r)
                    continue
                for ts, v in r:
                    ids.append(mid)
                    tss.append(ts)
                    fps.append(v)
                    sts.append("ok")
            out = {"media_id": ids,
                   "frame_ts_ms": pd.array(tss, dtype="Int64"),
                   "afp": pd.array(fps, dtype="Int64")}
            if with_status:
                out["status"] = sts
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=schema)


def audio_near_dup_pairs(fingerprints: DataFrame,
                         max_hamming: int = 7, n_bands: int = 8,
                         min_matched_frames: int = 2,
                         align: str = "any_offset",
                         max_bucket_size: int | None = 4096) -> DataFrame:
    """Near-dup AUDIO pairs from sub-fingerprints — the video
    alignment-voting machinery over 32-bit hashes (8 bands of 4 bits
    by default: exact pigeonhole guarantee for Hamming <= 7 of 32,
    matching the HK bit-error operating point). Output: (id_a, id_b,
    matched_frames [, offset_ms]).

    ``max_bucket_size`` defaults FINITE (r14 ADVICE): 4-bit bands
    have only 16 values, so under ``align='any_offset'`` the band-only
    equi-join matches ~1/16 of ALL frames per band — near-quadratic in
    total frame count on any real corpus. The default cap bounds every
    band bucket at cap·(cap−1)/2 candidate pairs; a capped pair can
    still meet through its other 7 bands, and true copies concentrate
    dozens of matched frames so losing individual hot buckets does not
    lose the pair. Pass ``None`` explicitly only for small corpora
    where the exact pigeonhole guarantee must hold unconditionally.

    CORPUS configuration (r15, pinned by
    ``scripts/scale_soak_afp.py``): ``n_bands=1, max_hamming=0`` —
    the HK paper's own search shape, an EXACT equi-join on the full
    32-bit sub-fingerprint. Real copies sit at 0 bits on most frames
    (measured on the ten-format fixture family), so a copy matches
    exactly on its clean frames and all its votes land at one delta;
    bucket keys become genuinely sparse (2^32 values instead of 16
    per band) so the hot-bucket cap bites only true degenerates
    (digital silence). 100% planted recall with correct offsets and
    zero false pairs at 1x/10x/100x to ~830k frames, scan
    near-linear."""
    from .phash import video_near_dup_pairs

    return video_near_dup_pairs(
        fingerprints, method="afp", max_hamming=max_hamming,
        n_bands=n_bands, min_matched_frames=min_matched_frames,
        align=align, max_bucket_size=max_bucket_size, bits=FP_BITS)
