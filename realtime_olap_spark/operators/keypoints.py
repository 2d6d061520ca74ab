"""Keypoint-based image near-dup — the CROP / ARBITRARY-ROTATION /
RESCALE detector the dHash/pHash family cannot be (r15 verdict honest
gate #6: "arbitrary-angle rotation and cropping still defeat
dHash/pHash").

Clean-room implementations of three published constructions:

- FAST-9 corner detection (Rosten & Drummond, "Machine learning for
  high-speed corner detection", ECCV 2006): a pixel is a corner when
  >= 9 contiguous pixels of its radius-3 Bresenham ring are all
  brighter or all darker than center +/- t; score = sum |ring -
  center|, 5x5 non-max suppressed.
- Oriented BRIEF descriptors (Calonder et al., "BRIEF", ECCV 2010 +
  the orientation-steering of Rublee et al., "ORB", ICCV 2011):
  256 fixed seeded point pairs compared on a 5x5-box-smoothed patch,
  the pattern rotated by the patch's intensity-centroid orientation
  -> a 256-bit descriptor as 4 int64 words.
- Multi-octave extraction: descriptors at 3 normalized scales
  (long side 256 / 192 / 143) so a cropped copy — whose
  normalization re-scales content by 1/crop-fraction — still has an
  octave pair within ~1.15x of the original's.

Near-dup join: descriptors are banded into exact-match band keys
(default 10 bands of 24 bits — plain LSH; at the 42-bit verify
radius there is NO pigeonhole guarantee; recall is probabilistic,
measured on the synthetic-texture e2e in tests/test_keypoints.py
and on true matched pairs: a 70% crop keeps 10/12 matches
band-reachable, 135-degree rotation 13, half-resolution 11 — all
>= 2x min_matches), verified by 256-bit Hamming, and votes are
counted per image pair. Measured operating point (planted
copies over synthetic textured corpora, verify radius 42): a 70%
crop scores 11 matched-keypoint votes, 135-degree rotation 28,
half-resolution 21, a crop of an UNRELATED same-style texture <= 1 —
``min_matches=5`` separates with a 5x margin even between two
transformed derivatives (crop x half = 5); crops below ~55% fall
toward the noise floor (documented limit).

Scale shape (100 TB): payload is read ONCE in the describe pass and
never shuffled — descriptors are <= max_kp * octaves rows of 4 longs
per image. The pair join explodes 10 8-byte band keys per descriptor
(~720 rows/image at defaults), joins on exact band equality with the
same hot-bucket cap discipline as the pHash/MinHash joins, and
verifies candidates with four JVM ``bit_count`` XORs. Random band
collisions cost ``n_bands/2^band_bits`` per cross-descriptor pair —
~6e-7 at the 24-bit default, measured near-linear join growth in
scripts/scale_soak_keypoints.py, where 16-bit banding was quadratic
in descriptor density (674M candidates at 33k images). This is still
the EXPENSIVE deep pass: run it on the pHash-unmatched remainder of
a corpus (or a flagged subset), not as the first-line dedup.

Reference parity note: pinot-core has no image operators at all —
extension surface for crawled-image curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: descriptors per octave (top-scored, spread-suppressed)
DEFAULT_MAX_KP = 24
#: normalized long-side scales; step ~1.33 keeps any crop >= ~55%
#: within ~1.15x of some octave pair
DEFAULT_OCTAVES = (1.0, 0.75, 0.56)
DEFAULT_FAST_T = 18
#: 256-bit Hamming verify radius (~16% of the descriptor)
DEFAULT_MAX_HAMMING = 42
#: matched-keypoint votes for an image pair
DEFAULT_MIN_MATCHES = 5
#: exact-match band width: the recall/candidate-volume dial — random
#: collisions per descriptor pair scale as n_bands / 2^band_bits, so
#: 24 keeps the banded join near-linear at corpus scale while true
#: crop/rotation/rescale matches still clear min_matches (measured);
#: drop to 16 for maximum recall on bounded subsets
DEFAULT_BAND_BITS = 24


def _make_keypoint_describer(max_kp: int = DEFAULT_MAX_KP,
                             octaves: tuple = DEFAULT_OCTAVES,
                             fast_t: int = DEFAULT_FAST_T):
    """Per-row ``payload -> [(kp_id, y, x, w0, w1, w2, w3), ...]``
    closure (list on success — possibly empty for texture-free
    images, ``None`` for malformed bytes, ``"unsupported: ..."``
    otherwise; never raises). Images smaller than 48 px on the long
    side carry no usable texture and return ``[]``. Nested function,
    captured by value (house rule)."""
    import numpy as np

    from .multimodal import _make_auto_decoder

    dec = _make_auto_decoder()
    # radius-3 Bresenham ring, FAST-9 order
    ring = [(0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2),
            (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0),
            (-3, 1), (-2, 2), (-1, 3)]
    # fixed seeded BRIEF pattern: offsets within +/-13 (rotated
    # reach <= 13*sqrt(2) < the 21-px border margin)
    pairs = np.random.RandomState(20160309).randint(
        -13, 14, size=(256, 4))
    border = 21

    def bilinear(g, nh, nw):
        h, w = g.shape
        ys = np.linspace(0, h - 1, nh)
        xs = np.linspace(0, w - 1, nw)
        y0 = np.floor(ys).astype(int)
        x0 = np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        return (g[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
                + g[np.ix_(y1, x0)] * fy * (1 - fx)
                + g[np.ix_(y0, x1)] * (1 - fy) * fx
                + g[np.ix_(y1, x1)] * fy * fx)

    def gray_norm(px, side):
        if px.shape[2] >= 3:
            g = (299 * px[:, :, 0].astype(np.int64)
                 + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
        else:
            g = px[:, :, 0].astype(np.int64)
        h, w = g.shape
        s = side / max(h, w)
        nh = max(2, int(round(h * s)))
        nw = max(2, int(round(w * s)))
        return np.round(bilinear(g.astype(np.float64),
                                 nh, nw)).astype(np.int32)

    def smooth(g):
        p = np.pad(g, 2, mode="edge").astype(np.int64)
        c = p.cumsum(0).cumsum(1)
        c = np.pad(c, ((1, 0), (1, 0)))
        h, w = g.shape
        return (c[5:5 + h, 5:5 + w] - c[:h, 5:5 + w]
                - c[5:5 + h, :w] + c[:h, :w]) // 25

    def fast_corners(g):
        h, w = g.shape
        c = g[3:h - 3, 3:w - 3]
        bright = np.zeros((16,) + c.shape, bool)
        dark = np.zeros_like(bright)
        score = np.zeros(c.shape, np.int32)
        for i, (dx, dy) in enumerate(ring):
            p = g[3 + dy:h - 3 + dy, 3 + dx:w - 3 + dx]
            bright[i] = p > c + fast_t
            dark[i] = p < c - fast_t
            score += np.abs(p - c)

        def run9(m):
            mm = np.concatenate([m, m[:8]], 0)
            run = np.zeros(c.shape, np.int32)
            best = np.zeros(c.shape, np.int32)
            for i in range(24):
                run = np.where(mm[i], run + 1, 0)
                best = np.maximum(best, run)
            return best >= 9

        score = np.where(run9(bright) | run9(dark), score, 0)
        s = np.zeros(g.shape, np.int32)
        s[3:h - 3, 3:w - 3] = score
        s[:border, :] = 0
        s[-border:, :] = 0
        s[:, :border] = 0
        s[:, -border:] = 0
        from numpy.lib.stride_tricks import sliding_window_view
        mx = sliding_window_view(np.pad(s, 2), (5, 5)).max((2, 3))
        ys, xs = np.nonzero((s == mx) & (s > 0))
        return ys, xs, s[ys, xs]

    def orientation(g, ys, xs, r=7):
        dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
        mask = (dy * dy + dx * dx) <= r * r
        m01 = np.zeros(len(ys))
        m10 = np.zeros(len(ys))
        for i, (y, x) in enumerate(zip(ys, xs)):
            p = g[y - r:y + r + 1, x - r:x + r + 1]
            m01[i] = (p * dy * mask).sum()
            m10[i] = (p * dx * mask).sum()
        return np.arctan2(m01, m10)

    def describe(data):
        r = dec(data)
        if not isinstance(r, tuple):
            return r  # None / "unsupported: ..." passes through
        px = r[3]
        if max(px.shape[:2]) < 48:
            return []  # icon-sized: no usable texture
        out = []
        kp_id = 0
        for o in octaves:
            g = gray_norm(px, int(round(256 * o)))
            if min(g.shape) < 2 * border + 6:
                continue
            sm = smooth(g)
            ys, xs, sc = fast_corners(g)
            if len(ys) == 0:
                continue
            order = np.argsort(-sc)[:max_kp * 3]
            ys, xs = ys[order], xs[order]
            keep = []
            for i in range(len(ys)):
                if all((ys[i] - ys[j]) ** 2 + (xs[i] - xs[j]) ** 2
                       >= 64 for j in keep):
                    keep.append(i)
                    if len(keep) >= max_kp:
                        break
            ys, xs = ys[keep], xs[keep]
            th = orientation(g, ys, xs)
            ct, st = np.cos(th), np.sin(th)
            for i, (y, x) in enumerate(zip(ys, xs)):
                ax = np.round(pairs[:, 0] * ct[i]
                              - pairs[:, 1] * st[i]).astype(int)
                ay = np.round(pairs[:, 0] * st[i]
                              + pairs[:, 1] * ct[i]).astype(int)
                bx = np.round(pairs[:, 2] * ct[i]
                              - pairs[:, 3] * st[i]).astype(int)
                by = np.round(pairs[:, 2] * st[i]
                              + pairs[:, 3] * ct[i]).astype(int)
                bits = (sm[y + ay, x + ax]
                        < sm[y + by, x + bx]).astype(np.uint64)
                words = []
                for wb in range(0, 256, 64):
                    v = np.uint64(0)
                    for b in range(64):
                        v = (v << np.uint64(1)) | bits[wb + b]
                    words.append(int(np.int64(v)))
                out.append((kp_id, int(y), int(x), *words))
                kp_id += 1
        return out

    return describe


def image_keypoint_signatures(df: DataFrame,
                              max_kp: int = DEFAULT_MAX_KP,
                              octaves: tuple = DEFAULT_OCTAVES,
                              fast_t: int = DEFAULT_FAST_T,
                              ) -> DataFrame:
    """Oriented-BRIEF keypoint descriptors over (``media_id``,
    ``payload``) → one row per keypoint: (``media_id``, ``kp``,
    ``y``, ``x``, ``w0..w3`` — the 256-bit descriptor as 4 signed
    longs). ONE ``mapInPandas``; undecodable/texture-free rows emit
    nothing. Payload bytes never leave the describe pass."""
    from pyspark.sql.types import LongType, StructField, StructType

    describe = _make_keypoint_describer(max_kp, octaves, fast_t)
    schema = StructType([StructField(c, LongType()) for c in
                         ("media_id", "kp", "y", "x",
                          "w0", "w1", "w2", "w3")])

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = {c: [] for c in schema.names}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                r = describe(payload)
                if not isinstance(r, list):
                    continue
                for kp_id, y, x, w0, w1, w2, w3 in r:
                    for c, v in zip(schema.names,
                                    (mid, kp_id, y, x, w0, w1, w2,
                                     w3)):
                        rows[c].append(v)
            yield pd.DataFrame({c: pd.array(rows[c], dtype="Int64")
                                for c in schema.names})

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=schema)


def _descriptor_bands(prefix: str, bits: int) -> list:
    """``256 // bits`` exact-match band keys sliced MSB-first from
    the 4 descriptor words (word boundaries crossed with
    shift-and-or): ``band_idx << bits | slice`` — 8-byte join keys,
    JVM shift+mask only. ``bits`` is the recall/volume dial: random
    band collisions scale as ``n_bands / 2^bits`` per descriptor
    pair, so 16 maximizes recall on bounded subsets while 24 cuts
    the candidate volume ~400x for corpus-scale runs (measured
    survival of true matched pairs stays >= 2x min_matches for the
    crop/rotation/rescale transforms; see module docstring)."""
    if bits < 8 or bits > 32:
        raise ValueError(f"band_bits must be in [8, 32]: {bits}")
    out = []
    mask = (1 << bits) - 1
    for i in range(256 // bits):
        start = i * bits
        j, r = divmod(start, 64)
        take1 = min(64 - r, bits)
        part = F.shiftrightunsigned(
            F.shiftleft(F.col(f"{prefix}{j}"), r), 64 - take1)
        if take1 < bits:
            rem = bits - take1
            part = F.shiftleft(part, rem).bitwiseOR(
                F.shiftrightunsigned(F.col(f"{prefix}{j + 1}"),
                                     64 - rem))
        out.append(F.lit(i * (1 << bits)).cast("long")
                   + part.bitwiseAND(F.lit(mask)))
    return out


def _hamming256(a: str, b: str) -> Column:
    h = F.lit(0)
    for wi in range(4):
        h = h + F.bit_count(F.col(f"{a}{wi}")
                            .bitwiseXOR(F.col(f"{b}{wi}")))
    return h


def keypoint_near_dup_pairs(sigs: DataFrame,
                            max_hamming: int = DEFAULT_MAX_HAMMING,
                            min_matches: int = DEFAULT_MIN_MATCHES,
                            max_bucket_size: int | None = 4096,
                            band_bits: int = DEFAULT_BAND_BITS,
                            ) -> DataFrame:
    """Image pairs sharing >= ``min_matches`` matched keypoints, from
    an :func:`image_keypoint_signatures` table: banded LSH candidate
    join (exact 16-bit band equality — probabilistic recall at the
    ``max_hamming`` verify radius, see module docstring), 256-bit
    Hamming verify, votes = the SMALLER of each side's distinct
    matched keypoints (a one-to-many burst cannot inflate the count).
    Output: (id_a, id_b, n_matches), id_a < id_b.

    ``max_bucket_size`` caps degenerate band buckets exactly like the
    pHash/MinHash joins (flat-texture descriptor slices concentrate);
    capped candidates can still meet through their other 15 bands."""
    b = sigs.select(
        "media_id", "kp", "w0", "w1", "w2", "w3",
        F.explode(F.array(*_descriptor_bands("w", band_bits)))
        .alias("__band"))
    if max_bucket_size is not None:
        gs = b.groupBy("__band").agg(F.count(F.lit(1)).alias("__n"))
        b = b.join(gs.where(F.col("__n") <= max_bucket_size)
                   .select("__band"), "__band")
    left = b.select(F.col("media_id").alias("id_a"),
                    F.col("kp").alias("kp_a"),
                    *[F.col(f"w{i}").alias(f"a{i}") for i in range(4)],
                    "__band")
    right = b.select(F.col("media_id").alias("id_b"),
                     F.col("kp").alias("kp_b"),
                     *[F.col(f"w{i}").alias(f"b{i}")
                       for i in range(4)],
                     "__band")
    cand = (left.join(right, "__band")
            .where(F.col("id_a") < F.col("id_b"))
            .where(_hamming256("a", "b") <= F.lit(max_hamming))
            .select("id_a", "id_b", "kp_a", "kp_b")
            .distinct())
    return (cand.groupBy("id_a", "id_b")
            .agg(F.least(F.count_distinct("kp_a"),
                         F.count_distinct("kp_b"))
                 .alias("n_matches"))
            .where(F.col("n_matches") >= F.lit(min_matches)))


def keypoint_near_dups(files: DataFrame,
                       max_kp: int = DEFAULT_MAX_KP,
                       octaves: tuple = DEFAULT_OCTAVES,
                       fast_t: int = DEFAULT_FAST_T,
                       max_hamming: int = DEFAULT_MAX_HAMMING,
                       min_matches: int = DEFAULT_MIN_MATCHES,
                       max_bucket_size: int | None = 4096,
                       band_bits: int = DEFAULT_BAND_BITS,
                       ) -> DataFrame:
    """One-call crop/rotation/rescale-robust near-dup over a
    :func:`sources.media.read_media_dir` frame (or any
    (``media_id``, ``payload``) frame): describe once, pair on
    descriptor votes. The deep-pass complement to
    ``media_dir_near_dups`` — run it on the subset the cheap pHash
    pass left unmatched."""
    ok = files
    if "status" in files.columns:
        ok = files.where(F.col("status") == "ok")
    sigs = image_keypoint_signatures(
        ok.select("media_id", "payload"), max_kp=max_kp,
        octaves=octaves, fast_t=fast_t).persist()
    sigs.count()  # the ONE payload pass
    return keypoint_near_dup_pairs(
        sigs, max_hamming=max_hamming, min_matches=min_matches,
        max_bucket_size=max_bucket_size, band_bits=band_bits)
