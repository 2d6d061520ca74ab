"""Perceptual image hashing + banded image near-dup (r14).

The image analog of :func:`operators.dedup.simhash`: a 64-bit
fingerprint per image such that visually-near-identical images
(re-encodes, mild noise, small edits, rescales) land within a few
Hamming bits, composed with a deterministic banded self-join for
candidate pairs. The three classic public algorithms:

- **aHash** (average hash): 8x8 area-resampled gray, bit = pixel >
  mean.
- **dHash** (difference hash): 9x8 gray, bit = right pixel > left
  (horizontal gradient signs — robust to global brightness).
- **pHash** (DCT hash): 32x32 gray → orthonormal 2-D DCT-II → the
  top-left 8x8 low-frequency block, bit = coefficient > median of the
  63 non-DC coefficients (the de-facto published construction).

All three share one decode: payload → clean-room codec (the magic-byte
auto router) → integer BT.601 luma → exact area resample (the same
row-stochastic weight matrices as the transcode pass's 'area' filter,
here WITHOUT aspect preservation — the fixed grid is what makes
rescales collide). Undecodable rows get a NULL hash and the usual
status reason — the shared three-valued contract, nothing raises.

Scale shape (100 TB): hashing is ONE ``mapInPandas`` over the payload
column — payload bytes never enter a shuffle. Near-dup candidates
band the 64-bit hash into ``n_bands`` equal slices JVM-side (shift +
mask, no UDF), explode to (band_idx, band_val, id) rows — 8 tiny rows
per image, payload long gone — and equi-join on the band. The
pigeonhole guarantee is exact, not probabilistic: a pair with Hamming
distance < ``n_bands`` MUST agree on at least one band, so with the
default 8 bands every pair within 7 bits is found; the final
``bit_count(a ^ b) <= max_hamming`` verify is a JVM builtin on the
joined longs. Same two-phase shape as MinHash LSH banding
(``operators/dedup.py``), with a deterministic guarantee instead of a
probabilistic one.

Reference parity note: pinot-core has no image operators — extension
surface for multimodal training-data curation (near-dup image
filtering before training).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BITS = 64


def _luma(px, np):
    """Integer BT.601 luma from an (h, w, ch) uint8 array — the same
    (299R + 587G + 114B) // 1000 integer convention however many
    channels the codec produced (gray passes through, alpha ignored)."""
    if px.shape[2] == 1:
        return px[:, :, 0].astype(np.float64)
    r = px[:, :, 0].astype(np.int64)
    g = px[:, :, 1].astype(np.int64)
    b = px[:, :, 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.float64)


def _dct_matrix(n, np):
    """Orthonormal DCT-II basis (the JPEG codec's own construction)."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    d = np.cos((2 * x + 1) * k * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


def _make_perceptual_hasher(method: str = "phash",
                            max_pixels: int | None = None,
                            dihedral: bool = False):
    """Per-row payload -> 64-bit signed hash closure (the worker body
    of :func:`image_perceptual_hash`, exposed for the fuzz sweep's
    raise-contract coverage): returns an int on success, ``None`` for
    malformed bytes, ``"unsupported: …"`` otherwise. With
    ``dihedral=True`` a success returns a LIST of 8 hashes — one per
    D4 group element (orient ``o``: ``o // 4`` = horizontal mirror,
    ``o % 4`` = 90° CCW rotations), orient 0 bit-identical to the
    plain hash. The transform is applied to the full-resolution luma
    BEFORE resampling, so each orientation hash equals the plain hash
    of an actually-rotated/mirrored image exactly (dHash's 9x8 grid is
    not square, so grid-level transforms would NOT be equivalent).
    Cost: 8 area-resamples per image — still decode-bounded. Nested
    function, captured by value (house rule)."""
    from .multimodal import MAX_DECODE_PIXELS, _make_auto_decoder

    dec = _make_auto_decoder(max_pixels or MAX_DECODE_PIXELS)
    px_hash = _make_pixel_hasher(method, dihedral)

    def hasher(payload):
        r = dec(payload)
        if not isinstance(r, tuple):
            return r
        return px_hash(r[3])

    return hasher


def _make_pixel_hasher(method: str = "phash", dihedral: bool = False):
    """Hash closure over a DECODED (h, w, ch) uint8 pixel array — the
    computation core of :func:`_make_perceptual_hasher`, factored out
    (r15) so video frame pixels hash without a PNG round trip (the
    round trip is lossless, so both paths are bit-identical —
    equality-tested). Returns an int (or the 8-orientation list when
    ``dihedral``)."""
    import numpy as np

    from .multimodal import _area_weights

    d32 = _dct_matrix(32, np)

    def resample(gray, tw, th):
        wy = _area_weights(gray.shape[0], th, np)
        wx = _area_weights(gray.shape[1], tw, np)
        return wy @ gray @ wx.T

    def hash_of_gray(gray):
        if method == "ahash":
            g = resample(gray, 8, 8)
            bits = (g > g.mean()).flatten()
        elif method == "dhash":
            g = resample(gray, 9, 8)
            bits = (g[:, 1:] > g[:, :-1]).flatten()
        else:
            g = resample(gray, 32, 32)
            c = (d32 @ g @ d32.T)[:8, :8].flatten()
            med = np.median(c[1:])
            bits = c > med
        h = 0
        for i, b in enumerate(bits):
            if b:
                h |= 1 << i
        # map to signed int64 (Spark LongType)
        return h - (1 << 64) if h >= (1 << 63) else h

    def px_hash(px):
        gray = _luma(px, np)
        if not dihedral:
            return hash_of_gray(gray)
        return [hash_of_gray(np.rot90(base, k))
                for base in (gray, np.fliplr(gray))
                for k in range(4)]

    return px_hash


def image_perceptual_hash(df: DataFrame, method: str = "phash",
                          max_pixels: int | None = None,
                          with_status: bool = False,
                          id_cols: tuple = ("media_id",)) -> DataFrame:
    """One 64-bit perceptual hash per payload row → ``*id_cols``,
    ``<method>`` (long, NULL when undecodable) [+ ``status``].
    ``id_cols`` are passed through unchanged (long-typed keys — e.g.
    ``("media_id", "frame_ts_ms")`` for per-frame hashing). ONE
    ``mapInPandas``; the hash computation per row is a fixed-size
    (≤32x32) numpy pipeline regardless of source dims, so per-row
    cost is decode-bounded."""
    if method not in ("phash", "dhash", "ahash"):
        raise ValueError(f"method must be phash|dhash|ahash: {method}")
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    hasher = _make_perceptual_hasher(method, max_pixels)
    fields = [StructField(c, LongType()) for c in id_cols] \
        + [StructField(method, LongType())]
    if with_status:
        fields.append(StructField("status", StringType()))
    schema = StructType(fields)

    def batches(it):
        import pandas as pd

        for pdf in it:
            hashes, sts = [], []
            for payload in pdf["payload"]:
                r = hasher(payload)
                if isinstance(r, int):
                    hashes.append(r)
                    sts.append("ok")
                else:
                    hashes.append(None)
                    sts.append("corrupt" if r is None else r)
            out = {c: pdf[c] for c in id_cols}
            out[method] = pd.array(hashes, dtype="Int64")
            if with_status:
                out["status"] = sts
            yield pd.DataFrame(out)

    return df.select(*id_cols, "payload").mapInPandas(
        batches, schema=schema)


def hash_bands(hash_col: Column, n_bands: int = 8,
               bits: int = HASH_BITS) -> Column:
    """JVM-side band array: ``n_bands`` equal slices of the hash,
    each encoded as ``band_idx * 2^(width+1) + band_val`` (disjoint
    ranges per band index, since ``band_val < 2^width``) — shift +
    mask only, no UDF. Arithmetic shift of negative longs is
    corrected by the mask."""
    if bits % n_bands:
        raise ValueError(f"{bits} bits not divisible into {n_bands}")
    width = bits // n_bands
    mask = (1 << width) - 1
    return F.array(*[
        (F.lit(i).cast("long") * F.lit(1 << (width + 1)).cast("long")
         + F.shiftright(hash_col, i * width).bitwiseAND(F.lit(mask)))
        for i in range(n_bands)])


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hashes — one JVM builtin."""
    return F.bit_count(a.bitwiseXOR(b))


def phash_near_dup_pairs(hashes: DataFrame, id_col: str,
                         hash_col: str, max_hamming: int = 7,
                         n_bands: int = 8,
                         max_bucket_size: int | None = None) -> DataFrame:
    """Candidate near-dup pairs with the EXACT pigeonhole guarantee:
    every pair within ``max_hamming < n_bands`` Hamming bits shares at
    least one of the ``n_bands`` band slices, so the banded equi-join
    finds it; the ``bit_count`` verify then drops everything above the
    threshold (false candidates from a colliding band). Output:
    (id_a, id_b, hamming), id_a < id_b, deduplicated.

    ``max_bucket_size`` is the corpus-scale knob (the same skew killer
    as MinHash-LSH's ``lsh_candidate_pairs`` cap): with the default 8
    bands each band value is only 8 bits wide — 256 buckets — so ANY
    large corpus makes some band bucket quadratic (flat/boilerplate
    images concentrate further). Buckets above the cap are skipped —
    bounding every bucket at cap·(cap−1)/2 pairs — and capped pairs
    can still meet through their other 7 bands; pairs hot in ALL
    bands (exact-duplicate armies) are exact-dedup's job upstream,
    not the near-dup join's. The size pass is a map-side-combined
    count on band keys. At corpus scale also consider
    ``n_bands=4`` (16-bit bands, 65k buckets, guarantee ≤3 bits).

    Shuffle budget: one explode of 8-byte band keys (no payload, no
    pixels), one equi-join on the band, one distinct on the id pair —
    the MinHash-LSH shape with a deterministic guarantee."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"guarantee needs max_hamming < n_bands: {max_hamming} "
            f">= {n_bands}")
    h = hashes.where(F.col(hash_col).isNotNull())
    b = h.select(F.col(id_col), F.col(hash_col),
                 F.explode(hash_bands(F.col(hash_col),
                                      n_bands)).alias("__band"))
    if max_bucket_size is not None:
        sizes = b.groupBy("__band").agg(F.count(F.lit(1)).alias("__n"))
        b = (b.join(sizes.where(F.col("__n") <= max_bucket_size),
                    "__band").drop("__n"))
    left = b.select(F.col(id_col).alias("id_a"),
                    F.col(hash_col).alias("ha"), "__band")
    right = b.select(F.col(id_col).alias("id_b"),
                     F.col(hash_col).alias("hb"), "__band")
    pairs = (left.join(right, "__band")
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     hamming(F.col("ha"), F.col("hb")).alias("hamming"))
             .where(F.col("hamming") <= F.lit(max_hamming))
             .distinct())
    return pairs


def image_dihedral_hashes(df: DataFrame, method: str = "phash",
                          max_pixels: int | None = None,
                          id_cols: tuple = ("media_id",)) -> DataFrame:
    """All 8 dihedral-orientation hashes per payload row →
    ``*id_cols``, ``orient`` (0-7: ``orient // 4`` mirror, ``orient %
    4`` 90° rotations; 0 = identity, bit-identical to
    :func:`image_perceptual_hash`), ``<method>``. The rotation/mirror
    blind spot fix (r14 verdict): dHash/pHash are not
    rotation-invariant, so a 90°-rotated crawl duplicate is invisible
    to the plain near-dup pass — hashing every D4 orientation at
    ingest (8 resamples of one decode; decode still dominates) makes
    it an equi-join problem again. Undecodable rows emit nothing (the
    join ignores them). ONE ``mapInPandas``."""
    if method not in ("phash", "dhash", "ahash"):
        raise ValueError(f"method must be phash|dhash|ahash: {method}")
    from pyspark.sql.types import LongType, StructField, StructType

    hasher = _make_perceptual_hasher(method, max_pixels, dihedral=True)
    schema = StructType([StructField(c, LongType()) for c in id_cols]
                        + [StructField("orient", LongType()),
                           StructField(method, LongType())])

    def batches(it):
        import pandas as pd

        for pdf in it:
            out: dict = {c: [] for c in id_cols}
            orients, hashes = [], []
            for row in zip(*(pdf[c] for c in id_cols), pdf["payload"]):
                r = hasher(row[-1])
                if not isinstance(r, list):
                    continue
                for o, h in enumerate(r):
                    for c, v in zip(id_cols, row):
                        out[c].append(v)
                    orients.append(o)
                    hashes.append(h)
            yield pd.DataFrame(
                {**{c: pd.array(out[c], dtype="Int64")
                    for c in id_cols},
                 "orient": pd.array(orients, dtype="Int64"),
                 method: pd.array(hashes, dtype="Int64")})

    return df.select(*id_cols, "payload").mapInPandas(
        batches, schema=schema)


def phash_near_dup_pairs_dihedral(hashes: DataFrame, id_col: str,
                                  hash_col: str, max_hamming: int = 7,
                                  n_bands: int = 8,
                                  max_bucket_size: int | None = None,
                                  ) -> DataFrame:
    """Near-dup pairs INCLUDING rotated/mirrored duplicates, from an
    :func:`image_dihedral_hashes` table. Output: (id_a, id_b,
    hamming, orient) — the best (minimum-Hamming) orientation match
    per pair; ``orient`` is the probe-side D4 element of that winning
    match (its direction — a onto b vs b onto a — is not preserved
    after pair canonicalization; 0 still means an unrotated match).

    Guarantee (the pigeonhole statement re-based on orientations): if
    image B is any dihedral transform τ of image A up to
    ``max_hamming < n_bands`` hash bits of noise, then A's τ-oriented
    hash is within ``max_hamming`` of B's IDENTITY hash, so that
    orientation pair shares a band and the equi-join finds it — exact,
    per orientation. Only one side of the join expands (probe side =
    all 8 orientations, build side = identity hashes only): the pair
    is still found in both directions because hash(τ(A)) ≈ hash(B)
    iff hash(τ⁻¹(B)) ≈ hash(A), while band rows grow 8× instead of
    64× candidate pairs. ``max_bucket_size`` caps per band bucket as
    in :func:`phash_near_dup_pairs`."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"guarantee needs max_hamming < n_bands: {max_hamming} "
            f">= {n_bands}")
    h = hashes.where(F.col(hash_col).isNotNull())
    probe = h.select(F.col(id_col), F.col("orient"), F.col(hash_col),
                     F.explode(hash_bands(F.col(hash_col),
                                          n_bands)).alias("__band"))
    build = probe.where(F.col("orient") == 0)
    if max_bucket_size is not None:
        sizes = build.groupBy("__band") \
            .agg(F.count(F.lit(1)).alias("__n"))
        small = sizes.where(F.col("__n") <= max_bucket_size) \
            .select("__band")
        build = build.join(small, "__band")
        probe = probe.join(small, "__band")
    left = probe.select(F.col(id_col).alias("id_a"),
                        F.col("orient"),
                        F.col(hash_col).alias("ha"), "__band")
    right = build.select(F.col(id_col).alias("id_b"),
                         F.col(hash_col).alias("hb"), "__band")
    cand = (left.join(right, "__band")
            .where(F.col("id_a") != F.col("id_b"))
            .select(F.least("id_a", "id_b").alias("lo"),
                    F.greatest("id_a", "id_b").alias("hi"),
                    hamming(F.col("ha"),
                            F.col("hb")).alias("hamming"),
                    "orient")
            .where(F.col("hamming") <= F.lit(max_hamming)))
    best = (cand.groupBy("lo", "hi")
            .agg(F.min(F.struct("hamming", "orient")).alias("__b")))
    return best.select(F.col("lo").alias("id_a"),
                       F.col("hi").alias("id_b"),
                       F.col("__b.hamming").alias("hamming"),
                       F.col("__b.orient").alias("orient"))


# ---------------------------------------------------------------------------
# Video perceptual near-dup: sampled-frame hash signatures
# ---------------------------------------------------------------------------

def frame_hash_signature(df: DataFrame, every_ms: int,
                         method: str = "phash",
                         max_pixels: int | None = None,
                         orientations: bool = False) -> DataFrame:
    """Per-video perceptual signature: sample frames on the
    ``every_ms`` grid through the REAL video decoders
    (``multimodal.decode_frames`` — GIF / animated WebP / WebM-VP8 /
    APNG / MJPEG-AVI; stills contribute their single frame at ts 0),
    then hash each sampled frame. Output: (media_id, frame_ts_ms,
    <method>), plus ``orient`` when ``orientations=True`` (all 8 D4
    hashes per frame — the rotated-video-copy detector's ingest side,
    r15). Two chained ``mapInPandas`` passes; the intermediate
    frame PNGs flow pipelined between them (same-stage, no shuffle —
    both are narrow maps over the same partitioning)."""
    from .multimodal import MAX_DECODE_PIXELS, decode_frames

    frames = decode_frames(df, every_ms,
                           max_pixels=max_pixels or MAX_DECODE_PIXELS)
    ok = frames.where(F.col("payload").isNotNull())
    if orientations:
        return image_dihedral_hashes(
            ok, method=method, id_cols=("media_id", "frame_ts_ms"))
    return image_perceptual_hash(
        ok, method=method, id_cols=("media_id", "frame_ts_ms"))


def video_near_dup_pairs(signatures: DataFrame,
                         method: str = "phash",
                         max_hamming: int = 7, n_bands: int = 8,
                         min_matched_frames: int = 2,
                         align: str = "same_ts",
                         max_bucket_size: int | None = None,
                         bits: int = HASH_BITS,
                         orientations: bool = False) -> DataFrame:
    """Near-dup VIDEO pairs from frame signatures: band every frame
    hash (the image pigeonhole guarantee per frame), equi-join frames
    of different videos AT THE SAME sample timestamp on a shared band,
    verify per-frame Hamming, then count distinct matching timestamps
    per video pair — re-encodes and re-containered copies of the same
    footage match on nearly every sampled frame, unrelated videos on
    ~none. Output: (id_a, id_b, matched_frames), id_a < id_b, pairs
    with at least ``min_matched_frames``.

    ``align="same_ts"`` (default) joins frames at the same sample
    timestamp — the aligned-copy detector (same content crawled twice
    in different containers/encodings). ``align="any_offset"`` is the
    SHIFTED-copy detector (trimmed intros, appended bumpers): frames
    join on the band alone, and matches VOTE on their timestamp delta
    — the pair's score is its best single alignment, so unrelated
    videos whose chance matches scatter across deltas stay below the
    threshold while a shifted copy concentrates all its matches at
    one delta. The band-only join is wider, so ``max_bucket_size``
    (per (band, ts) bucket under same_ts, per band bucket under
    any_offset — the MinHash cap semantics) is the corpus knob.

    Shuffle budget: one band explode (ids + 8-byte keys, pixels long
    gone), one equi-join on (ts, band) / (band), one distinct + one
    count shuffle on the id pair (+ a max over deltas for
    any_offset).

    ``orientations=True`` (r15) takes an orientation-bearing
    signature table (``frame_hash_signature(orientations=True)``) and
    probes every frame's 8 dihedral hashes against identity hashes —
    a consistently ROTATED or mirrored video copy matches on every
    sampled frame through its one orientation, with the per-frame
    pigeonhole guarantee intact. Probe side carries 8x band rows;
    build side stays identity-only (8x candidates, not 64x)."""
    if align not in ("same_ts", "any_offset"):
        raise ValueError(
            f"align must be same_ts|any_offset: {align}")
    if orientations:
        return _video_pairs_dihedral(signatures, method, max_hamming,
                                     n_bands, min_matched_frames,
                                     align, max_bucket_size, bits)
    h = signatures.where(F.col(method).isNotNull())
    b = h.select("media_id", "frame_ts_ms", F.col(method),
                 F.explode(hash_bands(F.col(method), n_bands,
                                      bits=bits)).alias("__band"))
    join_keys = (["ts", "__band"] if align == "same_ts"
                 else ["__band"])
    if max_bucket_size is not None:
        keys = (["frame_ts_ms", "__band"] if align == "same_ts"
                else ["__band"])
        sizes = b.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
        b = (b.join(sizes.where(F.col("__n") <= max_bucket_size),
                    keys).drop("__n"))
    left = b.select(F.col("media_id").alias("id_a"),
                    F.col("frame_ts_ms").alias("ts"),
                    F.col(method).alias("ha"), "__band")
    right = b.select(F.col("media_id").alias("id_b"),
                     F.col("frame_ts_ms").alias("ts_b"),
                     F.col(method).alias("hb"), "__band")
    if align == "same_ts":
        right = right.withColumnRenamed("ts_b", "ts")
    matched = (left.join(right, join_keys)
               .where(F.col("id_a") < F.col("id_b"))
               .where(hamming(F.col("ha"), F.col("hb"))
                      <= F.lit(max_hamming)))
    if align == "same_ts":
        matched = matched.select("id_a", "id_b", "ts").distinct()
        return (matched.groupBy("id_a", "id_b")
                .agg(F.count(F.lit(1)).alias("matched_frames"))
                .where(F.col("matched_frames")
                       >= F.lit(min_matched_frames)))
    # any_offset: vote per timestamp delta, keep each pair's best
    # alignment (and report the winning offset)
    matched = (matched
               .select("id_a", "id_b",
                       (F.col("ts") - F.col("ts_b")).alias("__delta"),
                       F.col("ts"))
               .distinct())
    per_delta = (matched.groupBy("id_a", "id_b", "__delta")
                 .agg(F.count(F.lit(1)).alias("matched_frames")))
    best = (per_delta.groupBy("id_a", "id_b")
            .agg(F.max(F.struct("matched_frames", "__delta"))
                 .alias("__best")))
    return (best.select(
        "id_a", "id_b",
        F.col("__best.matched_frames").alias("matched_frames"),
        F.col("__best.__delta").alias("offset_ms"))
        .where(F.col("matched_frames") >= F.lit(min_matched_frames)))


def _video_pairs_dihedral(signatures: DataFrame, method: str,
                          max_hamming: int, n_bands: int,
                          min_matched_frames: int, align: str,
                          max_bucket_size: int | None,
                          bits: int) -> DataFrame:
    """Orientation-probing body of
    :func:`video_near_dup_pairs(orientations=True)`: the one-side-
    expanded dihedral join (probe = all 8 orientation hashes per
    frame, build = identity hashes) feeding the same frame-voting
    algebra, with pair keys and deltas canonicalized to
    (least, greatest) id order."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"guarantee needs max_hamming < n_bands: {max_hamming} "
            f">= {n_bands}")
    h = signatures.where(F.col(method).isNotNull())
    b = h.select("media_id", "frame_ts_ms", "orient", F.col(method),
                 F.explode(hash_bands(F.col(method), n_bands,
                                      bits=bits)).alias("__band"))
    build = b.where(F.col("orient") == 0)
    probe = b
    if max_bucket_size is not None:
        keys = (["frame_ts_ms", "__band"] if align == "same_ts"
                else ["__band"])
        sizes = build.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
        small = sizes.where(F.col("__n") <= max_bucket_size) \
            .select(*keys)
        build = build.join(small, keys)
        probe = probe.join(small, keys)
    left = probe.select(F.col("media_id").alias("id_x"),
                        F.col("frame_ts_ms").alias("ts_x"),
                        F.col(method).alias("hx"), "__band")
    right = build.select(F.col("media_id").alias("id_y"),
                         F.col("frame_ts_ms").alias("ts_y"),
                         F.col(method).alias("hy"), "__band")
    join_keys = ["__band"]
    if align == "same_ts":
        right = right.withColumnRenamed("ts_y", "ts_x")
        join_keys = ["ts_x", "__band"]
    matched = (left.join(right, join_keys)
               .where(F.col("id_x") != F.col("id_y"))
               .where(hamming(F.col("hx"), F.col("hy"))
                      <= F.lit(max_hamming)))
    fwd = F.col("id_x") < F.col("id_y")
    if align == "same_ts":
        pairs = (matched.select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
            F.col("ts_x").alias("ts")).distinct())
        return (pairs.groupBy("id_a", "id_b")
                .agg(F.count(F.lit(1)).alias("matched_frames"))
                .where(F.col("matched_frames")
                       >= F.lit(min_matched_frames)))
    matched = (matched.select(
        F.least("id_x", "id_y").alias("id_a"),
        F.greatest("id_x", "id_y").alias("id_b"),
        F.when(fwd, F.col("ts_x") - F.col("ts_y"))
        .otherwise(F.col("ts_y") - F.col("ts_x")).alias("__delta"),
        F.when(fwd, F.col("ts_x")).otherwise(F.col("ts_y")).alias("ts"))
        .distinct())
    per_delta = (matched.groupBy("id_a", "id_b", "__delta")
                 .agg(F.count(F.lit(1)).alias("matched_frames")))
    best = (per_delta.groupBy("id_a", "id_b")
            .agg(F.max(F.struct("matched_frames", "__delta"))
                 .alias("__best")))
    return (best.select(
        "id_a", "id_b",
        F.col("__best.matched_frames").alias("matched_frames"),
        F.col("__best.__delta").alias("offset_ms"))
        .where(F.col("matched_frames") >= F.lit(min_matched_frames)))
