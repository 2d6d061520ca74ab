"""Bloom-gated exact dedup against a historical corpus.

The incremental-ingest shape of exact dedup at 100 TB: a plain
``new_batch LEFT ANTI JOIN corpus_keys`` re-shuffles (or at best
re-probes) the corpus key table on EVERY ingest batch, even though the
overwhelming majority of a typical batch is new content. A Bloom filter
built once over the corpus keys (ingest-time, alongside the key table
itself) turns that into a scan-side gate: rows whose key the filter
rejects are *definitely* new and never reach the join; only the
filter's "maybe" rows — true re-arrivals plus a bounded false-positive
trickle — pay the exact anti-join. Semantics stay EXACT (a Bloom filter
has no false negatives over the keys inserted at build), which is what
lets the gated operator be equality-tested against the plain anti-join.

This is the same trick at three public precedents:

- the reference prunes segments with per-column Bloom filters before a
  point-predicate scan (``pinot-segment-local`` ``BloomFilterReader.java:33``;
  our segment sink already writes the parquet analog,
  ``sources/segments.py``) — here the "segment" being pruned is the
  corpus-probe join itself;
- Spark's own runtime row-level filters inject a Bloom filter built from
  the small join side into the big side's scan
  (``spark.sql.optimizer.runtime.bloomFilter.enabled``) — but only
  *within* one query; ours persists across ingest batches, which is the
  point;
- classic Bloom (CACM 1970) as used by every LSM read path.

Layout/scale contract: the filter is sized by :func:`optimal_params`
(m = -n·ln p / ln²2 bits, k = (m/n)·ln 2 probes). The build is one
distributed ``bit_or`` aggregation over ≤ m/64 word rows — the driver
collects **m/64 longs, never keys** (10 bits/key ⇒ ~120 MB of words per
10⁹ corpus keys, broadcastable; beyond that, shard the corpus and carry
one filter per shard). Probing is pure scan-side work: the k probe
positions are JVM ``xxhash64`` expressions, and the word lookup either
constant-folds into the plan (literal mode, small filters) or reads a
broadcast numpy array inside an Arrow-batched pandas UDF (broadcast
mode) — no shuffle, no state, streaming-legal.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Above this many 64-bit words the constant-folded literal array stops
# being cheap to parse/plan (~4096 words = 32 KiB of filter, ~90 KB of
# SQL text) and the broadcast-numpy probe takes over.
_LITERAL_MAX_WORDS = 4096


def optimal_params(n_keys: int, fpp: float = 1e-3) -> tuple[int, int]:
    """Textbook sizing: bits m = -n·ln p / ln²2 (rounded up to a multiple
    of 64), probes k = (m/n)·ln 2, clamped to [1, 16]."""
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    n = max(1, n_keys)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, min(16, round((m / n) * math.log(2))))
    return m, k


@dataclass(frozen=True)
class BloomFilter:
    """An immutable built filter: ``words[i]`` holds bits [64i, 64i+64)
    as a SIGNED 64-bit long (Spark's native integral type — kept signed
    end-to-end so the JVM build, the JSON round-trip, and the numpy
    probe agree bit-for-bit)."""

    words: tuple[int, ...]
    num_bits: int
    num_hashes: int

    def to_json(self) -> str:
        return json.dumps({"num_bits": self.num_bits,
                           "num_hashes": self.num_hashes,
                           "words": list(self.words)})

    @staticmethod
    def from_json(s: str) -> "BloomFilter":
        d = json.loads(s)
        return BloomFilter(tuple(d["words"]), d["num_bits"], d["num_hashes"])


def bloom_fill_ratio(bf: BloomFilter) -> float:
    """Fraction of set bits — the filter's saturation. The OBSERVED
    false-positive probability is ``fill^k`` (each of the k probes must
    hit a set bit independently), so ops can decide when an OR-merged,
    long-lived filter has drifted past its design fpp and needs a
    rebuild at larger m. At design load the fill is ≈ 1 − e^(−kn/m) ≈
    0.5 for optimal sizing."""
    set_bits = sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1")
                   for w in bf.words)
    return set_bits / bf.num_bits


def bloom_fpp_estimate(bf: BloomFilter) -> float:
    """Expected false-positive probability at the CURRENT fill —
    ``fill_ratio ** k``."""
    return bloom_fill_ratio(bf) ** bf.num_hashes


def bloom_merge(a: BloomFilter, b: BloomFilter) -> BloomFilter:
    """Union by bitwise OR — Bloom filters over the same (m, k) family
    are closed under union, so per-batch filters built at ingest fold
    into one corpus filter with no corpus re-scan (the consuming→
    immutable segment analog for the sketch). ``merge(build(A),
    build(B)) == build(A ∪ B)`` bit-for-bit (tested)."""
    if (a.num_bits, a.num_hashes) != (b.num_bits, b.num_hashes):
        raise ValueError("cannot merge filters with different (m, k)")
    return BloomFilter(tuple(x | y for x, y in zip(a.words, b.words)),
                       a.num_bits, a.num_hashes)


def bloom_positions(key: Column | str, num_bits: int,
                    num_hashes: int) -> Column:
    """The k probe positions of a key as ``array<long>`` — k independent
    hashes via ``xxhash64(key, i)`` (the extra literal column acts as the
    per-probe seed), folded into [0, num_bits) with ``pmod``. Pure JVM
    expressions shared verbatim by the build and both probe modes, so
    membership is decided by one hash family everywhere."""
    c = F.col(key) if isinstance(key, str) else key
    return F.array(*[F.pmod(F.xxhash64(c, F.lit(i)), F.lit(num_bits))
                     for i in range(num_hashes)])


def bloom_build(keys: DataFrame, key_col: str, num_bits: int,
                num_hashes: int) -> BloomFilter:
    """Build the filter distributed: explode each key's k positions, one
    ``bit_or`` groupBy over word index (≤ num_bits/64 groups), collect
    the sparse (word, bits) rows and densify driver-side. The collect is
    bounded by the filter size — never by the corpus."""
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError("num_bits must be a positive multiple of 64")
    pos = (keys.select(F.explode(
        bloom_positions(key_col, num_bits, num_hashes)).alias("p")))
    # F.shiftleft only takes a python-int shift; call_function routes the
    # SQL builtin, which accepts a column shift amount
    rows = (pos.select(F.shiftright("p", 6).cast("int").alias("w"),
                       F.call_function(
                           "shiftleft", F.lit(1).cast("long"),
                           F.col("p").bitwiseAND(F.lit(63)).cast("int"))
                       .alias("b"))
            .groupBy("w").agg(F.bit_or("b").alias("bits"))
            .collect())
    words = [0] * (num_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return BloomFilter(tuple(words), num_bits, num_hashes)


def _might_contain_literal(key: Column, bf: BloomFilter) -> Column:
    """Literal-mode membership: the word array renders as ONE
    single-node literal (litarray.lit_longs — constant-folds to the
    same array Literal as CreateArray, but the analyzer walks one node
    instead of num_bits/64; per-element ``F.lit`` py4j calls do not
    scale), referenced once inside a forall-over-positions lambda."""
    from realtime_olap_spark.litarray import lit_longs  # noqa: PLC0415
    arr = lit_longs(bf.words)
    pos = bloom_positions(key, bf.num_bits, bf.num_hashes)
    return F.forall(pos, lambda p: (
        F.element_at(arr, F.shiftright(p, 6).cast("int") + F.lit(1))
        .bitwiseAND(F.call_function(
            "shiftleft", F.lit(1).cast("long"),
            p.bitwiseAND(F.lit(63)).cast("int")))
        != F.lit(0).cast("long")))


def _might_contain_broadcast(spark: SparkSession, key: Column,
                             bf: BloomFilter) -> Column:
    """Broadcast-mode membership: positions stay JVM expressions; the
    word lookup is a vectorized numpy gather inside an Arrow-batched
    pandas UDF reading the filter from a Spark broadcast (shipped once
    per executor, not per task). Closure-defined so it pickles by value
    (executors can't import this package)."""
    import numpy as np
    import pandas as pd

    bc = spark.sparkContext.broadcast(np.array(bf.words, dtype=np.int64))

    def _probe(pos):  # (pd.Series) -> pd.Series; unannotated because
        # stringized hints (future-annotations) can't resolve pd here
        w = bc.value
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        p = np.vstack(pos.to_numpy())  # (rows, k) int64 positions
        bits = (w[p >> 6] >> (p & 63)) & 1  # arithmetic shift; &1 masks
        return pd.Series(bits.all(axis=1))

    probe = F.pandas_udf(_probe, "boolean")
    return probe(bloom_positions(key, bf.num_bits, bf.num_hashes))


def bloom_might_contain(spark: SparkSession, key: Column | str,
                        bf: BloomFilter, mode: str = "auto") -> Column:
    """Membership column: False ⇒ the key was NOT inserted at build
    (no false negatives); True ⇒ maybe. NULL keys probe like an empty
    key — callers with NULL-key rows decide their policy explicitly
    (``dedup_exact_against_bloom`` routes them to definitely-new, the
    anti-join's NULL semantics)."""
    c = F.col(key) if isinstance(key, str) else key
    if mode == "auto":
        mode = ("literal" if len(bf.words) <= _LITERAL_MAX_WORDS
                else "broadcast")
    if mode == "literal":
        return _might_contain_literal(c, bf)
    if mode == "broadcast":
        return _might_contain_broadcast(spark, c, bf)
    raise ValueError(f"unknown probe mode: {mode!r}")


def dedup_exact_against_bloom(new_df: DataFrame, corpus_keys: DataFrame,
                              key: Column | str, bf: BloomFilter,
                              key_col: str = "__ck",
                              mode: str = "auto",
                              large_corpus: bool = False) -> DataFrame:
    """EXACT against-corpus dedup with the Bloom gate: rows the filter
    rejects (plus NULL-key rows) bypass the join as definitely-new; only
    "maybe" rows are checked against ``corpus_keys`` (whose ``key_col``
    must hold the same key expression the filter was built over). Result
    is row-identical to the ungated anti-join — the filter moves cost,
    not semantics. The candidate side is |re-arrivals| + fpp·|batch|
    rows, so the exact check is proportional to actual duplication.

    ``large_corpus=False`` anti-joins candidates directly (right side
    broadcast or shuffled by Catalyst — fine when the key table fits a
    join). ``large_corpus=True`` is the 100 TB shape: the corpus key
    table is NEVER shuffled — candidate keys (tiny, post-gate) broadcast
    INTO a semi-join that scans the corpus once to extract the actually-
    duplicated keys, which then broadcast back into the final anti-join:

        dup_keys  = corpus_keys ⋉ broadcast(candidate_keys)   (scan-only)
        survivors = candidates ▷ broadcast(dup_keys)

    Both joins are broadcast-hash on the SMALL side; a plain anti-join
    against a 100 TB key table would sort-merge-shuffle the corpus per
    ingest batch. Equality of the two shapes is tested."""
    spark = new_df.sparkSession
    c = F.col(key) if isinstance(key, str) else key
    keyed = new_df.withColumn(key_col, c)
    maybe = (c.isNotNull()
             & bloom_might_contain(spark, F.col(key_col), bf, mode))
    definite_new = keyed.where(~maybe)
    candidates = keyed.where(maybe)
    ck = corpus_keys.select(F.col(key_col))
    if large_corpus:
        cand_keys = candidates.select(key_col).distinct()
        dup_keys = ck.join(F.broadcast(cand_keys), on=key_col,
                           how="left_semi")
        survivors = candidates.join(F.broadcast(dup_keys), on=key_col,
                                    how="left_anti")
    else:
        survivors = candidates.join(ck, on=key_col, how="left_anti")
    return definite_new.unionByName(survivors).drop(key_col)
