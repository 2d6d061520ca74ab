"""Count-Min-gated exact heavy hitters — frequent-key detection that
never full-shuffles the corpus.

The curation use case: find keys (boilerplate lines, hot n-grams, spam
domains) occurring ≥ T times in a 100 TB corpus. The plain plan —
``groupBy(key).count().having(count >= T)`` — shuffles EVERY distinct
key once, and web-scale key columns (lines, shingles) have cardinality
within a small factor of the corpus itself. A Count-Min sketch (Cormode
& Muthukrishnan 2005) built in one pass bounds that: each of d rows
hashes the key into w counters, the estimate is the MIN over rows, and
the estimate only ever OVER-counts. So ``estimate ≥ T`` has no false
negatives, and the exact groupBy runs only over rows whose key passes
the gate — |true heavies| + a collision tail tuned by w. The final
answer is row-identical to the plain plan (equality-tested), the same
move as :mod:`operators/bloom`: the sketch relocates cost, not
semantics.

Distributed shape mirrors the Bloom build: one explode to (row, col)
cells, one ``sum`` aggregation over ≤ d·w groups, a driver-side densify
bounded by the SKETCH size, never by the corpus or its key cardinality
(d=4, w=65536 is 2 MB of counters). The probe is scan-side: d JVM
``xxhash64`` positions plus either a constant-folded literal lookup
(small sketches) or a broadcast numpy gather in an Arrow pandas UDF —
reusing the exact hash-position/probe-mode machinery of
:mod:`operators/bloom` so both sketches share one verified hash family.

The reference's analog is its approximation-with-bounds aggregation
family (DISTINCTCOUNTHLL etc., ``pinot-core`` aggregation function
registry); this module applies the same sketch-then-exact discipline to
a curation operator the reference doesn't have.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Literal-vs-broadcast probe cutoff for CMS counter arrays. Historically
#: shared bloom's 4096-word cutoff, which guarded the O(N) CreateArray
#: analysis cost of rendering the counters into the plan; litarray's
#: single-node literal removed that cost, and the r16 interleaved A/B on
#: the 32,768-counter gram sketch measured literal mode FASTER than the
#: pandas-UDF broadcast probe (0.478 s vs 0.531 s min-of-4 at sf0.1)
#: while removing the ArrowEvalPython boundary (guide §4.1: no corpus
#: position arrays cross Arrow). r17 measured AT this cutoff (16384x4 =
#: 65,536 counters, interleaved min-of-6, rows identical): literal
#: 0.331 s vs broadcast 0.346 s — the boundary itself is now measured,
#: not extrapolated (r16 ADVICE #4). Beyond it, plan-embedded multi-MB
#: literals stop paying — broadcast mode takes over.
_LITERAL_MAX_COUNTERS = 1 << 16


@dataclass(frozen=True)
class CMSketch:
    """d×w counter matrix, row-major flat tuple of signed 64-bit counts
    (counts are non-negative; signed keeps the JVM build, JSON, and
    numpy probe in one integer domain, like :class:`bloom.BloomFilter`)."""

    counters: tuple[int, ...]
    width: int
    depth: int

    def to_json(self) -> str:
        return json.dumps({"width": self.width, "depth": self.depth,
                           "counters": list(self.counters)})

    @staticmethod
    def from_json(s: str) -> "CMSketch":
        d = json.loads(s)
        return CMSketch(tuple(d["counters"]), d["width"], d["depth"])


def cms_total_mass(sk: CMSketch) -> int:
    """Total insertions (sum of any one row — every row holds the full
    mass). With it, the classic error bound is concrete: a point
    estimate overshoots the true count by more than ``(e/width)·mass``
    with probability ≤ e^(−depth) — the number an ops pipeline checks
    before trusting a threshold gate on a long-lived, sum-merged
    sketch."""
    return sum(sk.counters[:sk.width])


def cms_error_bound(sk: CMSketch) -> float:
    """The ε·N additive bound at the current mass: ``(e/width)·mass``
    (Cormode & Muthukrishnan's ε = e/w), exceeded with probability
    ≤ e^(−depth)."""
    import math
    return (math.e / sk.width) * cms_total_mass(sk)


def cms_merge(a: CMSketch, b: CMSketch) -> CMSketch:
    """Union by elementwise sum — CMS is a linear sketch, so per-batch
    sketches built at ingest fold into one corpus sketch with no corpus
    re-scan. ``merge(build(A), build(B)) == build(A ⊎ B)`` bit-for-bit
    (tested); estimates stay overestimates of the combined counts."""
    if (a.width, a.depth) != (b.width, b.depth):
        raise ValueError("cannot merge sketches with different (w, d)")
    return CMSketch(tuple(x + y for x, y in zip(a.counters, b.counters)),
                    a.width, a.depth)


def cms_positions(key: Column | str, width: int, depth: int) -> Column:
    """The d probe columns of a key as ``array<long>`` — row i probes
    flat position i·w + xxhash64(key, i) pmod w. Same seeded-xxhash64
    family as ``bloom.bloom_positions``, pre-offset into the flat
    counter layout so build and probe share one addressing scheme."""
    c = F.col(key) if isinstance(key, str) else key
    return F.array(*[
        F.lit(i * width) + F.pmod(F.xxhash64(c, F.lit(i)), F.lit(width))
        for i in range(depth)])


def cms_build(df: DataFrame, key: Column | str, width: int, depth: int,
              weight: Column | None = None) -> CMSketch:
    """One-pass distributed build: explode each row's d flat positions,
    ONE sum aggregation over ≤ d·w groups, densify driver-side. The
    collect is bounded by the sketch (d·w longs), never the corpus.
    ``weight`` counts each row as that many occurrences (e.g. a
    pre-aggregated (key, n) table; default 1)."""
    if width <= 0 or depth <= 0:
        raise ValueError("width and depth must be positive")
    c = F.col(key) if isinstance(key, str) else key
    w8 = (F.lit(1).cast("long") if weight is None
          else weight.cast("long"))
    rows = (df.select(F.explode(cms_positions(c, width, depth)).alias("p"),
                      w8.alias("n"))
            .groupBy("p").agg(F.sum("n").alias("cnt"))
            .collect())
    counters = [0] * (width * depth)
    for r in rows:
        counters[r["p"]] = r["cnt"]
    return CMSketch(tuple(counters), width, depth)


def cms_estimate(spark: SparkSession, key: Column | str, sk: CMSketch,
                 mode: str = "auto") -> Column:
    """Point-estimate column: min over the d probed counters — an upper
    bound on the key's true count (never an undercount), within
    ε·total-mass of it with probability 1−δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉.
    Literal mode constant-folds the counter array into the plan;
    broadcast mode gathers from a numpy array shipped once per executor."""
    c = F.col(key) if isinstance(key, str) else key
    if mode == "auto":
        mode = ("literal" if len(sk.counters) <= _LITERAL_MAX_COUNTERS
                else "broadcast")
    pos = cms_positions(c, sk.width, sk.depth)
    if mode == "literal":
        from realtime_olap_spark.litarray import lit_longs  # noqa: PLC0415
        arr = lit_longs(sk.counters)
        return F.array_min(F.transform(
            pos, lambda p: F.element_at(arr, p.cast("int") + F.lit(1))))
    if mode == "broadcast":
        import numpy as np
        import pandas as pd

        bc = spark.sparkContext.broadcast(
            np.array(sk.counters, dtype=np.int64))

        def _probe(ps):  # (pd.Series of int64 arrays) -> pd.Series int64;
            # unannotated: stringized hints can't resolve pd here
            t = bc.value
            if len(ps) == 0:
                return pd.Series([], dtype="int64")
            p = np.vstack(ps.to_numpy())
            return pd.Series(t[p].min(axis=1))

        probe = F.pandas_udf(_probe, "long")
        return probe(pos)
    raise ValueError(f"unknown probe mode: {mode!r}")


def heavy_hitters_exact(df: DataFrame, key: Column | str, threshold: int,
                        sk: CMSketch, key_out: str = "key",
                        mode: str = "auto") -> DataFrame:
    """EXACT keys occurring ≥ ``threshold`` times, as ``(key_out,
    n_occurrences)`` — row-identical to the ungated
    ``groupBy(key).count().where(count >= threshold)`` because the CMS
    estimate never undercounts: every true heavy passes the gate, and
    the exact count then discards the collision tail. The groupBy
    shuffles ONLY gate-passing rows; NULL keys never group (SQL GROUP BY
    keeps them, but a frequent-key report for NULL is meaningless and
    the gate's hash treats NULL as empty) — they are filtered out
    explicitly on both the gated and any comparison path's contract."""
    spark = df.sparkSession
    c = F.col(key) if isinstance(key, str) else key
    gated = df.where(c.isNotNull()
                     & (cms_estimate(spark, c, sk, mode)
                        >= F.lit(int(threshold)).cast("long")))
    return (gated.groupBy(c.alias(key_out))
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .where(F.col("n_occurrences") >= threshold))


def frequent_lines_exact(docs: DataFrame, text_col: str, threshold: int,
                         width: int = 8192, depth: int = 4,
                         sep: str = "\n", mode: str = "auto") -> DataFrame:
    """Boilerplate detector: exact lines appearing ≥ ``threshold`` times
    across the corpus, via the CMS gate over the exploded line column —
    the composition :func:`heavy_hitters_exact` exists for. Two corpus
    scans (sketch build + gated count), zero full-key shuffles; feed the
    result to ``lines.duplicate_line_removals``-style removal or a
    blocklist. Returns ``(line, n_occurrences)``."""
    lines = docs.select(
        F.explode(F.split(F.col(text_col), sep)).alias("line"))
    sk = cms_build(lines, "line", width, depth)
    return heavy_hitters_exact(lines, "line", threshold, sk,
                               key_out="line", mode=mode)
