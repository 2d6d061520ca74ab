"""Aggregation function registry — the reference's closed function set.

Reference: every aggregation implements aggregate / merge / extractFinalResult
(pinot-core/.../query/aggregation/function/AggregationFunction.java:34-120),
registered by name in AggregationFunctionFactory.java:29 with PERCENTILE<N>
suffix resolution (AggregationFunctionType.java:25-103). Spark's partial/final
HashAggregate is the same hierarchical-merge execution model, so every function
here is a plain Column expression and Catalyst does the merging.

Determinism note (differential testing): double addition is not associative,
so a shuffled Spark sum and a sequential DuckDB sum can differ in the last
ulp. ``dsum``/``davg`` therefore route SUM/AVG through DECIMAL(38,10) — exact,
associative, identical in any engine — and cast the final result back to
double. This is also the scale-safe choice: decimal partial aggregates are
fixed-width and merge exactly on a 1000-executor cluster.

Value semantics follow the reference: MIN/MAX/SUM/AVG/MINMAXRANGE coerce the
input to double (e.g. MinAggregationFunction.java:30 operates on double[]);
COUNT/DISTINCTCOUNT return longs; PERCENTILE<N> is the exact interpolated
percentile over doubles (PercentileAggregationFunction.java:32 collects all
values; Spark's `percentile` computes the same result without materializing
per-group arrays on the driver).

MV (multi-value) variants aggregate over every element of an ArrayType column
(AggregationFunction.java:87-93): COUNTMV counts elements, SUMMV sums all
elements, etc. Where an element-wise fold expresses the semantics (COUNTMV,
SUMMV, MINMV, …) we fold the array JVM-side — no explode, so the shuffle
carries one row per record, not one per element (the 100 TB-safe shape).
Functions that genuinely need element-level rows (DISTINCTCOUNTMV,
PERCENTILE<N>MV) are flagged ``needs_elements``; the group-by executor
(operators/groupby.py) explodes once, aggregates, and joins back on the
(small) group keys.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Deterministic (order-independent, exact) sum of a double column."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic average: exact decimal sum, divided by count as doubles.

    Mirrors the reference's AvgPair(sum, count) intermediate
    (pinot-core/.../function/customobject/AvgPair.java).
    """
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).cast("double")


# Fixed-point scale for element sums over float arrays: 2^35. Multiplying a
# double by a power of two is EXACT (only the exponent shifts), so
# floor(x * 2^35) is deterministic in every engine — unlike double→decimal
# casts, whose last-digit rounding differs between Spark (exact BigDecimal)
# and DuckDB (rounds through a double product). Quantization error is
# 2^-35 ≈ 3e-11 per element.
#
# Range guard: floor(x * 2^35) saturates long once |x| ≳ 2^28, and a per-row
# fold of n elements can reach n·max|x|·2^35. SUMMV/AVGMV therefore compute a
# per-row "risk" term size·max|x| and switch the FINAL result to an exact
# decimal fold whenever any row exceeds FX_SAFE_RISK (row fold then bounded
# by 2^24·2^35 = 2^59 < 2^63) — large-magnitude inputs (ids, epochs, big
# monetary values) get the exact-decimal answer instead of silent garbage.
# Cross-row merge is decimal in both paths, so partial sums never overflow.
FX = 34359738368  # 2^35
FX_SAFE_RISK = float(1 << 24)  # max per-row size(arr)·max|element| for fx path
_FX_CLAMP = float(1 << 25)  # element clamp: keeps the fx fold evaluable


def _fx_fold(col: Column | str) -> Column:
    """Per-row exact fixed-point sum of an array column's elements.

    Elements beyond the fx range are clamped to 0 so the fold can never
    overflow under ANSI evaluation — whenever a clamp would fire, the risk
    guard (> FX_SAFE_RISK, note 2^24 < 2^25 so clamping never touches a
    chosen fx result) routes the aggregate to the decimal fold instead. The
    accumulator is DECIMAL(38,0) (exact integers, no row-sum overflow)."""
    def term(x: Column) -> Column:
        xd = x.cast("double")
        safe = F.when(F.abs(xd) <= F.lit(_FX_CLAMP), xd).otherwise(F.lit(0.0))
        return F.floor(safe * F.lit(FX)).cast("decimal(38,0)")

    return F.aggregate(
        _c(col), F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: (acc + term(x)).cast("decimal(38,0)"),
    )


def _dec_fold(col: Column | str) -> Column:
    """Per-row exact DECIMAL(38,10) sum of an array column's elements — the
    overflow-safe fallback for large-magnitude elements."""
    return F.aggregate(
        _c(col), F.lit(0).cast(DEC),
        lambda acc, x: (acc + x.cast("double").cast(DEC)).cast(DEC),
    )


def _fx_risk(col: Column | str) -> Column:
    """Group-level max of size(arr)·max|element| — decides the fx/decimal
    switch. NULL (all arrays empty) counts as safe."""
    arr = _c(col)
    row_risk = (F.size(arr).cast("double")
                * F.array_max(F.transform(arr, lambda x: F.abs(x.cast("double")))))
    return F.coalesce(F.max(row_risk), F.lit(0.0))


# ---------------------------------------------------------------------------
# Single-value aggregations (SURVEY.md §2.4)
# ---------------------------------------------------------------------------

def agg_count(col: Column | str = "*") -> Column:
    return F.count(F.lit(1))


def agg_min(col: Column | str) -> Column:
    return F.min(_c(col).cast("double"))


def agg_max(col: Column | str) -> Column:
    return F.max(_c(col).cast("double"))


def agg_sum(col: Column | str) -> Column:
    return dsum(col)


def agg_avg(col: Column | str) -> Column:
    return davg(col)


def agg_minmaxrange(col: Column | str) -> Column:
    # MinMaxRangeAggregationFunction.java:33 — final = max - min.
    c = _c(col).cast("double")
    return (F.max(c) - F.min(c)).cast("double")


def agg_distinctcount(col: Column | str) -> Column:
    # Reference hashes values into an IntOpenHashSet (DistinctCount…java:32)
    # and tolerates hash collisions; we are exact (SURVEY.md §7 risk 1).
    return F.count_distinct(_c(col))


def agg_distinctcounthll(col: Column | str, rsd: float = 0.05) -> Column:
    # DistinctCountHLLAggregationFunction.java:34 — HyperLogLog sketch.
    return F.approx_count_distinct(_c(col), rsd)


def agg_percentile(col: Column | str, pct: float) -> Column:
    # Exact interpolated percentile (PercentileAggregationFunction.java:32).
    return F.percentile(_c(col).cast("double"), F.lit(pct / 100.0))


#: Accuracy of every approx-percentile sketch in the engine. The merged
#: same-column percentile families (groupby._merged_agg_columns) fold N
#: PERCENTILEEST/TDIGEST calls into ONE percentile_approx(col, array(p…),
#: acc) — merged and unmerged paths MUST use the same accuracy or their
#: values silently diverge (r16 verdict item 8; pinned in test_opt_r17).
PERCENTILE_APPROX_ACCURACY = 10000


def agg_percentile_est(col: Column | str, pct: float,
                       accuracy: int = PERCENTILE_APPROX_ACCURACY) -> Column:
    # PercentileEstAggregationFunction.java:33 — QuantileDigest approximate.
    return F.percentile_approx(_c(col).cast("double"), F.lit(pct / 100.0), F.lit(accuracy))


def agg_percentile_tdigest(col: Column | str, pct: float,
                           accuracy: int = PERCENTILE_APPROX_ACCURACY) -> Column:
    # PercentileTDigestAggregationFunction.java:37 — TDigest; Spark's
    # approx_percentile is the engine-native mergeable quantile sketch.
    return F.percentile_approx(_c(col).cast("double"), F.lit(pct / 100.0), F.lit(accuracy))


# ---------------------------------------------------------------------------
# Multi-value aggregations — element-wise folds (no explode needed)
# ---------------------------------------------------------------------------

def _dbl_arr(col: Column | str) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def agg_countmv(col: Column | str) -> Column:
    # CountMVAggregationFunction.java — counts elements, not rows.
    return F.sum(F.size(_c(col))).cast("long")


def agg_minmv(col: Column | str) -> Column:
    return F.min(F.array_min(_dbl_arr(col)))


def agg_maxmv(col: Column | str) -> Column:
    return F.max(F.array_max(_dbl_arr(col)))


def agg_summv(col: Column | str) -> Column:
    # Per-row exact fixed-point fold, exact decimal merge, one final
    # division; elements beyond the fx range switch to the decimal fold
    # (see FX_SAFE_RISK above).
    fx = (F.sum(_fx_fold(col).cast(DEC)).cast("double") / F.lit(float(FX)))
    dec = F.sum(_dec_fold(col)).cast("double")
    return (F.when(_fx_risk(col) <= F.lit(FX_SAFE_RISK), fx)
            .otherwise(dec).cast("double"))


def agg_avgmv(col: Column | str) -> Column:
    n = F.sum(F.size(_c(col)))
    fx = (F.sum(_fx_fold(col).cast(DEC)).cast("double") / F.lit(float(FX)) / n)
    dec = (F.sum(_dec_fold(col)).cast("double") / n)
    return (F.when(_fx_risk(col) <= F.lit(FX_SAFE_RISK), fx)
            .otherwise(dec).cast("double"))


def agg_minmaxrangemv(col: Column | str) -> Column:
    a = _dbl_arr(col)
    return (F.max(F.array_max(a)) - F.min(F.array_min(a))).cast("double")


# --- element-level MV aggregations: applied AFTER the executor explodes -----

def agg_distinctcountmv(elem: Column | str) -> Column:
    """Exact distinct element count; ``elem`` is the exploded element column."""
    return F.count_distinct(_c(elem))


def agg_distinctcounthllmv(elem: Column | str, rsd: float = 0.05) -> Column:
    return F.approx_count_distinct(_c(elem), rsd)


# ---------------------------------------------------------------------------
# Name-based registry (AggregationFunctionFactory analog)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AggSpec:
    """A resolved aggregation: Column builder + whether it must run over
    element-level (exploded) rows of its MV input column. ``empty_value``
    is the result for a group with NO elements (count-likes → 0); None means
    NULL (percentile of nothing)."""

    name: str
    builder: Callable[[Column | str], Column]
    needs_elements: bool = False
    empty_value: object = None


_SIMPLE: dict[str, tuple[Callable[[Column | str], Column], bool, object]] = {
    "count": (agg_count, False, None),
    "min": (agg_min, False, None),
    "max": (agg_max, False, None),
    "sum": (agg_sum, False, None),
    "avg": (agg_avg, False, None),
    "minmaxrange": (agg_minmaxrange, False, None),
    "distinctcount": (agg_distinctcount, False, None),
    "distinctcounthll": (agg_distinctcounthll, False, None),
    "fasthll": (agg_distinctcounthll, False, None),  # pre-agg HLL column analog
    "countmv": (agg_countmv, False, None),
    "minmv": (agg_minmv, False, None),
    "maxmv": (agg_maxmv, False, None),
    "summv": (agg_summv, False, None),
    "avgmv": (agg_avgmv, False, None),
    "minmaxrangemv": (agg_minmaxrangemv, False, None),
    "distinctcountmv": (agg_distinctcountmv, True, 0),
    "distinctcounthllmv": (agg_distinctcounthllmv, True, 0),
}

_PERCENTILE_RE = re.compile(
    r"^percentile(?P<kind>est|tdigest)?(?P<pct>\d{1,2}|100)(?P<mv>mv)?$")


def resolve(name: str) -> AggSpec:
    """Resolve a PQL aggregation name (case-insensitive, PERCENTILE<N> style)
    to an AggSpec — AggregationFunctionType.java:25-103 analog."""
    key = name.lower()
    if key in _SIMPLE:
        builder, needs_elements, empty = _SIMPLE[key]
        return AggSpec(key, builder, needs_elements, empty)
    m = _PERCENTILE_RE.match(key)
    if m:
        pct = float(m.group("pct"))
        kind = m.group("kind")
        mv = bool(m.group("mv"))

        def builder(col: Column | str) -> Column:
            if kind is None:
                return agg_percentile(col, pct)
            if kind == "tdigest":
                return agg_percentile_tdigest(col, pct)
            return agg_percentile_est(col, pct)

        return AggSpec(key, builder, needs_elements=mv)
    raise KeyError(f"unknown aggregation function: {name!r}")
