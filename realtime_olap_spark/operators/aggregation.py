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
# 2^-35 ≈ 3e-11 per element; the long partial sums stay < 2^53 up to ~10^13
# unit-magnitude elements per group.
FX = 34359738368  # 2^35


def _fx_fold(col: Column | str) -> Column:
    """Per-row exact fixed-point (long) sum of an array column's elements."""
    return F.aggregate(
        _c(col), F.lit(0).cast("long"),
        lambda acc, x: acc + F.floor(x.cast("double") * F.lit(FX)).cast("long"),
    )


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


def agg_percentile_est(col: Column | str, pct: float, accuracy: int = 10000) -> Column:
    # PercentileEstAggregationFunction.java:33 — QuantileDigest approximate.
    return F.percentile_approx(_c(col).cast("double"), F.lit(pct / 100.0), F.lit(accuracy))


def agg_percentile_tdigest(col: Column | str, pct: float, accuracy: int = 10000) -> Column:
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
    # Per-row exact fixed-point fold, exact long merge, one final division.
    return (F.sum(_fx_fold(col)).cast("double") / F.lit(float(FX))).cast("double")


def agg_avgmv(col: Column | str) -> Column:
    return (F.sum(_fx_fold(col)).cast("double") / F.lit(float(FX))
            / F.sum(F.size(_c(col)))).cast("double")


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
    element-level (exploded) rows of its MV input column."""

    name: str
    builder: Callable[[Column | str], Column]
    needs_elements: bool = False


_SIMPLE: dict[str, tuple[Callable[[Column | str], Column], bool]] = {
    "count": (agg_count, False),
    "min": (agg_min, False),
    "max": (agg_max, False),
    "sum": (agg_sum, False),
    "avg": (agg_avg, False),
    "minmaxrange": (agg_minmaxrange, False),
    "distinctcount": (agg_distinctcount, False),
    "distinctcounthll": (agg_distinctcounthll, False),
    "fasthll": (agg_distinctcounthll, False),  # pre-agg HLL column analog
    "countmv": (agg_countmv, False),
    "minmv": (agg_minmv, False),
    "maxmv": (agg_maxmv, False),
    "summv": (agg_summv, False),
    "avgmv": (agg_avgmv, False),
    "minmaxrangemv": (agg_minmaxrangemv, False),
    "distinctcountmv": (agg_distinctcountmv, True),
    "distinctcounthllmv": (agg_distinctcounthllmv, True),
}

_PERCENTILE_RE = re.compile(
    r"^percentile(?P<kind>est|tdigest)?(?P<pct>\d{1,2}|100)(?P<mv>mv)?$")


def resolve(name: str) -> AggSpec:
    """Resolve a PQL aggregation name (case-insensitive, PERCENTILE<N> style)
    to an AggSpec — AggregationFunctionType.java:25-103 analog."""
    key = name.lower()
    if key in _SIMPLE:
        builder, needs_elements = _SIMPLE[key]
        return AggSpec(key, builder, needs_elements)
    m = _PERCENTILE_RE.match(key)
    if m:
        pct = float(m.group("pct"))
        kind = m.group("kind")
        mv = bool(m.group("mv"))

        def builder(col: Column | str) -> Column:
            if kind is None:
                return agg_percentile(col, pct)
            return agg_percentile_est(col, pct)

        return AggSpec(key, builder, needs_elements=mv)
    raise KeyError(f"unknown aggregation function: {name!r}")
