"""Time-series gap filling: densify bucketed aggregates onto a regular
time grid and fill the missing buckets (constant / LOCF / linear).

The reference has no gapfill — its time handling is filter + group-by on
the time column (SURVEY.md §2.9/§2.10; `docs/pql_examples.rst` time
filters) — but every OLAP engine that grew out of that shape added one
(Pinot's later GapFill, Timescale's time_bucket_gapfill). This is the
standard time-series densification operator, implemented two ways:

1. ``gapfill`` — the zero-join **emit** shape and the 100 TB default:
   ONE window pass over the bucketed frame (a single shuffle on the
   group keys), then each observed row *emits* itself plus the filled
   rows up to the next observation via ``sequence`` + ``explode``. The
   dense grid is generated scan-side AFTER the window — there is never
   a grid×observed join, and the raw fact table never enters (callers
   bucket first with ``time_bucket``, which is an ordinary partial→final
   aggregation).
2. ``gapfill_join`` — the conventional **grid-join** shape (bounds →
   ``sequence``/``explode`` grid → left join observed → window fill).
   Kept as the readable reference implementation; bit-equal to the emit
   shape (asserted in tests/test_gapfill.py) including float-for-float
   on linear interpolation, because both express the interpolant as one
   correctly-rounded divide + multiply + add over exactly-representable
   int64 micros.

Fill modes: ``zero`` / ``const`` (coalesce a literal), ``locf``
(last-observation-carried-forward), ``linear`` (interpolate between the
flanking observations; trailing/leading edges fall back to NULL).
Emitted rows carry ``is_filled = true`` so downstream consumers can
distinguish data from fill.

Input contract: bucket timestamps must lie on the ``step_seconds`` grid
(use ``time_bucket``), with at most ONE row per (group, bucket) — the
output of a bucketed aggregation. Misaligned input and duplicate
(group, bucket) rows raise at run time through in-expression
``raise_error`` guards rather than silently snapping or emitting
phantom fill rows.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def time_bucket(df: DataFrame, ts_col: str, step_seconds: int,
                group_cols: Sequence[str],
                aggs: Iterable[Column]) -> DataFrame:
    """Aggregate onto a regular grid: floor(ts / step) * step.

    Plain partial→final hash aggregation — the only full-data pass in a
    gapfill pipeline. Emits ``bucket`` as a timestamp aligned to the
    step grid (epoch-anchored, so buckets from different inputs align).
    """
    step_us = int(step_seconds) * _US
    # exact int64 floor via pmod — `/` would round through double and
    # can flip the last microsecond of a bucket into the next one, and
    # `%` truncates toward zero for pre-1970 (negative-epoch) stamps,
    # landing them one bucket high vs SQL floor division
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    b = F.timestamp_micros(us - F.pmod(us, F.lit(step_us)))
    return (df.groupBy(*[F.col(c) for c in group_cols],
                       b.alias("bucket"))
            .agg(*aggs))


def _to_us(bound) -> int:
    if isinstance(bound, _dt.datetime):
        return int(bound.replace(tzinfo=bound.tzinfo or _dt.timezone.utc)
                   .timestamp() * _US)
    return int(bound)


def _aligned_or_die(delta_us: Column, step_us: int, what: str,
                    forbid_zero: bool = False) -> Column:
    """Integer bucket count delta/step, runtime-asserting grid alignment.

    ``raise_error`` lives inside the expression (the un-foldable house
    pattern) so the check cannot be constant-folded away.

    ``forbid_zero`` guards the lead-bucket delta: two rows in the same
    (group, bucket) give delta 0, which passes the modulo check but
    would make ``sequence(0, n-1)`` = ``sequence(0, -1)`` — a
    *descending* sequence emitting a phantom row one step before the
    bucket, flagged as observed. Duplicate buckets violate the input
    contract (bucket first with ``time_bucket``), so raise — the
    module's documented raise-don't-snap policy."""
    ok = (delta_us % F.lit(step_us)) == 0
    msg = f"gapfill: {what} not aligned to step grid"
    if forbid_zero:
        ok = ok & (delta_us != 0)
        msg += " (or duplicate rows in one (group, bucket))"
    return F.when(ok, (delta_us / F.lit(step_us)).cast("long")).otherwise(
        F.raise_error(F.lit(msg)))


def gapfill(df: DataFrame, bucket_col: str, group_cols: Sequence[str],
            value_cols: Sequence[str], step_seconds: int,
            how: str = "locf", fill_value=None,
            start=None, end=None) -> DataFrame:
    """Zero-join gapfill (emit shape). See module docstring.

    Scale: one Exchange (group keys) for the window; every grid row is
    produced by ``explode(sequence(...))`` on the executor that owns the
    flanking observation — output cardinality is groups × buckets, input
    cardinality is only the observed buckets. No join, no second
    shuffle, no driver-side grid.
    """
    if how not in ("zero", "const", "locf", "linear"):
        raise ValueError(f"unknown fill mode {how!r}")
    step_us = int(step_seconds) * _US
    const = F.lit(0.0) if how == "zero" else F.lit(fill_value)

    w = Window.partitionBy(*group_cols).orderBy(bucket_col)
    b_us = F.unix_micros(F.col(bucket_col).cast("timestamp"))
    base = df.withColumn("_b_us", b_us)
    base = base.withColumn("_lead_us", F.lead("_b_us").over(w))
    if how == "linear":
        for v in value_cols:
            base = base.withColumn(f"_lead_{v}", F.lead(v).over(w))
    if start is not None:
        base = base.withColumn("_rn", F.row_number().over(w))

    # How many grid slots this observation owns: up to the next
    # observation, or through `end` (inclusive) when it is the last.
    if end is not None:
        tail_us = F.lit(_to_us(end))
        delta = tail_us - F.col("_b_us")
        # `end` must sit at/after the last observed bucket — a negative
        # delta would make sequence() count DOWN and emit garbage.
        delta = F.when(delta >= 0, delta).otherwise(
            F.raise_error(F.lit("gapfill: end bound precedes last bucket")))
        n_tail = _aligned_or_die(delta, step_us, "end bound") + 1
    else:
        n_tail = F.lit(1)
    n = F.when(F.col("_lead_us").isNotNull(),
               _aligned_or_die(F.col("_lead_us") - F.col("_b_us"),
                               step_us, "bucket delta", forbid_zero=True)
               ).otherwise(n_tail)

    body = base.withColumn("_i", F.explode(F.sequence(F.lit(0),
                                                      n - F.lit(1))))
    out_bucket = F.timestamp_micros(F.col("_b_us")
                                    + F.col("_i") * F.lit(step_us))
    filled_vals = []
    for v in value_cols:
        if how in ("zero", "const"):
            fv = F.when(F.col("_i") == 0, F.col(v)).otherwise(const)
        elif how == "locf":
            fv = F.col(v)
        else:  # linear: v + (lead_v - v) * (i / n); trailing tail → NULL
            frac = F.col("_i") / n
            interp = (F.col(v)
                      + (F.col(f"_lead_{v}") - F.col(v)) * frac)
            fv = F.when(F.col("_i") == 0, F.col(v)).otherwise(
                F.when(F.col("_lead_us").isNotNull(), interp))
        filled_vals.append(fv.alias(v))
    body = body.select(*group_cols, out_bucket.alias(bucket_col),
                       *filled_vals,
                       (F.col("_i") > 0).alias("is_filled"))

    if start is None:
        return body
    # Leading edge: the first observation of each group additionally
    # emits [start, first_bucket) with NULL/const values. Same shuffled
    # frame (the _rn window shares the partitioning), tiny row count.
    start_us = _to_us(start)
    n_head = _aligned_or_die(F.col("_b_us") - F.lit(start_us), step_us,
                             "start bound")
    head = (base.where((F.col("_rn") == 1) & (F.col("_b_us") > start_us))
            .withColumn("_j", F.explode(F.sequence(F.lit(0),
                                                   n_head - F.lit(1)))))
    head_bucket = F.timestamp_micros(F.lit(start_us)
                                     + F.col("_j") * F.lit(step_us))
    head_val = const if how in ("zero", "const") else F.lit(None)
    head = head.select(*group_cols, head_bucket.alias(bucket_col),
                       *[head_val.cast(dict(df.dtypes)[v]).alias(v)
                         for v in value_cols],
                       F.lit(True).alias("is_filled"))
    return head.unionByName(body)


def gapfill_join(df: DataFrame, bucket_col: str, group_cols: Sequence[str],
                 value_cols: Sequence[str], step_seconds: int,
                 how: str = "locf", fill_value=None,
                 start=None, end=None) -> DataFrame:
    """Grid-join gapfill: per-group bounds → exploded dense grid → left
    join observed → window fill. The readable twin of ``gapfill``;
    costs one extra shuffle (the grid↔observed join) and exists to
    cross-check the emit shape (tests assert bit-equality).
    """
    if how not in ("zero", "const", "locf", "linear"):
        raise ValueError(f"unknown fill mode {how!r}")
    step_us = int(step_seconds) * _US
    const = F.lit(0.0) if how == "zero" else F.lit(fill_value)
    b_us = F.unix_micros(F.col(bucket_col).cast("timestamp"))

    lo = F.min(b_us)
    hi = F.max(b_us)
    if start is not None:
        lo = F.least(lo, F.lit(_to_us(start)))
    if end is not None:
        hi = F.greatest(hi, F.lit(_to_us(end)))
    bounds = df.groupBy(*group_cols).agg(
        lo.alias("_lo"), hi.alias("_hi"),
        F.count(F.lit(1)).alias("_tot"),
        F.count(b_us).alias("_cnt"),
        F.count_distinct(b_us).alias("_dcnt"))
    # alignment guard on the observed extremes vs the grid, plus the
    # duplicate-bucket contract shared with the emit shape: two rows in
    # one (group, bucket) would double the grid row after the left join.
    # Both the duplicate count and its distinct twin ignore NULL buckets
    # (count_distinct skips NULLs), so a NULL bucket gets its OWN
    # diagnostic instead of masquerading as a duplicate.
    bounds = bounds.withColumn(
        "_n",
        F.when(F.col("_tot") != F.col("_cnt"), F.raise_error(F.lit(
            "gapfill: NULL bucket value in input (bucket column must be "
            "non-null)")))
        .when(F.col("_cnt") != F.col("_dcnt"), F.raise_error(F.lit(
            "gapfill: duplicate rows in one (group, bucket)")))
        .otherwise(_aligned_or_die(F.col("_hi") - F.col("_lo"), step_us,
                                   "bounds delta")))
    grid = (bounds
            .withColumn("_k", F.explode(F.sequence(F.lit(0), F.col("_n"))))
            .select(*group_cols,
                    F.timestamp_micros(F.col("_lo")
                                       + F.col("_k") * F.lit(step_us))
                    .alias(bucket_col)))
    obs = df.select(*group_cols, bucket_col,
                    *[F.col(v).alias(f"_obs_{v}") for v in value_cols],
                    F.lit(True).alias("_observed"))
    j = grid.join(obs, on=[*group_cols, bucket_col], how="left")

    w = Window.partitionBy(*group_cols).orderBy(bucket_col)
    out_vals = []
    for v in value_cols:
        o = F.col(f"_obs_{v}")
        if how in ("zero", "const"):
            fv = F.when(F.col("_observed").isNotNull(), o).otherwise(const)
        elif how == "locf":
            fv = F.last(o, ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, 0))
        else:  # linear — reproduce the emit shape's exact float algebra:
            # prev + (next - prev) * (i / n) over integer slot offsets.
            wb = w.rowsBetween(Window.unboundedPreceding, 0)
            wf = w.rowsBetween(0, Window.unboundedFollowing)
            prev_v = F.last(o, ignorenulls=True).over(wb)
            next_v = F.first(o, ignorenulls=True).over(wf)
            prev_b = F.last(F.when(o.isNotNull(), b_us),
                            ignorenulls=True).over(wb)
            next_b = F.first(F.when(o.isNotNull(), b_us),
                             ignorenulls=True).over(wf)
            i = ((b_us - prev_b) / F.lit(step_us)).cast("long")
            nn = ((next_b - prev_b) / F.lit(step_us)).cast("long")
            interp = prev_v + (next_v - prev_v) * (i / nn)
            # leading/trailing edges (no flanking pair) stay NULL, like
            # the emit shape
            fv = F.when(F.col("_observed").isNotNull(), o).otherwise(
                F.when(prev_v.isNotNull() & next_v.isNotNull(), interp))
        out_vals.append(fv.alias(v))
    return j.select(*group_cols, bucket_col, *out_vals,
                    F.col("_observed").isNull().alias("is_filled"))
