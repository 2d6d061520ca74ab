"""Time-series downsampling: OHLC candles and time-weighted averages.

Companions to :mod:`operators/gapfill` (densify) — these REDUCE a raw
event stream onto the bucket grid (the reference's time handling stops
at plain group-by aggregates over time buckets, SURVEY.md §2.9; OHLC /
TWA are the standard TSDB downsamplers layered on the same grid).

- ``ohlc``: open/high/low/close + count per (group, bucket). One
  partial→final hash aggregation — open/close ride as lexicographic
  ``min(struct(t, v))`` / ``max(struct(t, v))`` so the whole candle is
  ONE shuffle of 4 struct/scalar partials, no window, no self-join.
  Timestamp ties are broken by value (struct ordering), making the
  candle deterministic under concurrent events.
- ``time_weighted_avg``: hold-last-value integral within each bucket,
  normalized by observed span — ``Σ v_i·(t_{i+1}−t_i) / (end−t_1)``
  with the last observation held to the bucket end. Interval-scoped:
  the clock starts at the bucket's first observation (no carry-in from
  the previous bucket — compose with ``gapfill`` LOCF first if you want
  carried state). One window pass + one aggregation sharing the same
  (group, bucket) shuffle. Tied timestamps contribute zero duration
  except the last tie (value order breaks the tie deterministically).

Both keep arithmetic in int64 micros until the final divide.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def _bucket(ts_col: str, step_us: int):
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return us - (us % F.lit(step_us))


def ohlc(df: DataFrame, ts_col: str, step_seconds: int,
         group_cols: Sequence[str], value_col: str) -> DataFrame:
    """OHLC candles: ``(…group, bucket, open, high, low, close, n)``."""
    step_us = int(step_seconds) * _US
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    v = F.col(value_col)
    tv = F.struct(us.alias("t"), v.alias("v"))
    return (df.groupBy(*[F.col(c) for c in group_cols],
                       F.timestamp_micros(_bucket(ts_col, step_us))
                       .alias("bucket"))
            .agg(F.min(tv)["v"].alias("open"),
                 F.max(v).alias("high"),
                 F.min(v).alias("low"),
                 F.max(tv)["v"].alias("close"),
                 F.count(F.lit(1)).alias("n")))


def time_weighted_avg(df: DataFrame, ts_col: str, step_seconds: int,
                      group_cols: Sequence[str],
                      value_col: str) -> DataFrame:
    """Interval-scoped TWA per (group, bucket); see module docstring.
    Output: ``(…group, bucket, twa, span_us, n)`` — ``span_us`` is the
    observed holding span (bucket end − first observation)."""
    step_us = int(step_seconds) * _US
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    b_us = _bucket(ts_col, step_us)
    base = df.select(*group_cols, F.col(value_col).alias("_v"),
                     us.alias("_us"), b_us.alias("_b"))
    w = Window.partitionBy(*group_cols, "_b").orderBy("_us", "_v")
    nxt = F.lead("_us").over(w)
    dur = F.coalesce(nxt, F.col("_b") + F.lit(step_us)) - F.col("_us")
    weighted = base.select(
        *group_cols, "_b",
        (F.col("_v") * dur.cast("double")).alias("_vw"),
        dur.alias("_w"))
    return (weighted.groupBy(*[F.col(c) for c in group_cols],
                             F.timestamp_micros(F.col("_b")).alias("bucket"))
            .agg((F.sum("_vw") / F.sum("_w").cast("double")).alias("twa"),
                 F.sum("_w").alias("span_us"),
                 F.count(F.lit(1)).alias("n")))
