"""Marketing-style attribution: credit each conversion event to the
user's most recent qualifying touch event.

A thin composition over :func:`operators.joins.asof_join` (the engine's
as-of machinery — one user-key shuffle, window-based nearest-match):
conversions are the left side, touches the right, matched backward
within an optional lookback. The reference has neither joins nor this
operator (SURVEY.md §2.3); it is the standard events-table companion to
:mod:`operators/funnel` / :mod:`operators/retention`.

Semantics: a touch at the SAME microsecond as the conversion counts
(as-of is inclusive); duplicate touches at an identical (user, ts) have
an unspecified winner (same contract as ``asof_join`` and SQL ASOF
JOIN); conversions with no touch in the lookback attribute to NULL
("unattributed" in the report).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_olap_spark.operators.joins import asof_join


def last_touch_attribution(df: DataFrame, conversion_event: str,
                           touch_events: Sequence[str],
                           user_col: str = "user_id", ts_col: str = "ts",
                           event_col: str = "event_type",
                           lookback_seconds: Optional[int] = None
                           ) -> DataFrame:
    """One row per conversion event: all conversion columns +
    ``channel`` (the attributed touch's event value, NULL when
    unattributed) + ``touch_ts`` (its timestamp)."""
    # asof_join's tolerance path needs TIMESTAMP (unix_micros rejects
    # the NTZ type raw parquet reads produce); session TZ is UTC
    df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    conv = df.where(F.col(event_col) == conversion_event)
    touch = (df.where(F.col(event_col).isin(list(touch_events)))
             .select(user_col, ts_col, F.col(event_col).alias("__touch")))
    tol = None if lookback_seconds is None \
        else int(lookback_seconds) * 1_000_000
    out = asof_join(conv, touch, on=[user_col], left_ts=ts_col,
                    right_ts=ts_col, values=["__touch"],
                    tolerance_us=tol, suffix="", direction="backward")
    return (out.withColumnRenamed("__touch", "channel")
            .withColumnRenamed("asof_ts", "touch_ts"))


def attribution_report(df: DataFrame, conversion_event: str,
                       touch_events: Sequence[str],
                       user_col: str = "user_id", ts_col: str = "ts",
                       event_col: str = "event_type",
                       lookback_seconds: Optional[int] = None
                       ) -> DataFrame:
    """Per-channel conversion credit: ``(channel, n_conversions,
    share)`` — NULL channel = unattributed; share over ALL conversions
    (one int/int divide, cross-engine exact). Tiny post-join aggregate."""
    a = last_touch_attribution(df, conversion_event, touch_events,
                               user_col, ts_col, event_col,
                               lookback_seconds)
    counts = a.groupBy("channel").agg(F.count(F.lit(1))
                                      .alias("n_conversions"))
    total = counts.agg(F.sum("n_conversions").alias("__total"))
    return (counts.crossJoin(F.broadcast(total))
            .select("channel", "n_conversions",
                    (F.col("n_conversions") / F.col("__total"))
                    .alias("share"))
            .orderBy(F.col("n_conversions").desc(),
                     F.col("channel").asc_nulls_last()))
