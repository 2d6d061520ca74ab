"""Cohort retention: bucket users by first activity, count how many
come back n buckets later.

The classic companion to :mod:`operators/funnel` on an events table
(the reference has neither — SURVEY.md §2.3/§2.8: no joins, no window
functions — but both are table stakes for behavioral analytics on this
schema). Output is the tall retention table ``(cohort, offset, n_users,
retention)`` where ``cohort`` is the time bucket of the user's first
event, ``offset`` counts buckets since the cohort, ``n_users`` is the
distinct users from that cohort active at that offset, and
``retention = n_users / cohort size`` (offset 0 ⇒ 1.0).

Shape: ONE user-key shuffle —
``groupBy(user).agg(min(t), collect_set(bucket))`` — then an explode of
each user's distinct active buckets (bounded by buckets-per-user, not
events) into a tiny ``(cohort, offset)`` aggregation. The raw events
table is never shuffled twice and never joined; cohort sizes ride along
as the offset-0 counts via one window over the already-tiny result.

Buckets are epoch-anchored int64-modulo floors (same grid as
``operators/gapfill.time_bucket``), offsets are exact integer bucket
deltas, and the retention ratio is one correctly-rounded int/int double
divide — all cross-engine exact (DuckDB differential in
tests/test_retention.py).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def cohort_retention(df: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", bucket_seconds: int = 86400 * 7,
                     max_offset: Optional[int] = None) -> DataFrame:
    """Tall cohort-retention table; see module docstring.

    ``max_offset`` trims the tail (offsets beyond it are dropped AFTER
    counting, so retained rows are unaffected)."""
    step_us = int(bucket_seconds) * _US
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = us - F.pmod(us, F.lit(step_us))  # pmod: pre-1970 safe

    per_user = (df.select(F.col(user_col).alias("u"),
                          bucket.alias("b"))
                .groupBy("u")
                .agg(F.min("b").alias("cohort_us"),
                     F.collect_set("b").alias("bs")))
    tall = (per_user
            .select("cohort_us", F.explode("bs").alias("b_us"))
            .select("cohort_us",
                    ((F.col("b_us") - F.col("cohort_us"))
                     / F.lit(step_us)).cast("long").alias("offset"))
            .groupBy("cohort_us", "offset")
            .agg(F.count(F.lit(1)).alias("n_users")))
    if max_offset is not None:
        tall = tall.where(F.col("offset") <= int(max_offset))
    w = Window.partitionBy("cohort_us")
    size = F.max(F.when(F.col("offset") == 0, F.col("n_users"))).over(w)
    return (tall.select(
                F.timestamp_micros(F.col("cohort_us")).alias("cohort"),
                "offset", "n_users",
                (F.col("n_users") / size).alias("retention"))
            .orderBy("cohort", "offset"))
