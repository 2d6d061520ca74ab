"""Sessionization: split each user's event stream into sessions at
inactivity gaps.

The reference has no session concept ("window queries are just filters on
the time column", SURVEY.md §2.10); this is the standard behavioral-
analytics / training-data-curation operator, implemented two ways:

1. ``sessionize`` — declarative: lag + running-sum window. Two window
   passes over data shuffled ONCE on user_id (both windows share the
   partitioning, Catalyst reuses the exchange). The scale path: no state
   beyond the sort, spills fine, skewed users split by AQE.
2. ``sessionize_pandas`` — the custom-operator shape (`applyInPandas`):
   per-user Arrow batch, imperative gap scan in numpy. Semantically
   identical (asserted in tests); exists to demonstrate the escape hatch
   the reference lacks (§2.11 "functions have to be implemented within
   Pinot") — any stateful per-key logic Spark can't express declaratively
   slots in here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampType)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("duration_us", LongType()),
])


def sessionize(df: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30) -> DataFrame:
    """Sessions = runs of events per user with inter-event gaps ≤ gap.
    session_id is 1-based per user in time order."""
    gap_us = gap_minutes * 60_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col)
    ts_us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(prev_us.isNull() | ((ts_us - prev_us) > gap_us), 1).otherwise(0)
    sid = F.sum(is_new).over(w)  # running count of session starts
    return (df.withColumn("session_id", sid.cast("long"))
            .groupBy(user_col, "session_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
                 .alias("duration_us")))


def sessionize_pandas(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """applyInPandas twin of ``sessionize``: one Arrow batch per user,
    vectorized gap detection. Use this shape when the per-key logic stops
    being expressible as window expressions (model-based segmentation,
    complex state machines)."""
    gap_us = gap_minutes * 60_000_000

    def per_user(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(ts_col)
        # datetime64[ns] → epoch micros (int64 view is nanoseconds)
        ts = pdf[ts_col].astype("int64").to_numpy() // 1000
        new = np.ones(len(ts), dtype=np.int64)
        new[1:] = (ts[1:] - ts[:-1] > gap_us).astype(np.int64)
        sid = np.cumsum(new)
        out = pd.DataFrame({
            "user_id": pdf[user_col].to_numpy(),
            "session_id": sid,
            "ts_us": ts,
        })
        g = out.groupby("session_id", as_index=False).agg(
            user_id=("user_id", "first"),
            start_us=("ts_us", "min"),
            end_us=("ts_us", "max"),
            n_events=("ts_us", "size"))
        return pd.DataFrame({
            "user_id": g["user_id"],
            "session_id": g["session_id"],
            "session_start": pd.to_datetime(g["start_us"], unit="us"),
            "session_end": pd.to_datetime(g["end_us"], unit="us"),
            "n_events": g["n_events"].astype("int64"),
            "duration_us": (g["end_us"] - g["start_us"]).astype("int64"),
        })

    return df.select(user_col, ts_col).groupBy(user_col) \
             .applyInPandas(per_user, schema=SESSION_SCHEMA)
