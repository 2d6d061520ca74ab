"""Maintenance jobs: merge-rollup, purge, retention (SURVEY.md §2.1, §2.10).

Reference background tasks (pinot-minion): MergeRollupSegmentConverter
(core/minion/rollup/MergeRollupSegmentConverter.java:42) rewrites segments
groupBy(dims).sum(metrics); SegmentPurger (core/minion/SegmentPurger.java:45)
rewrites segments minus purged rows; the controller retention manager
(pinot-controller/.../retention/) drops expired segments.

Spark-first: each is a declarative batch rewrite. At 100 TB these run
incrementally — one time partition at a time — so a rewrite touches only
the partitions named, never the whole table (dynamic partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_rollup(df: DataFrame, dims: list[str],
                 metrics: list[str]) -> DataFrame:
    """Merge-rollup: collapse rows with identical dimensions, summing
    metrics (MergeRollupSegmentConverter.java:42). One shuffle on the dims;
    partial aggregation makes the map side emit one row per group per
    partition before the exchange."""
    return df.groupBy(*dims).agg(*[F.sum(m).alias(m) for m in metrics])


def purge(df: DataFrame, predicate: Column) -> DataFrame:
    """Purge: drop rows matching the predicate (SegmentPurger.java:45 —
    e.g. GDPR deletes). The negated filter pushes down to the scan."""
    return df.where(~predicate)


def enforce_retention(df: DataFrame, time_column: str, cutoff) -> DataFrame:
    """Retention: keep only rows at/after the cutoff. With a time-
    partitioned layout (SegmentWriter) this prunes whole partitions at
    planning time — the segment-drop analog, no data read for expired
    partitions."""
    return df.where(F.col(time_column) >= F.lit(cutoff))


def compact(spark: SparkSession, src: str, dst: str, dims: list[str],
            metrics: list[str]) -> None:
    """End-to-end minion pass: read built segments, merge-rollup, rewrite
    (RealtimeSegmentConverter / minion task analog)."""
    merge_rollup(spark.read.parquet(src), dims, metrics) \
        .write.mode("overwrite").parquet(dst)
