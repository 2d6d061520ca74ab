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


def segment_metadata(spark: SparkSession, path: str,
                     time_column: str | None = None) -> DataFrame:
    """Per-segment metadata table — the SegmentMetadata / controller
    ``GET /segments/{table}/{segment}/metadata`` analog: one row per
    parquet file (= segment) with its doc count, byte size, and the time
    range of ``time_column`` (segment pruning uses exactly this range —
    SegmentPrunerService, §4.2).

    Pure aggregation over `input_file_name()` — one scan of only the time
    column, no shuffle beyond one hash agg keyed by ~thousands of files.
    """
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("total_docs")]
    if time_column is not None:
        aggs += [F.min(time_column).alias("start_time"),
                 F.max(time_column).alias("end_time")]
    # normalize "file:///x" vs "file:/x" URI spellings so the two sources
    # join on the same key
    def norm(c: Column) -> Column:
        return F.regexp_replace(c, "^file:/+", "/")

    cols = [time_column] if time_column is not None else []
    per_file = (df.select(*cols, norm(F.input_file_name()).alias("segment"))
                .groupBy("segment").agg(*aggs))
    # binaryFile prunes `content` when unprojected — this reads listings,
    # not payloads; recursive for time-partitioned layouts
    sizes = spark.read.format("binaryFile") \
        .option("pathGlobFilter", "*.parquet") \
        .option("recursiveFileLookup", "true").load(path) \
        .select(norm(F.col("path")).alias("segment"),
                F.col("length").alias("size_bytes"))
    return per_file.join(sizes, "segment", "left")
