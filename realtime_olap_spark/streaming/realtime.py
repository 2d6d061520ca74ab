"""Realtime (streaming) tables and hybrid stitching.

Reference model (SURVEY.md §1.1/§2.10):

- A REALTIME table consumes a stream per partition with offset management,
  building in-memory mutable segments that serve queries while consuming
  (core/realtime/impl/kafka/KafkaPartitionLevelConsumer.java:38,
  core/indexsegment/mutable/MutableSegmentImpl.java:61); segments are
  committed to immutable storage via a controller-coordinated protocol
  (LLRealtimeSegmentDataManager.java:82-127).
- Spark: Structured Streaming owns offsets + checkpoints (the LLC commit
  protocol, exactly-once into a file sink); the parquet files the sink
  commits are the immutable segments; the in-flight micro-batch is the
  consuming segment.
- Optional ``aggregateMetrics`` pre-rollup — sum metrics for identical
  dimension rows at ingest (MutableSegmentImpl.java:88) — is a streaming
  groupBy in update mode.
- A HYBRID table answers queries from OFFLINE ≤ time boundary and REALTIME >
  boundary so overlapping data is read exactly once
  (pinot-broker/.../BaseBrokerRequestHandler.java:376-420,
  docs/architecture.rst:63-76).

Tests drive this with a file source + ``availableNow`` trigger (synchronous
drain); production swaps in ``spark.readStream.format("kafka")`` with the
same downstream graph — the source is the only line that changes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_olap_spark.operators.aggregation import DEC

_UNIT_MS = {"MILLISECONDS": 1, "SECONDS": 1000, "MINUTES": 60_000,
            "HOURS": 3_600_000, "DAYS": 86_400_000}


@dataclass
class RealtimeIngest:
    """A realtime table ingest job: stream source → (optional rollup) →
    exactly-once parquet segments.

    ``source`` is any streaming DataFrame (kafka, file, rate); checkpointing
    gives the reference's offset-management + segment-commit semantics for
    free (SegmentCompletionProtocol analog is the sink's commit log).
    """

    spark: SparkSession
    checkpoint_dir: str
    sink_dir: str

    def start_append(self, source: DataFrame, partition_by: tuple[str, ...] = ()):
        """Raw append ingest — every input row becomes a stored row
        (the reference's default, no aggregateMetrics)."""
        w = (source.writeStream.format("parquet")
             .option("checkpointLocation", self.checkpoint_dir)
             .option("path", self.sink_dir)
             .outputMode("append")
             .trigger(availableNow=True))
        if partition_by:
            w = w.partitionBy(*partition_by)
        return w.start()

    def start_rollup(self, source: DataFrame, dims: list[str],
                     metrics: list[str]):
        """aggregateMetrics ingest-rollup (MutableSegmentImpl.java:88): sum
        metrics for identical dimension rows. foreachBatch merges each
        micro-batch's partial aggregate into the sink by re-aggregating the
        union — idempotent under replay because the checkpoint serializes
        batch ids (exactly-once)."""
        sink, spark = self.sink_dir, self.spark
        aggs = [F.sum(F.col(m).cast(DEC)).cast("double").alias(m) for m in metrics]

        def merge(batch: DataFrame, batch_id: int) -> None:
            part = batch.groupBy(*dims).agg(*aggs)
            try:
                existing = spark.read.parquet(sink)
                part = existing.unionByName(part).groupBy(*dims).agg(*aggs)
            except Exception:
                pass  # first batch: no sink yet
            part.write.mode("overwrite").parquet(sink + ".tmp")
            spark.read.parquet(sink + ".tmp").write.mode("overwrite").parquet(sink)

        return (source.writeStream
                .foreachBatch(merge)
                .option("checkpointLocation", self.checkpoint_dir)
                .trigger(availableNow=True)
                .start())


def time_boundary(offline: DataFrame, time_col: str,
                  granularity: str = "DAYS"):
    """The hybrid time boundary: max offline time minus one granularity unit
    (BaseBrokerRequestHandler.java:376-420 — offline data at the boundary
    bucket may be incomplete, so the last unit is served by realtime)."""
    row = offline.agg(F.max(time_col).alias("mx")).collect()[0]
    mx = row["mx"]
    if mx is None:
        return None
    unit_ms = _UNIT_MS[granularity.upper()]
    if hasattr(mx, "timestamp"):  # timestamp column
        from datetime import timedelta
        return mx - timedelta(milliseconds=unit_ms)
    return mx - unit_ms  # numeric epoch column


def hybrid_table(offline: DataFrame, realtime: DataFrame, time_col: str,
                 boundary=None, granularity: str = "DAYS") -> DataFrame:
    """The hybrid view: offline rows at/below the boundary, realtime rows
    above it — a unionByName, never a join (SURVEY.md §2.3). Both sides keep
    their partition pruning: the time filter lands on each scan."""
    if boundary is None:
        boundary = time_boundary(offline, time_col, granularity)
    if boundary is None:
        return realtime
    cols = offline.columns
    return (offline.where(F.col(time_col) <= F.lit(boundary))
            .unionByName(realtime.where(F.col(time_col) > F.lit(boundary))
                         .select(*cols)))


def windowed_rollup(source: DataFrame, time_col: str, dims: list[str],
                    metrics: list[str], window_duration: str = "1 hour",
                    watermark_delay: str = "10 minutes") -> DataFrame:
    """Event-time tumbling-window rollup with a watermark — the late-data
    policy the reference lacks entirely (SURVEY.md §2.10: rows are appended
    as they arrive; 'window' queries are just time filters).

    Streaming semantics: state per (window, dims) is dropped once the
    watermark passes the window end, so rows later than ``watermark_delay``
    are discarded instead of growing state forever — the knob that keeps a
    100 TB/day stream's state bounded. Works identically on a batch
    DataFrame (no watermark applied) for differential testing.
    """
    out = source
    if source.isStreaming:
        out = out.withWatermark(time_col, watermark_delay)
    aggs = [F.sum(F.col(m).cast(DEC)).cast("double").alias(m) for m in metrics]
    return (out.groupBy(F.window(F.col(time_col), window_duration).alias("win"),
                        *dims)
            .agg(*aggs)
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"), *dims, *metrics))
