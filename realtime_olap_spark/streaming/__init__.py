"""Realtime ingest (Structured Streaming) and hybrid table stitching."""

from realtime_olap_spark.streaming.realtime import (
    RealtimeIngest,
    hybrid_table,
    time_boundary,
)

__all__ = ["RealtimeIngest", "hybrid_table", "time_boundary"]
