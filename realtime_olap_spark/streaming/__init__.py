"""Realtime ingest (Structured Streaming) and hybrid table stitching."""

from realtime_olap_spark.streaming.realtime import (
    RealtimeIngest,
    decode_avro_stream,
    decode_json_stream,
    hybrid_table,
    time_boundary,
)

__all__ = ["RealtimeIngest", "decode_avro_stream", "decode_json_stream",
           "hybrid_table", "time_boundary"]
