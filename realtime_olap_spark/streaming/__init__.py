"""Realtime ingest (Structured Streaming) and hybrid table stitching."""

from realtime_olap_spark.streaming.realtime import (
    RealtimeIngest,
    decode_avro_stream,
    decode_json_stream,
    hybrid_table,
    realtime_segments_table,
    refresh_segments,
    kafka_source_options,
    read_kafka_stream,
    time_boundary,
)
from realtime_olap_spark.streaming.joins import stream_range_join
from realtime_olap_spark.streaming.media_dedup import (
    MediaNearDupIngest,
    media_near_dup_pairs_against,
)
from realtime_olap_spark.streaming.sessions import sessionize_stream

__all__ = ["MediaNearDupIngest", "RealtimeIngest", "decode_avro_stream",
           "decode_json_stream", "hybrid_table", "kafka_source_options",
           "media_near_dup_pairs_against", "read_kafka_stream",
           "realtime_segments_table", "refresh_segments",
           "sessionize_stream", "stream_range_join", "time_boundary"]
