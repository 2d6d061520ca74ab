"""Ingestion: batch readers, record transformers, segment sink, maintenance
jobs (SURVEY.md §2.1)."""

from realtime_olap_spark.sources.media import (media_dir_dedup_decisions,
                                               media_dir_inventory,
                                               media_dir_near_dups,
                                               media_near_dups_from_files,
                                               media_signature_coverage,
                                               read_media_dir)
from realtime_olap_spark.sources.readers import (read_avro, read_csv,
                                                 read_json, read_segments,
                                                 read_thrift)
from realtime_olap_spark.sources.segments import (SegmentWriter, write_bucketed,
                                                  with_virtual_columns)
from realtime_olap_spark.sources.transformers import (CompoundTransformer,
                                                      DataTypeTransformer,
                                                      ExpressionTransformer,
                                                      NullDefaultTransformer,
                                                      SanitationTransformer,
                                                      TimeTransformer)

__all__ = [
    "read_avro", "read_csv", "read_json", "read_segments", "read_thrift",
    "read_media_dir", "media_dir_inventory", "media_dir_near_dups",
    "media_dir_dedup_decisions", "media_near_dups_from_files",
    "media_signature_coverage",
    "SegmentWriter", "with_virtual_columns", "write_bucketed",
    "CompoundTransformer", "DataTypeTransformer", "ExpressionTransformer",
    "NullDefaultTransformer", "SanitationTransformer", "TimeTransformer",
]
