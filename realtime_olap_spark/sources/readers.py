"""Batch ingest readers (SURVEY.md §2.1).

Reference record readers: Avro (core/data/readers/AvroRecordReader.java:38),
CSV (CSVRecordReader.java:36), JSON (JSONRecordReader.java:37), and re-read
of built segments (PinotSegmentRecordReader.java:44). Thrift
(ThriftRecordReader.java:37) is out of scope (noted in SURVEY §2.1).

Spark-first: each maps to a declarative ``spark.read`` with an explicit
schema — schemas are declared, never inferred (Schema.java:61 semantics), so
a 100 TB read never pays an inference pass and malformed rows are culled by
the source, not downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType,
             header: bool = True, delimiter: str = ",") -> DataFrame:
    """CSV batch ingest; malformed rows dropped (reference readers skip
    unparseable records rather than failing the segment build)."""
    return (spark.read.schema(schema)
            .option("header", header)
            .option("delimiter", delimiter)
            .option("mode", "DROPMALFORMED")
            .csv(path))


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines batch ingest with declared schema."""
    return (spark.read.schema(schema)
            .option("mode", "DROPMALFORMED")
            .json(path))


def read_avro(spark: SparkSession, path: str,
              schema: StructType | None = None) -> DataFrame:
    """Avro batch ingest. Needs the spark-avro datasource package (not
    bundled with plain pyspark); raise a clear error instead of a cryptic
    ClassNotFound mid-job."""
    try:
        reader = spark.read.format("avro")
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(path)
    except Exception as exc:  # pragma: no cover - depends on jar presence
        raise NotImplementedError(
            "avro ingest needs the org.apache.spark:spark-avro package on "
            "the classpath (spark.jars.packages); not bundled here"
        ) from exc


def read_segments(spark: SparkSession, path: str) -> DataFrame:
    """Re-read previously built segments (PinotSegmentRecordReader analog)
    — the input side of merge/rollup/purge maintenance jobs."""
    return spark.read.parquet(path)
