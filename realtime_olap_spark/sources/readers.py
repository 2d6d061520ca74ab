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
    """Avro batch ingest (AvroRecordReader.java:38 analog).

    Prefers the ``spark-avro`` datasource jar (splits within files on sync
    markers). When the jar is absent — as in this sandbox — falls back to
    the pure-Python Object Container File decoder in ``avro_codec``:
    ``binaryFile`` source → ``mapInPandas``, one Arrow-batched task per
    container file (Avro's natural per-file parallelism; fine for the
    many-medium-files layout ingest pipelines produce). Schema comes from
    the declared ``schema`` or from the first file's header (a few-KB
    driver-side read, the same probe spark-avro does)."""
    try:
        reader = spark.read.format("avro")
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(path)
    except Exception as ex:
        # Fall back ONLY on the jar-absent datasource-lookup failure;
        # genuine errors when the jar IS present (bad path, schema
        # mismatch, corrupt file) must surface as themselves, not as a
        # confusing binaryFile/decode failure downstream.
        msg = str(ex)
        if ("FAILED_FIND_AVRO_SOURCE" in msg or "DATA_SOURCE_NOT_FOUND" in msg
                or ("Failed to find" in msg and "avro" in msg.lower())):
            return _read_avro_python(spark, path, schema)
        raise


def _read_avro_python(spark: SparkSession, path: str,
                      schema: StructType | None) -> DataFrame:
    import glob as _glob
    import os

    import pandas as pd

    from realtime_olap_spark.sources import avro_codec as A

    if schema is None:
        pattern = os.path.join(path, "*.avro") if os.path.isdir(path) else path
        matches = sorted(_glob.glob(pattern))
        if not matches:
            raise NotImplementedError(
                "spark-avro jar absent and no driver-readable file to infer "
                "the schema from — pass an explicit schema")
        with open(matches[0], "rb") as fh:
            head = fh.read(1 << 20)  # header is metadata + sync: a few KB
        schema_json, _, _, _ = A.read_container_header(head)
        schema = A.avro_to_spark_schema(schema_json)
    out_schema = schema
    names = [f.name for f in out_schema.fields]

    def decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                _, records = A.decode_container(bytes(content))
                rows = list(records)
                yield pd.DataFrame(
                    {n: [r.get(n) for r in rows] for n in names},
                    columns=names)

    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.avro").load(path)
            .select("content").mapInPandas(decode, schema=out_schema))


def read_segments(spark: SparkSession, path: str) -> DataFrame:
    """Re-read previously built segments (PinotSegmentRecordReader analog)
    — the input side of merge/rollup/purge maintenance jobs."""
    return spark.read.parquet(path)
