"""Batch ingest readers (SURVEY.md §2.1).

Reference record readers: Avro (core/data/readers/AvroRecordReader.java:38),
CSV (CSVRecordReader.java:36), JSON (JSONRecordReader.java:37), Thrift
(ThriftRecordReader.java:37 — ``read_thrift`` + the pure-Python
TBinaryProtocol codec in ``thrift_codec``), and re-read of built segments
(PinotSegmentRecordReader.java:44).

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


def read_thrift(spark: SparkSession, path: str, schema: StructType,
                field_ids: dict[str, int],
                glob: str = "*.thrift") -> DataFrame:
    """Thrift batch ingest (ThriftRecordReader.java:37 analog) — closes the
    last SURVEY §2.1 source: data files that are back-to-back
    TBinaryProtocol structs, decoded by the clean-room pure-Python codec in
    ``thrift_codec`` (public Apache Thrift wire format).

    ``field_ids`` maps schema column name -> thrift field id — the declared
    stand-in for the generated class's ``fieldForId`` introspection
    (``ThriftRecordReader.java:66-75``); there are no generated classes
    here, so the mapping is table metadata like the schema JSON. Columns
    whose field id is absent from a record decode as NULL (sentinels are
    the ``NullDefaultTransformer``'s job, as for every reader — documented
    deviation #4); multi-value (ArrayType) columns read thrift list/set
    containers, and an EMPTY container decodes to ``[NULL]`` so the
    sentinel fill reproduces the reference's one-element ``[default]``
    (``RecordReaderUtils.java:101-120``). Single-value conversions follow
    ``RecordReaderUtils.convertToDataType``: numeric parse per declared
    type, empty string -> NULL.

    Scale shape: ``binaryFile`` source -> ``mapInPandas``, one
    Arrow-batched task per data file — thrift's unframed stream has no
    split points, so per-file parallelism is the protocol's natural (and
    only) unit, exactly as in the reference's one-reader-per-file segment
    build."""
    import pandas as pd

    from realtime_olap_spark.sources import thrift_codec as TC

    fields = [(f.name, field_ids.get(f.name), f.dataType) for f in schema.fields]

    def conv_sv(v, dt):
        if v is None:
            return None
        t = dt.typeName()
        if t == "boolean":
            return v if isinstance(v, bool) else str(v).lower() == "true"
        if t in ("integer", "long", "short", "byte"):
            return int(v)
        if t in ("float", "double"):
            return float(v)
        if t == "binary":
            return v if isinstance(v, (bytes, bytearray)) else str(v).encode()
        # thrift STRING values that are not valid UTF-8 surface from the
        # codec as bytes: decode with replacement instead of leaking the
        # Python repr "b'..'" into a string column (advice r6)
        if isinstance(v, (bytes, bytearray)):
            s = bytes(v).decode("utf-8", errors="replace")
        else:
            s = str(v)
        return s if s != "" else None

    def conv(v, dt):
        if dt.typeName() == "array":
            if v is None:
                return None
            if isinstance(v, dict):  # thrift map: not a reference MV source
                return None
            if len(v) == 0:
                return [None]
            return [conv_sv(x, dt.elementType) for x in v]
        return conv_sv(v, dt)

    def decode(batches):
        for pdf in batches:
            for content in pdf["content"]:
                rows = list(TC.iter_structs(bytes(content)))
                yield pd.DataFrame(
                    {n: pd.Series([conv(r.get(fid), dt) for r in rows],
                                  dtype=object)
                     for n, fid, dt in fields},
                    columns=[n for n, _, _ in fields])

    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", glob).load(path)
            .select("content").mapInPandas(decode, schema=schema))


def read_segments(spark: SparkSession, path: str) -> DataFrame:
    """Re-read previously built segments (PinotSegmentRecordReader analog)
    — the input side of merge/rollup/purge maintenance jobs."""
    return spark.read.parquet(path)
