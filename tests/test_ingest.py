"""Ingestion-layer tests: readers, record transformers, null sentinels,
segment sink layout, virtual columns, maintenance jobs (SURVEY.md §2.1)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StringType,
                               StructField, StructType)

from realtime_olap_spark.catalog import TABLES, Catalog, TableConfig
from realtime_olap_spark.sources import (CompoundTransformer,
                                         DataTypeTransformer,
                                         ExpressionTransformer,
                                         NullDefaultTransformer,
                                         SanitationTransformer, SegmentWriter,
                                         TimeTransformer, read_avro, read_csv,
                                         read_json,
                                         with_virtual_columns)
from realtime_olap_spark.sources.maintenance import (enforce_retention,
                                                     merge_rollup, purge)
from tests.conftest import SF_DIR

_SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("name", StringType()),
    StructField("v", DoubleType()),
])


def test_read_csv_schema_declared(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("k,name,v\n1,a,1.5\n2,b,2.5\nbad-row,,\n")
    df = read_csv(spark, str(p), _SCHEMA)
    assert df.schema == _SCHEMA
    assert df.where("k IS NOT NULL").count() == 2


def test_read_json_schema_declared(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"k": 1, "name": "a", "v": 1.5}\n{"k": 2, "name": "b", "v": 2.5}\n')
    df = read_json(spark, str(p), _SCHEMA)
    assert df.schema == _SCHEMA and df.count() == 2


def test_read_thrift_through_transformer_chain(spark, tmp_path):
    """The full reference ingest path for a Thrift data file: decode →
    NullDefaultTransformer — a record missing a field lands as the
    per-role SENTINEL in the final table, matching
    ThriftRecordReader+RecordReaderUtils end-to-end semantics."""
    from realtime_olap_spark.sources import read_thrift
    from realtime_olap_spark.sources import thrift_codec as TC

    recs = [
        [(1, TC.I64, 1), (2, TC.STRING, "a"), (3, TC.DOUBLE, 2.0)],
        [(1, TC.I64, 2)],                       # name + metric missing
    ]
    (tmp_path / "d.thrift").write_bytes(TC.encode_file(recs))
    schema = StructType([StructField("k", LongType()),
                         StructField("name", StringType()),
                         StructField("v", DoubleType())])
    raw = read_thrift(spark, str(tmp_path), schema,
                      {"k": 1, "name": 2, "v": 3})
    cfg = TableConfig("t", dimensions=("k", "name"), metrics=("v",))
    out = {r["k"]: r for r in NullDefaultTransformer(cfg)(raw).collect()}
    assert out[1]["name"] == "a" and out[1]["v"] == 2.0
    assert out[2]["name"] == "null"             # dimension sentinel
    assert out[2]["v"] == 0.0                   # metric sentinel


def test_expression_transformer(spark):
    df = spark.createDataFrame([Row(a=2, b=3)])
    out = ExpressionTransformer({"c": "a * b + 1"})(df)
    assert out.collect()[0]["c"] == 7


def test_time_transformer_coarsen_and_refine(spark):
    df = spark.createDataFrame([Row(t=90_061_000)])  # ms: 1d 1h 1m 1s
    days = TimeTransformer("t", "MILLISECONDS", "DAYS")(df).collect()[0]["t"]
    assert days == 1  # floor
    back = TimeTransformer("t", "DAYS", "MILLISECONDS")(
        spark.createDataFrame([Row(t=1)])).collect()[0]["t"]
    assert back == 86_400_000


def test_datatype_transformer_mv_wrap(spark):
    df = spark.createDataFrame([Row(x="7")])
    out = DataTypeTransformer({"x": "long"}, multi_value=("x",))(df)
    assert isinstance(out.schema["x"].dataType, ArrayType)
    assert out.collect()[0]["x"] == [7]


def test_sanitation_truncates_and_strips(spark):
    df = spark.createDataFrame([Row(s="a\x00b" + "x" * 600)])
    out = SanitationTransformer(("s",), max_length=512)(df).collect()[0]["s"]
    assert "\x00" not in out and len(out) == 512 and out.startswith("ab")


def test_null_defaults_reference_sentinels(spark):
    cfg = TableConfig("t", dimensions=("d", "s"), metrics=("m",))
    df = spark.createDataFrame(
        [Row(d=1, s="x", m=2.0), Row(d=None, s=None, m=None)],
        schema=StructType([StructField("d", LongType()),
                           StructField("s", StringType()),
                           StructField("m", DoubleType())]))
    row = NullDefaultTransformer(cfg)(df).where("d < 0").collect()[0]
    assert row["d"] == -9223372036854775808  # Long.MIN_VALUE
    assert row["s"] == "null"
    assert row["m"] == 0.0


def test_compound_transformer_order(spark):
    cfg = TableConfig("t", dimensions=("name",), metrics=("v",),
                      time_column="t", time_unit="DAYS")
    tf = CompoundTransformer.for_table(
        cfg, expressions={"v": "v * 2"}, incoming_time_unit="MILLISECONDS",
        types={"v": "double"}, string_columns=("name",))
    df = spark.createDataFrame([Row(name="n", v=10, t=86_400_000)])
    row = tf(df).collect()[0]
    assert row["v"] == 20.0 and row["t"] == 1


def test_segment_writer_layout_and_pruning(spark, tmp_path):
    path = str(tmp_path / "events_seg")
    events = Catalog(spark, SF_DIR).table("events").drop("ts_ns")
    cfg = TableConfig("events", dimensions=("event_id", "user_id", "event_type"),
                      metrics=("value",), time_column="ts", time_unit="DAYS",
                      sorted_column="event_type")
    SegmentWriter(cfg, bloom_columns=("user_id",)).write(events, path)

    back = spark.read.parquet(path)
    assert back.count() == events.count()
    # partition pruning: a one-day filter must prune the file listing
    plan = (back.where(F.col("__ts_bucket") == "2024-01-01")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan
    # predicate pushdown on the sorted column reaches the scan
    plan2 = (back.where(F.col("event_type") == "click")
             ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)" in plan2


def test_virtual_columns(spark):
    df = with_virtual_columns(Catalog(spark, SF_DIR).table("events").drop("ts_ns"))
    row = df.select("$docId", "$segmentName", "$hostName").limit(1).collect()[0]
    assert row["$segmentName"].endswith(".parquet")
    assert df.select("$docId").distinct().count() == df.count()


def test_merge_rollup_matches_direct_agg(spark):
    events = Catalog(spark, SF_DIR).table("events").drop("ts_ns")
    rolled = merge_rollup(events, ["event_type"], ["value"])
    want = {r["event_type"]: r["s"] for r in
            events.groupBy("event_type").agg(F.sum("value").alias("s")).collect()}
    got = {r["event_type"]: r["value"] for r in rolled.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_purge_and_retention(spark):
    events = Catalog(spark, SF_DIR).table("events").drop("ts_ns")
    n = events.count()
    n_err = events.where("event_type = 'error'").count()
    assert purge(events, F.col("event_type") == "error").count() == n - n_err
    cut = dt.datetime(2024, 1, 2)
    kept = enforce_retention(events, "ts", cut).count()
    assert kept == events.where(F.col("ts") >= F.lit(cut)).count()
    assert 0 < kept < n


def test_catalog_has_all_driver_tables():
    assert set(TABLES) == {"region", "nation", "customer", "supplier", "part",
                           "orders", "lineitem", "events", "documents",
                           "embeddings"}


# ---------------------------------------------------------------------------
# Avro: pure-Python Object Container File path (jar absent in this sandbox)
# ---------------------------------------------------------------------------

def _golden_avro_bytes() -> bytes:
    """A container file written BYTE BY HAND from the public Avro spec —
    pins the decoder independently of our own encoder (a shared varint bug
    would survive a bare round-trip)."""
    schema = b'{"type":"record","name":"g","fields":[{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
    sync = b"0123456789abcdef"
    out = bytearray()
    out += b"Obj\x01"                                   # magic
    out += b"\x04"                                      # meta map: 2 entries
    out += b"\x16" + b"avro.schema"                     # key (len 11 -> zz 22=0x16)
    assert len(schema) == 95                            # zz 190 -> varint be 01
    out += b"\xbe\x01" + schema
    out += b"\x14" + b"avro.codec"                      # key (len 10 -> zz 20)
    out += b"\x08" + b"null"                            # value "null"
    out += b"\x00"                                      # end of map
    out += sync
    payload = b"\x06\x04hi" + b"\x01\x00"               # (3,"hi"), (-1,"")
    out += b"\x04"                                      # block: 2 records
    out += bytes([len(payload) << 1]) + payload
    out += sync
    return bytes(out)


def test_avro_golden_bytes_decode(spark, tmp_path):
    p = tmp_path / "golden.avro"
    p.write_bytes(_golden_avro_bytes())
    df = read_avro(spark, str(p))
    assert df.schema.simpleString() == "struct<a:bigint,b:string>"
    assert [tuple(r) for r in df.orderBy("a").collect()] == [(-1, ""), (3, "hi")]


def test_avro_container_round_trip_nested_deflate(spark, tmp_path):
    import json as _json

    from realtime_olap_spark.sources import avro_codec as A

    schema = _json.dumps({"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "kind", "type": {"type": "enum", "name": "K",
                                  "symbols": ["A", "B"]}}]})
    recs = [
        {"id": 1, "name": "x", "score": 1.5, "tags": ["a", "b"], "kind": "A"},
        {"id": -7, "name": None, "score": -0.25, "tags": [], "kind": "B"},
        {"id": 2 ** 40, "name": "y", "score": 0.0, "tags": ["z"], "kind": "A"},
    ]
    # two files -> two mapInPandas tasks (the per-file parallelism unit)
    (tmp_path / "p1.avro").write_bytes(A.encode_container(schema, recs[:2],
                                                          codec="deflate"))
    (tmp_path / "p2.avro").write_bytes(A.encode_container(schema, recs[2:],
                                                          codec="deflate"))
    df = read_avro(spark, str(tmp_path))
    got = sorted([r.asDict() for r in df.collect()], key=lambda d: d["id"])
    want = sorted(recs, key=lambda d: d["id"])
    assert got == want


def test_avro_stream_decode_python_fallback(spark):
    """decode_avro_stream must decode raw datums (Kafka message-body shape)
    through the pure-Python path when the jar is absent."""
    import json as _json

    from realtime_olap_spark.sources import avro_codec as A
    from realtime_olap_spark.streaming import decode_avro_stream

    schema = _json.dumps({"type": "record", "name": "m", "fields": [
        {"name": "k", "type": "string"}, {"name": "v", "type": "long"}]})
    payloads = [(A.encode_datum(schema, {"k": "a", "v": 1}),),
                (A.encode_datum(schema, {"k": "b", "v": -3}),)]
    src = spark.createDataFrame(payloads, "value binary")
    got = sorted([tuple(r) for r in decode_avro_stream(src, schema).collect()])
    assert got == [("a", 1), ("b", -3)]


# ---------------------------------------------------------------------------
# Bucketed segments: co-located (shuffle-free) joins
# ---------------------------------------------------------------------------

def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed the same way on the join key must join with NO
    Exchange in the executed plan — the write-time co-location strategy for
    100 TB fact-to-fact joins."""
    from realtime_olap_spark.sources import write_bucketed

    li = (Catalog(spark, SF_DIR).table("lineitem")
          .select("l_orderkey", "l_quantity"))
    orders = (Catalog(spark, SF_DIR).table("orders")
              .select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"))
    write_bucketed(li, "li_bucketed", str(tmp_path / "li"),
                   ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(orders, "ord_bucketed", str(tmp_path / "ord"),
                   ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("li_bucketed")
             .join(spark.table("ord_bucketed"), "l_orderkey"))
        n = j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    assert "Exchange" not in plan, plan
    want = li.join(orders, "l_orderkey").count()
    assert n == want and n > 0


def test_segment_metadata_table(spark, tmp_path):
    """SegmentMetadata analog: one row per segment file with docs, bytes,
    and the time range segment pruning relies on."""
    from realtime_olap_spark.sources.maintenance import segment_metadata

    events = Catalog(spark, SF_DIR).table("events").drop("ts_ns")
    cfg = TableConfig("events", dimensions=("event_id",), metrics=("value",),
                      time_column="ts", time_unit="DAYS")
    SegmentWriter(cfg).write(events, str(tmp_path / "seg"))

    meta = segment_metadata(spark, str(tmp_path / "seg"), "ts").collect()
    assert len(meta) > 1  # one row per (day-partitioned) segment file
    assert sum(r["total_docs"] for r in meta) == events.count()
    for r in meta:
        assert r["segment"].endswith(".parquet")
        assert r["size_bytes"] > 0
        assert r["start_time"] <= r["end_time"]
    lo = min(r["start_time"] for r in meta)
    hi = max(r["end_time"] for r in meta)
    want = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert (lo, hi) == (want[0], want[1])


SCHEMA_JSON = """{
  "schemaName": "clicks",
  "dimensionFieldSpecs": [
    {"name": "site", "dataType": "STRING", "defaultNullValue": "missing"},
    {"name": "tags", "dataType": "STRING", "singleValueField": false},
    {"name": "user_id", "dataType": "LONG"}
  ],
  "metricFieldSpecs": [
    {"name": "clicks", "dataType": "LONG"},
    {"name": "spend", "dataType": "DOUBLE", "defaultNullValue": -1.0}
  ],
  "timeFieldSpec": {
    "incomingGranularitySpec":
      {"name": "daysSinceEpoch", "dataType": "LONG", "timeType": "DAYS"}
  }
}"""


def test_tableconfig_from_json_roundtrip(tmp_path):
    """Pinot-style schema JSON loader (Schema.java:61; schemaTest.schema
    shape): roles, MV flags, defaultNullValue overrides, time spec — from
    a string, a dict, and a file; to_json() round-trips."""
    import json

    from realtime_olap_spark.catalog import TableConfig

    cfg = TableConfig.from_json(SCHEMA_JSON)
    assert cfg.name == "clicks"
    assert cfg.dimensions == ("site", "tags", "user_id")
    assert cfg.metrics == ("clicks", "spend")
    assert cfg.multi_value == ("tags",)
    assert cfg.time_column == "daysSinceEpoch" and cfg.time_unit == "DAYS"
    assert dict(cfg.null_value_overrides) == {"site": "missing", "spend": -1.0}

    assert TableConfig.from_json(json.loads(SCHEMA_JSON)) == cfg
    p = tmp_path / "clicks.schema"
    p.write_text(SCHEMA_JSON)
    assert TableConfig.from_json(str(p)) == cfg
    assert TableConfig.from_json(cfg.to_json()) == cfg


def test_tableconfig_from_json_validation():
    import pytest

    from realtime_olap_spark.catalog import TableConfig

    base = {"schemaName": "t",
            "dimensionFieldSpecs": [{"name": "a", "dataType": "STRING"}]}
    with pytest.raises(ValueError, match="schemaName"):
        TableConfig.from_json({})
    with pytest.raises(ValueError, match="invalid dataType"):
        TableConfig.from_json({**base, "dimensionFieldSpecs":
                               [{"name": "a", "dataType": "UUID"}]})
    with pytest.raises(ValueError, match="duplicate column"):
        TableConfig.from_json({**base, "metricFieldSpecs":
                               [{"name": "a", "dataType": "LONG"}]})
    with pytest.raises(ValueError, match="single-value"):
        TableConfig.from_json({**base, "metricFieldSpecs":
                               [{"name": "m", "dataType": "LONG",
                                 "singleValueField": False}]})
    with pytest.raises(ValueError, match="invalid timeType"):
        TableConfig.from_json({**base, "timeFieldSpec": {
            "incomingGranularitySpec": {"name": "t2", "dataType": "LONG",
                                        "timeType": "FORTNIGHTS"}}})


def test_null_default_override_applied_at_ingest(spark):
    """defaultNullValue from the schema JSON wins over the role sentinel
    in the ingest null-fill."""
    from realtime_olap_spark.catalog import TableConfig
    from realtime_olap_spark.sources.transformers import NullDefaultTransformer

    cfg = TableConfig.from_json(SCHEMA_JSON)
    df = spark.createDataFrame(
        [("s1", 1, 2, 0.5), (None, None, None, None)],
        "site string, user_id long, clicks long, spend double")
    out = {r["site"]: r for r in NullDefaultTransformer(cfg)(df).collect()}
    filled = out["missing"]          # override, not the 'null' sentinel
    assert filled["spend"] == -1.0   # override, not metric-0
    assert filled["clicks"] == 0     # role sentinel still applies
    assert filled["user_id"] == -9223372036854775808
