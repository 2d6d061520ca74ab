"""Property-based tests (hypothesis) for the pure-Python Avro codec —
no Spark session needed; the spec-level invariants that back
``read_avro``'s fallback path."""

from __future__ import annotations

import io
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_olap_spark.sources import avro_codec as A

I64 = st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)


@given(I64)
def test_varint_zigzag_round_trip(n):
    out = io.BytesIO()
    A.write_long(out, n)
    r = A.Reader(out.getvalue())
    assert r.read_long() == n and r.at_end()


@given(st.lists(I64, max_size=20))
def test_varint_stream_round_trip(ns):
    out = io.BytesIO()
    for n in ns:
        A.write_long(out, n)
    r = A.Reader(out.getvalue())
    assert [r.read_long() for _ in ns] == ns and r.at_end()


_SCHEMA = json.dumps({"type": "record", "name": "r", "fields": [
    {"name": "id", "type": "long"},
    {"name": "flag", "type": "boolean"},
    {"name": "name", "type": ["null", "string"]},
    {"name": "score", "type": "double"},
    {"name": "blob", "type": "bytes"},
    {"name": "tags", "type": {"type": "array", "items": "long"}},
    {"name": "props", "type": {"type": "map", "values": "string"}},
]})

_REC = st.fixed_dictionaries({
    "id": I64,
    "flag": st.booleans(),
    "name": st.one_of(st.none(), st.text(max_size=40)),
    "score": st.floats(allow_nan=False),  # NaN != NaN breaks dict compare
    "blob": st.binary(max_size=40),
    "tags": st.lists(I64, max_size=8),
    "props": st.dictionaries(st.text(max_size=10), st.text(max_size=10),
                             max_size=5),
})


@settings(max_examples=60, deadline=None)
@given(st.lists(_REC, max_size=12), st.sampled_from(["null", "deflate"]))
def test_container_round_trip_property(recs, codec):
    buf = A.encode_container(_SCHEMA, recs, codec=codec, block_records=5)
    schema_json, it = A.decode_container(buf)
    assert list(it) == recs
    assert json.loads(schema_json) == json.loads(_SCHEMA)


@settings(max_examples=60, deadline=None)
@given(_REC)
def test_datum_round_trip_property(rec):
    assert A.decode_datum(_SCHEMA, A.encode_datum(_SCHEMA, rec)) == rec
