"""Pure-Python Thrift ``TBinaryProtocol`` codec for batch ingest.

Closes the last declared SURVEY §2.1 gap: the reference ingests data files
that are a back-to-back stream of TBinaryProtocol-serialized structs of one
generated Thrift class (``core/data/readers/ThriftRecordReader.java:37``).
There is no framing and no file header — EOF is the only terminator
(``ThriftRecordReader.hasNext`` peeks one byte). Schema columns map to
struct members through the class's thrift FIELD IDS (``fieldForId``
introspection, ``ThriftRecordReader.java:66-75``); single-value columns are
parsed from the thrift value's string form and multi-value columns come
from thrift list/set containers (``RecordReaderUtils.java:63-142``).

This module is a clean-room implementation of the PUBLIC Apache Thrift
binary wire protocol (thrift.apache.org — TBinaryProtocol): structs decode
to ``{field_id: value}`` dicts, so a declared ``name -> field id`` mapping
replaces the generated class's introspection (there are no generated
classes here, by design — the mapping is table metadata, like the schema
JSON). The encoder exists for tests and for writing spec-true fixture
files; the decoder is what ingest uses (``readers.read_thrift``).

Wire format (all integers big-endian):

- struct: repeated fields, each ``byte ttype, i16 field-id, value``;
  terminated by a single STOP (0x00) byte. No begin marker.
- BOOL = 1 byte (0/1); BYTE = 1; DOUBLE = 8 (IEEE-754 bits); I16/I32/I64 =
  2/4/8; STRING/BINARY = i32 length + raw bytes; LIST/SET = ``byte
  elem-type, i32 count, elements``; MAP = ``byte key-type, byte val-type,
  i32 count, pairs``; STRUCT nests recursively.
"""

from __future__ import annotations

import io
import struct
from collections.abc import Iterator
from typing import Any

# TType constants (public thrift protocol ids)
STOP = 0
VOID = 1
BOOL = 2
BYTE = 3
DOUBLE = 4
I16 = 6
I32 = 8
I64 = 10
STRING = 11  # also BINARY on the wire
STRUCT = 12
MAP = 13
SET = 14
LIST = 15

_FIXED = {BOOL: ">b", BYTE: ">b", DOUBLE: ">d", I16: ">h", I32: ">i", I64: ">q"}


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

class ThriftReader:
    """Cursor over one data file's bytes."""

    def __init__(self, buf: bytes):
        self._buf = buf
        self._pos = 0

    def _unpack(self, fmt: str) -> Any:
        # bounds-checked like _take, so truncation INSIDE a fixed-width
        # value raises the codec's documented ValueError, not a bare
        # struct.error callers catching ValueError would miss (advice r6)
        n = struct.calcsize(fmt)
        if self._pos + n > len(self._buf):
            raise ValueError("truncated thrift data")
        v = struct.unpack_from(fmt, self._buf, self._pos)[0]
        self._pos += n
        return v

    def _take(self, n: int) -> bytes:
        if n < 0 or self._pos + n > len(self._buf):
            raise ValueError("truncated thrift data")
        b = self._buf[self._pos:self._pos + n]
        self._pos += n
        return b

    def at_end(self) -> bool:
        return self._pos >= len(self._buf)

    def read_value(self, ttype: int) -> Any:
        if ttype in _FIXED:
            v = self._unpack(_FIXED[ttype])
            return bool(v) if ttype == BOOL else v
        if ttype == STRING:
            n = self._unpack(">i")
            raw = self._take(n)
            # Generated classes expose `string` as str; true `binary`
            # members surface as bytes. The protocol can't tell them
            # apart, so decode UTF-8 when valid (the reference's
            # toString() path only ever sees string members anyway).
            try:
                return raw.decode("utf-8")
            except UnicodeDecodeError:
                return raw
        if ttype == STRUCT:
            return self.read_struct()
        if ttype in (LIST, SET):
            et = self._unpack(">b")
            n = self._unpack(">i")
            return [self.read_value(et) for _ in range(n)]
        if ttype == MAP:
            kt = self._unpack(">b")
            vt = self._unpack(">b")
            n = self._unpack(">i")
            return {self.read_value(kt): self.read_value(vt) for _ in range(n)}
        raise ValueError(f"unsupported thrift type id {ttype}")

    def read_struct(self) -> dict[int, Any]:
        """One struct -> {field_id: value} (nested structs recurse)."""
        out: dict[int, Any] = {}
        while True:
            ttype = self._unpack(">b")
            if ttype == STOP:
                return out
            fid = self._unpack(">h")
            out[fid] = self.read_value(ttype)


def iter_structs(buf: bytes) -> Iterator[dict[int, Any]]:
    """All structs in a data file, in order (EOF-terminated stream —
    ``ThriftRecordReader.hasNext`` semantics)."""
    r = ThriftReader(buf)
    while not r.at_end():
        yield r.read_struct()


# ---------------------------------------------------------------------------
# Encode (tests + fixture generation)
# ---------------------------------------------------------------------------

def write_value(out: io.BytesIO, ttype: int, v: Any) -> None:
    if ttype in _FIXED:
        out.write(struct.pack(_FIXED[ttype], int(v) if ttype == BOOL else v))
    elif ttype == STRING:
        raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        out.write(struct.pack(">i", len(raw)))
        out.write(raw)
    elif ttype == STRUCT:
        write_struct(out, v)
    elif ttype in (LIST, SET):
        et, items = v  # (element ttype, sequence)
        out.write(struct.pack(">bi", et, len(items)))
        for item in items:
            write_value(out, et, item)
    elif ttype == MAP:
        kt, vt, pairs = v  # (key ttype, val ttype, dict)
        out.write(struct.pack(">bbi", kt, vt, len(pairs)))
        for k, val in pairs.items():
            write_value(out, kt, k)
            write_value(out, vt, val)
    else:
        raise ValueError(f"unsupported thrift type id {ttype}")


def write_struct(out: io.BytesIO, fields: list[tuple[int, int, Any]]) -> None:
    """``fields`` = [(field_id, ttype, value), ...]; nested struct values
    are themselves such lists."""
    for fid, ttype, v in fields:
        out.write(struct.pack(">bh", ttype, fid))
        write_value(out, ttype, v)
    out.write(struct.pack(">b", STOP))


def encode_file(records: list[list[tuple[int, int, Any]]]) -> bytes:
    """Back-to-back structs — the reference's on-disk data-file layout."""
    out = io.BytesIO()
    for rec in records:
        write_struct(out, rec)
    return out.getvalue()
