"""Tagged FLAC / Ogg goldens (r15 verdict directive #4): committed
fixtures whose Vorbis-comment walks are pinned end-to-end through the
media-dir inventory, not just parser-direct on transient bytes.

A REAL FOSS-encoder golden (flac/oggenc output) is not obtainable in
this container — no encoder binaries, no tagged sample files anywhere
on the filesystem (searched) — so these are spec-assembled
(RFC 9639 FLAC block layout, RFC 3533 Ogg pages with true CRCs, the
public Vorbis I / OpusHead+OpusTags header layouts), byte-pinned by
the assembler-equality tests below, the same discipline as
`variant-mjpeg.avi` / `probe.webm`. The decision is recorded in
COVERAGE.md; re-pin against real encoder output in any environment
that has one.

- `tagged.flac`: the spec-assembled pluck clip with a VORBIS_COMMENT
  block spliced between STREAMINFO and the audio — decodes
  BIT-IDENTICALLY to `pluck-pcm16.flac` (tags must never perturb
  samples).
- `tagged-vorbis.ogg`: Vorbis ident + a comment header SPANNING two
  pages (255-byte lacing continuation — the r14 bounded multi-page
  reassembly exercised by a committed fixture) + a granule-bearing
  final page for the duration probe.
- `tagged-opus.ogg`: OpusHead (pre-skip 312) + OpusTags + final
  granule page — the 48 kHz-minus-pre-skip duration rule.
"""

from __future__ import annotations

import os
import struct
import zlib

from realtime_olap_spark.operators import multimodal as M

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _fix(name):
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


# ---------------------------------------------------------------------------
# Assemblers (deterministic: fixtures are byte-pinned against these)
# ---------------------------------------------------------------------------

def _vorbis_comment_body(vendor: str, tags: list[tuple[str, str]]):
    out = struct.pack("<I", len(vendor)) + vendor.encode()
    out += struct.pack("<I", len(tags))
    for k, v in tags:
        kv = f"{k}={v}".encode()
        out += struct.pack("<I", len(kv)) + kv
    return out


def _assemble_tagged_flac():
    base = _fix("pluck-pcm16.flac")
    assert base[:4] == b"fLaC" and base[4] & 0x80  # STREAMINFO last
    si_end = 8 + int.from_bytes(base[5:8], "big")
    vc = _vorbis_comment_body(
        "reference libFLAC 1.3.2 20170101",
        [("TITLE", "Pluck"), ("ARTIST", "Serhiy Storchaka"),
         ("ALBUM", "CPython test sounds"), ("DATE", "2013")])
    return (base[:4] + bytes([base[4] & 0x7F]) + base[5:si_end]
            + bytes([0x84]) + len(vc).to_bytes(3, "big") + vc
            + base[si_end:])


def _ogg_crc(page: bytes) -> int:
    """RFC 3533 CRC: poly 0x04c11db7, init 0, not reflected, xorout 0
    — NOT the zlib CRC."""
    crc = 0
    for b in page:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000
                   else crc << 1) & 0xFFFFFFFF
    return crc


def _ogg_page(serial, seq, granule, segments, header_type=0):
    """One page from a list of lacing SEGMENTS (each <= 255 bytes;
    a 255-byte final segment continues the packet on the next page)."""
    lace = bytes(len(s) for s in segments)
    body = b"".join(segments)
    hdr = (b"OggS\x00" + bytes([header_type])
           + struct.pack("<q", granule) + struct.pack("<I", serial)
           + struct.pack("<I", seq) + b"\x00\x00\x00\x00"
           + bytes([len(segments)]) + lace)
    crc = _ogg_crc(hdr + body)
    return hdr[:22] + struct.pack("<I", crc) + hdr[26:] + body


def _segments_of(packet: bytes):
    """RFC 3533 lacing: 255-byte segments, final short segment ends
    the packet (a multiple-of-255 packet needs a 0-byte closer)."""
    segs = [packet[i:i + 255] for i in range(0, len(packet), 255)]
    if not segs or len(segs[-1]) == 255:
        segs.append(b"")
    return segs


def _assemble_tagged_vorbis_ogg():
    serial = 0x52153
    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
             + struct.pack("<I", 44100)
             + struct.pack("<iii", 0, 128000, 0)
             + bytes([(8 << 4) | 8]) + b"\x01")
    comment = (b"\x03vorbis" + _vorbis_comment_body(
        "Xiph.Org libVorbis I 20200704 (Reducing Environment)",
        [("TITLE", "Pluck"), ("ARTIST", "Serhiy Storchaka"),
         ("ALBUM", "CPython test sounds"), ("DATE", "2013"),
         # padding comment pushes the packet past one 255-byte lace
         # segment so the header SPANS TWO PAGES (continuation walk)
         ("DESCRIPTION", "x" * 220)]) + b"\x01")
    segs = _segments_of(comment)
    assert len(segs) >= 2 and len(segs[0]) == 255
    pages = [_ogg_page(serial, 0, 0, [ident], header_type=0x02)]  # BOS
    pages.append(_ogg_page(serial, 1, -1, segs[:1]))  # packet continues
    pages.append(_ogg_page(serial, 2, -1, segs[1:], header_type=0x01))
    # an opaque "audio" page carrying the final granule (1.0 s)
    pages.append(_ogg_page(serial, 3, 44100, [b"\x00" * 16],
                           header_type=0x04))  # EOS
    return b"".join(pages)


def _assemble_tagged_opus_ogg():
    serial = 0x09A15
    head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
            + struct.pack("<I", 48000) + struct.pack("<h", 0)
            + bytes([0]))
    tags = b"OpusTags" + _vorbis_comment_body(
        "libopus 1.3.1", [("TITLE", "Pluck"), ("ENCODER", "opusenc")])
    return (_ogg_page(serial, 0, 0, [head], header_type=0x02)
            + _ogg_page(serial, 1, -1, _segments_of(tags))
            + _ogg_page(serial, 2, 48312, [b"\x00" * 8],
                        header_type=0x04))


# ---------------------------------------------------------------------------
# Pins + behavior
# ---------------------------------------------------------------------------

def test_tagged_goldens_pinned():
    assert _fix("tagged.flac") == _assemble_tagged_flac()
    assert _fix("tagged-vorbis.ogg") == _assemble_tagged_vorbis_ogg()
    assert _fix("tagged-opus.ogg") == _assemble_tagged_opus_ogg()
    # the spec-assembled Ogg pages carry TRUE RFC 3533 CRCs (any
    # standards decoder accepts them): recompute and compare
    data = _fix("tagged-vorbis.ogg")
    pos = 0
    n = 0
    while pos < len(data):
        nsegs = data[pos + 26]
        end = pos + 27 + nsegs + sum(data[pos + 27:pos + 27 + nsegs])
        page = data[pos:end]
        want = struct.unpack("<I", page[22:26])[0]
        zeroed = page[:22] + b"\x00\x00\x00\x00" + page[26:]
        assert _ogg_crc(zeroed) == want
        pos = end
        n += 1
    assert n == 4


def test_tagged_flac_decodes_identically_to_untagged():
    from realtime_olap_spark.operators.flac import _make_flac_decoder

    a = _make_flac_decoder()(_fix("pluck-pcm16.flac"))
    b = _make_flac_decoder()(_fix("tagged.flac"))
    assert a[0] == b[0] and a[2] == b[2] and (a[3] == b[3]).all()


def test_tag_walks_on_goldens():
    parse = M._make_tags_parser()
    flac = parse(_fix("tagged.flac"))
    assert flac == {"encoder": "reference libFLAC 1.3.2 20170101",
                    "title": "Pluck", "artist": "Serhiy Storchaka",
                    "album": "CPython test sounds", "date": "2013"}
    vorb = parse(_fix("tagged-vorbis.ogg"))
    assert vorb["encoder"].startswith("Xiph.Org libVorbis I 20200704")
    assert vorb["title"] == "Pluck" and vorb["date"] == "2013"
    assert vorb["description"] == "x" * 220  # the two-page packet
    opus = parse(_fix("tagged-opus.ogg"))
    # the ENCODER comment lands on the same key as the vendor string
    # and wins (later assignment) — the parser's documented semantics
    assert opus == {"encoder": "opusenc", "title": "Pluck"}


def test_probe_media_on_tagged_oggs():
    probe = M._make_ogg_prober()
    v = probe(_fix("tagged-vorbis.ogg"))
    assert isinstance(v, tuple)
    brand, duration_ms, _w, _h, _vc, audio_codec, _tc, _fc = v
    assert brand == "ogg" and audio_codec == "vorbis"
    assert duration_ms == 1000
    o = probe(_fix("tagged-opus.ogg"))
    assert o[0] == "ogg" and o[5] == "opus"
    assert o[1] == 1000  # (48312 - 312 pre-skip) / 48k


def test_inventory_with_tags_serves_goldens(spark):
    from realtime_olap_spark.sources.media import media_dir_inventory

    inv = {os.path.basename(r["path"]): r
           for r in media_dir_inventory(spark, FIXTURES,
                                        with_tags=True).collect()}
    fl = inv["tagged.flac"]
    assert fl["major_brand"] == "flac" and fl["status"] == "ok"
    assert dict(fl["tags"])["artist"] == "Serhiy Storchaka"
    vo = inv["tagged-vorbis.ogg"]
    assert vo["major_brand"] == "ogg" and vo["audio_codec"] == "vorbis"
    assert dict(vo["tags"])["title"] == "Pluck"
    assert vo["duration_ms"] == 1000
    op = inv["tagged-opus.ogg"]
    assert op["audio_codec"] == "opus"
    assert dict(op["tags"]) == {"encoder": "opusenc", "title": "Pluck"}
