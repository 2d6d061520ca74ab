"""Round-16 verdict directives + ADVICE fixes, each pinned.

1. (ADVICE medium) streaming `_image_pairs_against` sizes band
   buckets over IDENTITY corpus rows when orientations are on — the
   cap no longer binds ~8x early in the against-join.
2. (directive #5 / ADVICE) `_read_or_empty` degrades to empty ONLY
   for a missing directory; corrupt state fails the batch loudly.
3. (ADVICE) the realtime segments-table location guard compares
   scheme+authority too: hdfs://…/data/x never satisfies /data/x.
4. (directive #3) decode-free compressed-audio content keys: a
   re-tagged copy of the same encode (MP3 ID3v2/ID3v1/APE, FLAC
   metadata blocks, Ogg comment header) collides exactly; different
   frames don't; the coverage audit flips to covered.
5. (directive #2) the one-call near-dup entry points WARN
   per-modality skipped-file counts by default.
6. (directive #4) `image_orientations` defaults ON for the one-call
   paths: a planted rotated copy is found with no knobs.
7. (directive #1) streaming incremental cluster state: per-epoch CC
   over the touched frontier only; `decisions()` equals the batch
   decision layer over the drained corpus and is servable live.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import struct

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.operators import multimodal as M

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _fix(name):
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


# ---------------------------------------------------------------------------
# 1. streaming dihedral bucket cap sized over identity rows
# ---------------------------------------------------------------------------

def test_against_dihedral_cap_sizes_identity_rows_only(spark):
    """With orientations on, every corpus file contributes 8 band
    rows; the cap must bind on the 1x identity count (the batch
    dihedral operator's build side), not the 8x total. Corpus: 8
    files sharing a hash -> 8 identity rows per band (== cap) but 64
    orientation rows; the planted twin must still be found."""
    from realtime_olap_spark.streaming import media_near_dup_pairs_against

    sch = ("media_id long, modality string, frame_ts_ms long, "
           "sig long, orient long")
    corpus = spark.createDataFrame(
        [(mid, "image", 0, 42 + o, o)  # distinct per-orient hashes
         for mid in range(10, 18) for o in range(8)], sch)
    new = spark.createDataFrame([(1, "image", 0, 42, 0)], sch)
    rows = media_near_dup_pairs_against(
        new, corpus, image_orientations=True,
        max_bucket_size=8).collect()
    found = {(r["id_a"], r["id_b"]) for r in rows
             if r["modality"] == "image"}
    # every corpus file's identity hash 42 is within hamming of the
    # probe: all 8 pairs must survive the cap (identity rows = 8 <= 8)
    assert {(1, mid) for mid in range(10, 18)} <= found


# ---------------------------------------------------------------------------
# 2. corrupt streaming state fails loudly
# ---------------------------------------------------------------------------

def test_corrupt_state_dir_fails_loudly(spark, tmp_path):
    from realtime_olap_spark.streaming import MediaNearDupIngest

    ingest = MediaNearDupIngest(spark, str(tmp_path / "s"),
                                str(tmp_path / "p"))
    # missing directories: still empty frames (pre-first-epoch)
    assert ingest.signatures().count() == 0
    assert ingest.pairs().count() == 0
    assert ingest.clusters().count() == 0
    # a corrupt signature table must NOT silently degrade the
    # against-join to "no corpus"
    bad = tmp_path / "s" / "epoch=0"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception, match="(?i)parquet|footer|corrupt"):
        ingest.signatures().count()


# ---------------------------------------------------------------------------
# 3. location guard: scheme + authority
# ---------------------------------------------------------------------------

def test_locations_match_compares_scheme_and_authority():
    from realtime_olap_spark.streaming.realtime import _locations_match

    # same filesystem, different spellings
    assert _locations_match("file:/data/x", "/data/x")
    assert _locations_match("/data/x", "/data/x/")
    assert _locations_match("file:/data/./x", "/data/x")
    # a remote URI must never satisfy a local path with the same tail
    assert not _locations_match("hdfs://namenode/data/x", "/data/x")
    assert not _locations_match("s3a://bucket/data/x", "/data/x")
    # differing authorities are different storage
    assert not _locations_match("hdfs://nn1/data/x", "hdfs://nn2/data/x")
    assert _locations_match("hdfs://nn1/data/x", "hdfs://nn1/data/x")
    # and different paths still mismatch
    assert not _locations_match("file:/data/x", "/data/y")


# ---------------------------------------------------------------------------
# 4. decode-free compressed-audio content keys
# ---------------------------------------------------------------------------

def _syncsafe(n):
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def _id3v2(frames_payload, ver=3):
    return b"ID3" + bytes([ver, 0, 0]) + _syncsafe(len(frames_payload)) \
        + frames_payload


def _t_frame(fid, text):
    body = b"\x00" + text.encode("latin-1")
    return fid + len(body).to_bytes(4, "big") + b"\x00\x00" + body


def _strip_leading_id3(data):
    sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
        | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
    return data[10 + sz:]


def _apev2(items):
    body = b""
    for k, v in items:
        body += struct.pack("<II", len(v), 0) + k.encode() + b"\x00" + v
    size = len(body) + 32
    footer = (b"APETAGEX" + struct.pack("<I", 2000)
              + struct.pack("<I", size) + struct.pack("<I", len(items))
              + struct.pack("<I", 0) + b"\x00" * 8)
    return body + footer


def test_audio_content_key_retag_invariance_mp3():
    key = M._make_audio_content_keyer()
    base = _fix("test.mp3")
    k0 = key(base)
    assert isinstance(k0, tuple) and k0[0] == "mp3"
    frames = _strip_leading_id3(base)
    # bare frames (no tag at all) — same key
    assert key(frames) == k0
    # a completely different ID3v2 + ID3v1 tail + APEv2 tail
    retag = (_id3v2(_t_frame(b"TIT2", "Completely different title")
                    + _t_frame(b"TPE1", "Another artist") + b"\x00" * 300)
             + frames + _apev2([("Comment", b"ape comment")])
             + b"TAG" + b"\x00" * 125)
    assert key(retag) == k0
    # chained double ID3v2 headers
    assert key(_id3v2(b"\x00" * 40) + _id3v2(b"\x00" * 17) + frames) == k0
    # a different RECORDING (one frame byte flipped) differs
    mod = bytearray(base)
    mod[len(base) // 2] ^= 0x01
    assert key(bytes(mod)) != k0
    # truncated ID3v2 header: malformed, no key
    assert key(b"ID3\x03\x00\x00" + _syncsafe(10**6)) is None


def test_audio_content_key_retag_invariance_flac_and_ogg():
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_media_tags_goldens import (_assemble_tagged_vorbis_ogg,
                                         _ogg_page, _segments_of,
                                         _vorbis_comment_body)

    key = M._make_audio_content_keyer()
    # tagged.flac is pluck-pcm16.flac with a VORBIS_COMMENT spliced in
    assert key(_fix("tagged.flac")) == key(_fix("pluck-pcm16.flac"))
    assert key(_fix("tagged.flac"))[0] == "flac"
    # a different flac (frame byte flipped) differs
    other = bytearray(_fix("pluck-pcm16.flac"))
    other[-3] ^= 0x01
    assert key(bytes(other)) != key(_fix("tagged.flac"))
    # Ogg: rebuild tagged-vorbis.ogg with a DIFFERENT comment header
    base = _assemble_tagged_vorbis_ogg()
    serial = 0x52153
    ident_page = base[:base.index(b"OggS", 4)]
    comment2 = (b"\x03vorbis" + _vorbis_comment_body(
        "a different encoder", [("TITLE", "Renamed")]) + b"\x01")
    retagged = (ident_page
                + _ogg_page(serial, 1, -1, _segments_of(comment2))
                + _ogg_page(serial, 3, 44100, [b"\x00" * 16],
                            header_type=0x04))
    k_base, k_re = key(base), key(retagged)
    assert k_base[0] == "ogg" and k_base == k_re
    # different audio packet bytes -> different key
    changed = (ident_page
               + _ogg_page(serial, 1, -1, _segments_of(comment2))
               + _ogg_page(serial, 3, 44100, [b"\x01" * 16],
                           header_type=0x04))
    assert key(changed) != k_base
    # opus golden keys fine too
    assert key(_fix("tagged-opus.ogg"))[0] == "ogg"


def _webm_with_audio(frames, *, lacing="none", cluster_split=1,
                     ts_base=0, with_video=True):
    """Spec-assembled Matroska/WebM (RFC 8794 VINTs, public element
    ids) carrying an Opus audio track whose codec frames are
    ``frames`` — groupable into ``cluster_split`` clusters and laced
    per block (none / xiph / fixed / ebml) to model re-muxes."""
    import struct
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_multimodal import _ebml_el

    def block(track, rel_ts, blk_frames, lace):
        head = bytes([0x80 | track]) + struct.pack(">h", rel_ts)
        if lace == "none":
            assert len(blk_frames) == 1
            return _ebml_el(0xA3, head + b"\x00" + blk_frames[0])
        body = bytes([len(blk_frames) - 1])
        if lace == "xiph":
            flags = 0x02
            for f in blk_frames[:-1]:
                sz = len(f)
                body += b"\xff" * (sz // 255) + bytes([sz % 255])
        elif lace == "fixed":
            flags = 0x04
            assert len({len(f) for f in blk_frames}) == 1
        else:  # ebml
            flags = 0x06
            sz = len(blk_frames[0])
            body += bytes([0x80 | sz]) if sz < 127 else \
                bytes([0x40 | (sz >> 8), sz & 0xFF])
            prev = sz
            for f in blk_frames[1:-1]:
                delta = len(f) - prev
                prev = len(f)
                body += bytes([0x80 | (delta + 0x3F)]) \
                    if -0x3F <= delta <= 0x3F else None
        return _ebml_el(0xA3, head + bytes([flags]) + body
                        + b"".join(blk_frames))

    header = _ebml_el(0x1A45DFA3, _ebml_el(0x4282, b"webm"))
    entries = b""
    if with_video:
        entries += _ebml_el(0xAE, _ebml_el(0xD7, b"\x01")
                            + _ebml_el(0x83, b"\x01")
                            + _ebml_el(0x86, b"V_VP8"))
    entries += _ebml_el(0xAE, _ebml_el(0xD7, b"\x02")
                        + _ebml_el(0x83, b"\x02")
                        + _ebml_el(0x86, b"A_OPUS"))
    tracks = _ebml_el(0x1654AE6B, entries)
    per = max(1, (len(frames) + cluster_split - 1) // cluster_split)
    clusters = b""
    for ci in range(0, len(frames), per):
        blk_frames = frames[ci:ci + per]
        body = _ebml_el(0xE7, bytes([(ts_base + ci) & 0x7F]))
        if lacing == "none":
            for j, f in enumerate(blk_frames):
                body += block(2, j, [f], "none")
                if with_video:  # interleave a foreign-track block
                    body += block(1, j, [b"\x9d\x01*vid" + f], "none")
        else:
            body += block(2, 0, blk_frames, lacing)
        clusters += _ebml_el(0x1F43B675, body)
    segment = _ebml_el(0x18538067, tracks + clusters)
    return header + segment


def test_audio_content_key_webm_remux_invariance():
    """A re-muxed WebM (different cluster grouping, timestamps,
    lacing scheme, video-track bytes) keys identically iff the audio
    track's codec frames are identical."""
    key = M._make_audio_content_keyer()
    frames = [bytes([i]) * (20 + i * 7) for i in range(6)]
    base = key(_webm_with_audio(frames, lacing="none"))
    assert isinstance(base, tuple) and base[0] == "webm-audio"
    # remuxes: one cluster per frame; xiph-laced; ebml-laced;
    # shifted timestamps; video track absent
    assert key(_webm_with_audio(frames, cluster_split=6)) == base
    assert key(_webm_with_audio(frames, lacing="xiph",
                                cluster_split=2)) == base
    assert key(_webm_with_audio(frames, lacing="ebml",
                                cluster_split=3)) == base
    assert key(_webm_with_audio(frames, ts_base=9)) == base
    assert key(_webm_with_audio(frames, with_video=False)) == base
    # fixed lacing needs equal sizes — equal-size frames, same law
    eq = [bytes([i]) * 24 for i in range(4)]
    assert key(_webm_with_audio(eq, lacing="fixed")) \
        == key(_webm_with_audio(eq, lacing="xiph"))
    # different audio frames differ; no audio track is unsupported
    other = key(_webm_with_audio([b"\x07" * 40]))
    assert other != base
    assert key(_fix("inter.webm")) == "unsupported: no audio track"
    # never raises over truncations + bit flips of a real assembly
    import random
    data = _webm_with_audio(frames, lacing="xiph")
    for cut in range(0, len(data), 3):
        r = key(data[:cut])
        assert r is None or isinstance(r, (tuple, str))
    rng = random.Random(7)
    for _ in range(3000):
        b = bytearray(data)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        r = key(bytes(b))
        assert r is None or isinstance(r, (tuple, str))


def _m4a_with_samples(samples, *, tags=b"", mdat_first=True,
                      spc=2, co64=False):
    """Minimal spec-assembled ISO-BMFF audio file (ISO/IEC 14496-12
    box layout): one ``soun`` trak whose stsc/stsz/stco tables place
    ``samples`` into chunks of ``spc``; ``tags`` lands in
    ``moov/udta`` (the iTunes re-tag region) and ``mdat_first``
    flips box order — both shift every chunk offset, which the
    tables absorb."""
    def box(typ, body):
        return struct.pack(">I4s", 8 + len(body), typ) + body

    def full(typ, body, version=0):
        return box(typ, bytes([version]) + b"\x00\x00\x00" + body)

    ftyp = box(b"ftyp", b"M4A \x00\x00\x00\x00M4A mp42")
    payload = b"".join(samples)
    mdat = box(b"mdat", payload)
    n = len(samples)
    chunks = [samples[i:i + spc] for i in range(0, n, spc)]

    def offsets(mdat_pos):
        offs, p = [], mdat_pos + 8
        for c in chunks:
            offs.append(p)
            p += sum(len(s) for s in c)
        return offs

    def moov_at(mdat_pos):
        offs = offsets(mdat_pos)
        stsc = full(b"stsc", struct.pack(">I", 1)
                    + struct.pack(">III", 1, spc, 1))
        stsz = full(b"stsz", struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", len(s))
                               for s in samples))
        if co64:
            stco = full(b"co64", struct.pack(">I", len(offs))
                        + b"".join(struct.pack(">Q", o)
                                   for o in offs))
        else:
            stco = full(b"stco", struct.pack(">I", len(offs))
                        + b"".join(struct.pack(">I", o)
                                   for o in offs))
        stbl = box(b"stbl", stsc + stsz + stco)
        minf = box(b"minf", stbl)
        hdlr = full(b"hdlr", b"\x00" * 4 + b"soun" + b"\x00" * 12)
        mdia = box(b"mdia", hdlr + minf)
        trak = box(b"trak", mdia)
        udta = box(b"udta", tags) if tags else b""
        return box(b"moov", trak + udta)

    if mdat_first:
        mdat_pos = len(ftyp)
        return ftyp + mdat + moov_at(mdat_pos)
    # moov first: moov length is offset-independent, so one pass
    # with a dummy position sizes it, the second writes real offsets
    dummy = moov_at(0)
    mdat_pos = len(ftyp) + len(dummy)
    return ftyp + moov_at(mdat_pos) + mdat


def test_audio_content_key_mp4_retag_invariance():
    """An iTunes-style re-tag (udta/ilst rewritten, box order
    flipped, chunk offsets shifted, 64-bit offsets) keys identically
    iff the audio samples are identical."""
    key = M._make_audio_content_keyer()
    samples = [bytes([i]) * (15 + i * 3) for i in range(7)]
    base = key(_m4a_with_samples(samples))
    assert isinstance(base, tuple) and base[0] == "mp4-audio"
    big_tag = box_tags = b"\x00" * 900  # shifts offsets by ~1 KiB
    assert key(_m4a_with_samples(samples, tags=big_tag)) == base
    assert key(_m4a_with_samples(samples, mdat_first=False,
                                 tags=box_tags)) == base
    assert key(_m4a_with_samples(samples, spc=3)) == base
    assert key(_m4a_with_samples(samples, co64=True)) == base
    # different samples differ; probe goldens stay honest
    assert key(_m4a_with_samples([b"\x09" * 44])) != base
    assert key(_fix("probe.avif")).startswith("unsupported")
    assert key(_fix("probe.heic")).startswith("unsupported")
    r = key(_fix("probe.mp4"))
    assert r is None or isinstance(r, (tuple, str))
    # truncations + bit flips never raise
    import random
    data = _m4a_with_samples(samples, tags=b"\x00" * 40)
    for cut in range(0, len(data), 3):
        r = key(data[:cut])
        assert r is None or isinstance(r, (tuple, str))
    rng = random.Random(11)
    for _ in range(3000):
        b = bytearray(data)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        r = key(bytes(b))
        assert r is None or isinstance(r, (tuple, str))


def test_audio_content_key_retag_invariance_property():
    """Hypothesis pin of the tag-stripping LAW: for arbitrary frame
    bytes and arbitrary generated ID3v2 bodies / ID3v1 / APEv2 tails,
    the key depends ONLY on the frame bytes — every tag combination
    of the same frames collides, different frames never do (mod
    2^-64), and the keyer never raises on random non-audio bytes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    key = M._make_audio_content_keyer()

    @settings(max_examples=150, deadline=None)
    @given(frames=st.binary(min_size=4, max_size=400),
           tagbody=st.binary(max_size=200),
           ver=st.sampled_from([2, 3, 4]),
           v1=st.booleans(), ape=st.binary(max_size=60))
    def check(frames, tagbody, ver, v1, ape):
        # force an MPEG sync so the bare-frames route engages
        frames = b"\xff\xfb" + frames
        base = key(frames)
        assert isinstance(base, tuple) and base[0] == "mp3"
        tagged = _id3v2(tagbody, ver=ver) + frames
        if v1:
            tagged += b"TAG" + b"\x00" * 125
        else:
            tagged += _apev2([("k", ape)])
        assert key(tagged) == base
        # flipping one frame byte changes the key
        mod = bytearray(frames)
        mod[-1] ^= 0x01
        assert key(bytes(mod)) != base

    check()

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=600))
    def never_raises(blob):
        r = key(blob)
        assert (r is None or isinstance(r, tuple)
                or (isinstance(r, str) and r.startswith("unsupported")))

    never_raises()


def test_audio_content_keys_op(spark):
    from realtime_olap_spark.operators.multimodal import audio_content_keys
    from realtime_olap_spark.sources.media import read_media_dir

    ok = read_media_dir(spark, FIXTURES).where("status = 'ok'") \
        .select("media_id", "payload", "path")
    rows = {os.path.basename(r["path"]): r for r in
            audio_content_keys(ok, with_status=True)
            .join(ok.select("media_id", "path"), "media_id").collect()}
    assert rows["test.mp3"]["kind"] == "mp3"
    assert rows["tagged.flac"]["kind"] == "flac"
    assert rows["tagged-vorbis.ogg"]["kind"] == "ogg"
    assert rows["tagged.flac"]["content_key"] \
        == rows["pluck-pcm16.flac"]["content_key"]
    assert rows["python.png"]["content_key"] is None
    assert rows["python.png"]["status"].startswith("unsupported")


def test_retagged_mp3_one_call_pair_and_decision(spark, tmp_path):
    """The verdict's done-bar: a re-tagged copy of test.mp3 pairs
    with its original through the one-call pass, the decision layer
    keeps exactly one, and the coverage audit covers both."""
    from realtime_olap_spark.sources.media import (
        media_dir_dedup_decisions, media_dir_near_dups,
        media_signature_coverage, media_signatures, read_media_dir)

    d = tmp_path / "corpus"
    d.mkdir()
    base = _fix("test.mp3")
    (d / "original.mp3").write_bytes(base)
    retag = (_id3v2(_t_frame(b"TIT2", "Renamed") + b"\x00" * 2000)
             + _strip_leading_id3(base) + b"TAG" + b"\x00" * 125)
    (d / "retagged.mp3").write_bytes(retag)
    shutil.copy(os.path.join(FIXTURES, "python.png"), d / "still.png")
    ids = {os.path.basename(r["path"]): r["media_id"]
           for r in read_media_dir(spark, str(d)).collect()}
    pairs = media_dir_near_dups(spark, str(d)).collect()
    exact = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs
             if r["modality"] == "audio_exact"}
    a, b = sorted([ids["original.mp3"], ids["retagged.mp3"]])
    assert exact == {(a, b): 0}
    # decisions: the (larger) retagged file is kept, original dropped
    rows = {os.path.basename(r["path"]): r
            for r in media_dir_dedup_decisions(spark, str(d)).collect()}
    assert rows["original.mp3"]["cluster_id"] \
        == rows["retagged.mp3"]["cluster_id"]
    kept = [n for n in ("original.mp3", "retagged.mp3")
            if rows[n]["keep"]]
    assert kept == ["retagged.mp3"]  # bigger (padded tag)
    assert rows["still.png"]["keep"]
    # coverage flips: both mp3s covered via the content key
    ok = read_media_dir(spark, str(d)).where("status = 'ok'") \
        .select("media_id", "payload")
    cov = {os.path.basename(r["path"]): r
           for r in media_signature_coverage(
               spark, str(d), media_signatures(ok)).collect()}
    assert cov["original.mp3"]["covered"]
    assert cov["retagged.mp3"]["has_content_key"]


# ---------------------------------------------------------------------------
# 5. default-on coverage logging
# ---------------------------------------------------------------------------

def test_one_call_logs_skipped_files_by_default(spark, tmp_path, caplog):
    from realtime_olap_spark.sources.media import media_dir_near_dups

    d = tmp_path / "c"
    d.mkdir()
    shutil.copy(os.path.join(FIXTURES, "python.png"), d / "a.png")
    shutil.copy(os.path.join(FIXTURES, "probe.webm"), d / "probe.webm")
    (d / "notes.txt").write_text("not media at all")
    with caplog.at_level(logging.WARNING, "realtime_olap_spark.media"):
        media_dir_near_dups(spark, str(d)).collect()
    msgs = [r.getMessage() for r in caplog.records]
    hit = [m for m in msgs if "contributed no signature" in m]
    # probe.webm (metadata-only golden) + notes.txt are skipped
    assert hit and "2/3 files" in hit[0]
    assert "video/ok: 1" in hit[0] and "other/ok: 1" in hit[0]
    # opt-out silences it
    caplog.clear()
    with caplog.at_level(logging.WARNING, "realtime_olap_spark.media"):
        media_dir_near_dups(spark, str(d), coverage_log=False).collect()
    assert not [r for r in caplog.records
                if "contributed no signature" in r.getMessage()]


# ---------------------------------------------------------------------------
# 6. dihedral by default on the one-call paths
# ---------------------------------------------------------------------------

def test_rotated_duplicate_found_with_no_knobs(spark, tmp_path):
    import numpy as np

    from realtime_olap_spark.sources.media import (
        media_dir_dedup_decisions, read_media_dir)

    d = tmp_path / "rot"
    d.mkdir()
    base_bytes = _fix("python.png")
    base = M._make_png_decoder()(base_bytes)[3]
    rot = M._make_png_encoder()(np.ascontiguousarray(np.rot90(base, 1)))
    (d / "orig.png").write_bytes(base_bytes)
    (d / "rotated.png").write_bytes(rot)
    shutil.copy(os.path.join(FIXTURES, "file.png"), d / "other.png")
    rows = {os.path.basename(r["path"]): r
            for r in media_dir_dedup_decisions(spark, str(d)).collect()}
    assert rows["orig.png"]["cluster_id"] == rows["rotated.png"]["cluster_id"]
    assert sum(rows[n]["keep"] for n in ("orig.png", "rotated.png")) == 1
    assert rows["other.png"]["keep"]
    assert rows["other.png"]["cluster_id"] == rows["other.png"]["media_id"]


# ---------------------------------------------------------------------------
# 7. streaming incremental decision layer
# ---------------------------------------------------------------------------

def test_incremental_cluster_merge_across_epochs(spark, tmp_path):
    """Frontier CC: epoch 0 pairs (10,11); epoch 1 pairs (20,21);
    epoch 2's (11,20) edge must merge BOTH prior clusters into one
    min-id component, leaving an untouched cluster alone."""
    from realtime_olap_spark.streaming import MediaNearDupIngest

    ingest = MediaNearDupIngest(spark, str(tmp_path / "s"),
                                str(tmp_path / "p"))

    def pairs_df(*ab):
        return spark.createDataFrame(
            [("image", a, b, 0, None, None) for a, b in ab],
            "modality string, id_a long, id_b long, hamming long, "
            "matched_frames long, offset_ms long")

    ingest._update_clusters(pairs_df((10, 11)), 0)
    ingest._update_clusters(pairs_df((20, 21), (30, 31)), 1)
    got = {r["media_id"]: r["cluster_id"]
           for r in ingest.clusters().collect()}
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 30: 30, 31: 30}
    ingest._update_clusters(pairs_df((11, 20)), 2)
    got = {r["media_id"]: r["cluster_id"]
           for r in ingest.clusters().collect()}
    assert got == {10: 10, 11: 10, 20: 10, 21: 10, 30: 30, 31: 30}
    # replay of epoch 2 is idempotent (its own delta is excluded)
    ingest._update_clusters(pairs_df((11, 20)), 2)
    got2 = {r["media_id"]: r["cluster_id"]
            for r in ingest.clusters().collect()}
    assert got2 == got
    # an edge landing exactly on a cluster's ROOT node must still
    # find the component (the state carries the (root, root) row)
    ingest._update_clusters(pairs_df((5, 10)), 3)
    got = {r["media_id"]: r["cluster_id"]
           for r in ingest.clusters().collect()}
    assert got == {5: 5, 10: 5, 11: 5, 20: 5, 21: 5, 30: 30, 31: 30}


def test_compact_folds_epoch_state(spark, tmp_path):
    """State compaction (the minion merge analog for the ingest
    state): after N epochs, compact() folds every delta directory
    into one epoch with ALL live tables unchanged; ingest continues
    cleanly past it; an interrupted compaction converges on re-run
    without losing post-crash epochs."""
    from realtime_olap_spark.sources.media import read_media_dir
    from realtime_olap_spark.streaming import MediaNearDupIngest

    landing = tmp_path / "l"
    landing.mkdir()
    ingest = MediaNearDupIngest(spark, str(tmp_path / "s"),
                                str(tmp_path / "p"),
                                coverage_log=False)
    batches = (("python.png", "pluck-pcm16.wav"),
               ("python.jpg", "pluck-pcm16.flac"),
               ("python.bmp", "tagged.flac"))
    for ep, names in enumerate(batches):
        for n in names:
            shutil.copy(os.path.join(FIXTURES, n), landing / n)
        b = read_media_dir(spark, str(landing)).where(
            " OR ".join(f"path LIKE '%{n}'" for n in names))
        ingest.process_batch(b, ep)

    def snapshot():
        return (
            sorted(map(tuple, ingest.pairs().collect())),
            sorted(map(tuple, ingest.signatures().collect())),
            sorted(map(tuple, ingest.meta().collect())),
            sorted(map(tuple, ingest.clusters().collect())),
            sorted(map(tuple, ingest.decisions().collect())),
        )

    before = snapshot()
    ingest.compact()
    assert snapshot() == before
    for d in (tmp_path / "s", tmp_path / "p", tmp_path / "s_meta",
              tmp_path / "p_clusters"):
        eps = [n for n in os.listdir(d) if n.startswith("epoch=")]
        assert eps == ["epoch=2"], (d, eps)
    # ingest continues past the compaction
    shutil.copy(os.path.join(FIXTURES, "python.tiff"),
                landing / "python.tiff")
    b4 = read_media_dir(spark, str(landing)).where(
        "path LIKE '%python.tiff'")
    ingest.process_batch(b4, 3)
    rows = {r["media_id"]: r["cluster_id"]
            for r in ingest.clusters().collect()}
    ids = {os.path.basename(r["path"]): r["media_id"]
           for r in read_media_dir(spark, str(landing)).collect()}
    assert rows[ids["python.tiff"]] == rows[ids["python.png"]]
    # crash simulation: a completed-but-unswapped tmp for the pairs
    # table, with epoch dirs <= its bound deleted and a LATER epoch
    # present — recovery must finish the swap and keep the later epoch
    before = snapshot()
    pdir = str(tmp_path / "p")
    shutil.copytree(os.path.join(pdir, "epoch=2"),
                    os.path.join(pdir, "_compacting_2"))
    shutil.rmtree(os.path.join(pdir, "epoch=2"))
    MediaNearDupIngest._finish_or_discard_compaction(pdir)
    assert snapshot() == before
    eps = [n for n in os.listdir(pdir) if n.startswith("epoch=")]
    assert sorted(eps) == ["epoch=2", "epoch=3"]
    # a PARTIAL tmp (no _SUCCESS) is discarded, state untouched
    os.makedirs(os.path.join(pdir, "_compacting_3"))
    MediaNearDupIngest._finish_or_discard_compaction(pdir)
    assert not os.path.isdir(os.path.join(pdir, "_compacting_3"))
    assert snapshot() == before


def test_streaming_decisions_parity_and_live_serving(spark, tmp_path):
    """Two drained micro-batches over a real-fixture corpus: the live
    decisions() table equals the batch media_dedup_decisions over the
    final directory, and is servable over POST /query mid-crawl."""
    import urllib.request

    from realtime_olap_spark.server import PQLServer
    from realtime_olap_spark.sources.media import (
        media_dedup_decisions, media_near_dups_from_files,
        read_media_dir, read_media_dir_stream)
    from realtime_olap_spark.streaming import MediaNearDupIngest
    from tests.conftest import SF_DIR as _SF

    landing = tmp_path / "landing"
    landing.mkdir()
    names = ["python.png", "python.jpg", "python.bmp",
             "pluck-pcm16.wav", "pluck-pcm16.flac", "tagged.flac",
             "test.mp3", "file.png"]
    b1, b2 = names[0::2], names[1::2]
    for n in b1:
        shutil.copy(os.path.join(FIXTURES, n), landing / n)
    ingest = MediaNearDupIngest(spark, str(tmp_path / "sigs"),
                                str(tmp_path / "pairs"))
    ckpt = str(tmp_path / "ckpt")
    ingest.start(read_media_dir_stream(spark, str(landing)),
                 ckpt).awaitTermination()

    server = PQLServer(spark, str(_SF)).start()
    try:
        server.engine.catalog.register_derived(
            "media_decisions", lambda: ingest.decisions())

        def post(pql):
            req = urllib.request.Request(
                f"http://{server.host}:{server.port}/query",
                data=json.dumps({"pql": pql}).encode(), method="POST",
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as resp:
                return json.loads(resp.read().decode())

        # PQL has no boolean literals (reference PQL2.g4) — the
        # Pinot-style string-boolean comparison serves the keep side
        r1 = post("SELECT count(*) FROM media_decisions "
                  "WHERE keep = 'true'")
        n1 = int(r1["aggregationResults"][0]["value"])
        assert 0 < n1 <= len(b1)

        for n in b2:
            shutil.copy(os.path.join(FIXTURES, n), landing / n)
        ingest.start(read_media_dir_stream(spark, str(landing)),
                     ckpt).awaitTermination()
        r2 = post("SELECT count(*) FROM media_decisions "
                  "WHERE keep = 'true'")
        assert int(r2["aggregationResults"][0]["value"]) \
            == ingest.decisions().where("keep").count()
    finally:
        server.stop()

    # the LIVE coverage audit matches the batch one over the corpus
    cov = {r["media_id"]: (r["covered"], r["has_content_key"])
           for r in ingest.coverage().collect()}
    from realtime_olap_spark.sources.media import media_coverage
    want_cov = {r["media_id"]: (r["covered"], r["has_content_key"])
                for r in media_coverage(
                    read_media_dir(spark, str(landing)),
                    ingest.signatures()).collect()}
    assert cov == want_cov
    assert any(ck for _, ck in cov.values())  # test.mp3's content key

    files = read_media_dir(spark, str(landing))
    want_pairs = media_near_dups_from_files(files, coverage_log=False)
    want = {r["media_id"]: (r["cluster_id"], r["keep"], r["n_bytes"])
            for r in media_dedup_decisions(files, want_pairs).collect()}
    got = {r["media_id"]: (r["cluster_id"], r["keep"], r["n_bytes"])
           for r in ingest.decisions().collect()}
    assert got == want
    # sanity on content: the three pythons collapse to one keeper
    ids = {os.path.basename(r["path"]): r["media_id"]
           for r in files.collect()}
    pys = [ids[n] for n in ("python.png", "python.jpg", "python.bmp")]
    assert len({got[i][0] for i in pys}) == 1
    assert sum(got[i][1] for i in pys) == 1
    # and the re-tag family (flac content key + afp) is one cluster
    fls = [ids[n] for n in ("pluck-pcm16.wav", "pluck-pcm16.flac",
                            "tagged.flac")]
    assert len({got[i][0] for i in fls}) == 1
