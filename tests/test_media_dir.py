"""Media corpus directory ingestion (r14 verdict directive #2):
read_media_dir / media_dir_inventory over tests/fixtures as the corpus,
size-cap + NULL-payload contract, pushdown plan assertions, and the
live derived-table e2e through POST /query."""

from __future__ import annotations

import glob as globmod
import json
import os
import shutil

import pytest

from realtime_olap_spark.sources.media import (media_dir_inventory,
                                               read_media_dir)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _fixture_files():
    return sorted(p for p in globmod.glob(os.path.join(FIXTURES, "*"))
                  if os.path.isfile(p))


def test_read_media_dir_rows_and_payloads(spark):
    files = _fixture_files()
    df = read_media_dir(spark, FIXTURES)
    rows = {r["path"].replace("file:", ""): r for r in df.collect()}
    assert len(rows) == len(files)
    for p in files:
        r = rows[p]
        with open(p, "rb") as f:
            data = f.read()
        assert r["n_bytes"] == len(data)
        assert bytes(r["payload"]) == data
        assert r["status"] == "ok"
    # coarse media_type from the extension
    by_name = {os.path.basename(p): rows[p] for p in files}
    assert by_name["python.png"]["media_type"] == "image"
    assert by_name["probe.avi"]["media_type"] == "video"
    assert by_name["pluck-pcm16.wav"]["media_type"] == "audio"
    assert by_name["README.md"]["media_type"] == "other"
    # media_id is stable across scans (hash of path, not mtime)
    again = {r["path"]: r["media_id"]
             for r in read_media_dir(spark, FIXTURES).collect()}
    assert all(again[r["path"]] == r["media_id"]
               for r in rows.values())


def test_read_media_dir_size_cap_and_pushdown(spark):
    files = _fixture_files()
    sizes = {p: os.path.getsize(p) for p in files}
    cap = sorted(sizes.values())[len(sizes) // 2]  # median: both sides
    df = read_media_dir(spark, FIXTURES, max_bytes=cap)
    rows = {r["path"].replace("file:", ""): r for r in df.collect()}
    assert len(rows) == len(files)  # every file keeps a row
    for p, sz in sizes.items():
        r = rows[p]
        if sz <= cap:
            assert r["status"] == "ok" and r["payload"] is not None
        else:
            assert r["status"] == "oversize" and r["payload"] is None
            assert r["n_bytes"] == sz  # metadata survives
    # the size cap is PUSHED to the binaryFile scan (oversized files
    # are skipped before a byte is read), and the oversize branch
    # prunes the content column entirely
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LessThanOrEqual(length" in plan
    assert "GreaterThan(length" in plan
    ovr = df.where("status = 'oversize'")
    ovr_plan = ovr._jdf.queryExecution().executedPlan().toString()
    assert "content" not in ovr_plan.split("ReadSchema")[-1].split(
        "\n")[0].lower()
    with pytest.raises(ValueError, match="max_bytes"):
        read_media_dir(spark, FIXTURES, max_bytes=0)


def test_read_media_dir_glob_and_recursive(spark, tmp_path):
    root = tmp_path / "corpus"
    (root / "sub").mkdir(parents=True)
    shutil.copy(os.path.join(FIXTURES, "python.png"), root / "a.png")
    shutil.copy(os.path.join(FIXTURES, "python.jpg"),
                root / "sub" / "b.jpg")
    assert read_media_dir(spark, str(root)).count() == 2
    assert read_media_dir(spark, str(root), recursive=False).count() == 1
    assert read_media_dir(spark, str(root), glob="*.png").count() == 1


def test_media_dir_inventory_probes(spark):
    inv = {os.path.basename(r["path"]): r
           for r in media_dir_inventory(spark, FIXTURES).collect()}
    avi = inv["probe.avi"]
    assert avi["major_brand"] == "avi"
    assert avi["video_codec"] == "mjpg"
    assert (avi["width"], avi["height"]) == (640, 360)
    assert avi["frame_count"] == 90 and avi["status"] == "ok"
    webm = inv["probe.webm"]
    assert webm["major_brand"] == "webm" and webm["video_codec"] == "vp8"
    png = inv["python.png"]
    assert png["major_brand"] == "png" and png["status"] == "ok"
    mjpeg = inv["variant-mjpeg.avi"]
    assert mjpeg["frame_count"] == 3
    # non-container files keep their row with a reason, never dropped
    assert inv["README.md"]["status"].startswith("unsupported")
    assert inv["README.md"]["major_brand"] is None
    # r14 probers: stills report dims, audio reports duration+codec —
    # every format the engine decodes probes in the inventory
    assert inv["python.jpg"]["major_brand"] == "jpeg" \
        and inv["python.jpg"]["width"] > 0
    assert inv["python.tiff"]["major_brand"] == "tiff"
    assert inv["pluck-pcm16.wav"]["major_brand"] == "wav" \
        and inv["pluck-pcm16.wav"]["duration_ms"] > 0
    assert inv["pluck-pcm16.flac"]["major_brand"] == "flac"
    assert inv["pluck-ulaw.au"]["major_brand"] == "au"
    n_unsup = sum(1 for r in inv.values()
                  if str(r["status"]).startswith("unsupported"))
    assert n_unsup <= 3  # README.md, test.json-likes — not media
    # a size cap marks oversize rows without probing them
    cap = os.path.getsize(os.path.join(FIXTURES, "probe.avi"))
    inv2 = {os.path.basename(r["path"]): r
            for r in media_dir_inventory(
                spark, FIXTURES, max_bytes=cap).collect()}
    assert len(inv2) == len(inv)
    big = [n for n in inv2 if inv2[n]["status"] == "oversize"]
    assert big and all(inv2[n]["major_brand"] is None for n in big)
    assert inv2["probe.avi"]["status"] == "ok"


def _post(server, body: dict):
    import urllib.request

    req = urllib.request.Request(
        f"http://{server.host}:{server.port}/query",
        data=json.dumps(body).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read().decode())


def test_corpus_media_served_live_over_pql(spark, tmp_path):
    """e2e: a media directory registered as a LIVE derived table —
    'SELECT over a directory of crawled media' through POST /query
    with zero Python, new files visible without re-registration."""
    from realtime_olap_spark.server import PQLServer
    from tests.conftest import SF_DIR as _SF

    corpus = tmp_path / "crawl"
    corpus.mkdir()
    for n in ("python.png", "probe.avi", "probe.webm"):
        shutil.copy(os.path.join(FIXTURES, n), corpus / n)
    server = PQLServer(spark, str(_SF)).start()
    try:
        server.engine.catalog.register_derived(
            "corpus_media",
            lambda: media_dir_inventory(spark, str(corpus)))
        status, r1 = _post(server, {
            "pql": "SELECT count(*) FROM corpus_media"})
        assert status == 200 and r1["exceptions"] == []
        assert int(r1["aggregationResults"][0]["value"]) == 3
        status, r2 = _post(server, {
            "pql": "SELECT major_brand, count(*) FROM corpus_media "
                   "GROUP BY major_brand TOP 10"})
        got = {g["group"][0]: int(g["value"])
               for g in r2["aggregationResults"][0]["groupByResult"]}
        assert got == {"png": 1, "avi": 1, "webm": 1}
        # a newly crawled file lands between queries: the callable
        # re-lists per query, so it appears with NO re-registration
        shutil.copy(os.path.join(FIXTURES, "variant-mjpeg.avi"),
                    corpus / "new.avi")
        status, r3 = _post(server, {
            "pql": "SELECT count(*) FROM corpus_media"})
        assert int(r3["aggregationResults"][0]["value"]) == 4
    finally:
        server.stop()


def test_media_dir_inventory_with_tags(spark):
    inv = {os.path.basename(r["path"]): r
           for r in media_dir_inventory(spark, FIXTURES,
                                        with_tags=True).collect()}
    mp3 = inv["test.mp3"]
    assert dict(mp3["tags"]) == {"encoder": "Lavf53.5.0"}
    wav = dict(inv["pluck-pcm16.wav"]["tags"])
    assert wav["title"] == "Pluck"
    assert wav["artist"] == "Serhiy Storchaka"
    # python.png carries real ImageMagick tEXt timestamps (r14:
    # PNG tEXt/iTXt joined the tag walk)
    assert dict(inv["python.png"]["tags"])["date:create"] \
        .startswith("2014-01-26")
    assert inv["python.gif"]["tags"] is None  # no tag container
    # default stays tag-free (schema stability for existing views)
    base = media_dir_inventory(spark, FIXTURES)
    assert "tags" not in base.columns


def test_media_dir_near_dups_discovers_fixture_families(spark):
    """The whole-stack e2e on REAL third-party files: the fixtures
    directory contains one image shipped in six formats and one
    recording shipped in ten — the one-call near-dup pass must
    recover both families and nothing across them."""
    from realtime_olap_spark.sources.media import media_dir_near_dups

    files = {os.path.basename(r["path"]): r["media_id"]
             for r in read_media_dir(spark, FIXTURES).collect()}
    pairs = media_dir_near_dups(spark, FIXTURES).collect()
    img = {frozenset((r["id_a"], r["id_b"])): r["hamming"]
           for r in pairs if r["modality"] == "image"}
    aud = {frozenset((r["id_a"], r["id_b"])): r["matched_frames"]
           for r in pairs if r["modality"] == "audio"}
    pythons = [files[n] for n in
               ("python.png", "python.bmp", "python.tiff",
                "python.jpg", "python.webp", "python.gif")]
    plucks = [files[n] for n in files if n.startswith("pluck")]
    assert len(plucks) == 10
    # every re-encode pair of the python image is found
    for i, a in enumerate(pythons):
        for b in pythons[i + 1:]:
            assert frozenset((a, b)) in img, (a, b)
    # no image pair reaches across to a genuinely different image
    other = files["file.png"]
    assert not any(other in p for p in img)
    # every format pair of the pluck recording is found
    for i, a in enumerate(plucks):
        for b in plucks[i + 1:]:
            assert frozenset((a, b)) in aud, (a, b)
    # modality separation: audio ids never appear in image pairs
    assert not any(set(p) & set(plucks) for p in img)


def test_media_signature_coverage_audit(spark):
    """The audit surface for silent near-dup skips (r14 verdict
    missing-#1): compressed audio the engine probes but cannot decode
    (MP3/Ogg) shows covered=false, decodable image/audio files show
    their modality, and the pass is metadata-only (no payload in the
    listing side's scan)."""
    from pyspark.sql import functions as F

    from realtime_olap_spark.sources.media import (
        media_signature_coverage, media_signatures, read_media_dir)

    ok = read_media_dir(spark, FIXTURES).where(
        F.col("status") == "ok").select("media_id", "payload")
    sigs = media_signatures(ok)
    cov = {os.path.basename(r["path"]): r
           for r in media_signature_coverage(
               spark, FIXTURES, sigs).collect()}
    # decodable images/audio are covered with the right modality
    assert cov["python.png"]["has_image_sig"]
    assert not cov["python.png"]["has_audio_sig"]
    assert cov["pluck-pcm16.wav"]["has_audio_sig"]
    assert cov["tagged.flac"]["has_audio_sig"]
    # compressed audio: still NOT fingerprintable (no perceptual
    # rows), but r16's decode-free tag-stripped content key covers
    # the re-tagged-duplicate class — the audit flips to covered
    # through has_content_key, with has_audio_sig staying honest
    for n in ("test.mp3", "tagged-vorbis.ogg", "tagged-opus.ogg"):
        assert not cov[n]["has_audio_sig"], n
        assert cov[n]["has_content_key"], n
        assert cov[n]["covered"], n
    # FLAC gets both: decoded fingerprints AND the cheap content key
    assert cov["tagged.flac"]["has_content_key"]
    # non-media is uncovered
    assert not cov["README.md"]["covered"]
    assert not cov["README.md"]["has_content_key"]
    # every file keeps a row (the listing side is the authority)
    assert len(cov) == len(read_media_dir(spark, FIXTURES).collect())


def test_media_dir_dedup_decisions(spark):
    """Decision layer e2e on the real fixture families: each family
    collapses to ONE kept representative (the largest file), every
    member keeps the family's cluster id, non-duplicate files are
    kept singletons."""
    from realtime_olap_spark.sources.media import media_dir_dedup_decisions

    rows = {os.path.basename(r["path"]): r
            for r in media_dir_dedup_decisions(spark, FIXTURES)
            .collect()}
    pythons = ["python.png", "python.bmp", "python.tiff",
               "python.jpg", "python.webp", "python.gif"]
    # one cluster, one keeper = the largest member
    cids = {rows[n]["cluster_id"] for n in pythons}
    assert len(cids) == 1
    kept = [n for n in pythons if rows[n]["keep"]]
    biggest = max(pythons, key=lambda n: rows[n]["n_bytes"])
    assert kept == [biggest]
    # audio family: plucks + the spliced tagged.flac are ONE cluster
    plucks = [n for n in rows if n.startswith("pluck")] \
        + ["tagged.flac"]
    acids = {rows[n]["cluster_id"] for n in plucks}
    assert len(acids) == 1
    akept = [n for n in plucks if rows[n]["keep"]]
    assert akept == [max(plucks, key=lambda n: rows[n]["n_bytes"])]
    # untouched singles are kept, in their own singleton clusters
    for n in ("file.png", "README.md", "test.mp3"):
        assert rows[n]["keep"] and rows[n]["cluster_id"] \
            == rows[n]["media_id"]
    # a third REAL family the pass finds on its own: the two planar
    # TIFF variants encode the same pixels in two layouts
    tiffs = ["variant-planar.tiff", "variant-planar-tiled.tiff"]
    assert rows[tiffs[0]]["cluster_id"] == rows[tiffs[1]]["cluster_id"]
    tkept = [n for n in tiffs if rows[n]["keep"]]
    assert len(tkept) == 1
    # the drop list is exactly the non-representative family members
    dropped = {n for n, r in rows.items() if not r["keep"]}
    assert dropped == (set(pythons) - {biggest}) \
        | (set(plucks) - set(akept)) | (set(tiffs) - set(tkept))


def test_media_signatures_video_branch(spark):
    """r15: video payloads (WebM/AVI — previously silently skipped)
    emit per-sampled-frame hashes in the SAME single pass,
    bit-identical to the dedicated frame_hash_signature operator
    (which round-trips frames through lossless PNG), and the coverage
    audit reports them."""
    from pyspark.sql import functions as F

    from realtime_olap_spark.operators.phash import frame_hash_signature
    from realtime_olap_spark.sources.media import (
        media_signature_coverage, media_signatures, read_media_dir)

    ok = read_media_dir(spark, FIXTURES).where(
        F.col("status") == "ok").select("media_id", "payload")
    sigs = media_signatures(ok, video_every_ms=40)
    vid = {(r["media_id"], r["frame_ts_ms"]): r["sig"]
           for r in sigs.collect() if r["modality"] == "video"}
    assert vid  # inter.webm / inter2.webm / variant-mjpeg.avi decode
    vids = ok.join(
        read_media_dir(spark, FIXTURES).where(
            "path LIKE '%.webm' OR path LIKE '%.avi'")
        .select("media_id"), "media_id")
    want = {(r["media_id"], r["frame_ts_ms"]): r["phash"]
            for r in frame_hash_signature(
                vids.withColumn("media_type", F.lit("video")),
                every_ms=40).collect()
            if r["phash"] is not None}
    assert vid == want
    cov = {os.path.basename(r["path"]): r
           for r in media_signature_coverage(
               spark, FIXTURES, sigs).collect()}
    assert cov["inter.webm"]["has_video_sig"]
    assert cov["variant-mjpeg.avi"]["has_video_sig"]
    # metadata-only goldens with opaque payload stay uncovered
    assert not cov["probe.webm"]["covered"]
    assert not cov["probe.avi"]["covered"]


def test_media_dir_near_dups_video_family(spark, tmp_path):
    """One-call pass over a corpus with a RE-MUXED video copy: the
    same MJPEG footage in two AVI container variants pairs on every
    sampled frame; a reversed-order cut does not (same_ts default)."""
    import shutil
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_multimodal import _assemble_mjpeg_avi, _encode_flat_jpeg

    from realtime_olap_spark.sources.media import media_dir_near_dups

    def frame(shift):
        levels = [(40 if c < 1 + (shift % 3) else 200)
                  for c in range(4)]
        return _encode_flat_jpeg([levels], 32, 8)

    fr = [frame(i) for i in range(3)]
    corpus = tmp_path / "vid"
    corpus.mkdir()
    (corpus / "a.avi").write_bytes(
        _assemble_mjpeg_avi(fr, 32, 8, us_per_frame=40_000))
    (corpus / "b.avi").write_bytes(
        _assemble_mjpeg_avi(fr, 32, 8, us_per_frame=40_000,
                            rec_group=True, suffix=b"db",
                            audio_first=True))
    (corpus / "c.avi").write_bytes(
        _assemble_mjpeg_avi(fr[::-1], 32, 8, us_per_frame=40_000))
    shutil.copy(os.path.join(FIXTURES, "python.png"),
                corpus / "still.png")
    ids = {os.path.basename(r["path"]): r["media_id"]
           for r in __import__("realtime_olap_spark.sources.media",
                               fromlist=["read_media_dir"])
           .read_media_dir(spark, str(corpus)).collect()}
    pairs = media_dir_near_dups(spark, str(corpus), video_every_ms=40,
                                image_max_hamming=3).collect()
    vid = {frozenset((r["id_a"], r["id_b"])): r["matched_frames"]
           for r in pairs if r["modality"] == "video"}
    assert vid.get(frozenset((ids["a.avi"], ids["b.avi"]))) == 3
    assert frozenset((ids["a.avi"], ids["c.avi"])) not in vid
    # the still never crosses modalities
    assert not any(ids["still.png"] in p for p in vid)
