"""Streaming incremental perceptual near-dup (r15 verdict directive
#2): per micro-batch, new files are decoded ONCE, banded, and joined
against the persisted corpus signature table — the corpus payload is
never rescanned. Parity: an availableNow drain over the fixtures
corpus split into two batches yields exactly the one-shot batch
pass's pairs; the growing pair table is servable over POST /query
while ingest runs."""

from __future__ import annotations

import glob as globmod
import json
import os
import shutil

from realtime_olap_spark.sources.media import (media_dir_near_dups,
                                               read_media_dir,
                                               read_media_dir_stream)
from realtime_olap_spark.streaming import MediaNearDupIngest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _canon(rows):
    return {(r["modality"], r["id_a"], r["id_b"], r["hamming"],
             r["matched_frames"], r["offset_ms"]) for r in rows}


def _media_files():
    keep = (".png", ".jpg", ".bmp", ".tiff", ".webp", ".gif",
            ".wav", ".flac", ".aiff", ".aifc", ".au",
            ".webm", ".avi")  # r15: video joins the parity corpus
    return sorted(p for p in globmod.glob(os.path.join(FIXTURES, "*"))
                  if os.path.isfile(p) and p.lower().endswith(keep))


def test_streaming_two_batches_equal_one_batch_pass(spark, tmp_path):
    """Parity + live serving in one e2e: fixtures landed in two
    micro-batches produce the SAME pair set as media_dir_near_dups
    over the final directory, and a derived table over ingest.pairs()
    serves the growth over POST /query between the drains."""
    import urllib.request

    from realtime_olap_spark.server import PQLServer
    from tests.conftest import SF_DIR as _SF

    landing = tmp_path / "landing"
    landing.mkdir()
    files = _media_files()
    assert len(files) >= 16
    # batch 1: half of each family (alternating keeps both image and
    # audio pairs crossing the batch boundary)
    b1, b2 = files[0::2], files[1::2]
    for p in b1:
        shutil.copy(p, landing / os.path.basename(p))

    ingest = MediaNearDupIngest(spark, str(tmp_path / "sigs"),
                                str(tmp_path / "pairs"))
    ckpt = str(tmp_path / "ckpt")
    stream = read_media_dir_stream(spark, str(landing))
    ingest.start(stream, ckpt).awaitTermination()
    n1 = ingest.pairs().count()
    assert n1 > 0  # within-batch-1 pairs exist

    server = PQLServer(spark, str(_SF)).start()
    try:
        server.engine.catalog.register_derived(
            "media_near_dups", lambda: ingest.pairs())

        def post(pql):
            req = urllib.request.Request(
                f"http://{server.host}:{server.port}/query",
                data=json.dumps({"pql": pql}).encode(), method="POST",
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as resp:
                return json.loads(resp.read().decode())

        r1 = post("SELECT count(*) FROM media_near_dups")
        assert int(r1["aggregationResults"][0]["value"]) == n1

        # batch 2 lands while the server is up; same checkpoint so
        # availableNow picks up only the new files
        for p in b2:
            shutil.copy(p, landing / os.path.basename(p))
        ingest.start(read_media_dir_stream(spark, str(landing)),
                     ckpt).awaitTermination()

        r2 = post("SELECT count(*) FROM media_near_dups")
        n2 = int(r2["aggregationResults"][0]["value"])
        assert n2 > n1  # cross-batch + within-batch-2 pairs arrived
        assert n2 == ingest.pairs().count()
        r3 = post("SELECT modality, count(*) FROM media_near_dups "
                  "GROUP BY modality TOP 5")
        got = {g["group"][0]: int(g["value"])
               for g in r3["aggregationResults"][0]["groupByResult"]}
        # r16: tagged.flac is a re-tag of pluck-pcm16.flac — the
        # decode-free content key pairs them as audio_exact
        assert set(got) == {"image", "audio", "audio_exact"}
    finally:
        server.stop()

    # PARITY: the drained stream == the one-shot batch pass over the
    # final landing directory (same paths -> same media_ids)
    want = _canon(media_dir_near_dups(spark, str(landing)).collect())
    assert _canon(ingest.pairs().collect()) == want


def test_process_batch_replay_is_idempotent(spark, tmp_path):
    """A replayed epoch (crash between state writes and checkpoint
    commit) overwrites its own epoch directories: pairs and
    signatures end up identical to the single-run outcome."""
    landing = tmp_path / "l"
    landing.mkdir()
    for n in ("python.png", "python.jpg", "pluck-pcm16.wav",
              "pluck-pcm16.flac"):
        shutil.copy(os.path.join(FIXTURES, n), landing / n)
    b1 = read_media_dir(spark, str(landing))
    ingest = MediaNearDupIngest(spark, str(tmp_path / "s"),
                                str(tmp_path / "p"))
    ingest.process_batch(b1, 0)
    once_pairs = _canon(ingest.pairs().collect())
    once_sigs = ingest.signatures().count()
    assert once_pairs and once_sigs
    # replay epoch 0: the stale epoch-0 signatures are NOT corpus
    ingest.process_batch(b1, 0)
    assert _canon(ingest.pairs().collect()) == once_pairs
    assert ingest.signatures().count() == once_sigs


def test_against_orientations_cross_batch(spark, tmp_path):
    """A rotated duplicate landing in a LATER batch than its original
    is found by the incremental pass when image_orientations is on —
    in both directions (original-then-rotated and rotated-then-
    original)."""
    import numpy as np

    from realtime_olap_spark.operators import multimodal as M

    enc = M._make_png_encoder()
    with open(os.path.join(FIXTURES, "python.png"), "rb") as f:
        base_bytes = f.read()
    base = M._make_png_decoder()(base_bytes)[3]
    rot = enc(np.ascontiguousarray(np.rot90(base, 1)))
    for first, second in ((base_bytes, rot), (rot, base_bytes)):
        d = tmp_path / f"o{len(first)}"
        d.mkdir()
        ingest = MediaNearDupIngest(spark, str(d / "s"), str(d / "p"),
                                    image_orientations=True)
        (d / "first.png").write_bytes(first)
        ingest.process_batch(read_media_dir(spark, str(d)), 0)
        assert ingest.pairs().count() == 0
        (d / "second.png").write_bytes(second)
        b2 = read_media_dir(spark, str(d)).where(
            "path LIKE '%second.png'")
        ingest.process_batch(b2, 1)
        rows = ingest.pairs().collect()
        assert len(rows) == 1 and rows[0]["hamming"] == 0
        # and parity with the batch dihedral one-call pass
        want = _canon(media_dir_near_dups(
            spark, str(d), image_orientations=True).collect())
        assert _canon(rows) == want


def test_read_media_dir_stream_shape(spark, tmp_path):
    """The streaming reader yields the batch reader's exact column
    shape and size-cap semantics per micro-batch."""
    landing = tmp_path / "x"
    landing.mkdir()
    for n in ("python.png", "probe.avi"):
        shutil.copy(os.path.join(FIXTURES, n), landing / n)
    cap = os.path.getsize(landing / "probe.avi")  # png is the bigger
    got = {}

    def sink(df, eid):
        for r in df.collect():
            got[os.path.basename(r["path"])] = r

    (read_media_dir_stream(spark, str(landing), max_bytes=cap)
     .writeStream.foreachBatch(sink)
     .option("checkpointLocation", str(tmp_path / "ck"))
     .trigger(availableNow=True).start().awaitTermination())
    batch = {os.path.basename(r["path"]): r
             for r in read_media_dir(spark, str(landing),
                                     max_bytes=cap).collect()}
    assert set(got) == set(batch)
    for n, r in got.items():
        assert r["media_id"] == batch[n]["media_id"]
        assert r["status"] == batch[n]["status"]
    assert got["python.png"]["status"] == "oversize"
    assert got["python.png"]["payload"] is None
    assert got["probe.avi"]["payload"] is not None


def test_against_join_plan_is_signature_only(spark):
    """The batch-vs-corpus near-dup join is pure JVM over the tiny
    signature tables: no Python/pandas nodes, no payload column —
    the corpus is never re-decoded per micro-batch."""
    from realtime_olap_spark.streaming import media_near_dup_pairs_against

    sch = "media_id long, modality string, frame_ts_ms long, sig long"
    new = spark.createDataFrame(
        [(1, "image", 0, 42), (1, "audio", 0, 7)], sch)
    corpus = spark.createDataFrame(
        [(2, "image", 0, 42), (2, "audio", 64, 7)], sch)
    df = media_near_dup_pairs_against(new, corpus)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan
    assert "MapInPandas" not in plan and "PythonUDF" not in plan
    # and it actually pairs the planted image twins
    rows = {(r["modality"], r["id_a"], r["id_b"]) for r in df.collect()}
    assert ("image", 1, 2) in rows
