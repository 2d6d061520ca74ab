"""Streaming incremental perceptual near-dup — the image/audio twin
of ``streaming/dedup.py`` (r15 verdict directive #2).

A crawl keeps landing media files; the corpus near-dup state is the
tiny SIGNATURE table (64-bit image hashes / 32-bit audio
sub-fingerprints from ``sources/media.media_signatures``), persisted
once per file at ingest. Each micro-batch:

1. decodes ONLY the new files (one ``mapInPandas`` — the corpus
   payload is never rescanned),
2. finds within-batch pairs (the batch operator,
   ``sources/media.media_near_dup_pairs``),
3. probes the batch's bands against the CORPUS band table
   (:func:`media_near_dup_pairs_against` — O(batch bands ⋈ matching
   corpus bands), the ``minhash_lsh_pairs_against`` shape),
4. appends the new pairs and the batch's signatures under
   ``epoch=N`` directories (idempotent per epoch: a replayed batch
   overwrites its own directory — effectively-once without a
   transaction log).

An availableNow drain over the corpus split into batches yields
EXACTLY the pairs of the one-shot batch pass over the whole
directory (parity-tested), because batch pairs = within-b1 ∪
within-b2 ∪ (b2 × b1) when hashes are deterministic.

Reference parity note: pinot-core has no media operators at all —
extension surface for continuously-crawled multimodal training
corpora.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAIRS_SCHEMA = ("modality string, id_a long, id_b long, "
                "hamming long, matched_frames long, offset_ms long")


def _image_pairs_against(new_img: DataFrame, corpus_img: DataFrame,
                         max_hamming: int, n_bands: int,
                         max_bucket_size: int | None,
                         orientations: bool) -> DataFrame:
    """Image pairs of a NEW batch against the corpus: banded equi-join
    (pigeonhole guarantee per orientation pair), hamming verify,
    canonical (least, greatest) pair with the minimum distance. With
    ``orientations`` both directions probe (new orients × corpus
    identity, new identity × corpus orients) so a rotated file on
    EITHER side is found — the same candidate multiset as the batch
    dihedral join restricted to cross pairs."""
    from realtime_olap_spark.operators.phash import hamming, hash_bands

    def bands(df, idname):
        cols = [F.col("media_id").alias(idname),
                F.col("sig").alias(f"h_{idname}"),
                F.explode(hash_bands(F.col("sig"),
                                     n_bands)).alias("__band")]
        if orientations:
            cols.insert(2, F.col("orient").alias(f"o_{idname}"))
        return df.select(*cols)

    nb = bands(new_img, "id_new")
    cb = bands(corpus_img, "id_corpus")
    if max_bucket_size is not None:
        # size over IDENTITY corpus rows only (the batch dihedral
        # operator's build side, phash_near_dup_pairs_dihedral): with
        # orientations every file contributes 8 band rows, and sizing
        # over all of them would bind the cap ~8x early, silently
        # losing recall in hot buckets (r15 ADVICE)
        base = cb.where(F.col("o_id_corpus") == 0) if orientations \
            else cb
        sizes = base.groupBy("__band") \
            .agg(F.count(F.lit(1)).alias("__n"))
        small = sizes.where(F.col("__n") <= max_bucket_size) \
            .select("__band")
        cb = cb.join(small, "__band")
        nb = nb.join(small, "__band")
    if orientations:
        d1 = nb.join(cb.where(F.col("o_id_corpus") == 0), "__band")
        d2 = nb.where(F.col("o_id_new") == 0).join(cb, "__band")
        cand = d1.select("id_new", "id_corpus", "h_id_new",
                         "h_id_corpus",
                         F.col("o_id_new").alias("orient")) \
            .unionByName(d2.select(
                "id_new", "id_corpus", "h_id_new", "h_id_corpus",
                F.col("o_id_corpus").alias("orient")))
    else:
        cand = nb.join(cb, "__band") \
            .select("id_new", "id_corpus", "h_id_new", "h_id_corpus",
                    F.lit(0).alias("orient"))
    verified = (cand.where(F.col("id_new") != F.col("id_corpus"))
                .select(F.least("id_new", "id_corpus").alias("id_a"),
                        F.greatest("id_new",
                                   "id_corpus").alias("id_b"),
                        hamming(F.col("h_id_new"),
                                F.col("h_id_corpus")).alias("hamming"),
                        "orient")
                .where(F.col("hamming") <= F.lit(max_hamming)))
    if orientations:
        return (verified.groupBy("id_a", "id_b")
                .agg(F.min(F.struct("hamming", "orient")).alias("__b"))
                .select("id_a", "id_b",
                        F.col("__b.hamming").alias("hamming")))
    return verified.select("id_a", "id_b", "hamming").distinct()


def _frame_pairs_against(new_df: DataFrame, corpus_df: DataFrame,
                         bits: int, n_bands: int, max_hamming: int,
                         min_matched_frames: int,
                         max_bucket_size: int | None,
                         align: str,
                         orientations: bool = False) -> DataFrame:
    """Frame-voting pairs of a NEW batch against the corpus — the
    ``video_near_dup_pairs`` algebra with the self-join split into
    batch × corpus: band equi-join over per-frame hashes, hamming
    verify, distinct vote keys, per-pair (or per-delta) counting.
    Serves audio (32-bit sub-fingerprints, align='any_offset') and
    video (64-bit frame hashes, either alignment; with
    ``orientations`` both probe directions — new orients × corpus
    identity and vice versa — exactly the batch dihedral candidate
    set restricted to cross pairs). Deltas and vote keys are
    canonicalized to the (least, greatest) pair orientation so a
    drained stream reproduces the batch operator bit-for-bit."""
    from realtime_olap_spark.operators.phash import hamming, hash_bands

    def bands(df, idname, tsname):
        cols = [F.col("media_id").alias(idname),
                F.col("frame_ts_ms").alias(tsname),
                F.col("sig").alias(f"h_{idname}"),
                F.explode(hash_bands(F.col("sig"), n_bands,
                                     bits=bits)).alias("__band")]
        if orientations:
            cols.insert(3, F.col("orient").alias(f"o_{idname}"))
        return df.select(*cols)

    nb = bands(new_df, "id_new", "ts_new")
    cb = bands(corpus_df, "id_corpus", "ts_corpus")
    if max_bucket_size is not None:
        keys = (["ts_corpus", "__band"] if align == "same_ts"
                else ["__band"])
        base = cb.where(F.col("o_id_corpus") == 0) if orientations \
            else cb
        sizes = base.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
        small = sizes.where(F.col("__n") <= max_bucket_size) \
            .select(*keys)
        cb = cb.join(small, keys)
        nb = nb.join(small.withColumnRenamed("ts_corpus", "ts_new")
                     if align == "same_ts" else small,
                     (["ts_new", "__band"] if align == "same_ts"
                      else ["__band"]))
    join_keys = ["__band"]
    if align == "same_ts":
        cb = cb.withColumnRenamed("ts_corpus", "__ts")
        nb = nb.withColumnRenamed("ts_new", "__ts")
        join_keys = ["__ts", "__band"]
    if orientations:
        d1 = nb.join(cb.where(F.col("o_id_corpus") == 0), join_keys)
        d2 = nb.where(F.col("o_id_new") == 0).join(cb, join_keys)
        cand = d1.unionByName(d2).drop("o_id_new", "o_id_corpus")
    else:
        cand = nb.join(cb, join_keys)
    if align == "same_ts":
        cand = cand.withColumn("ts_new", F.col("__ts")) \
            .withColumn("ts_corpus", F.col("__ts"))
    fwd = F.col("id_new") < F.col("id_corpus")
    matched = (cand
               .where(F.col("id_new") != F.col("id_corpus"))
               .where(hamming(F.col("h_id_new"), F.col("h_id_corpus"))
                      <= F.lit(max_hamming))
               .select(
                   F.least("id_new", "id_corpus").alias("id_a"),
                   F.greatest("id_new", "id_corpus").alias("id_b"),
                   F.when(fwd, F.col("ts_new") - F.col("ts_corpus"))
                   .otherwise(F.col("ts_corpus") - F.col("ts_new"))
                   .alias("__delta"),
                   F.when(fwd, F.col("ts_new"))
                   .otherwise(F.col("ts_corpus")).alias("ts"))
               .distinct())
    per_delta = (matched.groupBy("id_a", "id_b", "__delta")
                 .agg(F.count(F.lit(1)).alias("matched_frames")))
    if align == "same_ts":
        # __delta is identically 0 under same_ts: one vote bucket
        return (per_delta.select("id_a", "id_b", "matched_frames")
                .where(F.col("matched_frames")
                       >= F.lit(min_matched_frames)))
    best = (per_delta.groupBy("id_a", "id_b")
            .agg(F.max(F.struct("matched_frames", "__delta"))
                 .alias("__best")))
    return (best.select(
        "id_a", "id_b",
        F.col("__best.matched_frames").alias("matched_frames"),
        F.col("__best.__delta").alias("offset_ms"))
        .where(F.col("matched_frames") >= F.lit(min_matched_frames)))


def media_near_dup_pairs_against(new_sigs: DataFrame,
                                 corpus_sigs: DataFrame,
                                 image_max_hamming: int = 10,
                                 image_n_bands: int = 16,
                                 audio_max_hamming: int = 7,
                                 min_matched_frames: int = 2,
                                 max_bucket_size: int | None = 4096,
                                 image_orientations: bool = False,
                                 video_align: str = "same_ts",
                                 ) -> DataFrame:
    """Near-dup pairs of a NEW batch's signatures against a CORPUS
    signature table — the asymmetric ingestion shape: per-batch cost
    is O(batch bands ⋈ matching corpus bands), never corpus², and the
    corpus payload is never re-read (signatures only). Output matches
    ``sources/media.media_near_dup_pairs``: (modality, id_a, id_b,
    hamming, matched_frames, offset_ms), pairs canonicalized
    (id_a < id_b). ``audio_content`` rows join on exact key equality
    (modality ``audio_exact`` — the re-tagged same-encode class).
    ``max_bucket_size`` caps degenerate CORPUS band buckets and
    content-key groups (the ``minhash_lsh_pairs_against``
    discipline)."""
    from realtime_olap_spark.operators.afp import FP_BITS

    ac_new = new_sigs.where(F.col("modality") == "audio_content") \
        .select(F.col("media_id").alias("id_new"), "sig")
    ac_cor = corpus_sigs.where(F.col("modality") == "audio_content") \
        .select(F.col("media_id").alias("id_corpus"), "sig")
    if max_bucket_size is not None:
        gs = ac_cor.groupBy("sig").agg(F.count(F.lit(1)).alias("__n"))
        ac_cor = ac_cor.join(gs.where(F.col("__n") <= max_bucket_size)
                             .select("sig"), "sig")
    ac = (ac_new.join(ac_cor, "sig")
          .where(F.col("id_new") != F.col("id_corpus"))
          .select(F.lit("audio_exact").alias("modality"),
                  F.least("id_new", "id_corpus").alias("id_a"),
                  F.greatest("id_new", "id_corpus").alias("id_b"),
                  F.lit(0).cast("long").alias("hamming"))
          .distinct())
    img_new = new_sigs.where(F.col("modality") == "image")
    img_cor = corpus_sigs.where(F.col("modality") == "image")
    img = _image_pairs_against(
        img_new, img_cor, image_max_hamming, image_n_bands,
        max_bucket_size, image_orientations) \
        .select(F.lit("image").alias("modality"), "id_a", "id_b",
                "hamming")
    aud = _frame_pairs_against(
        new_sigs.where(F.col("modality") == "audio"),
        corpus_sigs.where(F.col("modality") == "audio"),
        FP_BITS, 8, audio_max_hamming, min_matched_frames,
        max_bucket_size, "any_offset") \
        .select(F.lit("audio").alias("modality"), "id_a", "id_b",
                "matched_frames", "offset_ms")
    vid = _frame_pairs_against(
        new_sigs.where(F.col("modality") == "video"),
        corpus_sigs.where(F.col("modality") == "video"),
        64, image_n_bands, image_max_hamming, min_matched_frames,
        max_bucket_size, video_align,
        orientations=image_orientations) \
        .select(F.lit("video").alias("modality"), "id_a", "id_b",
                "matched_frames",
                *(["offset_ms"] if video_align == "any_offset"
                  else []))
    return img.unionByName(ac, allowMissingColumns=True) \
        .unionByName(aud, allowMissingColumns=True) \
        .unionByName(vid, allowMissingColumns=True)


class MediaNearDupIngest:
    """Micro-batch driver: foreachBatch over a (media_id, payload)
    stream. Per epoch — ONE decode pass over the batch, within-batch
    pairs + batch-vs-corpus pairs, both appended under
    ``pairs_dir/epoch=N``; the batch's signatures appended under
    ``sigs_dir/epoch=N`` (epoch-keyed directories make a replayed
    batch overwrite itself — idempotent re-runs). Serve the growing
    pair table live over POST /query by registering
    ``lambda: ingest.pairs()`` as a derived table (re-evaluated per
    query — new epochs visible with no re-registration).

    r16 (verdict directive #1 — the live curation loop): per epoch
    the ingest ALSO maintains incremental CLUSTER state. New pair
    edges are unioned into the persisted (media_id, cluster_id)
    assignment by running connected components over ONLY the touched
    components — the previous members of any cluster an edge lands
    in, re-expressed as star edges (member → cluster root), plus the
    new edges — so per-epoch CC cost is O(frontier), never O(all
    pairs ever). Component ids keep the batch operator's min-node-id
    semantics, so :meth:`decisions` (file metadata ⋈ live clusters →
    ``decide_keeps``) equals the batch
    ``media_dedup_decisions(files, pairs)`` over the drained corpus —
    a crawl can serve its curated keep/drop corpus WHILE ingesting,
    with no full CC re-run per query. File metadata per epoch lands
    under ``meta_dir/epoch=N`` (latest epoch wins per file on
    replay); cluster deltas under ``clusters_dir/epoch=N``.

    ``image_orientations`` defaults ON (r15 verdict): rotated and
    mirrored crawl duplicates are found with no knob; the expansion
    is one-sided (probe 8×, build identity-only)."""

    def __init__(self, spark: SparkSession, sigs_dir: str,
                 pairs_dir: str,
                 clusters_dir: str | None = None,
                 meta_dir: str | None = None,
                 image_max_hamming: int = 10, image_n_bands: int = 16,
                 audio_max_hamming: int = 7,
                 min_matched_frames: int = 2,
                 max_bucket_size: int | None = 4096,
                 image_orientations: bool = True,
                 video_every_ms: int = 1000,
                 video_align: str = "same_ts",
                 coverage_log: bool = True):
        self.spark = spark
        self.sigs_dir = sigs_dir
        self.pairs_dir = pairs_dir
        self.clusters_dir = (clusters_dir
                             or pairs_dir.rstrip("/") + "_clusters")
        self.meta_dir = meta_dir or sigs_dir.rstrip("/") + "_meta"
        self.video_every_ms = video_every_ms
        self.coverage_log = coverage_log
        self.params = dict(image_max_hamming=image_max_hamming,
                           image_n_bands=image_n_bands,
                           audio_max_hamming=audio_max_hamming,
                           min_matched_frames=min_matched_frames,
                           max_bucket_size=max_bucket_size,
                           image_orientations=image_orientations,
                           video_align=video_align)

    # -- readers ----------------------------------------------------
    def _read_or_empty(self, path: str, schema: str) -> DataFrame:
        # an epoch that emitted zero rows writes no part files, and
        # before the first epoch the directory does not exist at all —
        # ONLY the missing-directory case degrades to empty; a corrupt
        # or permission-broken state directory must fail the batch
        # loudly, not silently drop the corpus from the against-join
        # (r15 ADVICE: no bare-except "no corpus" fallback)
        if os.path.isdir(path):
            return self.spark.read.schema(
                self.spark.createDataFrame([], schema).schema
            ).parquet(path)
        return self.spark.createDataFrame([], schema)

    def signatures(self, exclude_epoch: int | None = None) -> DataFrame:
        sch = "media_id long, modality string, frame_ts_ms long, sig long"
        if self.params["image_orientations"]:
            sch += ", orient long"
        df = self._read_or_empty(self.sigs_dir, sch + ", epoch long")
        if exclude_epoch is not None:
            # a replayed batch must not see its own stale signatures
            # (written by the failed attempt) as "corpus"
            df = df.where(F.col("epoch") != int(exclude_epoch))
        return df.drop("epoch")

    def pairs(self) -> DataFrame:
        return self._read_or_empty(
            self.pairs_dir, PAIRS_SCHEMA + ", epoch long").drop("epoch")

    _META_SCHEMA = ("media_id long, path string, media_type string, "
                    "n_bytes long, status string")

    def meta(self, exclude_epoch: int | None = None) -> DataFrame:
        """Per-file listing metadata across epochs, LATEST epoch
        winning per media_id (a replayed batch's rewrite supersedes
        its failed attempt; a re-crawled path supersedes its old
        size)."""
        df = self._read_or_empty(self.meta_dir,
                                 self._META_SCHEMA + ", epoch long")
        if exclude_epoch is not None:
            df = df.where(F.col("epoch") != int(exclude_epoch))
        best = (df.groupBy("media_id")
                .agg(F.max(F.struct("epoch", "path", "media_type",
                                    "n_bytes", "status")).alias("__b")))
        return best.select(
            "media_id", F.col("__b.path").alias("path"),
            F.col("__b.media_type").alias("media_type"),
            F.col("__b.n_bytes").alias("n_bytes"),
            F.col("__b.status").alias("status"))

    def clusters(self, exclude_epoch: int | None = None) -> DataFrame:
        """The LIVE near-dup cluster assignment: (media_id,
        cluster_id), latest epoch's delta winning per node. Files in
        no pair carry no row (they are their own singleton clusters —
        :meth:`decisions` coalesces)."""
        df = self._read_or_empty(
            self.clusters_dir, "media_id long, cluster_id long, "
                               "epoch long")
        if exclude_epoch is not None:
            df = df.where(F.col("epoch") != int(exclude_epoch))
        best = (df.groupBy("media_id")
                .agg(F.max(F.struct("epoch", "cluster_id"))
                     .alias("__b")))
        return best.select("media_id",
                           F.col("__b.cluster_id").alias("cluster_id"))

    def decisions(self) -> DataFrame:
        """The LIVE curated-corpus table: one row per ingested file
        with its cluster and the keep/drop decision
        (``sources.media.decide_keeps`` — largest file per cluster
        wins, ties to smallest media_id; identical to the batch
        ``media_dedup_decisions`` over the drained corpus). Register
        ``lambda: ingest.decisions()`` as a derived table to serve
        ``WHERE keep`` over POST /query while the crawl runs."""
        from realtime_olap_spark.sources.media import decide_keeps

        out = (self.meta().join(self.clusters(), "media_id", "left")
               .withColumn("cluster_id",
                           F.coalesce(F.col("cluster_id"),
                                      F.col("media_id"))))
        return decide_keeps(out)

    def coverage(self) -> DataFrame:
        """The LIVE signature-coverage audit over everything ingested
        so far (``sources.media.media_coverage`` over the persisted
        meta + signature tables — zero re-decode): which crawled
        files contributed no signature of any family and are
        therefore invisible to the near-dup pass. Register as a
        derived table to watch coverage while the crawl runs."""
        from realtime_olap_spark.sources.media import media_coverage

        return media_coverage(self.meta(), self.signatures())

    def _update_clusters(self, pairs: DataFrame,
                         epoch_id: int) -> None:
        """Union this epoch's pair edges into the persisted cluster
        state: CC over the FRONTIER only — the new edges plus the
        previous members of every touched cluster as (member → root)
        star edges. Min-node-id component semantics are preserved
        (the union graph contains every node of each merged
        component), so the live assignment always equals a from-
        scratch CC over all pairs ever seen."""
        from realtime_olap_spark.operators.components import (
            connected_components)

        edges = (pairs.select(F.col("id_a").alias("src"),
                              F.col("id_b").alias("dst"))
                 .where(F.col("src") != F.col("dst")).distinct())
        prev = self.clusters(exclude_epoch=epoch_id)
        nodes = (edges.select(F.col("src").alias("media_id"))
                 .unionByName(edges.select(F.col("dst")
                                           .alias("media_id")))
                 .distinct())
        touched = (prev.join(nodes, "media_id")
                   .select("cluster_id").distinct())
        star = (prev.join(touched, "cluster_id")
                .select(F.col("media_id").alias("src"),
                        F.col("cluster_id").alias("dst")))
        cc = (connected_components(star.unionByName(edges))
              .select(F.col("node").alias("media_id"),
                      F.col("component").alias("cluster_id")))
        # connected_components omits the root's own (root, root) row
        # (star-forest edges have root < node); the state table MUST
        # carry it, or a LATER edge landing on the root node would
        # miss its cluster in the frontier lookup and split the
        # component
        roots = cc.select(F.col("cluster_id").alias("media_id"),
                          "cluster_id").distinct()
        delta = cc.unionByName(roots)
        delta.write.mode("overwrite").parquet(
            os.path.join(self.clusters_dir, f"epoch={int(epoch_id)}"))

    # -- the per-batch body (callable directly for batch backfills) --
    def process_batch(self, files: DataFrame, epoch_id: int) -> None:
        from realtime_olap_spark.sources.media import (
            log_signature_coverage, media_near_dup_pairs,
            media_signatures)

        cols = set(files.columns)
        meta = files.select(
            "media_id",
            *[(F.col(c) if c in cols
               else F.lit(None).cast(t)).alias(c)
              for c, t in (("path", "string"),
                           ("media_type", "string"),
                           ("n_bytes", "long"),
                           ("status", "string"))])
        meta.write.mode("overwrite").parquet(
            os.path.join(self.meta_dir, f"epoch={int(epoch_id)}"))
        if "status" in cols:
            files = files.where(F.col("status") == "ok")
        sigs = media_signatures(
            files.select("media_id", "payload"),
            image_orientations=self.params["image_orientations"],
            video_every_ms=self.video_every_ms,
        ).persist()
        sigs.count()  # the ONE payload pass over the batch
        if self.coverage_log and {"media_type", "path",
                                  "n_bytes"} <= cols:
            log_signature_coverage(
                files, sigs, f"MediaNearDupIngest epoch {epoch_id}")
        corpus = self.signatures(exclude_epoch=epoch_id)
        within = media_near_dup_pairs(sigs, **self.params)
        against = media_near_dup_pairs_against(sigs, corpus,
                                               **self.params)
        pairs = (within.unionByName(against, allowMissingColumns=True)
                 .dropDuplicates(["modality", "id_a", "id_b"]))
        epoch_dir = os.path.join(self.pairs_dir,
                                 f"epoch={int(epoch_id)}")
        pairs.write.mode("overwrite").parquet(epoch_dir)
        # incremental cluster maintenance sees ONLY this epoch's
        # edges (read back from the just-written directory — no
        # recompute of the join lineage); earlier epochs' effects are
        # already folded into the persisted cluster state
        self._update_clusters(
            self._read_or_empty(epoch_dir, PAIRS_SCHEMA), epoch_id)
        sigs.write.mode("overwrite").parquet(
            os.path.join(self.sigs_dir, f"epoch={int(epoch_id)}"))
        sigs.unpersist()

    # -- maintenance ------------------------------------------------
    def compact(self) -> None:
        """Fold the accumulated ``epoch=N`` delta directories of all
        four state tables (pairs, signatures, meta, clusters) into a
        single consolidated epoch — the minion segment-merge analog
        (``sources/maintenance.py``) for the ingest state: latest-wins
        rows are resolved once and the per-query groupBy over every
        historical delta disappears until deltas accumulate again.

        MAINTENANCE WINDOW ONLY: run while the stream is STOPPED
        after a drained ``availableNow`` pass whose checkpoint
        committed — a restarted stream replaying its last uncommitted
        epoch would overwrite the consolidated directory with that
        single batch's rows.

        Crash-safe per table (two-phase): the consolidated rows are
        written to an underscore-prefixed ``_compacting`` directory
        (invisible to Spark reads) and only after a successful write
        (``_SUCCESS`` marker) are the old epoch directories removed
        and the new directory renamed into place; :meth:`compact`
        first FINISHES any interrupted previous compaction (tmp with
        _SUCCESS -> complete the swap; tmp without -> discard, state
        untouched). Re-running after any failure converges."""
        import shutil

        dirs = [
            (self.pairs_dir,
             self.pairs().dropDuplicates(["modality", "id_a", "id_b"])),
            (self.sigs_dir, self.signatures()),
            (self.meta_dir, self.meta()),
            (self.clusters_dir, self.clusters()),
        ]
        for d, _ in dirs:
            self._finish_or_discard_compaction(d)
        epochs = [int(name.split("=", 1)[1])
                  for d, _ in dirs if os.path.isdir(d)
                  for name in os.listdir(d) if name.startswith("epoch=")]
        if not epochs:
            return
        k = max(epochs)
        for d, df in dirs:
            if not os.path.isdir(d):
                continue
            # the covered-epoch bound rides in the tmp dir NAME so a
            # crash recovery never deletes epoch dirs written after
            # the failed attempt (they supersede the consolidation)
            tmp = os.path.join(d, f"_compacting_{k}")
            df.write.mode("overwrite").parquet(tmp)
            for name in os.listdir(d):
                if name.startswith("epoch=") \
                        and int(name.split("=", 1)[1]) <= k:
                    shutil.rmtree(os.path.join(d, name))
            os.rename(tmp, os.path.join(d, f"epoch={k}"))

    @staticmethod
    def _finish_or_discard_compaction(d: str) -> None:
        import shutil

        if not os.path.isdir(d):
            return
        for name in os.listdir(d):
            if not name.startswith("_compacting_"):
                continue
            tmp = os.path.join(d, name)
            k = int(name.split("_compacting_", 1)[1])
            if os.path.isfile(os.path.join(tmp, "_SUCCESS")):
                # write completed; crash hit between the epoch-dir
                # deletes and the rename — finish the swap for epochs
                # <= k only (later epochs supersede the consolidation)
                for other in os.listdir(d):
                    if other.startswith("epoch=") \
                            and int(other.split("=", 1)[1]) <= k:
                        shutil.rmtree(os.path.join(d, other))
                os.rename(tmp, os.path.join(d, f"epoch={k}"))
            else:
                shutil.rmtree(tmp)  # partial write; state untouched

    # -- streaming entry --------------------------------------------
    def start(self, files_stream: DataFrame, checkpoint_dir: str,
              available_now: bool = True):
        """``files_stream``: a streaming frame carrying ``media_id``
        and ``payload`` (e.g. a ``binaryFile`` readStream projected
        through the ``read_media_dir`` column shape)."""
        writer = (files_stream.writeStream
                  .foreachBatch(lambda df, eid:
                                self.process_batch(df, eid))
                  .option("checkpointLocation", checkpoint_dir))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
