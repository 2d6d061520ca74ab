"""Training-shard sink — the tail of the curation pipeline.

Packed training sequences ship to trainers as a set of roughly equal,
individually loadable SHARDS plus a MANIFEST describing each shard
(row/token totals), the layout every public training-data format uses
(WebDataset tars, TFRecord shards, JSONL shard directories). This sink
writes the same layout in parquet, Spark-first:

- **Shard assignment is a row property**: ``pmod(xxhash64(key), N)`` —
  reproducible under re-runs, re-partitioning, and re-layouts, exactly
  like the engine's sampling/split decisions (``operators/sampling``),
  so a re-built dataset assigns every sequence to the same shard.
- **One write pass**: the corpus is repartitioned BY the shard column
  (one shuffle — also what bounds files per shard) and written
  ``partitionBy("shard")``; the manifest is a per-shard aggregate (N
  rows out) written next to the data.
- **Atomic publish**: data + manifest stage into a temp dir and rename
  into place with a completion marker — a reader never observes a
  half-written dataset (same discipline as the IVF/PQ index builds and
  the streaming rollup swap).

At 100 TB: one hash-partitioned shuffle sized by ``n_shards``; the
manifest aggregate is map-side combined to N tiny rows.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Completion marker written last inside the staged dataset.
MARKER = "_SHARDS_COMPLETE"


def with_shard(df: DataFrame, key: str, n_shards: int,
               shard_col: str = "shard") -> DataFrame:
    """Attach the deterministic shard id: ``pmod(xxhash64(key), N)``."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return df.withColumn(
        shard_col,
        F.pmod(F.xxhash64(F.col(key)), F.lit(n_shards)).cast("int"))


#: File holding the published content Bloom filter (JSON), when requested.
BLOOM_FILE = "content_bloom.json"

#: File holding per-shard Theta sketches (JSON), when requested.
THETA_FILE = "theta_sketches.json"


def write_training_shards(df: DataFrame, path: str, key: str,
                          n_shards: int,
                          token_col: str | None = None,
                          files_per_shard: int = 1,
                          overwrite: bool = False,
                          content_key: str | None = None,
                          bloom_fpp: float = 1e-3,
                          theta_columns: tuple[str, ...] = (),
                          theta_k: int = 4096) -> None:
    """Write ``df`` as ``path/data/shard=K/…parquet`` + a per-shard
    manifest at ``path/manifest`` + the completion marker, atomically.

    ``token_col`` (optional) adds exact per-shard token totals to the
    manifest — the number a training job actually schedules by.

    ``content_key`` (optional) publishes a Bloom filter of
    ``md5(content_key)`` next to the manifest (``content_bloom.json``,
    inside the same atomic stage): the ingest-time artifact the NEXT
    batch gates against (``dedup_against_dataset``) without re-shuffling
    this dataset — the sketch analog of the segment sink's per-column
    parquet bloom filters, at dataset grain.

    ``theta_columns`` (optional) publishes one Theta (KMV) sketch PER
    SHARD per named column (``theta_sketches.json``, same atomic
    stage) — the distinct-count metadata the reference keeps per
    segment, at shard grain. Because the union merge law is exact
    (``operators/theta``), readers answer "how many distinct X?" for
    the dataset, any shard SUBSET, or a UNION of datasets by merging
    sketches — metadata only, zero data read
    (:func:`dataset_distinct_estimate`, :func:`dataset_key_overlap`).

    An existing dataset at ``path`` FAILS the publish unless
    ``overwrite=True`` (which swaps the staged build into place and
    removes the old one) — a silent keep-the-old would let a re-run
    believe it shipped fresh data. Concurrent first-publish races still
    resolve to whichever rename wins, both writers having produced the
    same deterministic content."""
    sharded = with_shard(df, key, n_shards)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col).cast("long")).alias("n_tokens"))
    manifest = sharded.groupBy("shard").agg(*aggs)

    stage = f"{path}.tmp-{os.getpid()}"
    (sharded.repartition(files_per_shard * n_shards, F.col("shard"))
     .write.mode("overwrite").partitionBy("shard")
     .parquet(os.path.join(stage, "data")))
    manifest.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(stage, "manifest"))
    if content_key is not None:
        from realtime_olap_spark.operators.bloom import (bloom_build,
                                                         optimal_params)
        keys = (df.select(F.md5(F.col(content_key).cast("string"))
                          .alias("__ck"))
                .where(F.col("__ck").isNotNull()).distinct())
        m, k = optimal_params(keys.count(), bloom_fpp)
        with open(os.path.join(stage, BLOOM_FILE), "w") as f:
            f.write(bloom_build(keys, "__ck", m, k).to_json())
    if theta_columns:
        import json  # noqa: PLC0415
        from realtime_olap_spark.operators.theta import theta_build_grouped
        blob = {}
        for col in theta_columns:
            per_shard = theta_build_grouped(sharded, ["shard"],
                                            F.col(col).cast("string"),
                                            k=theta_k)
            blob[col] = {str(shard): json.loads(sk.to_json())
                         for (shard,), sk in per_shard.items()}
        with open(os.path.join(stage, THETA_FILE), "w") as f:
            json.dump(blob, f)
    open(os.path.join(stage, MARKER), "w").close()
    if os.path.exists(path):
        if not overwrite:
            shutil.rmtree(stage, ignore_errors=True)
            raise FileExistsError(
                f"{path} already holds a dataset; pass overwrite=True "
                f"to replace it")
        retired = f"{path}.old-{os.getpid()}"
        os.rename(path, retired)
        os.rename(stage, path)
        shutil.rmtree(retired, ignore_errors=True)
        return
    try:
        os.rename(stage, path)
    except OSError:
        # lost a first-publish race: keep the winner (identical content)
        shutil.rmtree(stage, ignore_errors=True)


def read_shards(spark: SparkSession, path: str,
                shards: list[int] | None = None) -> DataFrame:
    """Read the dataset (or a subset of shards — partition-pruned).
    Refuses a dataset without its completion marker."""
    if not os.path.exists(os.path.join(path, MARKER)):
        raise FileNotFoundError(
            f"{path} has no {MARKER} marker — incomplete or not a "
            f"shard dataset")
    df = spark.read.parquet(os.path.join(path, "data"))
    if shards is not None:
        df = df.where(F.col("shard").isin([int(s) for s in shards]))
    return df


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    if not os.path.exists(os.path.join(path, MARKER)):
        raise FileNotFoundError(f"{path} has no {MARKER} marker")
    return spark.read.parquet(os.path.join(path, "manifest"))


def read_bloom(path: str):
    """The dataset's published content Bloom filter, or None if the
    publish didn't request one. Refuses unmarked datasets like the other
    readers."""
    from realtime_olap_spark.operators.bloom import BloomFilter
    if not os.path.exists(os.path.join(path, MARKER)):
        raise FileNotFoundError(f"{path} has no {MARKER} marker")
    bpath = os.path.join(path, BLOOM_FILE)
    if not os.path.exists(bpath):
        return None
    with open(bpath) as f:
        return BloomFilter.from_json(f.read())


def read_theta(path: str, col: str):
    """The dataset's published per-shard Theta sketches for ``col`` as
    ``{shard: ThetaSketch}`` (sketches are over the STRING form of the
    column, matching the write). None when the publish didn't request
    theta for this column."""
    import json  # noqa: PLC0415
    from realtime_olap_spark.operators.theta import ThetaSketch
    if not os.path.exists(os.path.join(path, MARKER)):
        raise FileNotFoundError(f"{path} has no {MARKER} marker")
    tpath = os.path.join(path, THETA_FILE)
    if not os.path.exists(tpath):
        return None
    with open(tpath) as f:
        blob = json.load(f)
    if col not in blob:
        return None
    return {int(s): ThetaSketch(tuple(d["entries"]), d["theta"], d["k"])
            for s, d in blob[col].items()}


def _merged_theta(path: str, col: str, shards: list[int] | None = None):
    from realtime_olap_spark.operators.theta import theta_union_all
    per_shard = read_theta(path, col)
    if per_shard is None:
        raise FileNotFoundError(
            f"{path} published no theta sketch for column {col!r}")
    picked = (list(per_shard.values()) if shards is None
              else [per_shard[int(s)] for s in shards if int(s) in per_shard])
    if not picked:
        from realtime_olap_spark.operators.theta import (HASH_DOMAIN,
                                                         ThetaSketch)
        return ThetaSketch((), HASH_DOMAIN, 2)
    return theta_union_all(picked)


def dataset_distinct_estimate(path: str, col: str,
                              shards: list[int] | None = None) -> float:
    """Distinct-count estimate for ``col`` over the dataset (or a shard
    subset) from published metadata ONLY — no data files are read. The
    shard-subset answer is exact sketch algebra, not a scale-down: the
    hash shard assignment partitions rows, so the union of the subset's
    sketches IS the sketch of the subset's rows (merge law, tested).
    The reference answers metadata-only COUNT the same way
    (``SegmentMetadata`` totalDocs fast path); this extends it to
    DISTINCTCOUNT at bounded error."""
    from realtime_olap_spark.operators.theta import theta_estimate
    return theta_estimate(_merged_theta(path, col, shards))


def dataset_key_overlap(path_a: str, path_b: str, col: str) -> dict:
    """Metadata-only overlap preview between two published datasets:
    estimated distinct ``col`` values in A, B, A∪B, A∩B, A\\B, B\\A and
    Jaccard — the instant answer to "how much of today's corpus is
    yesterday's?" before running the content-level :func:`dataset_diff`
    (which reads and joins both key sets). Both datasets must have
    published theta for ``col``; cross-dataset algebra is well-defined
    because every publish uses one hash family."""
    from realtime_olap_spark.operators.theta import (jaccard_estimate,
                                                     theta_a_not_b,
                                                     theta_estimate,
                                                     theta_intersect,
                                                     theta_union)
    a = _merged_theta(path_a, col)
    b = _merged_theta(path_b, col)
    return {"a": theta_estimate(a), "b": theta_estimate(b),
            "union": theta_estimate(theta_union(a, b)),
            "intersect": theta_estimate(theta_intersect(a, b)),
            "a_not_b": theta_estimate(theta_a_not_b(a, b)),
            "b_not_a": theta_estimate(theta_a_not_b(b, a)),
            "jaccard": jaccard_estimate(a, b)}


def dedup_against_dataset(batch: DataFrame, path: str, content_key: str,
                          large_corpus: bool = False) -> DataFrame:
    """Drop batch rows whose ``md5(content_key)`` already shipped in the
    published dataset at ``path`` — the cross-round incremental-ingest
    gate. With a published filter (``content_key=`` at write time), most
    of the batch never touches the dataset: only filter-passing
    candidates read the dataset's key column (column-pruned scan) for
    the exact check; without one, it falls back to the plain anti-join.
    ``large_corpus=True`` selects the never-shuffle-the-corpus join
    shape (see ``operators/bloom.dedup_exact_against_bloom``).
    Exactness is inherited: result ≡ the ungated anti-join (tested)."""
    from realtime_olap_spark.operators.bloom import dedup_exact_against_bloom
    spark = batch.sparkSession
    kexpr = F.md5(F.col(content_key).cast("string"))
    corpus_keys = (read_shards(spark, path)
                   .select(F.md5(F.col(content_key).cast("string"))
                           .alias("__ck")))
    bf = read_bloom(path)
    if bf is None:
        return (batch.withColumn("__ck", kexpr)
                .join(corpus_keys, on="__ck", how="left_anti")
                .drop("__ck"))
    return dedup_exact_against_bloom(batch, corpus_keys, kexpr, bf,
                                     large_corpus=large_corpus)


def dataset_diff(spark: SparkSession, path_a: str, path_b: str,
                 content_key: str, dims: list[str] | None = None
                 ) -> DataFrame:
    """Content-level diff of two published datasets: one row per
    ``(status, *dims)`` with ``n_contents`` distinct content keys, where
    status ∈ {added, removed, common} (B relative to A) — the ops-facing
    answer to "what changed between yesterday's corpus and today's".

    Shape: each side reduces to its DISTINCT ``md5(content_key)`` keys
    (column-pruned scan — the text column never moves if the key is
    already a digest column), then ONE full-outer join on the key and a
    map-side-combined count. At 100 TB both sides are key tables a few
    percent the corpus size; with both datasets written by
    ``write_training_shards`` on the same ``key`` the join can also run
    shard-by-shard (the deterministic hash assignment makes equal shard
    ids co-locatable)."""
    dims = dims or []
    def keys(path):
        df = read_shards(spark, path)
        return (df.select(F.md5(F.col(content_key).cast("string"))
                          .alias("__ck"), *dims).distinct())
    a = keys(path_a).withColumn("__in_a", F.lit(True))
    b = keys(path_b).withColumn("__in_b", F.lit(True))
    joined = a.join(b, on=["__ck", *dims], how="full_outer")
    status = (F.when(F.col("__in_a").isNull(), F.lit("added"))
              .when(F.col("__in_b").isNull(), F.lit("removed"))
              .otherwise(F.lit("common")))
    return (joined.select(status.alias("status"), *dims)
            .groupBy("status", *dims)
            .agg(F.count(F.lit(1)).alias("n_contents")))
