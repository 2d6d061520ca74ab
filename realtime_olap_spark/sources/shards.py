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


def write_training_shards(df: DataFrame, path: str, key: str,
                          n_shards: int,
                          token_col: str | None = None,
                          files_per_shard: int = 1,
                          overwrite: bool = False) -> None:
    """Write ``df`` as ``path/data/shard=K/…parquet`` + a per-shard
    manifest at ``path/manifest`` + the completion marker, atomically.

    ``token_col`` (optional) adds exact per-shard token totals to the
    manifest — the number a training job actually schedules by.

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
