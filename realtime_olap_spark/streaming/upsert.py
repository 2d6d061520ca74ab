"""Primary-key upsert tables — latest-record-wins keyed ingestion.

Modern realtime OLAP stores materialize a PRIMARY-KEY view of a keyed
stream: each key shows only its newest record (by a version/event-time
column), with late or replayed lower-version records ignored. (Pinot
grew this as upsert-enabled realtime tables after the reference fork's
vintage — public docs/design "Upsert in Pinot"; this module is the
EXTENSION analog, flagged as beyond strict reference parity, built the
Spark-first way.)

Two pieces:

- :func:`latest_by_key` — the batch semantics: ONE aggregation,
  ``max(struct(version, …tiebreak…, full_row))`` per key. Struct
  comparison is lexicographic field-by-field, and the full row embedded
  LAST makes the order total, so the winner is deterministic even on
  exact version ties — no window sort, no shuffle beyond the one
  map-side-combined groupBy (the same never-sort discipline as
  ``groupby.top_n``).
- :func:`upsert_batch` / :func:`read_upsert` — the incremental state:
  the materialized view lives as parquet hash-bucketed by key
  (``bucket=K/`` partition dirs, ``pmod(xxhash64(key), N)`` — the
  deterministic row-property assignment of ``sources/shards``). A new
  batch touches only its own buckets: read THOSE partitions
  (partition-pruned scan), merge latest-wins with the batch, swap the
  rebuilt bucket dirs atomically. Per-batch cost is
  O(batch + state in touched buckets), never O(state) — at 100 TB,
  size N so a bucket is a few GB and a typical batch touches a small
  fraction. Streaming ingestion is ``foreachBatch(upsert_batch)``
  (exactly-once via the idempotent latest-wins merge: replaying a batch
  reproduces the same winners — tested), the consuming→immutable path
  for keyed tables.

Single-writer discipline (one upsert stream per table, like the
reference's one consuming segment per partition); readers see a
complete published state through the completion marker. Version column
must be NON-NULL (enforced) — a NULL version has no place in a total
order.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MARKER = "_UPSERT_COMPLETE"


def latest_by_key(df: DataFrame, keys: list[str], version_col: str,
                  tiebreak: list[str] | None = None) -> DataFrame:
    """One row per key: the max-(version, tiebreak…, whole-row) record.
    Deterministic under ties (the embedded full row totalizes the
    order); NULL-version rows are rejected loudly rather than silently
    losing."""
    if not keys:
        raise ValueError("need at least one key column")
    cols = df.columns
    # NULL versions fail loudly at runtime (inside the comparison key
    # itself, so no filter Catalyst could fold away) — a NULL has no
    # place in the total order.
    v = F.when(F.col(version_col).isNotNull(), F.col(version_col)) \
         .otherwise(F.raise_error(F.lit(
             f"NULL {version_col} in upsert input")))
    ordered = F.struct(
        v.alias("__v"),
        *[F.col(t).alias(f"__t{i}") for i, t in enumerate(tiebreak or [])],
        F.struct(*[F.col(c) for c in cols]).alias("__row"))
    return (df.groupBy(*[F.col(k) for k in keys])
            .agg(F.max(ordered).alias("__m"))
            .select("__m.__row.*"))


def _bucket(keys: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]),
                  F.lit(n_buckets)).cast("int")


def _meta_path(path: str) -> str:
    return os.path.join(path, MARKER)


def read_upsert(spark: SparkSession, path: str,
                buckets: list[int] | None = None,
                tombstone_col: str | None = None) -> DataFrame:
    """The materialized latest-per-key view (optionally a partition-
    pruned bucket subset). Refuses unpublished state.

    ``tombstone_col`` implements DELETE markers the upsert way (the
    reference family's delete-record support): a delete is just an
    upserted record whose tombstone flag is true — it WINS its key like
    any other version (so later re-inserts resurrect the key, and
    replay stays idempotent), and this reader filters tombstoned keys
    out of the visible view. State keeps the tombstones (they must keep
    out-versioning stale late arrivals); compaction = rewriting a
    bucket without its tombstones once no older record can arrive."""
    if not os.path.exists(_meta_path(path)):
        raise FileNotFoundError(f"{path} has no {MARKER} marker")
    df = spark.read.parquet(os.path.join(path, "data"))
    if buckets is not None:
        df = df.where(F.col("__bucket").isin([int(b) for b in buckets]))
    if tombstone_col is not None:
        df = df.where(~F.coalesce(F.col(tombstone_col), F.lit(False)))
    return df.drop("__bucket")


def upsert_batch(spark: SparkSession, path: str, batch: DataFrame,
                 keys: list[str], version_col: str,
                 n_buckets: int = 64,
                 tiebreak: list[str] | None = None) -> None:
    """Fold one keyed batch into the state at ``path``. First call
    publishes the initial state; later calls read ONLY the batch's
    touched bucket partitions, merge latest-wins, and atomically swap
    those bucket dirs. Replays are idempotent (same winners)."""
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path)) as f:
            meta = json.load(f)
        if (meta["keys"], meta["version_col"], meta["n_buckets"]) != \
                (keys, version_col, n_buckets):
            raise ValueError(
                f"upsert state at {path} was built with "
                f"{meta['keys']}/{meta['version_col']}/{meta['n_buckets']}"
                f" — cannot fold {keys}/{version_col}/{n_buckets}")
        exists = True
    else:
        exists = False

    data_dir = os.path.join(path, "data")
    if not exists:
        out = latest_by_key(batch, keys, version_col, tiebreak)
        (out.withColumn("__bucket", _bucket(keys, n_buckets))
         .repartition(F.col("__bucket"))
         .write.mode("overwrite").partitionBy("__bucket")
         .parquet(data_dir))
        with open(_meta_path(path), "w") as f:
            json.dump({"keys": keys, "version_col": version_col,
                       "n_buckets": n_buckets}, f)
        return

    keyed = batch.withColumn("__bucket", _bucket(keys, n_buckets))
    touched = sorted(r["__bucket"] for r in
                     keyed.select("__bucket").distinct().collect())
    if not touched:
        return
    # partition-pruned read of ONLY the touched buckets
    state = (spark.read.parquet(data_dir)
             .where(F.col("__bucket").isin(touched)))
    merged = latest_by_key(state.drop("__bucket")
                           .unionByName(batch), keys, version_col, tiebreak)
    staged = (merged.withColumn("__bucket", _bucket(keys, n_buckets))
              .repartition(F.col("__bucket")))
    stage_dir = f"{data_dir}.stage-{os.getpid()}"
    staged.write.mode("overwrite").partitionBy("__bucket").parquet(stage_dir)
    for b in touched:
        src = os.path.join(stage_dir, f"__bucket={b}")
        dst = os.path.join(data_dir, f"__bucket={b}")
        retired = f"{dst}.old"
        if not os.path.exists(src):
            # every batch row for this bucket lost to existing state and
            # deduped into... cannot happen (merge includes state), but
            # guard: keep the existing bucket untouched
            continue
        if os.path.exists(dst):
            os.rename(dst, retired)
        os.rename(src, dst)
        shutil.rmtree(retired, ignore_errors=True)
    shutil.rmtree(stage_dir, ignore_errors=True)


def _replayed(path: str, batch_id: int) -> bool:
    """foreachBatch is AT-LEAST-once: after a crash the last batch can
    be re-delivered. Latest-wins folds are replay-idempotent, but
    INCREMENT/APPEND are not — so every sink records the last applied
    batch id in the marker and skips ids it has already folded. (The
    id is written AFTER the bucket swaps; a crash exactly between swap
    and record re-applies one batch — the same bounded at-least-once
    window the reference family's partial upsert documents. The
    latest-wins sink keeps exactly-once outright.)"""
    if not os.path.exists(_meta_path(path)):
        return False
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    last = meta.get("last_batch_id")
    return last is not None and batch_id <= last


def _record_batch_id(path: str, batch_id: int) -> None:
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    meta["last_batch_id"] = batch_id
    tmp = _meta_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(path))


def upsert_sink(spark: SparkSession, path: str, keys: list[str],
                version_col: str, n_buckets: int = 64,
                tiebreak: list[str] | None = None):
    """The foreachBatch callable: ``stream.writeStream.foreachBatch(
    upsert_sink(...))`` materializes the stream's latest-per-key view
    incrementally — availableNow drain ≡ one batch latest_by_key over
    all the files (tested). Re-delivered batch ids are skipped
    (:func:`_replayed`; redundant here since latest-wins is idempotent
    anyway, but it keeps both sinks on one contract)."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if _replayed(path, batch_id):
            return
        upsert_batch(spark, path, batch_df, keys, version_col,
                     n_buckets, tiebreak)
        _record_batch_id(path, batch_id)
    return fold


# ------------------------------------------------- partial upsert ----

#: Per-column merge strategies (the reference family's partial-upsert
#: config): how a key's NEW record combines with its existing state.
PARTIAL_STRATEGIES = ("overwrite", "ignore", "increment", "append",
                     "max", "min")


def _guarded_version(version_col: str):
    return F.when(F.col(version_col).isNotNull(), F.col(version_col)) \
            .otherwise(F.raise_error(F.lit(
                f"NULL {version_col} in upsert input")))


def partial_latest_by_key(df: DataFrame, keys: list[str],
                          version_col: str,
                          strategies: dict[str, str],
                          default: str = "overwrite") -> DataFrame:
    """Per-key combine with PER-COLUMN strategies — the batch twin of
    the incremental partial fold (Pinot's partial upsert: per-column
    OVERWRITE / IGNORE / INCREMENT / APPEND / MAX / MIN, applied here
    as one aggregation):

    - ``overwrite``: value from the HIGHEST version (in-row value ties
      broken by value — ``max(struct(version, col))``)
    - ``ignore``: value from the LOWEST version (first write wins)
    - ``increment``: SUM of all arriving values
    - ``append``: ALL values as an array in version order
    - ``max`` / ``min``: extreme over all arriving values
    The result's ``version_col`` is the key's max version. One
    map-side-combined groupBy; no windows."""
    for c, s in strategies.items():
        if s not in PARTIAL_STRATEGIES:
            raise ValueError(f"unknown strategy {s!r} for column {c!r}")
    if default not in PARTIAL_STRATEGIES:
        raise ValueError(f"unknown default strategy {default!r}")
    v = _guarded_version(version_col)
    aggs = [F.max(v).alias(version_col)]
    for c in df.columns:
        if c in keys or c == version_col:
            continue
        s = strategies.get(c, default)
        if s == "overwrite":
            agg = F.max(F.struct(v.alias("__v"),
                                 F.col(c).alias("__c")))["__c"]
        elif s == "ignore":
            agg = F.min(F.struct(v.alias("__v"),
                                 F.col(c).alias("__c")))["__c"]
        elif s == "increment":
            agg = F.sum(c)
        elif s == "append":
            agg = F.transform(
                F.array_sort(F.collect_list(
                    F.struct(v.alias("__v"), F.col(c).alias("__c")))),
                lambda x: x["__c"])
        elif s == "max":
            agg = F.max(c)
        else:  # min
            agg = F.min(c)
        aggs.append(agg.alias(c))
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def _combine_partial(state: DataFrame, batch_agg: DataFrame,
                     keys: list[str], version_col: str,
                     strategies: dict[str, str], default: str) -> DataFrame:
    """Full-outer join state rows with batch-aggregated rows and apply
    each column's strategy. Written so folding batches in version order
    reproduces the one-shot batch answer (parity-tested); for
    INCREMENT / APPEND / MAX / MIN the fold is order-insensitive
    outright, for OVERWRITE the higher version wins regardless of
    arrival, and IGNORE is first-ARRIVAL-wins across batches (the
    ingestion-time semantics the reference family also applies)."""
    sv, bv = F.col(f"__s.{version_col}"), F.col(f"__b.{version_col}")
    joined = (state.alias("__s").join(batch_agg.alias("__b"),
                                      on=keys, how="full_outer"))
    out_cols = [F.col(k) for k in keys]
    out_cols.append(F.when(sv.isNull(), bv)
                    .when(bv.isNull(), sv)
                    .otherwise(F.greatest(sv, bv)).alias(version_col))
    for c in state.columns:
        if c in keys or c == version_col:
            continue
        s = strategies.get(c, default)
        sc, bc = F.col(f"__s.{c}"), F.col(f"__b.{c}")
        if s == "overwrite":
            # exact version tie → greatest(value), matching the
            # struct-max tie-break of partial_latest_by_key's one-shot
            # twin; without it, folding batches diverges from the
            # one-shot answer on duplicated versions (fold ≡ one-shot
            # parity contract)
            val = (F.when(sv.isNull(), bc).when(bv.isNull(), sc)
                   .when(bv > sv, bc).when(sv > bv, sc)
                   .otherwise(F.greatest(sc, bc)))
        elif s == "ignore":
            val = F.when(sv.isNotNull(), sc).otherwise(bc)
        elif s == "increment":
            # both-NULL stays NULL: the one-shot twin is F.sum, which
            # returns NULL when every arriving value is NULL — folding
            # to 0 here would break fold ≡ one-shot (caught by the r10
            # randomized upsert sweep's design probe)
            val = (F.when(sv.isNull(), bc).when(bv.isNull(), sc)
                   .when(sc.isNull() & bc.isNull(),
                         F.lit(None).cast(state.schema[c].dataType))
                   .otherwise(F.coalesce(sc, F.lit(0)) +
                              F.coalesce(bc, F.lit(0))))
        elif s == "append":
            val = F.concat(F.coalesce(sc, F.array()),
                           F.coalesce(bc, F.array()))
        elif s == "max":
            val = (F.when(sv.isNull(), bc).when(bv.isNull(), sc)
                   .otherwise(F.greatest(sc, bc)))
        else:  # min
            val = (F.when(sv.isNull(), bc).when(bv.isNull(), sc)
                   .otherwise(F.least(sc, bc)))
        out_cols.append(val.alias(c))
    return joined.select(*out_cols)


def partial_upsert_batch(spark: SparkSession, path: str, batch: DataFrame,
                         keys: list[str], version_col: str,
                         strategies: dict[str, str],
                         n_buckets: int = 64,
                         default: str = "overwrite") -> None:
    """The incremental partial fold: aggregate the batch per key with
    :func:`partial_latest_by_key`, then join-combine against ONLY the
    touched bucket partitions and atomically swap them — the same
    O(batch + touched buckets) state discipline as :func:`upsert_batch`.
    APPEND columns are stored as version-ordered arrays from the first
    publish on."""
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path)) as f:
            meta = json.load(f)
        if (meta["keys"], meta["version_col"], meta["n_buckets"],
                meta.get("strategies"), meta.get("default")) != \
                (keys, version_col, n_buckets, strategies, default):
            raise ValueError(
                f"partial-upsert state at {path} was built with a "
                f"different (keys, version, buckets, strategies) config")
        exists = True
    else:
        exists = False

    agg = partial_latest_by_key(batch, keys, version_col, strategies,
                                default)
    data_dir = os.path.join(path, "data")
    if not exists:
        (agg.withColumn("__bucket", _bucket(keys, n_buckets))
         .repartition(F.col("__bucket"))
         .write.mode("overwrite").partitionBy("__bucket")
         .parquet(data_dir))
        with open(_meta_path(path), "w") as f:
            json.dump({"keys": keys, "version_col": version_col,
                       "n_buckets": n_buckets, "strategies": strategies,
                       "default": default, "partial": True}, f)
        return

    keyed = agg.withColumn("__bucket", _bucket(keys, n_buckets))
    touched = sorted(r["__bucket"] for r in
                     keyed.select("__bucket").distinct().collect())
    if not touched:
        return
    state = (spark.read.parquet(data_dir)
             .where(F.col("__bucket").isin(touched)).drop("__bucket"))
    merged = _combine_partial(state, agg, keys, version_col,
                              strategies, default)
    staged = (merged.withColumn("__bucket", _bucket(keys, n_buckets))
              .repartition(F.col("__bucket")))
    stage_dir = f"{data_dir}.stage-{os.getpid()}"
    staged.write.mode("overwrite").partitionBy("__bucket").parquet(stage_dir)
    for b in touched:
        src = os.path.join(stage_dir, f"__bucket={b}")
        dst = os.path.join(data_dir, f"__bucket={b}")
        if not os.path.exists(src):
            continue
        retired = f"{dst}.old"
        if os.path.exists(dst):
            os.rename(dst, retired)
        os.rename(src, dst)
        shutil.rmtree(retired, ignore_errors=True)
    shutil.rmtree(stage_dir, ignore_errors=True)


def partial_upsert_sink(spark: SparkSession, path: str, keys: list[str],
                        version_col: str, strategies: dict[str, str],
                        n_buckets: int = 64, default: str = "overwrite"):
    """foreachBatch callable for the partial fold (availableNow drain ≡
    version-ordered batch composition — tested). Re-delivered batch ids
    are SKIPPED — essential here, not just hygiene: INCREMENT/APPEND
    would double-apply under foreachBatch's at-least-once re-delivery
    (replay-skip tested)."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if _replayed(path, batch_id):
            return
        partial_upsert_batch(spark, path, batch_df, keys, version_col,
                             strategies, n_buckets, default)
        _record_batch_id(path, batch_id)
    return fold


def compact_upsert(spark: SparkSession, path: str, tombstone_col: str,
                   before_version) -> int:
    """Drop tombstones whose version is below ``before_version`` — the
    retention step once no record older than the horizon can still
    arrive (the same contract as the segment retention sweep in
    ``sources/maintenance``: a tombstone only exists to out-version
    stale late arrivals, so past the lateness horizon it is dead
    weight). Rewrites ONLY buckets that actually hold expirable
    tombstones (partition-pruned probe first), atomic per-bucket swap.
    Returns the number of tombstones removed."""
    if not os.path.exists(_meta_path(path)):
        raise FileNotFoundError(f"{path} has no {MARKER} marker")
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    vcol = meta["version_col"]
    data_dir = os.path.join(path, "data")
    dead = (F.coalesce(F.col(tombstone_col), F.lit(False))
            & (F.col(vcol) < F.lit(before_version)))
    full = spark.read.parquet(data_dir)
    touched = sorted(r["__bucket"] for r in
                     full.where(dead).select("__bucket")
                     .distinct().collect())
    if not touched:
        return 0
    sub = full.where(F.col("__bucket").isin(touched))
    n_dead = sub.where(dead).count()
    staged = sub.where(~dead).repartition(F.col("__bucket"))
    stage_dir = f"{data_dir}.stage-{os.getpid()}"
    staged.write.mode("overwrite").partitionBy("__bucket").parquet(stage_dir)
    for b in touched:
        src = os.path.join(stage_dir, f"__bucket={b}")
        dst = os.path.join(data_dir, f"__bucket={b}")
        retired = f"{dst}.old"
        if os.path.exists(dst):
            os.rename(dst, retired)
        if os.path.exists(src):
            os.rename(src, dst)
        else:
            # every row in this bucket was an expirable tombstone —
            # the bucket is now legitimately empty
            os.makedirs(dst, exist_ok=True)
        shutil.rmtree(retired, ignore_errors=True)
    shutil.rmtree(stage_dir, ignore_errors=True)
    return int(n_dead)
