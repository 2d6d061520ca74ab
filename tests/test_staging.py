"""Session segment staging (catalog.py): a raw SINGLE-FILE parquet table
is one row group = one scan task, serializing every scan-side operator on
a multi-core session; the catalog rewrites it once per (session, corpus)
into ``defaultParallelism`` part files (the reference's segment-build
analog — raw input becomes engine segments at INGEST,
SegmentIndexCreationDriverImpl.java:117) and queries read the staged
segments. These tests pin: value/schema parity with the raw read, the
stage-only-the-pathological-case predicate, the sorted-column layout, the
one-build-per-session memo contract, and the kill switch."""

from __future__ import annotations

import os

import pytest

from realtime_olap_spark.catalog import STAGE_ENV, Catalog
from tests.conftest import SF_DIR, rows_of_spark


def test_staged_table_equals_raw(spark):
    """The staged read is invisible to consumers: identical schema
    (names, types, order) and identical multiset of rows."""
    staged = Catalog(spark, SF_DIR).table("lineitem")
    os.environ[STAGE_ENV] = "0"
    try:
        raw = Catalog(spark, SF_DIR).table("lineitem")
    finally:
        os.environ.pop(STAGE_ENV, None)
    assert staged.schema == raw.schema
    assert rows_of_spark(staged) == rows_of_spark(raw)


def test_staged_events_keeps_ts_twin(spark):
    """The events ts/ts_ns normalization happens BEFORE staging; the
    staged table exposes the identical derived columns."""
    staged = Catalog(spark, SF_DIR).table("events")
    os.environ[STAGE_ENV] = "0"
    try:
        raw = Catalog(spark, SF_DIR).table("events")
    finally:
        os.environ.pop(STAGE_ENV, None)
    assert staged.schema == raw.schema
    assert rows_of_spark(staged.select("event_id", "ts", "ts_ns")) == \
        rows_of_spark(raw.select("event_id", "ts", "ts_ns"))


def test_staged_scan_is_parallel(spark):
    """The point of staging: the scan has multiple input files (= leaf
    tasks; default cores/4), not one. Range partitioning may leave a
    bucket empty, so allow a small shortfall."""
    df = Catalog(spark, SF_DIR).table("lineitem")
    target = max(2, spark.sparkContext.defaultParallelism // 4)
    assert len(df.inputFiles()) >= max(2, target // 2)


def test_stage_predicate(spark, tmp_path):
    """Only the pathological shape stages: one data file under the size
    cap. Multi-file directories keep their deliberate layout."""
    cat = Catalog(spark, SF_DIR)
    single = os.path.join(SF_DIR, "lineitem.parquet")
    assert cat._should_stage(single)
    # multi-file directory: never staged
    out = str(tmp_path / "multi")
    spark.range(100).repartition(4).write.parquet(out)
    assert not cat._should_stage(out)
    # missing path: never staged
    assert not cat._should_stage(str(tmp_path / "nope"))
    # kill switch
    os.environ[STAGE_ENV] = "0"
    try:
        assert not cat._should_stage(single)
    finally:
        os.environ.pop(STAGE_ENV, None)


def test_staged_range_clustered_layout(spark):
    """lineitem declares (sorted_column=l_returnflag,
    time_column=l_shipdate): staging range-partitions + sorts on that
    pair, so every part file covers a narrow key/time range and parquet
    min/max stats prune range predicates — round-robin would spray each
    file across the full range and defeat skipping."""
    import pyspark.sql.functions as F

    os.environ["SPARK_GRAFT_STAGE_PARTS"] = "16"  # enough buckets for
    try:                                          # a selective layout
        df = Catalog(spark, SF_DIR).table("lineitem")
    finally:
        os.environ.pop("SPARK_GRAFT_STAGE_PARTS", None)
    files = df.inputFiles()
    assert files, "staged table should expose its part files"
    for f in files[:3]:
        vals = [(r[0], r[1]) for r in
                spark.read.parquet(f)
                .select("l_returnflag", "l_shipdate").collect()]
        assert vals == sorted(vals), f"not sorted within {f}"
    # clustering is selective: only a minority of files overlap a
    # narrow date window (~1/8 of the span, once per returnflag block)
    import datetime as dt

    lo, hi = dt.date(1994, 1, 1), dt.date(1994, 3, 31)

    def day(v):  # l_shipdate ships as DATE or TIMESTAMP across rounds
        return v.date() if isinstance(v, dt.datetime) else v

    overlapping = 0
    for f in files:
        mn, mx = (spark.read.parquet(f)
                  .agg(F.min("l_shipdate"), F.max("l_shipdate")).first())
        if day(mn) <= hi and day(mx) >= lo:
            overlapping += 1
    assert overlapping <= len(files) // 2, \
        f"{overlapping}/{len(files)} files overlap a narrow window"
    # and the staged scan still pushes filters down to the parquet leaves
    plan = (df.filter(F.col("l_returnflag") == "R")
              ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [IsNotNull(l_returnflag)" in plan


def test_staging_builds_once_per_session(spark):
    """The staged path is memoized per (session, corpus): two catalogs
    resolve to the SAME directory without a second write (mtime pinned)."""
    a = Catalog(spark, SF_DIR).table("part")
    files_a = sorted(a.inputFiles())
    mtime = max(os.path.getmtime(f.removeprefix("file:")) for f in files_a)
    b = Catalog(spark, SF_DIR).table("part")
    files_b = sorted(b.inputFiles())
    assert files_a == files_b
    assert max(os.path.getmtime(f.removeprefix("file:"))
               for f in files_b) == pytest.approx(mtime)


def test_stage_predicate_single_part_directory(spark, tmp_path):
    """The generator may ship a table as a DIRECTORY holding one part
    file (layout regeneration insurance): that is the same one-scan-task
    pathology and must stage; staged values equal the raw read."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "documents.parquet")
    spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
        F.lit("en").alias("lang"), F.lit("web").alias("source"),
        F.lit(7).alias("n_chars")).coalesce(1).write.parquet(src)
    cat = Catalog(spark, str(tmp_path))
    assert cat._should_stage(src)
    staged = cat.table("documents")
    assert len(staged.inputFiles()) >= 2
    os.environ[STAGE_ENV] = "0"
    try:
        raw = Catalog(spark, str(tmp_path)).table("documents")
    finally:
        os.environ.pop(STAGE_ENV, None)
    assert rows_of_spark(staged) == rows_of_spark(raw)


def test_stage_sweep_spares_heartbeated_live_dir(tmp_path):
    """A >1-day-old staging dir whose owning session is still alive
    (fresh heartbeat mtime) must survive another session's sweep; a
    dir with a stale heartbeat is removed (r8 verdict / ADVICE low:
    the old creation-age sweep could delete a live soak/notebook/PQL
    session's staged parquet out from under its memoized plans)."""
    import os
    import time

    from realtime_olap_spark.catalog import (_register_stage_cleanup,
                                             _touch_stage_heartbeat)

    root = tmp_path / "stage_root"
    live = root / "app-live-old"
    dead = root / "app-dead-old"
    mine = root / "app-me"
    for d in (live, dead, mine):
        d.mkdir(parents=True)
    old = time.time() - 48 * 3600
    os.utime(live, (old, old))
    os.utime(dead, (old, old))
    # the live session's heartbeat thread refreshes its dir mtime —
    # simulate one beat having happened since
    _touch_stage_heartbeat(str(live))
    _register_stage_cleanup(str(root), str(mine))
    assert live.exists()        # fresh heartbeat -> spared
    assert not dead.exists()    # stale heartbeat -> swept
    assert mine.exists()
    # registration also touched our own dir (first heartbeat)
    assert os.path.getmtime(mine) > time.time() - 60
