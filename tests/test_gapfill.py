"""Gapfill: hand-computed fills, emit ≡ join bit-equality, DuckDB
differential (generate_series + IGNORE-NULLS window twin), and the
alignment / bound guards."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.operators.gapfill import (gapfill, gapfill_join,
                                                   time_bucket)
from tests.conftest import SF_DIR, assert_matches_oracle

HOUR = 3600
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(h):
    return T0 + dt.timedelta(hours=h)


@pytest.fixture(scope="module")
def tiny(spark):
    # group a: observations at hours 0, 3 (gap of 2); group b: hour 1 only
    return spark.createDataFrame(
        [("a", _ts(0), 10.0), ("a", _ts(3), 40.0), ("b", _ts(1), 7.0)],
        "g string, bucket timestamp, v double")


def _rows(df):
    return {(r["g"], r["bucket"], r["v"], r["is_filled"])
            for r in df.collect()}


def test_locf_hand(tiny):
    got = _rows(gapfill(tiny, "bucket", ["g"], ["v"], HOUR, how="locf"))
    assert got == {
        ("a", _ts(0), 10.0, False), ("a", _ts(1), 10.0, True),
        ("a", _ts(2), 10.0, True), ("a", _ts(3), 40.0, False),
        ("b", _ts(1), 7.0, False)}


def test_zero_and_const_hand(tiny):
    got = _rows(gapfill(tiny, "bucket", ["g"], ["v"], HOUR, how="zero"))
    assert ("a", _ts(1), 0.0, True) in got and ("a", _ts(2), 0.0, True) in got
    got = _rows(gapfill(tiny, "bucket", ["g"], ["v"], HOUR, how="const",
                        fill_value=-1.0))
    assert ("a", _ts(2), -1.0, True) in got


def test_linear_hand(tiny):
    got = _rows(gapfill(tiny, "bucket", ["g"], ["v"], HOUR, how="linear"))
    assert got == {
        ("a", _ts(0), 10.0, False), ("a", _ts(1), 20.0, True),
        ("a", _ts(2), 30.0, True), ("a", _ts(3), 40.0, False),
        ("b", _ts(1), 7.0, False)}


def test_bounds_hand(tiny):
    got = _rows(gapfill(tiny, "bucket", ["g"], ["v"], HOUR, how="locf",
                        start=_ts(0), end=_ts(4)))
    # leading edge has nothing to carry -> NULL; trailing carries forward
    assert ("b", _ts(0), None, True) in got
    assert ("b", _ts(2), 7.0, True) in got
    assert ("b", _ts(4), 7.0, True) in got
    assert ("a", _ts(4), 40.0, True) in got
    # every group spans the full [start, end] grid
    assert sum(1 for r in got if r[0] == "a") == 5
    assert sum(1 for r in got if r[0] == "b") == 5


def test_dense_input_unchanged(spark):
    dense = spark.createDataFrame(
        [("a", _ts(h), float(h)) for h in range(4)],
        "g string, bucket timestamp, v double")
    out = gapfill(dense, "bucket", ["g"], ["v"], HOUR, how="linear")
    rows = _rows(out)
    assert len(rows) == 4 and all(not r[3] for r in rows)
    assert {(r[1], r[2]) for r in rows} == {(_ts(h), float(h))
                                            for h in range(4)}


def test_misaligned_raises(spark):
    bad = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", T0 + dt.timedelta(minutes=90), 2.0)],
        "g string, bucket timestamp, v double")
    with pytest.raises(Exception, match="aligned"):
        gapfill(bad, "bucket", ["g"], ["v"], HOUR).collect()


def test_end_before_last_raises(tiny):
    with pytest.raises(Exception, match="end bound precedes"):
        gapfill(tiny, "bucket", ["g"], ["v"], HOUR, start=_ts(0),
                end=_ts(1)).collect()


@pytest.mark.parametrize("how,fv", [("locf", None), ("zero", None),
                                    ("const", 5.5), ("linear", None)])
def test_emit_equals_join_on_events(spark, how, fv):
    """The zero-join emit shape is bit-equal to the grid-join shape on
    real data (hourly mean value per event_type), every fill mode,
    with explicit bounds so leading/trailing edges are exercised."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    b = time_bucket(ev, "ts", HOUR, ["event_type"],
                    [F.avg("value").alias("v"),
                     F.count(F.lit(1)).cast("double").alias("n")])
    lo, hi = b.agg(F.min("bucket"), F.max("bucket")).first()
    lo = lo.replace(minute=0, second=0, microsecond=0)
    hi = hi.replace(minute=0, second=0, microsecond=0)
    args = dict(how=how, fill_value=fv, start=lo, end=hi)
    a = gapfill(b, "bucket", ["event_type"], ["v", "n"], HOUR, **args)
    c = gapfill_join(b, "bucket", ["event_type"], ["v", "n"], HOUR, **args)
    ra = sorted(a.collect(), key=lambda r: (r["event_type"], r["bucket"]))
    rc = sorted(c.collect(), key=lambda r: (r["event_type"], r["bucket"]))
    assert len(ra) == len(rc) > 0
    for x, y in zip(ra, rc):
        assert x == y  # bit-equal incl. linear interpolation floats


def test_locf_matches_duckdb(spark, duck):
    """DuckDB differential with an INDEPENDENT construction: dense grid
    from generate_series + left join + last_value IGNORE NULLS."""
    con = duck(SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    b = time_bucket(ev, "ts", HOUR, ["event_type"],
                    [F.count(F.lit(1)).alias("n")])
    out = (gapfill(b, "bucket", ["event_type"], ["n"], HOUR, how="locf")
           .select("event_type", "bucket", "n", "is_filled"))
    oracle = """
WITH b AS (
  SELECT event_type,
         make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS bucket,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
  FROM b GROUP BY 1),
grid AS (
  SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds)
SELECT g.event_type, g.bucket,
       last_value(b.n IGNORE NULLS)
         OVER (PARTITION BY g.event_type ORDER BY g.bucket) AS n,
       b.n IS NULL AS is_filled
FROM grid g LEFT JOIN b USING (event_type, bucket)
"""
    assert_matches_oracle(out, con, oracle, "gapfill_locf")


def test_linear_matches_duckdb(spark, duck):
    """Linear fill differential: DuckDB twin interpolates with the same
    prev + (next-prev) * (i/n) algebra over integer slot offsets."""
    con = duck(SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    b = time_bucket(ev, "ts", HOUR, ["event_type"],
                    [F.count(F.lit(1)).cast("double").alias("n")])
    out = (gapfill(b, "bucket", ["event_type"], ["n"], HOUR, how="linear")
           .select("event_type", "bucket", "n"))
    oracle = """
WITH b AS (
  SELECT event_type,
         make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS bucket,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM b GROUP BY 1),
grid AS (
  SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds),
j AS (
  SELECT g.event_type, g.bucket, b.n,
         last_value(b.n IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.bucket) AS pv,
         first_value(b.n IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         last_value(CASE WHEN b.n IS NOT NULL THEN epoch_us(g.bucket) END
                    IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.bucket) AS pb,
         first_value(CASE WHEN b.n IS NOT NULL THEN epoch_us(g.bucket) END
                     IGNORE NULLS)
           OVER (PARTITION BY g.event_type ORDER BY g.bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
  FROM grid g LEFT JOIN b USING (event_type, bucket))
SELECT event_type, bucket,
       CASE WHEN n IS NOT NULL THEN n
            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
              pv + (nv - pv) * (((epoch_us(bucket) - pb) // 3600000000)
                                / ((nb - pb) // 3600000000))
       END AS n
FROM j
"""
    assert_matches_oracle(out, con, oracle, "gapfill_linear")


def test_time_bucket_alignment(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    b = time_bucket(ev, "ts", HOUR, ["event_type"],
                    [F.count(F.lit(1)).alias("n")])
    bad = b.where(F.unix_micros(F.col("bucket")) % (HOUR * 1_000_000) != 0)
    assert bad.count() == 0


def test_emit_shape_single_exchange(spark):
    """The emit shape's 100 TB claim: exactly ONE Exchange on top of the
    bucketed input (the group-key shuffle for the window); the join
    shape pays at least one more."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    b = time_bucket(ev, "ts", HOUR, ["event_type"],
                    [F.count(F.lit(1)).alias("n")])
    base = b._jdf.queryExecution().executedPlan().toString().count("Exchange")
    plan = (gapfill(b, "bucket", ["event_type"], ["n"], HOUR, how="locf")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == base + 1, plan
    planj = (gapfill_join(b, "bucket", ["event_type"], ["n"], HOUR,
                          how="locf")
             ._jdf.queryExecution().executedPlan().toString())
    assert planj.count("Exchange") >= base + 2, planj


def test_duplicate_bucket_raises_emit(spark):
    """Two rows in one (group, bucket): the lead delta is 0, which used
    to pass the modulo alignment guard and make sequence(0, -1) emit a
    phantom row one step BEFORE the bucket flagged is_filled=false.
    Contract says raise, not corrupt (r8 verdict / ADVICE medium)."""
    dup = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(0), 2.0), ("a", _ts(2), 3.0)],
        "g string, bucket timestamp, v double")
    with pytest.raises(Exception, match="duplicate"):
        gapfill(dup, "bucket", ["g"], ["v"], HOUR, how="locf").collect()


def test_duplicate_bucket_raises_join(spark):
    dup = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(0), 2.0), ("a", _ts(2), 3.0)],
        "g string, bucket timestamp, v double")
    with pytest.raises(Exception, match="duplicate"):
        gapfill_join(dup, "bucket", ["g"], ["v"], HOUR,
                     how="locf").collect()


def test_null_bucket_raises_join_own_message(spark):
    """A single NULL-bucket row is a contract violation but NOT a
    duplicate — count_distinct skips NULLs, so the old guard flagged it
    with the misleading 'duplicate' message (ADVICE r9). It now gets its
    own null-bucket diagnostic."""
    bad = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", None, 2.0), ("a", _ts(2), 3.0)],
        "g string, bucket timestamp, v double")
    with pytest.raises(Exception, match="NULL bucket"):
        gapfill_join(bad, "bucket", ["g"], ["v"], HOUR,
                     how="locf").collect()
    # and a genuine duplicate alongside a null still reports duplicate
    # or null (never silent corruption); the null check fires first
    bad2 = spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(0), 2.0), ("a", None, 9.9),
         ("a", _ts(2), 3.0)],
        "g string, bucket timestamp, v double")
    with pytest.raises(Exception, match="NULL bucket"):
        gapfill_join(bad2, "bucket", ["g"], ["v"], HOUR,
                     how="locf").collect()


def test_time_bucket_pre_1970_floor(spark):
    """Negative (pre-1970) epochs must floor DOWN to the bucket grid
    (SQL // semantics), not truncate toward zero into the ceil bucket."""
    ts = dt.datetime(1969, 12, 31, 23, 30, 0)  # epoch -1800s
    df = spark.createDataFrame([(ts, 1.0)], "t timestamp, v double")
    out = time_bucket(df, "t", HOUR, [], [F.sum("v").alias("s")]).first()
    assert out["bucket"] == dt.datetime(1969, 12, 31, 23, 0, 0)
    # and the bucketed frame gapfills on-grid across the epoch boundary
    df2 = spark.createDataFrame(
        [(dt.datetime(1969, 12, 31, 23, 0, 0), 1.0),
         (dt.datetime(1970, 1, 1, 1, 0, 0), 3.0)],
        "bucket timestamp, v double")
    got = gapfill(df2.withColumn("g", F.lit("x")), "bucket", ["g"], ["v"],
                  HOUR, how="linear").collect()
    mid = [r for r in got if r["is_filled"]]
    assert len(mid) == 1 and mid[0]["v"] == 2.0
