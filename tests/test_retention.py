"""Cohort retention: hand-computed matrix, DuckDB differential, and the
single-user-shuffle / no-join plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.operators.retention import cohort_retention
from tests.conftest import SF_DIR, assert_matches_oracle

DAY = 86400
T0 = dt.datetime(2024, 1, 1)  # midnight, so daily buckets land on days


def _ev(spark, rows):
    return spark.createDataFrame(
        [(int(u), T0 + dt.timedelta(hours=h)) for u, h in rows],
        "user_id long, ts timestamp")


def test_hand_matrix(spark):
    # day 0 cohort: users 1,2 (both active day 0; user 1 returns day 1,
    # both return day 2). day 1 cohort: user 3 (returns day 3).
    df = _ev(spark, [
        (1, 0), (1, 25), (1, 50), (1, 55),
        (2, 3), (2, 49),
        (3, 30), (3, 80),
    ])
    got = {(r["cohort"], r["offset"]): (r["n_users"], r["retention"])
           for r in cohort_retention(df, bucket_seconds=DAY).collect()}
    d0, d1 = T0, T0 + dt.timedelta(days=1)
    assert got == {
        (d0, 0): (2, 1.0), (d0, 1): (1, 0.5), (d0, 2): (2, 1.0),
        (d1, 0): (1, 1.0), (d1, 2): (1, 1.0),
    }


def test_max_offset(spark):
    df = _ev(spark, [(1, 0), (1, 25), (1, 50)])
    got = cohort_retention(df, bucket_seconds=DAY, max_offset=1).collect()
    assert {r["offset"] for r in got} == {0, 1}


def test_matches_duckdb(spark, duck):
    con = duck(SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = cohort_retention(ev, bucket_seconds=7 * DAY)
    step = 7 * DAY * 1_000_000
    oracle = f"""
WITH b AS (
  SELECT user_id, epoch_us(ts) - (epoch_us(ts) % {step}) AS b_us
  FROM events),
fu AS (SELECT user_id, MIN(b_us) AS cohort_us FROM b GROUP BY 1),
act AS (SELECT DISTINCT user_id, b_us FROM b),
tall AS (
  SELECT cohort_us, (a.b_us - cohort_us) // {step} AS "offset",
         COUNT(*) AS n_users
  FROM act a JOIN fu USING (user_id)
  GROUP BY 1, 2),
sized AS (
  SELECT *, MAX(CASE WHEN "offset" = 0 THEN n_users END)
              OVER (PARTITION BY cohort_us) AS sz
  FROM tall)
SELECT make_timestamp(cohort_us) AS cohort, "offset", n_users,
       n_users / sz AS retention
FROM sized
"""
    assert_matches_oracle(out, con, oracle, "cohort_retention")


def test_single_user_shuffle_no_join(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = (cohort_retention(ev, bucket_seconds=7 * DAY)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan, plan
    # events scanned exactly once
    assert plan.count("FileScan parquet") == 1, plan
