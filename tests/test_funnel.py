"""Funnel analysis: hand-computed matches, strict/window semantics, the
anchor-rescan pandas twin (≡ declarative without a window, dominant
with one), DuckDB list-algebra differential, and the one-Exchange plan."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.operators.funnel import (funnel_counts,
                                                  funnel_match,
                                                  funnel_match_pandas)
from tests.conftest import SF_DIR, assert_matches_oracle

T0 = dt.datetime(2024, 1, 1)
STEPS = ["signup", "view", "click", "purchase"]


def _ev(spark, rows):
    return spark.createDataFrame(
        [(int(u), T0 + dt.timedelta(seconds=s), e) for u, s, e in rows],
        "user_id long, ts timestamp, event_type string")


def _us(s):
    return int((T0 + dt.timedelta(seconds=s)
                ).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_basic_match(spark):
    df = _ev(spark, [
        (1, 0, "signup"), (1, 10, "view"), (1, 20, "click"),
        (1, 30, "purchase"),
        (2, 0, "signup"), (2, 10, "view"),          # breaks at click
        (3, 5, "view"), (3, 6, "click"),            # never signs up
    ])
    got = {r["user"]: (r["max_step"], r["t_1"], r["t_2"], r["t_3"], r["t_4"])
           for r in funnel_match(df, STEPS).collect()}
    assert set(got) == {1, 2}
    assert got[1] == (4, _us(0), _us(10), _us(20), _us(30))
    assert got[2] == (2, _us(0), _us(10), None, None)


def test_order_matters_and_greedy_earliest(spark):
    # view BEFORE signup doesn't count; the earliest feasible view does
    df = _ev(spark, [
        (1, 10, "view"), (1, 20, "signup"), (1, 30, "view"),
        (1, 25, "view"), (1, 40, "click"),
    ])
    r = funnel_match(df, STEPS).collect()[0]
    assert (r["max_step"], r["t_1"], r["t_2"], r["t_3"]) == \
        (3, _us(20), _us(25), _us(40))


def test_strict_vs_nonstrict(spark):
    df = _ev(spark, [(1, 0, "signup"), (1, 0, "view")])
    assert funnel_match(df, STEPS, strict=True).collect()[0]["max_step"] == 1
    assert funnel_match(df, STEPS, strict=False).collect()[0]["max_step"] == 2


def test_window_expiry(spark):
    df = _ev(spark, [(1, 0, "signup"), (1, 100, "view"), (1, 120, "click")])
    assert funnel_match(df, STEPS).collect()[0]["max_step"] == 3
    r = funnel_match(df, STEPS, window_seconds=50).collect()[0]
    assert r["max_step"] == 1 and r["t_2"] is None


def test_rescan_twin_beats_greedy_under_window(spark):
    # greedy anchors at t=0 and the 50 s window expires before the view;
    # the rescan twin re-anchors on the t=60 signup and completes step 2
    df = _ev(spark, [(1, 0, "signup"), (1, 60, "signup"), (1, 100, "view")])
    greedy = funnel_match(df, STEPS, window_seconds=50).collect()[0]
    assert greedy["max_step"] == 1
    twin = funnel_match_pandas(df, STEPS, window_seconds=50).collect()[0]
    assert twin["max_step"] == 2
    assert (twin["t_1"], twin["t_2"]) == (_us(60), _us(100))


def test_twin_equals_declarative_without_window(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = sorted(funnel_match(ev, STEPS).collect())
    b = sorted(funnel_match_pandas(ev, STEPS).collect())
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        assert tuple(x) == tuple(y)


def test_twin_depth_dominates_with_window(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    w = 6 * 3600
    a = {r["user"]: r["max_step"]
         for r in funnel_match(ev, STEPS, window_seconds=w).collect()}
    b = {r["user"]: r["max_step"]
         for r in funnel_match_pandas(ev, STEPS, window_seconds=w).collect()}
    assert set(a) == set(b)
    assert all(b[u] >= a[u] for u in a)
    assert any(b[u] > a[u] for u in a) or a == b


_ORACLE_MATCH = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
  WHERE event_type IN ('signup','view','click','purchase')),
g AS (
  SELECT user_id AS "user",
    list_sort(list(us) FILTER (WHERE event_type='signup'))   AS a0,
    list_sort(list(us) FILTER (WHERE event_type='view'))     AS a1,
    list_sort(list(us) FILTER (WHERE event_type='click'))    AS a2,
    list_sort(list(us) FILTER (WHERE event_type='purchase')) AS a3
  FROM e GROUP BY 1),
m1 AS (SELECT "user", a1, a2, a3, a0[1] AS t_1 {DL} FROM g),
m2 AS (SELECT "user", a2, a3, t_1 {DLC},
              (list_filter(a1, x -> x > t_1 {WIN}))[1] AS t_2 FROM m1),
m3 AS (SELECT "user", a3, t_1, t_2 {DLC},
              (list_filter(a2, x -> x > t_2 {WIN}))[1] AS t_3 FROM m2),
m4 AS (SELECT "user", t_1, t_2, t_3,
              (list_filter(a3, x -> x > t_3 {WIN}))[1] AS t_4 FROM m3)
SELECT "user", t_1, t_2, t_3, t_4,
       CASE WHEN t_4 IS NOT NULL THEN 4 WHEN t_3 IS NOT NULL THEN 3
            WHEN t_2 IS NOT NULL THEN 2 ELSE 1 END AS max_step
FROM m4 WHERE t_1 IS NOT NULL
"""


def _oracle(window_seconds=None):
    if window_seconds is None:
        return (_ORACLE_MATCH.replace("{DL}", "").replace("{DLC}", "")
                .replace("{WIN}", ""))
    w = int(window_seconds) * 1_000_000
    return (_ORACLE_MATCH
            .replace("{DL}", f", a0[1] + {w} AS dl")
            .replace("{DLC}", ", dl")
            .replace("{WIN}", " AND x <= dl"))


def test_match_matches_duckdb(spark, duck):
    con = duck(SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert_matches_oracle(funnel_match(ev, STEPS), con, _oracle(),
                          "funnel_match")


def test_match_matches_duckdb_windowed(spark, duck):
    con = duck(SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert_matches_oracle(
        funnel_match(ev, STEPS, window_seconds=6 * 3600), con,
        _oracle(6 * 3600), "funnel_match_windowed")


def test_counts_consistent_with_match(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    m = funnel_match(ev, STEPS).collect()
    want = {i: sum(1 for r in m if r["max_step"] >= i) for i in range(1, 5)}
    want = {i: n for i, n in want.items() if n > 0}
    got = {r["step"]: r["n_users"]
           for r in funnel_counts(ev, STEPS).collect()}
    assert got == want
    rows = {r["step"]: r for r in funnel_counts(ev, STEPS).collect()}
    for i, r in rows.items():
        if i == 1:
            assert r["conversion"] == 1.0
        else:
            assert r["conversion"] == rows[i]["n_users"] / rows[i - 1]["n_users"]
        assert r["step_name"] == STEPS[i - 1]


def test_match_single_exchange(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    plan = (funnel_match(ev, STEPS)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan


def test_time_to_convert_matches_duckdb(spark, duck):
    """Adjacent-step latency percentiles, differential against the list
    algebra + quantile_cont (bit-identical exact interpolation)."""
    from realtime_olap_spark.operators.funnel import funnel_time_to_convert

    con = duck(SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = funnel_time_to_convert(ev, STEPS)
    oracle = _oracle().replace(
        'SELECT "user", t_1, t_2, t_3, t_4,', "SELECT").replace(
        """       CASE WHEN t_4 IS NOT NULL THEN 4 WHEN t_3 IS NOT NULL THEN 3
            WHEN t_2 IS NOT NULL THEN 2 ELSE 1 END AS max_step
FROM m4 WHERE t_1 IS NOT NULL""", """ * FROM m4 WHERE t_1 IS NOT NULL""")
    oracle = f"""
WITH base AS ({oracle}),
tall AS (
  SELECT 1 AS step, (t_2 - t_1) / 1000000.0 AS dur_s FROM base
  UNION ALL SELECT 2, (t_3 - t_2) / 1000000.0 FROM base
  UNION ALL SELECT 3, (t_4 - t_3) / 1000000.0 FROM base)
SELECT step, COUNT(*) AS n, MIN(dur_s) AS min_s,
       quantile_cont(dur_s, 0.5) AS median_s,
       quantile_cont(dur_s, 0.95) AS p95_s,
       MAX(dur_s) AS max_s
FROM tall WHERE dur_s IS NOT NULL GROUP BY step
"""
    assert_matches_oracle(out, con, oracle, "time_to_convert")


def test_time_to_convert_consistency(spark):
    from realtime_olap_spark.operators.funnel import funnel_time_to_convert

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    m = funnel_match(ev, STEPS).collect()
    got = {r["step"]: r for r in funnel_time_to_convert(ev, STEPS).collect()}
    for i in (1, 2, 3):
        durs = [(r[f"t_{i + 1}"] - r[f"t_{i}"]) / 1e6 for r in m
                if r[f"t_{i + 1}"] is not None]
        if not durs:
            assert i not in got
            continue
        r = got[i]
        assert r["n"] == len(durs)
        assert r["min_s"] == min(durs) and r["max_s"] == max(durs)
        assert min(durs) <= r["median_s"] <= r["p95_s"] <= max(durs)


def test_step_window(spark):
    # adjacent gaps: 0->40 (breaks a 30 s step window), 0->20->40 passes
    df = _ev(spark, [(1, 0, "signup"), (1, 40, "view"), (1, 50, "click"),
                     (2, 0, "signup"), (2, 20, "view"), (2, 45, "click")])
    got = {r["user"]: r["max_step"]
           for r in funnel_match(df, STEPS,
                                 step_window_seconds=30).collect()}
    assert got == {1: 1, 2: 3}
    # combined with the anchored whole-funnel window
    got2 = {r["user"]: r["max_step"]
            for r in funnel_match(df, STEPS, window_seconds=40,
                                  step_window_seconds=30).collect()}
    assert got2 == {1: 1, 2: 2}


def test_step_window_matches_duckdb(spark, duck):
    con = duck(SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    w = 12 * 3600 * 1_000_000
    oracle = (_ORACLE_MATCH.replace("{DL}", "").replace("{DLC}", "")
              .replace("{WIN}", ""))
    # per-step deadline references the PREVIOUS step's time
    for prev in ("t_1", "t_2", "t_3"):
        oracle = oracle.replace(f"x -> x > {prev}",
                                f"x -> x > {prev} AND x <= {prev} + {w}")
    assert_matches_oracle(
        funnel_match(ev, STEPS, step_window_seconds=12 * 3600), con,
        oracle, "funnel_step_window")


def test_cap_per_step_truncates_matchable_events(spark):
    # user 1's only feasible view is their 3rd view event; cap=2 keeps
    # just the first two sorted views, so the funnel breaks at step 2
    df = _ev(spark, [(1, 30, "signup"), (1, 5, "view"), (1, 10, "view"),
                     (1, 40, "view")])
    assert funnel_match(df, STEPS).collect()[0]["max_step"] == 2
    r = funnel_match(df, STEPS, cap_per_step=2).collect()[0]
    assert r["max_step"] == 1 and r["t_2"] is None
