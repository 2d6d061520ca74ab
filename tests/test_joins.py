"""As-of and bounded range joins (time-series extensions; the reference has
no join operator at all) — DuckDB-differential + physical-plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.joins import asof_join, range_join_bucketed
from tests.conftest import SF_DIR, assert_matches_oracle


def _clicks_errors(spark):
    ev = Catalog(spark, SF_DIR).table("events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    clicks = ev.where(F.col("event_type") == "click").drop("event_type")
    # dedupe right per (user, ts): tied-timestamp winners are unspecified in
    # both engines, so make the match unambiguous
    errors = (ev.where(F.col("event_type") == "error")
              .groupBy("user_id", "ts").agg(F.max("value").alias("value")))
    return clicks, errors


_ASOF_ORACLE = """
WITH clicks AS (SELECT event_id, ts, user_id, value FROM events
                WHERE event_type = 'click'),
     errors AS (SELECT user_id, ts, MAX(value) AS value FROM events
                WHERE event_type = 'error' GROUP BY user_id, ts)
SELECT c.event_id, c.ts, c.user_id, c.value,
       e.ts AS asof_ts, e.value AS err_value
FROM clicks c
ASOF LEFT JOIN errors e
  ON c.user_id = e.user_id AND e.ts <= c.ts
"""


def test_asof_join_matches_duckdb_asof(spark, duck):
    """Every click picks up the user's most recent error at-or-before it —
    bit-identical to DuckDB's native ASOF LEFT JOIN."""
    clicks, errors = _clicks_errors(spark)
    out = asof_join(clicks, errors, on=["user_id"], values=["value"])
    assert_matches_oracle(
        out.withColumnRenamed("value_asof", "err_value"),
        duck(SF_DIR), _ASOF_ORACLE, name="asof_join")


def test_asof_join_single_shuffle(spark):
    clicks, errors = _clicks_errors(spark)
    out = asof_join(clicks, errors, on=["user_id"], values=["value"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the union+window formulation shuffles ONCE (aggregating the right
    # side has its own exchange upstream; the as-of itself adds exactly one)
    assert plan.count("Exchange hashpartitioning(user_id") <= 2
    assert "Window" in plan


def test_asof_tolerance_nulls_stale_matches(spark):
    import datetime as dt

    def t(minutes):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, t(10)), (1, t(60)), (2, t(5))], "id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, t(9), 1.0), (1, t(20), 2.0)], "id long, ts timestamp, v double")
    out = asof_join(left, right, on=["id"], values=["v"],
                    tolerance_us=15 * 60_000_000)
    got = {(r["id"], r["ts"]): (r["asof_ts"], r["v_asof"])
           for r in out.collect()}
    assert got[(1, t(10))] == (t(9), 1.0)      # fresh match
    assert got[(1, t(60))] == (None, None)     # t(20) is 40min stale
    assert got[(2, t(5))] == (None, None)      # no right rows for key


_RANGE_ORACLE = """
WITH clicks AS (SELECT event_id, ts, user_id FROM events
                WHERE event_type = 'click'),
     errors AS (SELECT event_id, ts, user_id FROM events
                WHERE event_type = 'error')
SELECT c.event_id AS event_id_l, c.ts AS ts_l,
       e.event_id AS event_id_r, e.ts AS ts_r, c.user_id
FROM clicks c JOIN errors e
  ON c.user_id = e.user_id
 AND e.ts BETWEEN c.ts - INTERVAL 10 MINUTE AND c.ts + INTERVAL 10 MINUTE
"""


def test_range_join_matches_duckdb_inequality_join(spark, duck):
    ev = Catalog(spark, SF_DIR).table("events").select(
        "event_id", "ts", "user_id", "event_type")
    clicks = ev.where(F.col("event_type") == "click").drop("event_type")
    errors = ev.where(F.col("event_type") == "error").drop("event_type")
    out = range_join_bucketed(clicks, errors, on=["user_id"],
                              window_us=10 * 60_000_000)
    assert_matches_oracle(out, duck(SF_DIR), _RANGE_ORACLE,
                          name="range_join_bucketed")


def test_range_join_is_equi_join_not_nested_loop(spark):
    ev = Catalog(spark, SF_DIR).table("events").select(
        "event_id", "ts", "user_id", "event_type")
    clicks = ev.where(F.col("event_type") == "click").drop("event_type")
    errors = ev.where(F.col("event_type") == "error").drop("event_type")
    out = range_join_bucketed(clicks, errors, on=["user_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "__bucket" in plan  # banded key reaches the join


_ASOF_FWD_ORACLE = """
WITH clicks AS (SELECT event_id, ts, user_id, value FROM events
                WHERE event_type = 'click'),
     errors AS (SELECT user_id, ts, MAX(value) AS value FROM events
                WHERE event_type = 'error' GROUP BY user_id, ts)
SELECT c.event_id, c.ts, c.user_id, c.value,
       e.ts AS asof_ts, e.value AS err_value
FROM clicks c
ASOF LEFT JOIN errors e
  ON c.user_id = e.user_id AND e.ts >= c.ts
"""


def test_asof_join_forward_matches_duckdb(spark, duck):
    """direction='forward': every click picks up the user's NEXT error at-
    or-after it — mirrored window, same single-shuffle plan."""
    clicks, errors = _clicks_errors(spark)
    out = asof_join(clicks, errors, on=["user_id"], values=["value"],
                    direction="forward")
    assert_matches_oracle(
        out.withColumnRenamed("value_asof", "err_value"),
        duck(SF_DIR), _ASOF_FWD_ORACLE, name="asof_forward")


def test_asof_join_multi_key(spark):
    """Composite as-of key (user_id, event_type): matches only within the
    same composite group."""
    import datetime as dt

    def t(minutes):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame(
        [(1, "a", t(10)), (1, "b", t(10))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(1, "a", t(5), 1.0), (1, "b", t(7), 2.0), (2, "a", t(9), 9.0)],
        "id long, k string, ts timestamp, v double")
    out = asof_join(left, right, on=["id", "k"], values=["v"])
    got = {(r["id"], r["k"]): (r["asof_ts"], r["v_asof"])
           for r in out.collect()}
    assert got == {(1, "a"): (t(5), 1.0), (1, "b"): (t(7), 2.0)}


def test_asof_join_map_values_need_opt_out(spark):
    """Map-typed value columns can't enter the deterministic tie-break
    sort key (maps aren't orderable): the default raises a CLEAR error
    at plan-build time; deterministic_ties=False carries them fine and
    on tie-free data produces exactly the documented match."""
    import datetime as dt

    import pytest

    def t(minutes):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame([(1, t(10))], "id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, t(5), {"k": 1.0}), (1, t(7), {"k": 2.0})],
        "id long, ts timestamp, v map<string,double>")
    with pytest.raises(ValueError, match="deterministic_ties=False"):
        asof_join(left, right, on=["id"], values=["v"])
    out = asof_join(left, right, on=["id"], values=["v"],
                    deterministic_ties=False).collect()
    assert len(out) == 1
    assert out[0]["asof_ts"] == t(7) and out[0]["v_asof"] == {"k": 2.0}


def test_asof_join_tie_free_identical_under_both_settings(spark):
    """On tie-free inputs the deterministic and opt-out paths return the
    SAME rows (the tie-break key is inert when (key, ts) is unique)."""
    clicks, errors = _clicks_errors(spark)
    a = sorted(map(tuple, asof_join(
        clicks, errors, on=["user_id"], values=["value"]).collect()))
    b = sorted(map(tuple, asof_join(
        clicks, errors, on=["user_id"], values=["value"],
        deterministic_ties=False).collect()))
    assert a == b and len(a) > 0
