"""Last-touch attribution: hand cases (lookback expiry, latest-touch
wins, unattributed), DuckDB ASOF-JOIN differential, report shares."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from realtime_olap_spark.operators.attribution import (attribution_report,
                                                       last_touch_attribution)
from tests.conftest import SF_DIR, assert_matches_oracle

T0 = dt.datetime(2024, 1, 1)
TOUCHES = ["view", "click", "error", "signup"]


def _ev(spark, rows):
    return spark.createDataFrame(
        [(int(u), T0 + dt.timedelta(seconds=s), e) for u, s, e in rows],
        "user_id long, ts timestamp, event_type string")


def test_hand(spark):
    df = _ev(spark, [
        (1, 0, "view"), (1, 50, "click"), (1, 100, "purchase"),
        (2, 0, "view"), (2, 500, "purchase"),       # outside 100 s lookback
        (3, 10, "purchase"),                        # never touched
    ])
    got = {r["user_id"]: (r["channel"], r["touch_ts"])
           for r in last_touch_attribution(
               df, "purchase", ["view", "click"],
               lookback_seconds=100).collect()}
    assert got[1] == ("click", T0 + dt.timedelta(seconds=50))
    assert got[2] == (None, None)
    assert got[3] == (None, None)
    # without lookback user 2 attributes to the old view
    got2 = {r["user_id"]: r["channel"]
            for r in last_touch_attribution(
                df, "purchase", ["view", "click"]).collect()}
    assert got2 == {1: "click", 2: "view", 3: None}


def test_matches_duckdb_asof(spark, duck):
    con = duck(SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = (last_touch_attribution(ev, "purchase", TOUCHES)
           .select("event_id", "user_id", "channel", "touch_ts"))
    oracle = f"""
WITH conv AS (SELECT * FROM events WHERE event_type = 'purchase'),
touch AS (SELECT user_id, ts, event_type AS channel FROM events
          WHERE event_type IN ({', '.join(repr(t) for t in TOUCHES)}))
SELECT c.event_id, c.user_id, t.channel, t.ts AS touch_ts
FROM conv c ASOF LEFT JOIN touch t
  ON c.user_id = t.user_id AND t.ts <= c.ts
"""
    assert_matches_oracle(out, con, oracle, "attribution")


def test_report_shares(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rep = attribution_report(ev, "purchase", TOUCHES,
                             lookback_seconds=6 * 3600).collect()
    total = sum(r["n_conversions"] for r in rep)
    n_conv = ev.where(F.col("event_type") == "purchase").count()
    assert total == n_conv
    assert abs(sum(r["share"] for r in rep) - 1.0) < 1e-12
    for r in rep:
        assert r["share"] == r["n_conversions"] / total
