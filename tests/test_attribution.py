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


def test_multi_touch_linear_matches_duckdb(spark, duck):
    from realtime_olap_spark.operators.attribution import \
        multi_touch_attribution

    con = duck(SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = (multi_touch_attribution(ev, "purchase", TOUCHES, "linear",
                                   lookback_seconds=2 * 86400)
           .select("conv_id", "channel", "touch_ts", "credit"))
    oracle = f"""
WITH conv AS (
  SELECT user_id, event_id AS conv_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'purchase'),
touch AS (
  SELECT user_id, event_type AS channel, epoch_us(ts) AS t_us
  FROM events WHERE event_type IN ({', '.join(repr(t) for t in TOUCHES)})),
j AS (
  SELECT c.conv_id, t.channel, t.t_us
  FROM conv c LEFT JOIN touch t
    ON c.user_id = t.user_id AND t.t_us <= c.c_us
   AND t.t_us >= c.c_us - {2 * 86400 * 1_000_000})
SELECT conv_id, channel, make_timestamp(t_us) AS touch_ts,
       CASE WHEN t_us IS NULL THEN 1.0
            ELSE 1.0 / COUNT(t_us) OVER (PARTITION BY conv_id) END AS credit
FROM j
"""
    assert_matches_oracle(out, con, oracle, "multi_touch_linear")


def test_multi_touch_position_hand(spark):
    from realtime_olap_spark.operators.attribution import \
        multi_touch_attribution

    df = _ev(spark, [
        (1, 0, "view"), (1, 10, "click"), (1, 20, "view"), (1, 25, "click"),
        (1, 30, "purchase"),
        (2, 5, "view"), (2, 40, "purchase"),
        (3, 50, "purchase"),
    ]).withColumn("event_id", F.monotonically_increasing_id())
    rows = multi_touch_attribution(df, "purchase", ["view", "click"],
                                   "position",
                                   lookback_seconds=3600).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["touch_ts"])
    assert [round(r["credit"], 10) for r in u1] == [0.4, 0.1, 0.1, 0.4]
    assert [r["credit"] for r in by_user[2]] == [1.0]
    assert by_user[3][0]["channel"] is None
    assert by_user[3][0]["credit"] == 1.0


def test_multi_touch_time_decay_vs_python(spark):
    from realtime_olap_spark.operators.attribution import \
        multi_touch_attribution

    df = _ev(spark, [
        (1, 0, "view"), (1, 1800, "click"), (1, 3600, "purchase"),
    ]).withColumn("event_id", F.monotonically_increasing_id())
    rows = sorted(multi_touch_attribution(
        df, "purchase", ["view", "click"], "time_decay",
        lookback_seconds=7200, half_life_seconds=1800).collect(),
        key=lambda r: r["touch_ts"])
    w_view = 0.5 ** (3600 / 1800)
    w_click = 0.5 ** (1800 / 1800)
    tot = w_view + w_click
    assert abs(rows[0]["credit"] - w_view / tot) < 1e-9
    assert abs(rows[1]["credit"] - w_click / tot) < 1e-9


def test_multi_touch_credits_sum_to_conversions(spark):
    from realtime_olap_spark.operators.attribution import \
        multi_touch_report

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_conv = ev.where(F.col("event_type") == "purchase").count()
    for model, kw in [("linear", {}), ("position", {}),
                      ("time_decay", {"half_life_seconds": 3600})]:
        rep = multi_touch_report(ev, "purchase", TOUCHES, model,
                                 lookback_seconds=86400, **kw)
        total = rep.agg(F.sum("credit")).first()[0]
        assert abs(total - n_conv) < 1e-6, model


def test_last_touch_banded_equals_asof(spark):
    """The opt-in banded shape must be row-identical to the default
    as-of shape — which is itself DuckDB-ASOF-differentialed above —
    including ties, expiry at the exact lookback edge, and unattributed
    conversions."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    for lb in (3600, 6 * 3600, 86400):
        a = (last_touch_attribution(ev, "purchase", TOUCHES,
                                    lookback_seconds=lb)
             .select("event_id", "user_id", "channel", "touch_ts"))
        b = (last_touch_attribution(ev, "purchase", TOUCHES,
                                    lookback_seconds=lb, banded=True)
             .select("event_id", "user_id", "channel", "touch_ts"))
        assert sorted(map(tuple, a.collect())) \
            == sorted(map(tuple, b.collect())), lb


def test_last_touch_tied_instant_deterministic(spark):
    """Two DIFFERENT touch channels at one identical (user, ts) instant:
    both shapes must pick the same winner — max(struct(ts, channel)),
    i.e. the lexicographically larger channel among the tied timestamps
    (asof_join orders tied right rows by their (rt, value) struct inside
    the window; the banded reduce is max(struct(t, ch)) outright). This
    is the exact input ADVICE r9 flagged as a potential flake."""
    df = _ev(spark, [
        (1, 50, "click"), (1, 50, "view"), (1, 100, "purchase"),
        (2, 50, "view"), (2, 50, "click"), (2, 100, "purchase"),
    ])
    for banded in (False, True):
        got = {r["user_id"]: r["channel"] for r in
               last_touch_attribution(df, "purchase", ["view", "click"],
                                      lookback_seconds=100,
                                      banded=banded).collect()}
        # 'view' > 'click' lexicographically, input order irrelevant
        assert got == {1: "view", 2: "view"}, f"banded={banded}"


def test_last_touch_banded_hand_and_guard(spark):
    df = _ev(spark, [
        (1, 0, "view"), (1, 50, "click"), (1, 100, "purchase"),
        (2, 0, "view"), (2, 500, "purchase"),
        (3, 10, "purchase"),
        (4, 100, "view"), (4, 200, "purchase"), (4, 200, "purchase"),
    ])
    got = sorted((r["user_id"], r["channel"]) for r in
                 last_touch_attribution(df, "purchase", ["view", "click"],
                                        lookback_seconds=100,
                                        banded=True).collect())
    # duplicate conversions at one (user, ts) both attribute to the
    # same touch; lookback edge is inclusive (u1: touch at c-100, u4:
    # touch at c-100)
    assert got == [(1, "click"), (2, None), (3, None),
                   (4, "view"), (4, "view")]
    import pytest as _pt
    with _pt.raises(ValueError, match="finite"):
        last_touch_attribution(df, "purchase", ["view"], banded=True)


def test_multi_touch_time_decay_tiny_half_life(spark):
    """Half-life tiny vs touch age: unshifted 0.5^(age/hl) underflows
    EVERY weight to 0.0 and the normalizer divide hits ANSI
    DIVIDE_BY_ZERO (found by the randomized sweep). The min-age shift
    keeps the youngest touch's weight at exactly 1.0; far-older touches
    correctly collapse to credit 0 (the limit distribution)."""
    from realtime_olap_spark.operators.attribution import \
        multi_touch_attribution

    df = _ev(spark, [
        (1, 0, "view"), (1, 50_000, "click"), (1, 86_000, "purchase"),
    ]).withColumn("event_id", F.monotonically_increasing_id())
    rows = sorted(multi_touch_attribution(
        df, "purchase", ["view", "click"], "time_decay",
        lookback_seconds=86_400, half_life_seconds=1).collect(),
        key=lambda r: r["touch_ts"])
    assert abs(sum(r["credit"] for r in rows) - 1.0) < 1e-12
    assert rows[-1]["credit"] == 1.0      # youngest touch takes all
    assert rows[0]["credit"] == 0.0       # 36000 half-lives older
