"""E2E behavioral-analytics pipeline over the events table: sessionize →
funnel → retention → gapfilled DAU → OHLC → attribution, with
cross-operator consistency invariants (each operator's totals must agree
with the others on the same corpus — the analytics analog of
test_curation_pipeline.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from realtime_olap_spark.operators.attribution import attribution_report
from realtime_olap_spark.operators.downsample import ohlc
from realtime_olap_spark.operators.funnel import funnel_counts
from realtime_olap_spark.operators.gapfill import gapfill, time_bucket
from realtime_olap_spark.operators.retention import cohort_retention
from realtime_olap_spark.operators.sessions import sessionize
from tests.conftest import SF_DIR

DAY = 86400


def test_behavioral_pipeline_consistency(spark):
    # raw parquet reads give TIMESTAMP_NTZ; the session-TZ-aware ops
    # (sessionize's unix_micros) want TIMESTAMP — one upfront cast, like
    # Catalog.table does for the suite
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()

    # sessions partition each user's events
    sess = sessionize(ev, "user_id", "ts", gap_minutes=30)
    assert sess.agg(F.sum("n_events")).first()[0] == n_events
    assert sess.select("user_id").distinct().count() == n_users

    # funnel step 1 = users with a signup event
    fc = {r["step"]: r["n_users"]
          for r in funnel_counts(ev, ["signup", "view", "click",
                                      "purchase"]).collect()}
    signup_users = (ev.where(F.col("event_type") == "signup")
                    .select("user_id").distinct().count())
    assert fc[1] == signup_users
    assert all(fc[i] >= fc[i + 1] for i in sorted(fc) if i + 1 in fc)

    # retention offset-0 cohort sizes partition the user base
    ret = cohort_retention(ev, bucket_seconds=7 * DAY)
    sizes = (ret.where(F.col("offset") == 0)
             .agg(F.sum("n_users")).first()[0])
    assert sizes == n_users

    # daily active-user curve, gapfilled: dense day axis, observed days
    # carry their exact distinct counts
    dau = time_bucket(ev, "ts", DAY, [],
                      [F.count_distinct("user_id").alias("dau")])
    filled = gapfill(dau.withColumn("g", F.lit(1)), "bucket", ["g"],
                     ["dau"], DAY, how="locf").drop("g")
    days = [r["bucket"] for r in filled.select("bucket").collect()]
    days.sort()
    assert all((b - a) == dt.timedelta(days=1)
               for a, b in zip(days, days[1:]))
    observed = {r["bucket"]: r["dau"] for r in dau.collect()}
    for r in filled.collect():
        if not r["is_filled"]:
            assert r["dau"] == observed[r["bucket"]]

    # OHLC candles cover every event exactly once
    candles = ohlc(ev, "ts", 3600, ["event_type"], "value")
    assert candles.agg(F.sum("n")).first()[0] == n_events

    # attribution credits every conversion exactly once
    rep = attribution_report(ev, "purchase", ["view", "click", "signup"],
                             lookback_seconds=3 * DAY)
    n_conv = ev.where(F.col("event_type") == "purchase").count()
    assert rep.agg(F.sum("n_conversions")).first()[0] == n_conv
