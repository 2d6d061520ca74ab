"""OHLC + time-weighted average: hand candles, DuckDB differentials
(struct-min open/close — arithmetic-free, hash-exact on doubles), TWA
python reference on integral values (exact float ops), tie semantics."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from realtime_olap_spark.operators.downsample import ohlc, time_weighted_avg
from tests.conftest import SF_DIR, assert_matches_oracle

T0 = dt.datetime(2024, 1, 1)
HOUR = 3600


def _ev(spark, rows):
    return spark.createDataFrame(
        [(g, T0 + dt.timedelta(seconds=s), float(v)) for g, s, v in rows],
        "g string, ts timestamp, v double")


def test_ohlc_hand(spark):
    df = _ev(spark, [
        ("a", 0, 10), ("a", 100, 50), ("a", 200, 5), ("a", 3599, 30),
        ("a", 3600, 99),
    ])
    got = {r["bucket"]: (r["open"], r["high"], r["low"], r["close"], r["n"])
           for r in ohlc(df, "ts", HOUR, ["g"], "v").collect()}
    assert got[T0] == (10.0, 50.0, 5.0, 30.0, 4)
    assert got[T0 + dt.timedelta(hours=1)] == (99.0, 99.0, 99.0, 99.0, 1)


def test_ohlc_tie_break(spark):
    # two events at the same first/last microsecond: struct ordering makes
    # open the SMALLER tied value and close the LARGER tied value
    df = _ev(spark, [("a", 0, 7), ("a", 0, 3), ("a", 50, 9), ("a", 50, 4)])
    r = ohlc(df, "ts", HOUR, ["g"], "v").collect()[0]
    assert (r["open"], r["close"]) == (3.0, 9.0)


def test_ohlc_matches_duckdb(spark, duck):
    con = duck(SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = ohlc(ev, "ts", HOUR, ["event_type"], "value")
    oracle = """
SELECT event_type,
       make_timestamp(epoch_us(ts) - (epoch_us(ts) % 3600000000)) AS bucket,
       (min({'t': epoch_us(ts), 'v': value})).v AS open,
       MAX(value) AS high, MIN(value) AS low,
       (max({'t': epoch_us(ts), 'v': value})).v AS close,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
"""
    assert_matches_oracle(out, con, oracle, "ohlc")


def test_twa_hand(spark):
    # v=10 held 100 s, v=20 held 3500 s of the 3600 s span from t=0
    df = _ev(spark, [("a", 0, 10), ("a", 100, 20)])
    r = time_weighted_avg(df, "ts", HOUR, ["g"], "v").collect()[0]
    want = (10 * 100 + 20 * 3500) / 3600
    assert r["twa"] == want
    assert r["span_us"] == 3600 * 1_000_000
    # single observation holds to bucket end -> twa = v
    df1 = _ev(spark, [("b", 1800, 42)])
    r1 = time_weighted_avg(df1, "ts", HOUR, ["g"], "v").collect()[0]
    assert r1["twa"] == 42.0 and r1["span_us"] == 1800 * 1_000_000


def test_twa_tie_last_value_carries(spark):
    # tied timestamps: zero duration except the LAST tie (max value)
    df = _ev(spark, [("a", 0, 5), ("a", 0, 1)])
    r = time_weighted_avg(df, "ts", HOUR, ["g"], "v").collect()[0]
    assert r["twa"] == 5.0


def test_twa_random_sweep_vs_python(spark):
    """Integral values and micro-aligned times keep every float op exact,
    so the python reference must match bit-for-bit."""
    rng = random.Random(5)
    cases, rows = {}, []
    for g in range(150):
        n = rng.randint(1, 10)
        obs = sorted(rng.sample(range(0, HOUR), n))
        vals = [float(rng.randint(-50, 50)) for _ in obs]
        cases[str(g)] = list(zip(obs, vals))
        rows += [(str(g), s, v) for s, v in zip(obs, vals)]
    df = _ev(spark, rows)
    got = {r["g"]: (r["twa"], r["span_us"])
           for r in time_weighted_avg(df, "ts", HOUR, ["g"], "v").collect()}
    for g, obs in cases.items():
        num, den = 0.0, 0
        for i, (t, v) in enumerate(obs):
            end = obs[i + 1][0] if i + 1 < len(obs) else HOUR
            num += v * float((end - t) * 1_000_000)
            den += (end - t) * 1_000_000
        assert got[g] == (num / float(den), den), g


def test_twa_matches_duckdb_integral(spark, duck):
    con = duck(SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .withColumn("value", F.round("value").cast("double"))
    out = time_weighted_avg(ev, "ts", HOUR, ["event_type"], "value")
    # mirror construction (lead + telescoping span); integral values make
    # the products exact, and the sums stay < 2^53 so order cannot matter
    oracle = """
WITH b AS (
  SELECT event_type, ROUND(value) AS v, epoch_us(ts) AS us,
         epoch_us(ts) - (epoch_us(ts) % 3600000000) AS b_us
  FROM events),
d AS (
  SELECT event_type, b_us, v,
         COALESCE(lead(us) OVER (PARTITION BY event_type, b_us
                                 ORDER BY us, v),
                  b_us + 3600000000) - us AS w
  FROM b)
SELECT event_type, make_timestamp(b_us) AS bucket,
       SUM(v * CAST(w AS DOUBLE)) / CAST(SUM(w) AS DOUBLE) AS twa,
       CAST(SUM(w) AS BIGINT) AS span_us, COUNT(*) AS n
FROM d GROUP BY 1, 2
"""
    assert_matches_oracle(out, con, oracle, "twa")


def test_sliding_quantile_rank_bounds(spark):
    """Trailing 6-hour p50/p95 per hour: windowed row counts must be
    exact; each quantile estimate's EXACT rank inside the true window
    population must sit within the KLL rank-error bound (and be exact
    when the window holds <= k rows)."""
    from realtime_olap_spark.operators.downsample import sliding_quantile

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    W = 6
    out = sliding_quantile(ev, "ts", "value", HOUR, W,
                           quantiles=(0.5, 0.95), k=200).collect()
    rows = ev.select(
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.col("ts").cast("timestamp"))
         % (HOUR * 1_000_000)).alias("b"), "value").collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["b"], []).append(r["value"])
    assert len(out) == len(by_bucket) > 10
    for rec in out:
        b_us = int(rec["bucket"].replace(
            tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        window = sorted(v for bb, vs in by_bucket.items()
                        if b_us - (W - 1) * HOUR * 1_000_000 <= bb <= b_us
                        for v in vs)
        assert rec["n"] == len(window)
        for q, col in [(0.5, "q_50"), (0.95, "q_95")]:
            est = rec[col]
            import bisect
            lo = bisect.bisect_left(window, est) / len(window)
            hi = bisect.bisect_right(window, est) / len(window)
            tol = 0.0 if len(window) <= 200 else 0.05
            assert lo - tol <= q <= hi + tol, (rec["bucket"], q, est, lo, hi)


def test_sliding_quantile_window_one_is_per_bucket(spark):
    """window_buckets=1 degenerates to plain per-bucket quantiles."""
    from realtime_olap_spark.operators.downsample import sliding_quantile

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = {(r["bucket"], r["n"]): r["q_50"]
         for r in sliding_quantile(ev, "ts", "value", HOUR, 1,
                                   quantiles=(0.5,)).collect()}
    b = {(r["bucket"], r["n"]): r["q_50"]
         for r in sliding_quantile(ev, "ts", "value", HOUR, 1,
                                   quantiles=(0.5,)).collect()}
    assert a == b and len(a) > 10  # deterministic, per-bucket grain


def test_counter_rate_hand_and_resets(spark):
    from realtime_olap_spark.operators.downsample import counter_rate

    # counter 0 -> 10 -> 25 -> reset -> 5 -> 30 across two buckets
    df = _ev(spark, [("a", 0, 0), ("a", 100, 10), ("a", 200, 25),
                     ("a", 3700, 5), ("a", 3800, 30)])
    got = {r["bucket"]: (r["increase"], r["rate_per_s"], r["n_samples"])
           for r in counter_rate(df, "ts", HOUR, ["g"], "v").collect()}
    # bucket 0: deltas 10, 15 (first sample contributes nothing)
    assert got[T0] == (25.0, 25.0 / 3600, 3)
    # bucket 1: reset sample contributes its own value 5, then +25
    assert got[T0 + dt.timedelta(hours=1)] == (30.0, 30.0 / 3600, 2)


def test_counter_rate_matches_duckdb(spark, duck):
    from realtime_olap_spark.operators.downsample import counter_rate

    con = duck(SF_DIR)
    # synthesize integral cumulative counters per event_type from events
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .withColumn("value", F.round("value").cast("double"))
    out = counter_rate(ev, "ts", HOUR, ["event_type"], "value")
    oracle = """
WITH b AS (
  SELECT event_type, ROUND(value) AS v, epoch_us(ts) AS us FROM events),
d AS (
  SELECT event_type, us,
         CASE WHEN prev IS NULL THEN NULL
              WHEN v >= prev THEN v - prev ELSE v END AS delta
  FROM (SELECT *, lag(v) OVER (PARTITION BY event_type
                               ORDER BY us, v) AS prev FROM b))
SELECT event_type,
       make_timestamp(us - (us % 3600000000)) AS bucket,
       COALESCE(SUM(delta), 0.0) AS increase,
       COALESCE(SUM(delta), 0.0) / 3600.0 AS rate_per_s,
       COUNT(*) AS n_samples
FROM d GROUP BY 1, 2
"""
    assert_matches_oracle(out, con, oracle, "counter_rate")


def test_counter_rate_random_sweep(spark):
    """Random integral counter walks with resets vs a python reference
    (exact float ops on integral deltas)."""
    from realtime_olap_spark.operators.downsample import counter_rate

    rng = random.Random(11)
    cases, rows = {}, []
    for g in range(120):
        t, v, samples = 0, 0, []
        for _ in range(rng.randint(2, 15)):
            t += rng.randint(1, 1200)
            if rng.random() < 0.15:
                v = rng.randint(0, 5)      # reset
            else:
                v += rng.randint(0, 100)   # growth
            samples.append((t, float(v)))
        cases[str(g)] = samples
        rows += [(str(g), s, v) for s, v in samples]
    df = _ev(spark, rows)
    got = {(r["g"], r["bucket"]): (r["increase"], r["n_samples"])
           for r in counter_rate(df, "ts", HOUR, ["g"], "v").collect()}
    want = {}
    for g, samples in cases.items():
        prev = None
        for t, v in samples:
            b = T0 + dt.timedelta(seconds=(t // HOUR) * HOUR)
            inc, n = want.get((g, b), (0.0, 0))
            d = 0.0 if prev is None else (v - prev if v >= prev else v)
            want[(g, b)] = (inc + d, n + 1)
            prev = v
    assert got == want


def test_histogram_hand_and_clamp(spark):
    from realtime_olap_spark.operators.downsample import histogram

    df = _ev(spark, [("a", 0, v) for v in
                     [-5, 0, 1, 9.99, 10, 55, 99.9, 100, 250]])
    got = {r["bin"]: r["n"]
           for r in histogram(df, "v", 0.0, 100.0, 10).collect()}
    # clamp: -5 joins bin 0; 100 and 250 join bin 9
    assert got == {0: 4, 1: 1, 5: 1, 9: 3}
    nd = {r["bin"]: r["n"] for r in
          histogram(df, "v", 0.0, 100.0, 10, clamp=False).collect()}
    assert nd == {0: 3, 1: 1, 5: 1, 9: 1}


def test_histogram_matches_duckdb(spark, duck):
    from realtime_olap_spark.operators.downsample import histogram

    con = duck(SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = histogram(ev, "value", 0.0, 50.0, 16, group_cols=["event_type"])
    oracle = """
WITH b AS (
  SELECT event_type,
         LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 3.125) AS BIGINT), 0),
               15) AS bin
  FROM events WHERE value IS NOT NULL)
SELECT event_type, bin, 0.0 + bin * 3.125 AS bin_lo,
       0.0 + (bin + 1) * 3.125 AS bin_hi, COUNT(*) AS n
FROM b GROUP BY 1, 2
"""
    assert_matches_oracle(out, con, oracle, "histogram")


def test_histogram_total_preserved(spark):
    from realtime_olap_spark.operators.downsample import histogram

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    total = ev.where(F.col("value").isNotNull()).count()
    got = histogram(ev, "value", 0.0, 50.0, 16).agg(F.sum("n")).first()[0]
    assert got == total  # clamp loses nothing


def test_counter_rate_fold_equals_batch(spark):
    """Time-ordered microbatch folds of counter_rate_fold sum per bucket
    to the one-shot batch counter_rate (state carries each series' last
    sample across batch boundaries)."""
    from realtime_olap_spark.operators.downsample import (counter_rate,
                                                          counter_rate_fold)

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .withColumn("value", F.round("value").cast("double"))
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 3
    cuts = [lo + span, lo + 2 * span]
    batches = [ev.where(F.col("ts") <= cuts[0]),
               ev.where((F.col("ts") > cuts[0]) & (F.col("ts") <= cuts[1])),
               ev.where(F.col("ts") > cuts[1])]
    state = None
    acc = {}
    for bdf in batches:
        inc, state = counter_rate_fold(bdf, state, "ts", HOUR,
                                       ["event_type"], "value")
        state = state.localCheckpoint()
        for r in inc.collect():
            key = (r["event_type"], r["bucket"])
            i, n = acc.get(key, (0.0, 0))
            acc[key] = (i + r["increase"], n + r["n_samples"])
    want = {(r["event_type"], r["bucket"]): (r["increase"], r["n_samples"])
            for r in counter_rate(ev, "ts", HOUR,
                                  ["event_type"], "value").collect()}
    assert acc == want and len(want) > 100


def test_counter_rate_equals_naive_window(spark):
    """The skew-safe (series,bucket)-window shape equals the textbook
    series-wide lag fold exactly (integral values keep the regrouped
    float adds exact)."""
    from realtime_olap_spark.operators.downsample import (
        _counter_rate_naive, counter_rate)

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .withColumn("value", F.round("value").cast("double"))
    a = {(r["event_type"], r["bucket"]): (r["increase"], r["n_samples"])
         for r in counter_rate(ev, "ts", HOUR,
                               ["event_type"], "value").collect()}
    b = {(r["event_type"], r["bucket"]): (r["increase"], r["n_samples"])
         for r in _counter_rate_naive(ev, "ts", HOUR,
                                      ["event_type"], "value").collect()}
    assert a == b and len(a) > 100
