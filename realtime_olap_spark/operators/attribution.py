"""Marketing-style attribution: credit each conversion event to the
user's most recent qualifying touch event.

A thin composition over :func:`operators.joins.asof_join` (the engine's
as-of machinery — one user-key shuffle, window-based nearest-match):
conversions are the left side, touches the right, matched backward
within an optional lookback. The reference has neither joins nor this
operator (SURVEY.md §2.3); it is the standard events-table companion to
:mod:`operators/funnel` / :mod:`operators/retention`.

Semantics: a touch at the SAME microsecond as the conversion counts
(as-of is inclusive); duplicate touches at an identical (user, ts) have
an unspecified winner (same contract as ``asof_join`` and SQL ASOF
JOIN); conversions with no touch in the lookback attribute to NULL
("unattributed" in the report).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from realtime_olap_spark.operators.joins import asof_join


def last_touch_attribution(df: DataFrame, conversion_event: str,
                           touch_events: Sequence[str],
                           user_col: str = "user_id", ts_col: str = "ts",
                           event_col: str = "event_type",
                           lookback_seconds: Optional[int] = None,
                           banded: bool = False) -> DataFrame:
    """One row per conversion event: all conversion columns +
    ``channel`` (the attributed touch's event value, NULL when
    unattributed) + ``touch_ts`` (its timestamp).

    Physical shapes:

    - **as-of** (default): the :func:`operators.joins.asof_join` union
      + running-last window — ONE shuffle on the user key. Interleaved
      A/B at the 1000× soak (100M events, min-of-2, warmed): 12.2 s at
      10M users, 11.8 s skewed to 10k users × 10k events, 25.7 s at
      100 users × 1M events — the window's parallelism is
      min(users, cores) but the sort is linear, so even heavy skew
      degrades gently.
    - **banded** (``banded=True``, needs a finite lookback): the
      multi-touch lookback banding — touches keyed by floor(t/L),
      conversions probing bands {b−1, b}, a per-(user, conv-ts)
      ``max(struct(t, channel))`` reduce, and a join back onto the
      conversions. MEASURED SLOWER than as-of in every tested regime
      (20.3 s uniform, 259 s at 100 users — its equi-join key
      cardinality is users × bands-in-range, which collapses exactly
      when the window would, and it pays 3 shuffles to the window's 1).
      Its niche is a lookback much SMALLER than the data's time span
      (bands ≫ 1 per user) combined with per-user histories too large
      to sort in one partition; outside that, keep the default.

    Both shapes are result-identical on a finite lookback
    (equality-tested against each other and DuckDB ASOF in
    tests/test_attribution.py) — INCLUDING two different touch channels
    at one identical (user, ts) instant: asof_join breaks the tie
    deterministically as max(struct(ts, channel)), exactly the banded
    reduce's ``max(struct(t, channel))``, so the shapes agree on
    ``channel`` too (tie repro in tests/test_attribution.py).
    Conversions sharing an identical (user, ts) instant necessarily
    share the same last touch, which is what lets the banded reduce key
    on (user, conv-ts) instead of a synthetic row id."""
    # asof_join's tolerance path needs TIMESTAMP (unix_micros rejects
    # the NTZ type raw parquet reads produce); session TZ is UTC
    df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    conv = df.where(F.col(event_col) == conversion_event)
    touch = (df.where(F.col(event_col).isin(list(touch_events)))
             .select(user_col, ts_col, F.col(event_col).alias("__touch")))
    if banded and lookback_seconds is None:
        raise ValueError("banded last-touch needs a finite "
                         "lookback_seconds (the band width)")
    if not banded:
        tol = None if lookback_seconds is None \
            else int(lookback_seconds) * 1_000_000
        out = asof_join(conv, touch, on=[user_col], left_ts=ts_col,
                        right_ts=ts_col, values=["__touch"],
                        tolerance_us=tol, suffix="", direction="backward")
        return (out.withColumnRenamed("__touch", "channel")
                .withColumnRenamed("asof_ts", "touch_ts"))

    look_us = int(lookback_seconds) * 1_000_000

    def band(col):
        return ((col - F.pmod(col, F.lit(look_us))) / F.lit(look_us)) \
            .cast("long")

    c_us = F.unix_micros(F.col(ts_col))
    conv_probe = (conv.select(F.col(user_col).alias("__u"),
                              c_us.alias("__c_us"))
                  .distinct()
                  .withColumn("__band",
                              F.explode(F.array(band(F.col("__c_us")) - 1,
                                                band(F.col("__c_us"))))))
    touch_b = (touch.select(F.col(user_col).alias("__u"),
                            F.col("__touch"),
                            c_us.alias("__t_us"))
               .withColumn("__band", band(F.col("__t_us"))))
    best = (conv_probe.join(touch_b, on=["__u", "__band"], how="inner")
            .where((F.col("__t_us") <= F.col("__c_us"))
                   & (F.col("__t_us") >= F.col("__c_us") - F.lit(look_us)))
            .groupBy("__u", "__c_us")
            .agg(F.max(F.struct(F.col("__t_us").alias("t"),
                                F.col("__touch").alias("ch")))
                 .alias("__m")))
    joined = conv.join(
        best,
        (F.col(user_col) == F.col("__u"))
        & (F.unix_micros(F.col(ts_col)) == F.col("__c_us")),
        "left")
    return joined.select(
        *conv.columns,
        F.col("__m")["ch"].alias("channel"),
        F.timestamp_micros(F.col("__m")["t"]).alias("touch_ts"))


def attribution_report(df: DataFrame, conversion_event: str,
                       touch_events: Sequence[str],
                       user_col: str = "user_id", ts_col: str = "ts",
                       event_col: str = "event_type",
                       lookback_seconds: Optional[int] = None
                       ) -> DataFrame:
    """Per-channel conversion credit: ``(channel, n_conversions,
    share)`` — NULL channel = unattributed; share over ALL conversions
    (one int/int divide, cross-engine exact). Tiny post-join aggregate."""
    a = last_touch_attribution(df, conversion_event, touch_events,
                               user_col, ts_col, event_col,
                               lookback_seconds)
    counts = a.groupBy("channel").agg(F.count(F.lit(1))
                                      .alias("n_conversions"))
    total = counts.agg(F.sum("n_conversions").alias("__total"))
    return (counts.crossJoin(F.broadcast(total))
            .select("channel", "n_conversions",
                    (F.col("n_conversions") / F.col("__total"))
                    .alias("share"))
            .orderBy(F.col("n_conversions").desc(),
                     F.col("channel").asc_nulls_last()))


def multi_touch_attribution(df: DataFrame, conversion_event: str,
                            touch_events: Sequence[str],
                            model: str = "linear",
                            user_col: str = "user_id", ts_col: str = "ts",
                            event_col: str = "event_type",
                            conv_id_col: str = "event_id",
                            lookback_seconds: int = 7 * 86400,
                            half_life_seconds: Optional[int] = None
                            ) -> DataFrame:
    """Fractional credit across EVERY touch in the lookback window:

    - ``linear``: each of the n touches gets 1/n (exact rational —
      DuckDB-differential in tests).
    - ``position`` (U-shape): first 0.4, last 0.4, middles share 0.2
      (n=1 → 1.0, n=2 → 0.5/0.5) — also engine-exact.
    - ``time_decay``: weight 0.5^(Δt/half_life), normalized per
      conversion. pow is a libm call and NOT bit-reproducible across
      engines (the round-6 log lesson), so this model is verified
      against a python reference at 1e-9, not hash-compared.

    Output: one row per (conversion, touch) with ``credit``; a
    conversion with no touches yields one NULL-channel row with credit
    1. Shape: one-sided BANDED equi-join on (user, lookback-band) — a
    touch in ``[c − L, c]`` always lands in band(c) or band(c)−1, so
    each qualifying pair is found exactly once and per-task pair counts
    are band-local (a plain user equi-join + range filter computes the
    full per-user conv×touch cartesian first: the 100× soak measured
    26.8× growth on that shape vs 2.5× banded). Then ONE window over
    conv_id partitions (size = touches-per-conversion) for the
    n/rank/normalizer, and unattributed conversions return through an
    anti-join on the matched ids."""
    if model not in ("linear", "position", "time_decay"):
        raise ValueError(f"unknown model {model!r}")
    if model == "time_decay" and not half_life_seconds:
        raise ValueError("time_decay needs half_life_seconds")
    df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    look_us = int(lookback_seconds) * 1_000_000
    c_us = F.unix_micros(F.col(ts_col))
    conv = (df.where(F.col(event_col) == conversion_event)
            .select(F.col(user_col).alias("__u"),
                    F.col(conv_id_col).alias("conv_id"),
                    c_us.alias("__c_us")))
    touch = (df.where(F.col(event_col).isin(list(touch_events)))
             .select(F.col(user_col).alias("__u"),
                     F.col(event_col).alias("channel"),
                     c_us.alias("__t_us")))
    # exact int64 band (double-division floor can wobble at multiples)
    def band(col):
        return ((col - F.pmod(col, F.lit(look_us))) / F.lit(look_us)) \
            .cast("long")

    conv_probe = conv.withColumn(
        "__band", F.explode(F.array(band(F.col("__c_us")) - 1,
                                    band(F.col("__c_us")))))
    touch_b = touch.withColumn("__band", band(F.col("__t_us")))
    pairs = (conv_probe.join(touch_b, on=["__u", "__band"], how="inner")
             .where((F.col("__t_us") <= F.col("__c_us"))
                    & (F.col("__t_us") >= F.col("__c_us")
                       - F.lit(look_us)))
             .drop("__band"))
    matched = pairs.select("conv_id").distinct()
    unmatched = (conv.join(matched, on="conv_id", how="left_anti")
                 .select("__u", "conv_id", "__c_us",
                         F.lit(None).cast("string").alias("channel"),
                         F.lit(None).cast("long").alias("__t_us")))
    j = pairs.unionByName(unmatched)
    w = Window.partitionBy("conv_id")
    wo = w.orderBy("__t_us", "channel")
    n = F.count("__t_us").over(w)
    rk = F.row_number().over(wo)
    if model == "linear":
        credit = F.lit(1.0) / n
    elif model == "position":
        credit = (F.when(n == 1, F.lit(1.0))
                  .when(n == 2, F.lit(0.5))
                  .when(rk == 1, F.lit(0.4))
                  .when(rk == n, F.lit(0.4))
                  .otherwise(F.lit(0.2) / (n - F.lit(2))))
    else:
        hl = float(half_life_seconds) * 1_000_000.0
        age = F.col("__c_us") - F.col("__t_us")
        # Shift ages by the window minimum (the log-sum-exp trick):
        # algebraically identical — 0.5^(a/h)/Σ 0.5^(b/h) ==
        # 0.5^((a−m)/h)/Σ 0.5^((b−m)/h) — but the youngest touch's
        # weight is now exactly 1.0, so the normalizer is ≥ 1 and a
        # half-life tiny relative to the touch ages can no longer
        # underflow the WHOLE window to 0 and hit ANSI DIVIDE_BY_ZERO
        # (found by scripts/randomized_sweep_analytics.py: hl=10 s,
        # lookback=24 h → 0.5^8640 ≡ 0.0 for every touch). Touches far
        # older than the youngest still underflow individually to
        # credit 0 — the correct limit distribution.
        m = F.min(age).over(w)
        raw = F.pow(F.lit(0.5), (age - m) / hl)
        credit = raw / F.sum(raw).over(w)
    credit = F.when(F.col("__t_us").isNull(), F.lit(1.0)).otherwise(credit)
    return (j.select(F.col("__u").alias(user_col), "conv_id", "channel",
                     F.timestamp_micros(F.col("__t_us")).alias("touch_ts"),
                     credit.alias("credit")))


def multi_touch_report(df: DataFrame, conversion_event: str,
                       touch_events: Sequence[str], model: str = "linear",
                       **kwargs) -> DataFrame:
    """Per-channel fractional credit totals (NULL = unattributed);
    credits sum to the number of conversions by construction."""
    a = multi_touch_attribution(df, conversion_event, touch_events,
                                model, **kwargs)
    return (a.groupBy("channel").agg(F.sum("credit").alias("credit"))
            .orderBy(F.col("credit").desc(),
                     F.col("channel").asc_nulls_last()))
