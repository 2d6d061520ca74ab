"""Funnel analysis: ordered multi-step event sequences per user.

The reference has no funnel aggregations — its behavioral queries are
filter + group-by over the time column (SURVEY.md §2.4/§2.10; Pinot grew
FUNNEL_COUNT/FUNNEL_MATCH_STEP years later) — but funnels are the
canonical product-analytics workload for an events table, so the engine
ships them as a first-class extension:

1. ``funnel_match`` — declarative, ONE shuffle: group the events by user
   collecting one time-sorted array per step
   (``array_sort(collect_list(when(event = step, t)))``), then match the
   funnel as a higher-order-function fold: ``t1 = first(step1 times)``,
   ``t_i = first(filter(step_i times, t > t_{i-1} [and t ≤ t1 + W]))``.
   Greedy-earliest matching — provably optimal when no conversion window
   is set (matching the earliest feasible event at every step can only
   enlarge the feasible set downstream, the classic subsequence-matching
   exchange argument).
2. ``funnel_match_pandas`` — the custom-operator escape hatch
   (``applyInPandas``): a per-user two-pointer scan that RE-ANCHORS on
   every step-1 occurrence. With a conversion window, greedy-earliest can
   fail where a later anchor succeeds (the window expires); the twin
   finds the max depth over ALL anchors. Equal to the declarative shape
   whenever no window is set (asserted in tests); with a window its depth
   dominates (property-tested).
3. ``funnel_counts`` — the per-step aggregate: users reaching step i,
   plus step-over-step conversion. Tiny post-agg data (k rows).

Every step time is carried as epoch micros (int64) so results compare
exactly across engines (the DuckDB oracle mirrors the list algebra with
``list_sort``/``list_filter``/1-based indexing; both engines drop
``x > NULL`` lambda comparisons the same way).

Scale: the only full-data operation is the per-user groupBy (one
Exchange, partial collect_list map-side). Per-step arrays are bounded by
a user's own event count; ``cap_per_step`` optionally truncates each
sorted array to its first N entries for pathological hot users (an
explicit, documented semantics change: events beyond the cap can no
longer match).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_match(df: DataFrame, steps: Sequence[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 event_col: str = "event_type",
                 window_seconds: Optional[int] = None,
                 strict: bool = True,
                 cap_per_step: Optional[int] = None,
                 step_window_seconds: Optional[int] = None) -> DataFrame:
    """Per-user funnel match: one row per user that performed step 1,
    with ``t_1 .. t_k`` (epoch micros of the greedy-earliest match, NULL
    once the funnel breaks) and ``max_step`` (deepest step reached).

    ``strict`` requires strictly increasing timestamps between steps
    (``>``); ``strict=False`` allows ties (``>=``). ``window_seconds``
    bounds the whole funnel to ``t1 + window`` (anchored at the matched
    first step — see ``funnel_match_pandas`` for anchor re-scan).
    ``step_window_seconds`` bounds each ADJACENT gap instead
    (``t_i ≤ t_{i-1} + W`` — the reference family's maxStepDuration
    mode); unlike the anchored whole-funnel window, greedy-earliest
    stays optimal here (taking the earliest feasible ``t_i`` minimizes
    the left end of the next step's window too), so no rescan twin is
    needed. Both windows may be combined.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    k = len(steps)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))

    arrs = []
    for i, s in enumerate(steps):
        a = F.array_sort(F.collect_list(F.when(F.col(event_col) == s, us)))
        if cap_per_step is not None:
            a = F.slice(a, F.lit(1), F.lit(int(cap_per_step)))
        arrs.append(a.alias(f"_a{i}"))
    g = (df.where(F.col(event_col).isin(list(steps)))
           .groupBy(F.col(user_col).alias("user"))
           .agg(*arrs))

    # t1 = earliest step-1 event; each later step folds over its own
    # array. Every t_i is staged as a projection alias (multi-referenced,
    # so it survives CollapseProject and is never re-evaluated inside the
    # next step's lambda — the HOF no-hoisting trap).
    g = g.select("*", F.try_element_at("_a0", F.lit(1)).alias("t_1"))
    if window_seconds is not None:
        g = g.select(
            "*", (F.col("t_1") + F.lit(int(window_seconds) * 1_000_000))
            .alias("_deadline"))
    # NB: the predicates must be SINGLE-arg callables — F.filter treats a
    # two-parameter callback as (element, index), so a captured-default
    # `lambda x, p=prev:` silently compares against the array index.
    step_us = None if step_window_seconds is None \
        else int(step_window_seconds) * 1_000_000

    def _after(p, d):
        def pred(x):
            c = (x > p) if strict else (x >= p)
            if d is not None:
                c = c & (x <= d)
            if step_us is not None:
                c = c & (x <= p + F.lit(step_us))
            return c
        return pred

    dl = F.col("_deadline") if window_seconds is not None else None
    for i in range(1, k):
        g = g.select("*", F.try_element_at(
            F.filter(F.col(f"_a{i}"), _after(F.col(f"t_{i}"), dl)),
            F.lit(1)).alias(f"t_{i + 1}"))

    max_step = F.lit(0)
    for i in range(1, k + 1):
        max_step = F.when(F.col(f"t_{i}").isNotNull(), F.lit(i)) \
                    .otherwise(max_step)
    out_cols = ["user"] + [f"t_{i}" for i in range(1, k + 1)]
    return (g.select(*out_cols, max_step.alias("max_step"))
             .where(F.col("t_1").isNotNull()))


def funnel_counts(df: DataFrame, steps: Sequence[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  event_col: str = "event_type",
                  window_seconds: Optional[int] = None,
                  strict: bool = True) -> DataFrame:
    """Per-step funnel aggregate: ``(step, step_name, n_users,
    conversion)`` where conversion = n_users / previous step's n_users.

    Post-match data is one row per converting user, so the counting agg
    is trivially cheap; the explode emits ≤ k rows per user.
    """
    m = funnel_match(df, steps, user_col, ts_col, event_col,
                     window_seconds, strict)
    tall = (m.select(F.explode(F.sequence(F.lit(1), F.col("max_step")))
                     .alias("step"))
            .groupBy("step").agg(F.count(F.lit(1)).alias("n_users")))
    names = F.array(*[F.lit(s) for s in steps])
    w = Window.orderBy("step")
    prev = F.lag("n_users").over(w)
    return (tall
            .select("step",
                    F.element_at(names, F.col("step").cast("int"))
                    .alias("step_name"),
                    "n_users",
                    F.when(prev.isNull(), F.lit(1.0))
                     .otherwise(F.col("n_users") / prev).alias("conversion"))
            .orderBy("step"))


def funnel_match_pandas(df: DataFrame, steps: Sequence[str],
                        user_col: str = "user_id", ts_col: str = "ts",
                        event_col: str = "event_type",
                        window_seconds: Optional[int] = None,
                        strict: bool = True) -> DataFrame:
    """Anchor-rescan funnel twin (``applyInPandas``): tries EVERY step-1
    occurrence as the funnel anchor and keeps the deepest match (earliest
    anchor wins ties). Identical to ``funnel_match`` when
    ``window_seconds`` is None (greedy-earliest is optimal without a
    deadline); with a window it can only reach deeper (never shallower).

    The per-user logic is a numpy-free two-pointer scan inside an Arrow
    batch — the §2.11 escape-hatch shape for state machines the SQL
    algebra can't express.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    step_list = list(steps)
    k = len(step_list)
    win_us = None if window_seconds is None else \
        int(window_seconds) * 1_000_000
    strict_local = bool(strict)

    schema = ("user long, "
              + ", ".join(f"t_{i + 1} long" for i in range(k))
              + ", max_step int")

    def per_user(pdf):
        import pandas as pd

        ev = pdf.sort_values("_us")
        per_step = [ev.loc[ev["_ev"] == s, "_us"].tolist()
                    for s in step_list]
        anchors = per_step[0]
        if not anchors:
            return pd.DataFrame(
                {c: pd.Series(dtype="int64" if c != "max_step" else "int32")
                 for c in ["user"]
                 + [f"t_{i + 1}" for i in range(k)] + ["max_step"]})
        best_depth, best_times = 0, []
        for a in anchors:
            times = [a]
            deadline = None if win_us is None else a + win_us
            cur = a
            for i in range(1, k):
                nxt = None
                for t in per_step[i]:
                    if (t > cur if strict_local else t >= cur) and \
                            (deadline is None or t <= deadline):
                        nxt = t
                        break
                if nxt is None:
                    break
                times.append(nxt)
                cur = nxt
            if len(times) > best_depth:
                best_depth, best_times = len(times), times
            if best_depth == k:
                break
        row = {"user": int(pdf["_user"].iloc[0])}
        for i in range(k):
            row[f"t_{i + 1}"] = (best_times[i]
                                 if i < len(best_times) else None)
        row["max_step"] = best_depth
        return pd.DataFrame([row])

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = (df.where(F.col(event_col).isin(step_list))
            .select(F.col(user_col).alias("_user"),
                    us.alias("_us"),
                    F.col(event_col).alias("_ev")))
    return base.groupBy("_user").applyInPandas(per_user, schema=schema)


def funnel_time_to_convert(df: DataFrame, steps: Sequence[str],
                           user_col: str = "user_id", ts_col: str = "ts",
                           event_col: str = "event_type",
                           window_seconds: Optional[int] = None,
                           strict: bool = True) -> DataFrame:
    """Step-to-step conversion latency: for each adjacent step pair,
    ``(step, n, min_s, median_s, p95_s, max_s)`` over the users who made
    that transition (durations in seconds, from the greedy-earliest
    match). Post-match data is ≤ 1 row per converting user per step, so
    the percentile aggregation is over tiny per-step groups; Spark's
    exact ``percentile`` matches DuckDB's ``quantile_cont``
    interpolation bit-for-bit on these integer-micro durations."""
    k = len(steps)
    m = funnel_match(df, steps, user_col, ts_col, event_col,
                     window_seconds, strict)
    pairs = ", ".join(
        f"{i + 1}L, t_{i + 2} - t_{i + 1}" for i in range(k - 1))
    tall = (m.select(F.expr(f"stack({k - 1}, {pairs})")
                     .alias("step", "dur_us"))
            .where(F.col("dur_us").isNotNull())
            .select("step", (F.col("dur_us") / F.lit(1_000_000.0))
                    .alias("dur_s")))
    return (tall.groupBy("step")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("dur_s").alias("min_s"),
                 F.expr("percentile(dur_s, 0.5)").alias("median_s"),
                 F.expr("percentile(dur_s, 0.95)").alias("p95_s"),
                 F.max("dur_s").alias("max_s"))
            .orderBy("step"))
