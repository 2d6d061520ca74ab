"""Randomized sweeps for the behavioral/time-series operators: hundreds
of generated cases batched into ONE DataFrame per property (distinct
group keys), compared against pure-Python reference implementations —
the theta/bloom randomized-sweep house style (seeded, exact compare)."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from realtime_olap_spark.operators.funnel import (funnel_match,
                                                  funnel_match_pandas)
from realtime_olap_spark.operators.gapfill import gapfill
from realtime_olap_spark.operators.retention import cohort_retention

T0 = dt.datetime(2024, 1, 1)
US = 1_000_000
STEPS = ["s1", "s2", "s3"]


def _t(sec):
    return T0 + dt.timedelta(seconds=int(sec))


def _t_us(sec):
    return int((_t(sec)).replace(tzinfo=dt.timezone.utc)
               .timestamp() * US)


# ---------- python references ----------

def _ref_funnel(events, window_s=None, strict=True):
    """Greedy-earliest funnel (anchor = earliest step-1 event)."""
    per = {s: sorted(t for t, e in events if e == s) for s in STEPS}
    if not per[STEPS[0]]:
        return None
    t1 = per[STEPS[0]][0]
    times = [t1]
    deadline = None if window_s is None else t1 + window_s
    cur = t1
    for s in STEPS[1:]:
        nxt = next((t for t in per[s]
                    if (t > cur if strict else t >= cur)
                    and (deadline is None or t <= deadline)), None)
        if nxt is None:
            break
        times.append(nxt)
        cur = nxt
    return times


def _ref_funnel_rescan(events, window_s=None, strict=True):
    """Max depth over ALL step-1 anchors (earliest anchor wins ties)."""
    per = {s: sorted(t for t, e in events if e == s) for s in STEPS}
    best = None
    for a in per[STEPS[0]]:
        times = [a]
        deadline = None if window_s is None else a + window_s
        cur = a
        for s in STEPS[1:]:
            nxt = next((t for t in per[s]
                        if (t > cur if strict else t >= cur)
                        and (deadline is None or t <= deadline)), None)
            if nxt is None:
                break
            times.append(nxt)
            cur = nxt
        if best is None or len(times) > len(best):
            best = times
        if len(best) == len(STEPS):
            break
    return best


def test_funnel_random_sweep(spark):
    rng = random.Random(42)
    users = {}
    rows = []
    for u in range(300):
        n = rng.randint(1, 12)
        evs = []
        for _ in range(n):
            sec = rng.randint(0, 50)  # small range -> plenty of ties
            e = rng.choice(STEPS + ["noise"])
            evs.append((sec, e))
        users[u] = evs
        rows += [(u, _t(sec), e) for sec, e in evs]
    df = spark.createDataFrame(rows,
                               "user_id long, ts timestamp, event_type string")

    for window_s, strict in [(None, True), (None, False),
                             (20, True), (7, False)]:
        got = {r["user"]: r
               for r in funnel_match(df, STEPS, window_seconds=window_s,
                                     strict=strict).collect()}
        for u, evs in users.items():
            want = _ref_funnel(evs, window_s, strict)
            if want is None:
                assert u not in got, (u, window_s, strict)
                continue
            r = got[u]
            assert r["max_step"] == len(want), (u, evs, window_s, strict)
            for i, t in enumerate(want):
                assert r[f"t_{i + 1}"] == _t_us(t), (u, evs, i)
            for i in range(len(want), len(STEPS)):
                assert r[f"t_{i + 1}"] is None

    # rescan twin vs its own reference (windowed, where it differs)
    got = {r["user"]: r
           for r in funnel_match_pandas(df, STEPS,
                                        window_seconds=15).collect()}
    for u, evs in users.items():
        want = _ref_funnel_rescan(evs, 15)
        if want is None:
            assert u not in got
            continue
        r = got[u]
        assert r["max_step"] == len(want), (u, evs)
        for i, t in enumerate(want):
            assert r[f"t_{i + 1}"] == _t_us(t), (u, evs, i)


def test_gapfill_random_sweep(spark):
    rng = random.Random(7)
    STEP = 60  # 1-minute grid
    cases = {}
    rows = []
    for g in range(200):
        n = rng.randint(1, 10)
        buckets = sorted(rng.sample(range(0, 40), n))
        vals = [round(rng.uniform(-5, 5), 3) for _ in buckets]
        cases[str(g)] = list(zip(buckets, vals))
        rows += [(str(g), _t(b * STEP), v) for b, v in zip(buckets, vals)]
    df = spark.createDataFrame(rows, "g string, bucket timestamp, v double")

    for how in ["locf", "zero", "linear"]:
        got = {}
        out = gapfill(df, "bucket", ["g"], ["v"], STEP, how=how)
        for r in out.collect():
            got.setdefault(r["g"], {})[r["bucket"]] = (r["v"], r["is_filled"])
        for g, obs in cases.items():
            bmap = dict(obs)
            lo, hi = obs[0][0], obs[-1][0]
            want = {}
            for b in range(lo, hi + 1):
                if b in bmap:
                    want[_t(b * STEP)] = (bmap[b], False)
                else:
                    prev = max(x for x in bmap if x < b)
                    if how == "locf":
                        v = bmap[prev]
                    elif how == "zero":
                        v = 0.0
                    else:
                        nxt = min(x for x in bmap if x > b)
                        frac = (b - prev) / (nxt - prev)
                        v = bmap[prev] + (bmap[nxt] - bmap[prev]) * frac
                    want[_t(b * STEP)] = (v, True)
            assert got[g] == want, (g, how)


def test_retention_random_sweep(spark):
    rng = random.Random(99)
    DAY = 86400
    users = {u: sorted(rng.sample(range(0, 30), rng.randint(1, 8)))
             for u in range(250)}
    rows = [(u, _t(d * DAY + rng.randint(0, DAY - 1)))
            for u, days in users.items() for d in days]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    want = {}
    cohort_of = {u: days[0] for u, days in users.items()}
    for u, days in users.items():
        c = cohort_of[u]
        for d in set(days):
            key = (_t(c * DAY), d - c)
            want[key] = want.get(key, 0) + 1

    got = {(r["cohort"], r["offset"]): (r["n_users"], r["retention"])
           for r in cohort_retention(df, bucket_seconds=DAY).collect()}
    assert set(got) == set(want)
    for key, n in want.items():
        size = want[(key[0], 0)]
        assert got[key] == (n, n / size), key
