"""Stateful streaming sessionization — the custom stateful operator seam.

``applyInPandasWithState`` is Spark's arbitrary-per-key-state hook
(the Structured Streaming analog of the reference's "implement your
function inside the engine" extension point, SURVEY.md §2.11). Per user we
keep the full set of NOT-YET-FINAL sessions in state as (start, end,
n_events) summaries and emit a session only once the event-time watermark
strictly passes ``session_end + gap`` — before that point a late event
(still within the watermark delay) may extend it, merge it with a
neighbor, or open an earlier session, and append-mode streams cannot
retract. Late events are folded into the pending summaries by a
sorted-merge (two pending sessions bridged by a late event collapse into
one, counts added), so results are deterministic under ANY arrival order
within the watermark delay — the property the r2 eager-emit version
claimed but only held for in-order batches.

Semantics match the batch ``operators.sessions.sessionize`` exactly for
every emitted session (equality-tested stream-vs-batch, including an
out-of-order late-arrival schedule, in ``tests/test_streaming.py``);
sessions still open when the stream pauses remain in state and are
emitted when their event-time timeout fires.

Scale design: state per key is one small row (a long + three parallel
long-arrays whose length is bounded by watermark_delay/gap + 1, NOT by
event count) — millions of concurrent users fit trivially in the state
store; each micro-batch touches only keys with new data or expiring
timeouts (never a full-state scan), and Arrow batches per key group keep
the Python hop vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from realtime_olap_spark.operators.sessions import SESSION_SCHEMA

# (next session_id to emit, pending sessions as parallel arrays sorted by
# start: start/end micros and event counts)
STATE_SCHEMA = StructType([
    StructField("sid", LongType()),
    StructField("s_us", ArrayType(LongType())),
    StructField("e_us", ArrayType(LongType())),
    StructField("n_ev", ArrayType(LongType())),
])


def _session_row(user: int, sid: int, s_us: int, e_us: int, n: int) -> dict:
    return {"user_id": user, "session_id": sid,
            "session_start": pd.Timestamp(s_us, unit="us"),
            "session_end": pd.Timestamp(e_us, unit="us"),
            "n_events": n, "duration_us": e_us - s_us}


def sessionize_stream(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", gap_minutes: int = 30,
                      watermark: str = "1 minute") -> DataFrame:
    """Sessionize a stream of (user, event-time) rows with an inactivity
    gap. Emits one row per session (append mode), only once the watermark
    strictly passes ``session_end + gap`` — via the event-time timeout for
    idle keys, or inline when a data batch observes the watermark already
    past a pending session's horizon."""
    gap_us = gap_minutes * 60_000_000

    def _finalize(user, sid, sess, wm_us, out):
        """Emit the prefix of pending sessions no future event can touch.

        Sessions are sorted by start and pairwise separated by > gap, so
        end_i + gap < start_{i+1} <= end_{i+1}: maturity is monotone and
        emission order == start order == batch session_id order. A future
        event has ts >= watermark (Spark drops older rows), so a session
        is final exactly when end + gap < watermark (at end + gap == wm an
        event at ts == wm would still merge)."""
        keep = 0
        while keep < len(sess) and sess[keep][1] + gap_us < wm_us:
            s, e, n = sess[keep]
            out.append(_session_row(user, sid, s, e, n))
            sid += 1
            keep += 1
        return sid, sess[keep:]

    def fn(key, pdfs, state):
        user = key[0]
        out: list[dict] = []
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.hasTimedOut:
            sid, s_arr, e_arr, n_arr = state.get
            sess = list(zip(s_arr, e_arr, n_arr))
            sid, sess = _finalize(user, sid, sess, wm_us, out)
            if sess:
                state.update((sid, [s[0] for s in sess], [s[1] for s in sess],
                              [s[2] for s in sess]))
                state.setTimeoutTimestamp(
                    max((sess[0][1] + gap_us) // 1000 + 1,
                        state.getCurrentWatermarkMs() + 1))
            else:
                state.remove()
        else:
            chunks = [pdf for pdf in pdfs if len(pdf)]
            ts = (np.sort(np.concatenate(
                [c[ts_col].astype("int64").to_numpy() for c in chunks]))
                // 1000) if chunks else np.array([], dtype=np.int64)
            if len(ts):
                if state.exists:
                    sid, s_arr, e_arr, n_arr = state.get
                    pending = list(zip(s_arr, e_arr, n_arr))
                else:
                    sid, pending = 1, []
                # vectorized gap scan: the batch collapses to runs
                brk = np.nonzero(np.diff(ts) > gap_us)[0]
                bounds = np.concatenate(([0], brk + 1, [len(ts)]))
                runs = [(int(ts[int(bounds[i])]), int(ts[int(bounds[i + 1]) - 1]),
                         int(bounds[i + 1] - bounds[i]))
                        for i in range(len(bounds) - 1)]
                # sorted-merge pending sessions with the new runs; a late
                # run bridging two pending sessions collapses them into one
                sess: list[tuple[int, int, int]] = []
                for s, e, n in sorted(pending + runs):
                    if sess and s - sess[-1][1] <= gap_us:
                        ps, pe, pn = sess[-1]
                        sess[-1] = (ps, max(pe, e), pn + n)
                    else:
                        sess.append((s, e, n))
                sid, sess = _finalize(user, sid, sess, wm_us, out)
                if sess:
                    state.update((sid, [s[0] for s in sess],
                                  [s[1] for s in sess], [s[2] for s in sess]))
                    state.setTimeoutTimestamp(
                        max((sess[0][1] + gap_us) // 1000 + 1,
                            state.getCurrentWatermarkMs() + 1))
                elif state.exists:
                    state.remove()
        yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA])

    return (events.withWatermark(ts_col, watermark)
            .groupBy(user_col)
            .applyInPandasWithState(fn, SESSION_SCHEMA, STATE_SCHEMA,
                                    "append", "EventTimeTimeout"))
