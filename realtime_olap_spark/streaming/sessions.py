"""Stateful streaming sessionization — the custom stateful operator seam.

``applyInPandasWithState`` is Spark's arbitrary-per-key-state hook
(the Structured Streaming analog of the reference's "implement your
function inside the engine" extension point, SURVEY.md §2.11): per user we
keep ONE open session in state, close sessions as gaps are observed in the
data, and let the EVENT-TIME TIMEOUT close idle sessions once the watermark
passes ``session_end + gap`` — so results are deterministic under
out-of-order arrival within the watermark delay.

Semantics match the batch ``operators.sessions.sessionize`` exactly for
every session the stream has closed (equality-tested stream-vs-batch in
``tests/test_streaming.py``); sessions still open when the stream pauses
remain in state, emitted when their timeout fires.

Scale design: state per key is one fixed-width row (4 longs) — millions of
concurrent users fit trivially in the state store; each micro-batch touches
only keys with new data or expiring timeouts (never a full-state scan), and
Arrow batches per key group keep the Python hop vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampType)

from realtime_olap_spark.operators.sessions import SESSION_SCHEMA

# (next session_id, open session start/end micros, events in open session)
STATE_SCHEMA = StructType([
    StructField("sid", LongType()),
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n_events", LongType()),
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
    gap. Emits one row per CLOSED session (append mode): closed either by a
    later event from the same user (gap exceeded) or by the event-time
    timeout when the watermark passes ``end + gap``."""
    gap_us = gap_minutes * 60_000_000

    def fn(key, pdfs, state):
        user = key[0]
        out: list[dict] = []
        if state.hasTimedOut:
            sid, s_us, e_us, n = state.get
            out.append(_session_row(user, sid, s_us, e_us, n))
            state.remove()
        else:
            chunks = [pdf for pdf in pdfs if len(pdf)]
            ts = (np.sort(np.concatenate(
                [c[ts_col].astype("int64").to_numpy() for c in chunks]))
                // 1000) if chunks else np.array([], dtype=np.int64)
            if len(ts):
                if state.exists:
                    sid, s_us, e_us, n = state.get
                else:
                    sid, s_us, e_us, n = 1, int(ts[0]), int(ts[0]), 0
                # vectorized gap scan within the batch; the state head is the
                # only scalar merge
                brk = np.nonzero(np.diff(ts) > gap_us)[0]
                bounds = np.concatenate(([0], brk + 1, [len(ts)]))
                for i in range(len(bounds) - 1):
                    lo, hi = int(bounds[i]), int(bounds[i + 1])
                    first, last = int(ts[lo]), int(ts[hi - 1])
                    if n > 0 and first - e_us > gap_us:
                        out.append(_session_row(user, sid, s_us, e_us, n))
                        sid, s_us, e_us, n = sid + 1, first, first, 0
                    if n == 0:
                        s_us = first
                    if i < len(bounds) - 2:  # this run closes within batch
                        out.append(_session_row(user, sid, s_us, last,
                                                n + hi - lo))
                        sid, s_us, e_us, n = sid + 1, 0, 0, 0
                    else:
                        e_us, n = last, n + hi - lo
                state.update((sid, s_us, e_us, n))
                # event-time timeout must sit above the current watermark
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max((e_us + gap_us) // 1000,
                                              wm_ms + 1))
        yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA])

    return (events.withWatermark(ts_col, watermark)
            .groupBy(user_col)
            .applyInPandasWithState(fn, SESSION_SCHEMA, STATE_SCHEMA,
                                    "append", "EventTimeTimeout"))
