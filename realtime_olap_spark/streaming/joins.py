"""Watermarked stream-stream joins — beyond-parity streaming surface.

The reference has NO stateful join of any kind (SURVEY.md §2.10 'no
stateful join'); Structured Streaming gives a principled one: both sides
declare event-time watermarks and the join carries a TIME-RANGE condition,
so the state store provably discards rows once the other side's watermark
passes their match window — bounded state at any input rate, the only
join shape that survives unbounded streams.

Semantics: inner join emits a pair as soon as both rows have arrived
(watermarks bound STATE, not correctness for inner joins), so a full
drain produces exactly the batch join's result — equality-tested against
``operators.joins.range_join_bucketed`` in ``tests/test_streaming.py``.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_range_join(left: DataFrame, right: DataFrame, on: Sequence[str],
                      left_ts: str = "ts", right_ts: str = "ts",
                      window_us: int = 60_000_000,
                      watermark: str = "1 minute",
                      suffixes: tuple[str, str] = ("_l", "_r")) -> DataFrame:
    """All (left, right) pairs sharing ``on`` with |Δt| ≤ ``window_us``,
    computed continuously over two streams. State per side is bounded by
    (watermark delay + window) of input — the range condition is what lets
    Spark expire it."""
    on = list(on)
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    conds = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in on]
    conds.append(rt >= lt - F.expr(f"INTERVAL {window_us} MICROSECOND"))
    conds.append(rt <= lt + F.expr(f"INTERVAL {window_us} MICROSECOND"))
    joined = lw.join(rw, reduce(lambda a, b: a & b, conds), "inner")
    out_cols = [F.col(f"l.{k}").alias(k) for k in on]
    out_cols += [F.col(f"l.{c}").alias(f"{c}{suffixes[0]}")
                 for c in left.columns if c not in on]
    out_cols += [F.col(f"r.{c}").alias(f"{c}{suffixes[1]}")
                 for c in right.columns if c not in on]
    return joined.select(*out_cols)
