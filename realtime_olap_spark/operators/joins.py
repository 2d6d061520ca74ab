"""Time-series joins the reference engine lacks entirely (it has NO join
operator — README.md:27): as-of join and bounded range join, built as
compositions of existing DataFrame ops so Catalyst plans them, no UDFs.

Scale design (100 TB event streams):

- ``asof_join`` is the union + running-``last`` formulation: both inputs
  are unioned, shuffled ONCE on the join key, sorted by (time, side) within
  each key partition, and every left row picks up the most recent right row
  via ``last(..., ignorenulls=True)`` over an unbounded-preceding window.
  One Exchange total (plan-asserted) — no per-row probe, no range
  cross-product, no state; skewed keys fall to AQE. This is the standard
  scalable as-of shape (the sort is the same work a merge-based as-of does).

- ``range_join_bucketed`` bands time into ``window`` buckets: a right row
  lands in exactly ONE bucket, a left row probes its own and the two
  adjacent buckets, so |Δt| ≤ window pairs are found exactly once through a
  plain EQUI-join on (key, bucket) — never an inequality/cross join, which
  is what a naive ``ON a.ts BETWEEN …`` plan degenerates to. Join-key
  cardinality grows with the data, keeping shuffle partitions balanced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              values: Sequence[str] = ("value",),
              tolerance_us: int | None = None,
              suffix: str = "_asof",
              direction: str = "backward",
              deterministic_ties: bool = True) -> DataFrame:
    """For every left row, attach the nearest right row at-or-before it
    (``direction="backward"``, the market-data/telemetry standard:
    ``right_ts <= left_ts`` inclusive) or at-or-after it
    (``direction="forward"``: ``right_ts >= left_ts`` — 'next event'
    lookups) within the same ``on`` key. Forward is the exact mirror:
    same single shuffle, window ordered descending with ``first`` looking
    ahead instead of ``last`` looking back.

    Output = all left columns + ``asof_ts`` (matched right timestamp, NULL
    when no match) + one ``<v><suffix>`` per requested right value column.
    ``tolerance_us`` voids matches older than the tolerance (they become
    NULLs, like a stale quote). The matched (ts, values) travel as ONE
    struct through the window so a right row whose value is genuinely NULL
    is still the match — ``last(ignorenulls)`` never reaches past it.

    Right rows should be unique per (key, right_ts); with duplicates the
    winner among the tied timestamps is DETERMINISTIC by default
    (``deterministic_ties=True``): the max of the ``(right_ts, *values)``
    struct under Spark's lexicographic struct ordering (the tied-``__r``
    rows are part of the window's sort key, so two runs — and the banded
    last-touch twin, which reduces with ``max(struct(t, value))`` —
    always agree). SQL ASOF leaves the tie unspecified, so differential
    tests against it must use tie-free inputs or compare only the
    timestamp.

    Deterministic tie-breaking requires every value column to be of an
    ORDERABLE type — a map-typed value column raises a clear error at
    plan-build time (not a mid-job analysis failure). Pass
    ``deterministic_ties=False`` to carry unorderable value columns:
    ``__r`` then leaves the sort key, and the winner among tied right
    timestamps is whichever the sort happens to place last (matching
    SQL ASOF's unspecified-tie contract). Tie-free inputs are identical
    under both settings.
    """
    on = list(on)
    if deterministic_ties:
        unorderable = [v for v in values
                       if isinstance(right.schema[v].dataType, T.MapType)]
        if unorderable:
            raise ValueError(
                f"deterministic_ties=True needs orderable value columns; "
                f"map-typed {unorderable} cannot enter the tie-break sort "
                f"key — pass deterministic_ties=False to accept an "
                f"unspecified winner among tied right timestamps")
    payload = [c for c in left.columns]
    rstruct = T.StructType(
        [T.StructField("rt", right.schema[right_ts].dataType)]
        + [T.StructField(v, right.schema[v].dataType) for v in values])

    lu = left.select(
        *payload,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_l"),
        F.lit(None).cast(rstruct).alias("__r"))
    ru = right.select(
        *on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in payload if c not in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_l"),
        F.struct(F.col(right_ts).alias("rt"),
                 *[F.col(v) for v in values]).alias("__r"))
    cols = [*payload, "__t", "__is_l", "__r"]
    u = lu.select(*cols).unionByName(ru.select(*cols))

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    # right rows (side 0) sort before left rows at equal time → inclusive;
    # forward mirrors the sort so 'before' in window order means 'at or
    # after' in time
    t_ord = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    # __r asc_nulls_last: right rows tied on (key, __t) sort by their
    # (rt, *values) struct, so last() deterministically picks the max —
    # and left rows (__r IS NULL) still sort AFTER the right rows they
    # must see (inclusive match); __is_l then orders the left rows only.
    # Without deterministic_ties, __r leaves the sort key (unorderable
    # value types allowed) and __is_l alone keeps the inclusive-match
    # ordering: right rows (0) before left rows (1) at equal time.
    tie_keys = ([F.col("__r").asc_nulls_last()] if deterministic_ties
                else [])
    w = (Window.partitionBy(*on)
         .orderBy(t_ord, *tie_keys, F.col("__is_l").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    m = F.last("__r", ignorenulls=True).over(w)
    if tolerance_us is not None:
        gap = F.unix_micros(F.col("__t")) - F.unix_micros(m["rt"])
        fresh = ((gap if direction == "backward" else -gap)
                 <= F.lit(tolerance_us))
        m = F.when(fresh, m)  # stale match → NULL struct → NULL fields
    return (u.withColumn("__m", m)
            .where(F.col("__is_l") == 1)
            .select(*payload, F.col("__m")["rt"].alias("asof_ts"),
                    *[F.col("__m")[v].alias(f"{v}{suffix}") for v in values]))


def range_join_bucketed(left: DataFrame, right: DataFrame, on: Sequence[str],
                        left_ts: str = "ts", right_ts: str = "ts",
                        window_us: int = 60_000_000,
                        suffixes: tuple[str, str] = ("_l", "_r")) -> DataFrame:
    """All (left, right) pairs sharing the ``on`` key with
    ``|left_ts - right_ts| <= window_us`` — via banded equi-join.

    Each right row is assigned floor(ts / window) once; each left row
    probes buckets {b-1, b, b+1}. A qualifying pair's right bucket is
    always one of the three, and unique — every pair emitted exactly once,
    no post-dedup. The physical plan is a plain equi-join on
    (key…, bucket): shuffle-partitionable, broadcast-able, never a nested
    loop (plan-asserted in tests).
    """
    on = list(on)
    lb = F.floor(F.unix_micros(F.col(left_ts)) / F.lit(window_us))
    rb = F.floor(F.unix_micros(F.col(right_ts)) / F.lit(window_us))

    lcols = [F.col(c) for c in on] + \
        [F.col(c).alias(f"{c}{suffixes[0]}")
         for c in left.columns if c not in on]
    rcols = [F.col(c) for c in on] + \
        [F.col(c).alias(f"{c}{suffixes[1]}")
         for c in right.columns if c not in on]
    l = left.select(*lcols, F.explode(F.array(lb - 1, lb, lb + 1))
                    .alias("__bucket"))
    r = right.select(*rcols, rb.alias("__bucket"))

    lt = F.unix_micros(F.col(f"{left_ts}{suffixes[0]}"))
    rt = F.unix_micros(F.col(f"{right_ts}{suffixes[1]}"))
    return (l.join(r, [*on, "__bucket"])
            .where(F.abs(lt - rt) <= F.lit(window_us))
            .drop("__bucket"))
