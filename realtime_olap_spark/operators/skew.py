"""Skew mitigation: salted two-phase aggregation and salted replicate joins.

The reference never shuffles intra-query (hierarchical merge only —
SURVEY.md §4.4), so key skew cannot hurt it; on Spark a shuffled groupBy or
join keyed on a hot value (one giant user, one dominant event_type) puts an
entire 100 TB key in one task. First line of defense is AQE
(`spark.sql.adaptive.skewJoin.enabled`, on in session.py) which splits
skewed SHUFFLE JOIN partitions at runtime; these helpers cover what AQE
does not: skewed AGGREGATIONS, and joins where the strategy must be pinned.

Both are deterministic (salt = hash of the whole row, not rand()) so
results are reproducible and differentially testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_olap_spark.operators.aggregation import DEC

_SALT = "__salt"


def _salt_col(df: DataFrame, n: int) -> Column:
    # deterministic spread: hash every column so identical rows of a hot
    # key still fan out across salts (xxhash64 is cheap, JVM-side)
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n))


def salted_groupby_agg(df: DataFrame, keys: list[str],
                       aggs: list[tuple[str, str | None, str]],
                       num_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(keys + salt) shrinks each
    hot key into ``num_salts`` partial rows, then groupBy(keys) merges the
    partials. Supported fns (algebraic → exact under re-merge): count, sum,
    min, max, avg. SUM/AVG accumulate in DECIMAL(38,10) so the two-phase
    result is bit-identical to the one-phase plan.

    Note Spark's partial aggregation already handles *map-side* combining;
    salting additionally bounds the size of every REDUCE task, which is
    what matters when one key dominates the corpus.
    """
    partials: list[Column] = []
    finals: list[Column] = []
    for i, (fn, col, alias) in enumerate(aggs):
        fn = fn.lower()
        p = f"__p{i}"
        if fn == "count":
            partials.append(F.count(F.lit(1)).alias(p))
            finals.append(F.sum(p).cast("long").alias(alias))
        elif fn == "sum":
            partials.append(F.sum(F.col(col).cast(DEC)).alias(p))
            finals.append(F.sum(p).cast("double").alias(alias))
        elif fn == "min":
            partials.append(F.min(col).alias(p))
            finals.append(F.min(p).alias(alias))
        elif fn == "max":
            partials.append(F.max(col).alias(p))
            finals.append(F.max(p).alias(alias))
        elif fn == "avg":
            partials.append(F.sum(F.col(col).cast(DEC)).alias(p))
            partials.append(F.count(col).alias(p + "c"))
            finals.append((F.sum(p).cast("double") / F.sum(p + "c")).alias(alias))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    phase1 = (df.withColumn(_SALT, _salt_col(df, num_salts))
                .groupBy(*keys, _SALT).agg(*partials))
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(skewed: DataFrame, small: DataFrame, on: str,
                num_salts: int = 16, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: the skewed (big) side gets a deterministic salt,
    the small side is replicated ``num_salts``× via an exploded literal
    range, and the join keys on (key, salt) — a hot key's rows spread over
    ``num_salts`` tasks instead of one. Use when AQE's runtime splitting is
    unavailable (non-shuffle joins, pinned strategies); replication costs
    num_salts × |small|, so keep the small side genuinely small."""
    s = skewed.withColumn(_SALT, _salt_col(skewed, num_salts))
    r = (small.withColumn(_SALT, F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(num_salts - 1).cast("long")))))
    return s.join(r, on=[on, _SALT], how=how).drop(_SALT)
