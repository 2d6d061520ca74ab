"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``realtime_olap_spark/``; this module only adapts it to
the driver's entry-point shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_olap_spark import suite  # noqa: E402


def _utc(spark: SparkSession) -> SparkSession:
    # timestamp-valued results are oracle-compared; pin the session TZ so
    # the driver's own SparkSession can't skew them (runtime-settable conf)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return suite.QUERIES["flagship_q1"](_utc(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        return lambda spark, sf_dir: fn(_utc(spark), sf_dir)

    return {name: wrap(fn) for name, fn in suite.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for non-SQL-expressible
    operators → rows-only check)."""
    return dict(suite.ORACLES)
