"""Driver-local DataFrames that execute JVM-side.

``spark.createDataFrame(list_of_tuples)`` ships the rows as a PICKLED
Python RDD: every subsequent action on the frame (or anything unioned
with it) routes through a Python-worker deserialization step — measured
~0.28 s of fixed cost PER ACTION on this box, regardless of row count
(guide §4: the boundary itself is the cost). Converting through a
pandas DataFrame with Arrow enabled instead yields a JVM-native local
relation: the same 10-row frame then costs ~0.03 s per action.

Every small driver-built table in a query path (sketch summaries,
union-find results, rule tables) should come through here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def local_frame(spark: SparkSession, rows: Sequence[tuple],
                columns: Sequence[str], schema: str) -> DataFrame:
    """Arrow-path local DataFrame: ``rows`` (tuples, positional against
    ``columns``/``schema``) land as a JVM local relation, not a pickled
    Python RDD. ``schema`` is the authoritative DDL string (pandas dtype
    inference on small/empty frames is not trusted)."""
    import pandas as pd  # noqa: PLC0415

    pdf = pd.DataFrame(list(rows), columns=list(columns))
    return spark.createDataFrame(pdf, schema=schema)
