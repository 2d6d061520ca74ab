"""top_n_with_others: hand case, DuckDB differential with an
INDEPENDENT rank-based construction, no-remainder omission, and the
TakeOrderedAndProject / no-global-window plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_olap_spark.operators.groupby import top_n_with_others
from tests.conftest import SF_DIR, assert_matches_oracle


def _agg(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return (ev.groupBy(F.col("event_type").alias("k"))
            .agg(F.count(F.lit(1)).alias("n")))


def test_hand(spark):
    df = spark.createDataFrame(
        [("a", 100), ("b", 50), ("c", 30), ("d", 20), ("e", 10)],
        "k string, n long")
    got = {r["k"]: r["n"]
           for r in top_n_with_others(df, ["k"], ["n"], 2).collect()}
    assert got == {"a": 100, "b": 50, "OTHERS": 60}


def test_no_remainder_no_others_row(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, n long")
    got = {r["k"] for r in top_n_with_others(df, ["k"], ["n"], 5).collect()}
    assert got == {"a", "b"}


def test_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [("b", 10), ("a", 10), ("c", 10)], "k string, n long")
    got = {r["k"] for r in top_n_with_others(df, ["k"], ["n"], 2).collect()}
    assert got == {"a", "b", "OTHERS"}  # key asc breaks the tie


def test_matches_duckdb(spark, duck):
    con = duck(SF_DIR)
    out = top_n_with_others(_agg(spark), ["k"], ["n"], 2)
    # independent construction: rank every group, sum the tail directly
    oracle = """
WITH a AS (SELECT event_type AS k, COUNT(*) AS n FROM events GROUP BY 1),
r AS (SELECT *, row_number() OVER (ORDER BY n DESC, k ASC) AS rk FROM a)
SELECT k, n FROM r WHERE rk <= 2
UNION ALL
SELECT 'OTHERS' AS k, SUM(n) AS n FROM r WHERE rk > 2 HAVING COUNT(*) > 0
"""
    assert_matches_oracle(out, con, oracle, "topn_others")


def test_plan_no_global_window(spark):
    plan = (top_n_with_others(_agg(spark), ["k"], ["n"], 2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
