"""Error-bound tests for the rows-only sketch queries: the driver can't
value-hash an estimate against DuckDB (different sketch algorithms), but
every estimate still has a testable contract — HLL within its published
relative error of the exact distinct count, quantile sketches within rank
tolerance of the exact quantile, entropy deterministic and in-range.
(rollup_fasthll's bounds live in tests/test_streaming.py.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_olap_spark import suite
from realtime_olap_spark.catalog import Catalog
from tests.conftest import SF_DIR


def _rank_window(vals: list[float], q: float, tol: float) -> tuple[float, float]:
    """Exact values at ranks q−tol and q+tol — the window a rank-error-
    bounded quantile estimate must land in."""
    s = sorted(vals)
    lo = s[max(0, int((q - tol) * (len(s) - 1)))]
    hi = s[min(len(s) - 1, int(round((q + tol) * (len(s) - 1))) + 1 - 1)]
    return lo, hi


def test_agg_approx_sketches_bounds(spark):
    row = suite.QUERIES["agg_approx_sketches"](spark, SF_DIR).first()
    li = Catalog(spark, SF_DIR).table("lineitem")
    exact = li.agg(
        F.count_distinct("l_partkey").alias("dp"),
        F.count_distinct("l_orderkey").alias("do")).first()
    # Spark approx_count_distinct default rsd = 5%; allow 3 sigma
    assert abs(row["hll_part"] - exact["dp"]) <= 0.15 * exact["dp"]
    assert abs(row["hll_order"] - exact["do"]) <= 0.15 * exact["do"]

    prices = [r[0] for r in li.select("l_extendedprice").collect()]
    for col, q in (("est_p50", 0.50), ("est_p90", 0.90),
                   ("td_p50", 0.50), ("td_p95", 0.95)):
        lo, hi = _rank_window(prices, q, 0.02)
        assert lo <= row[col] <= hi, (col, row[col], lo, hi)


def test_mv_approx_aggs_bounds(spark):
    row = suite.QUERIES["mv_approx_aggs"](spark, SF_DIR).first()
    c = Catalog(spark, SF_DIR)
    exact_words = (c.table("part")
                   .select(F.explode(F.split("p_name", " ")).alias("w"))
                   .agg(F.count_distinct("w")).first()[0])
    assert abs(row["hll_words"] - exact_words) <= max(2, 0.15 * exact_words)

    elems = [float(r[0]) for r in
             c.table("embeddings")
             .select(F.explode("embedding")).collect()]
    for col, q in (("est_p50", 0.50), ("td_p90", 0.90)):
        lo, hi = _rank_window(elems, q, 0.02)
        assert lo <= row[col] <= hi, (col, row[col], lo, hi)


def test_mm_feature_entropy_contract(spark):
    a = suite.QUERIES["mm_feature_entropy"](spark, SF_DIR).collect()
    b = suite.QUERIES["mm_feature_entropy"](spark, SF_DIR).collect()
    assert [r["media_id"] for r in a] == [r["media_id"] for r in b]
    assert len(a) == 20
    assert all(0.0 <= r["byte_entropy"] <= 8.0 for r in a)
    ent = [r["byte_entropy"] for r in a]
    assert ent == sorted(ent, reverse=True)
