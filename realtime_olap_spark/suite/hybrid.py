"""Hybrid-table and rollup-routing suite — batch-checkable slices of the
streaming architecture (SURVEY.md §2.10 / M6 / M7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.rollup import RollupRouter, RollupSpec, build_rollup
from realtime_olap_spark.streaming import hybrid_table
from realtime_olap_spark.suite.registry import query
from realtime_olap_spark.suite.sqlgen import OAVG, OSUM

# The hybrid boundary for the events fixture: split the 30-day window so the
# "offline" part is days 1-20 and "realtime" is the tail (FIXTURES.md).
_BOUNDARY = "2024-01-21 00:00:00"


@query("hybrid_time_boundary", f"""
SELECT event_type, COUNT(*) AS cnt, {OSUM('value')} AS total
FROM events
GROUP BY event_type
ORDER BY event_type
""")
def hybrid_time_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid table = offline(≤ boundary) ∪ realtime(> boundary)
    (BaseBrokerRequestHandler.java:376-420). Splitting one table at the
    boundary and re-unioning must read every row exactly once — the oracle
    is the plain full-table aggregate."""
    ev = Catalog(spark, sf_dir).table("events")
    boundary = F.lit(_BOUNDARY).cast("timestamp")
    offline = ev.where(F.col("ts") <= boundary)   # segment store
    realtime = ev                                  # consuming segments
    hybrid = hybrid_table(offline, realtime, "ts",
                          boundary=_BOUNDARY)
    return (hybrid.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum(F.col("value").cast("decimal(38,10)")).cast("double").alias("total"))
            .orderBy("event_type"))


@query("rollup_routed_agg", f"""
SELECT l_suppkey,
       COUNT(*) AS cnt,
       {OSUM('l_quantity')} AS sum_qty,
       {OAVG('l_quantity')} AS avg_qty,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem
WHERE l_returnflag = 'R'
GROUP BY l_suppkey
ORDER BY sum_qty DESC, l_suppkey ASC
LIMIT 10
""")
def rollup_routed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-tree analog end-to-end: build the rollup, route an eligible
    query (every pre-aggregated function kind AND a dimension filter —
    StarTreeFilterOperator.java:55-88 traverses predicate dims; here the
    filter lands on the rollup scan) + reference TOP-10 ordering. The
    result must equal the raw aggregation — the reference's star-tree vs
    non-star-tree differential (StarTreeClusterIntegrationTest.java)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    spec = RollupSpec(dims=("l_returnflag", "l_linestatus", "l_suppkey"),
                      sum_cols=("l_quantity",),
                      min_cols=("l_extendedprice",),
                      max_cols=("l_extendedprice",))
    router = RollupRouter(li, build_rollup(li, spec), spec)
    out = router.query(
        ["l_suppkey"],
        [("count", None, "cnt"), ("sum", "l_quantity", "sum_qty"),
         ("avg", "l_quantity", "avg_qty"),
         ("min", "l_extendedprice", "min_price"),
         ("max", "l_extendedprice", "max_price")],
        where=F.col("l_returnflag") == "R",
        filter_dims=["l_returnflag"])
    return out.orderBy(F.col("sum_qty").desc(), F.col("l_suppkey").asc()).limit(10)


@query("rollup_fasthll")  # sketch estimates — no SQL oracle (rows-only)
def rollup_fasthll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-backed rollup pairs (AggregationFunctionColumnPair.java:25-58)
    end-to-end: the rollup stores a mergeable DataSketches HLL AND a KLL
    quantile sketch per group; the routed query merges partials
    (hll_union_agg / kll_merge_agg) instead of rescanning raw rows — at
    100 TB distinct-counts and percentiles read the rollup only. HLL union
    is register-exact vs a single-pass sketch
    (tests/test_streaming.py::test_rollup_fasthll_matches_direct_sketch);
    the routed KLL percentile is rank-error-bounded vs the exact
    percentile (test_rollup_kll_percentile_routes_and_bounds)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    spec = RollupSpec(dims=("l_returnflag", "l_linestatus"),
                      hll_cols=("l_partkey",), kll_cols=("l_extendedprice",))
    router = RollupRouter(li, build_rollup(li, spec), spec)
    return (router.query(["l_returnflag"],
                         [("distinctcounthll", "l_partkey", "distinct_parts"),
                          ("percentiletdigest90", "l_extendedprice", "p90_price")])
            .orderBy("l_returnflag"))
