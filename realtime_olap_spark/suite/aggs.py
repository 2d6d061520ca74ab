"""Aggregation suite: the §2.4 function inventory + §2.5 group-by semantics.

Each aggregation function of the reference's closed registry
(pinot-core/.../query/aggregation/function/AggregationFunctionFactory.java:29)
gets exercised scalar and grouped; TOP-N and HAVING reproduce the broker
reduce semantics (BrokerReduceService.java:383-506). Approximate sketches
(HLL, quantile digests) have no SQL oracle → rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators import filters as P
from realtime_olap_spark.operators.groupby import Agg, Key, group_by_agg, having, top_n
from realtime_olap_spark.suite.registry import query
from realtime_olap_spark.suite.sqlgen import OAVG, OSUM


@query("agg_scalar_all", f"""
SELECT COUNT(*) AS cnt,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       {OSUM('l_extendedprice')} AS sum_price,
       {OAVG('l_extendedprice')} AS avg_price,
       MAX(l_extendedprice) - MIN(l_extendedprice) AS range_price
FROM lineitem WHERE l_linestatus = 'F'
""")
def agg_scalar_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/MIN/MAX/SUM/AVG/MINMAXRANGE in one pass — the reference runs all
    requested functions over each block in one AggregationOperator
    (CountAggregationFunction.java:30 … MinMaxRangeAggregationFunction.java:33)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return group_by_agg(
        li, keys=[],
        aggs=[
            Agg("count", None, "cnt"),
            Agg("min", "l_extendedprice", "min_price"),
            Agg("max", "l_extendedprice", "max_price"),
            Agg("sum", "l_extendedprice", "sum_price"),
            Agg("avg", "l_extendedprice", "avg_price"),
            Agg("minmaxrange", "l_extendedprice", "range_price"),
        ],
        where=P.eq("l_linestatus", "F"),
    )


@query("agg_metadata_count", "SELECT COUNT(*) AS cnt FROM lineitem")
def agg_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unfiltered COUNT(*) — the reference answers from segment metadata
    (MetadataBasedAggregationOperator.java:37); Spark answers from Parquet
    footer row counts via aggregate pushdown (spark.sql.parquet.aggregatePushdown)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return li.agg(F.count(F.lit(1)).alias("cnt"))


@query("agg_dictionary_minmax", """
SELECT MIN(p_retailprice) AS min_rp, MAX(p_retailprice) AS max_rp,
       MAX(p_retailprice) - MIN(p_retailprice) AS range_rp
FROM part
""")
def agg_dictionary_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unfiltered MIN/MAX — dictionary fast path in the reference
    (DictionaryBasedAggregationOperator.java:47); Parquet column stats here."""
    p = Catalog(spark, sf_dir).table("part")
    return group_by_agg(p, keys=[], aggs=[
        Agg("min", "p_retailprice", "min_rp"),
        Agg("max", "p_retailprice", "max_rp"),
        Agg("minmaxrange", "p_retailprice", "range_rp"),
    ])


@query("agg_distinctcount", """
SELECT COUNT(DISTINCT l_partkey) AS dc_part,
       COUNT(DISTINCT l_suppkey) AS dc_supp,
       COUNT(DISTINCT l_returnflag) AS dc_flag
FROM lineitem
""")
def agg_distinctcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCTCOUNT (exact — the reference's IntOpenHashSet of value hashes,
    DistinctCountAggregationFunction.java:32, tolerates collisions; we don't)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return group_by_agg(li, keys=[], aggs=[
        Agg("distinctcount", "l_partkey", "dc_part"),
        Agg("distinctcount", "l_suppkey", "dc_supp"),
        Agg("distinctcount", "l_returnflag", "dc_flag"),
    ])


@query("agg_distinctcounthll")  # sketch estimate — no SQL oracle (rows-only)
def agg_distinctcounthll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCTCOUNTHLL / FASTHLL (DistinctCountHLLAggregationFunction.java:34)
    — HyperLogLog estimate; deterministic for a given input but not
    SQL-oracle-comparable across engines."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return group_by_agg(li, keys=[], aggs=[
        Agg("distinctcounthll", "l_partkey", "hll_part"),
        Agg("fasthll", "l_orderkey", "hll_order"),
    ])


@query("agg_percentiles", """
SELECT quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.50) AS p50,
       quantile_cont(l_extendedprice, 0.90) AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99
FROM lineitem WHERE l_returnflag = 'A'
""")
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PERCENTILE<N> (PercentileAggregationFunction.java:32 collects all
    values per group; Spark's `percentile` computes the identical interpolated
    result distributed — verified bit-exact vs quantile_cont)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return group_by_agg(li, keys=[], aggs=[
        Agg("percentile25", "l_extendedprice", "p25"),
        Agg("percentile50", "l_extendedprice", "p50"),
        Agg("percentile90", "l_extendedprice", "p90"),
        Agg("percentile99", "l_extendedprice", "p99"),
    ], where=P.eq("l_returnflag", "A"))


@query("agg_percentile_est")  # quantile sketch — no SQL oracle (rows-only)
def agg_percentile_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILEEST<N> / PERCENTILETDIGEST<N> — mergeable quantile sketches
    (PercentileEstAggregationFunction.java:33, …TDigest….java:37); Spark's
    approx_percentile is the engine-native equivalent."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return group_by_agg(li, keys=[], aggs=[
        Agg("percentileest50", "l_extendedprice", "est_p50"),
        Agg("percentiletdigest90", "l_extendedprice", "td_p90"),
    ])


@query("agg_groupby_expr", f"""
SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_bucket,
       COUNT(*) AS cnt,
       {OSUM('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
GROUP BY ship_year, qty_bucket
""")
def agg_groupby_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY on transform expressions (request.thrift:107-111,
    docs/pql_examples.rst:158-161): time-derived and arithmetic keys."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return group_by_agg(
        li,
        keys=[Key(F.year("l_shipdate"), "ship_year"),
              Key(F.floor(F.col("l_quantity") / 10), "qty_bucket")],
        aggs=[Agg("count", None, "cnt"),
              Agg("sum", F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")],
    )


@query("agg_groupby_topn", f"""
SELECT l_suppkey, {OSUM('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY l_suppkey
ORDER BY sum_qty DESC, l_suppkey ASC
LIMIT 10
""")
def agg_groupby_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference TOP-N: top groups per aggregation ordered by that aggregate
    desc, default 10 (docs/pql_examples.rst:169-172;
    AggregationGroupByTrimmingService.java:44) — computed exactly, with key
    tie-break; plans as TakeOrderedAndProject."""
    li = Catalog(spark, sf_dir).table("lineitem")
    g = group_by_agg(li, keys=[Key("l_suppkey", "l_suppkey")],
                     aggs=[Agg("sum", "l_quantity", "sum_qty")])
    return top_n(g, "sum_qty", 10, key_names=["l_suppkey"])


@query("agg_having", f"""
SELECT o_custkey, COUNT(*) AS n_orders, {OSUM('o_totalprice')} AS total
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 8 AND {OSUM('o_totalprice')} > 800000
""")
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over final aggregates (BrokerReduceService.java:426-460,
    HavingClauseComparisonTree.java:32). Exact aggregation makes the
    reference's close-policy intersection a no-op (SURVEY.md §7 risk 4)."""
    o = Catalog(spark, sf_dir).table("orders")
    g = group_by_agg(o, keys=[Key("o_custkey", "o_custkey")],
                     aggs=[Agg("count", None, "n_orders"),
                           Agg("sum", "o_totalprice", "total")])
    return having(g, (F.col("n_orders") >= 8) & (F.col("total") > 800000))


@query("agg_groupby_multicol", f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS cnt, {OAVG('o_totalprice')} AS avg_price,
       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY o_orderstatus, o_orderpriority
""")
def agg_groupby_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column group-by with mixed aggregates + time filter — the
    composite dictionary-key path (DictionaryBasedGroupKeyGenerator.java:63)."""
    o = Catalog(spark, sf_dir).table("orders")
    return group_by_agg(
        o,
        keys=[Key("o_orderstatus", "o_orderstatus"),
              Key("o_orderpriority", "o_orderpriority")],
        aggs=[Agg("count", None, "cnt"),
              Agg("avg", "o_totalprice", "avg_price"),
              Agg("min", "o_totalprice", "min_price"),
              Agg("max", "o_totalprice", "max_price")],
        where=P.range_("o_orderdate", low=F.lit("1996-01-01").cast("timestamp")),
    )


@query("agg_groupby_percentile", """
SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS p50
FROM lineitem GROUP BY l_returnflag
""")
def agg_groupby_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact percentile — per-group value collection in the reference,
    distributed sort-based percentile in Spark."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return group_by_agg(li, keys=[Key("l_returnflag", "l_returnflag")],
                        aggs=[Agg("percentile50", "l_extendedprice", "p50")])


@query("agg_percentile_tdigest")  # quantile sketch — rows-only check
def agg_percentile_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILETDIGEST<N> (PercentileTDigestAggregationFunction.java:37):
    mergeable quantile sketch → approx_percentile is the engine-native
    mergeable equivalent (same role as PERCENTILEEST; kept as a distinct
    entry for §2.4 parity bookkeeping)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return li.agg(
        F.percentile_approx(F.col("l_extendedprice").cast("double"),
                            F.lit(0.5), F.lit(1000)).alias("p50_tdigest"),
        F.percentile_approx(F.col("l_extendedprice").cast("double"),
                            F.lit(0.95), F.lit(1000)).alias("p95_tdigest"))
