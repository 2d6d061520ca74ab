"""Core suite: flagship aggregation, selection queries, filter predicates.

Every query here exercises the reference surface of SURVEY.md §2.2/§2.6 and
is paired with a DuckDB oracle. Selection queries carry a deterministic
ORDER BY on a unique key so the row subset is well-defined in both engines
(the reference returns arbitrary matching rows; the oracle needs determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators import filters as P
from realtime_olap_spark.operators import selection
from realtime_olap_spark.operators.aggregation import dsum
from realtime_olap_spark.operators.groupby import Agg, Key, group_by_agg
from realtime_olap_spark.suite.registry import query
from realtime_olap_spark.suite.sqlgen import OAVG, OSUM

# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped aggregation (the entry() query)
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {OSUM('l_quantity')} AS sum_qty,
       {OSUM('l_extendedprice')} AS sum_base_price,
       {OSUM('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {OAVG('l_quantity')} AS avg_qty,
       {OAVG('l_extendedprice')} AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("flagship_q1", FLAGSHIP_ORACLE)
def flagship_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary aggregation: filter → group-by → 6 aggregates.

    Maps the reference's AggregationGroupByOperator pipeline
    (pinot-core/.../operator/query/AggregationGroupByOperator.java:38);
    Catalyst plans partial+final HashAggregate over the key shuffle, same
    shape as CombineGroupByOperator → BrokerReduceService.
    """
    li = Catalog(spark, sf_dir).table("lineitem")
    out = group_by_agg(
        li,
        keys=[Key("l_returnflag", "l_returnflag"), Key("l_linestatus", "l_linestatus")],
        aggs=[
            Agg("sum", "l_quantity", "sum_qty"),
            Agg("sum", "l_extendedprice", "sum_base_price"),
            Agg("sum", F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            Agg("avg", "l_quantity", "avg_qty"),
            Agg("avg", "l_extendedprice", "avg_price"),
            Agg("count", None, "count_order"),
        ],
        where=P.range_("l_shipdate", high=F.lit("2000-09-02").cast("timestamp")),
    )
    return out.orderBy("l_returnflag", "l_linestatus")


# ---------------------------------------------------------------------------
# Selection queries (§2.6)
# ---------------------------------------------------------------------------

@query("sel_limit", """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_returnflag = 'R'
ORDER BY l_orderkey, l_linenumber
LIMIT 10
""")
def sel_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SelectionOnlyOperator (early termination at LIMIT) with deterministic
    order — SelectionOnlyOperator.java:45,76-87."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return selection.select_order_by(
        li,
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
        order_by=[F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        where=P.eq("l_returnflag", "R"),
        limit=10,
    )


@query("sel_order_by_offset", """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 15 OFFSET 5
""")
def sel_order_by_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SelectionOrderByOperator with pagination — bounded top-(offset+limit)
    per partition, merged once (SelectionOperatorService.java:76-109);
    Spark: TakeOrderedAndProject + offset."""
    li = Catalog(spark, sf_dir).table("lineitem")
    return selection.select_order_by(
        li,
        ["l_orderkey", "l_linenumber", "l_extendedprice"],
        order_by=[F.col("l_extendedprice").desc(),
                  F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
        limit=15, offset=5,
    )


@query("sel_empty", """
SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 0
ORDER BY o_orderkey LIMIT 10
""")
def sel_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EmptyFilterOperator / empty-result path (EmptyFilterOperator.java:28)."""
    o = Catalog(spark, sf_dir).table("orders")
    return selection.select_order_by(
        o, ["o_orderkey", "o_totalprice"],
        order_by=[F.col("o_orderkey").asc()],
        where=P.range_("o_totalprice", high=0, high_inclusive=False), limit=10)


# ---------------------------------------------------------------------------
# Filter predicates (§2.2) — each verified through an aggregate so the whole
# matching set (not a LIMITed subset) is compared against the oracle.
# ---------------------------------------------------------------------------

@query("filter_eq", f"""
SELECT COUNT(*) AS cnt,
       {OSUM('l_extendedprice')} AS total
FROM lineitem WHERE l_returnflag = 'R'
""")
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return (li.where(P.eq("l_returnflag", "R"))
              .agg(F.count(F.lit(1)).alias("cnt"),
                   dsum("l_extendedprice").alias("total")))


@query("filter_neq", """
SELECT COUNT(*) AS cnt FROM lineitem WHERE l_linestatus <> 'O'
""")
def filter_neq(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).table("lineitem")
    return li.where(P.neq("l_linestatus", "O")).agg(F.count(F.lit(1)).alias("cnt"))


@query("filter_in", f"""
SELECT COUNT(*) AS cnt,
       {OSUM('o_totalprice')} AS total
FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""")
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return (o.where(P.isin("o_orderpriority", ["1-URGENT", "2-HIGH"]))
             .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("total")))


@query("filter_not_in", """
SELECT COUNT(*) AS cnt FROM orders
WHERE o_orderpriority NOT IN ('5-LOW', '4-NOT SPECIFIED')
""")
def filter_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    return (o.where(P.not_in("o_orderpriority", ["5-LOW", "4-NOT SPECIFIED"]))
             .agg(F.count(F.lit(1)).alias("cnt")))


@query("filter_between", f"""
SELECT COUNT(*) AS cnt,
       {OSUM('l_quantity')} AS qty
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
""")
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusive BETWEEN on a metric and on the time column — RANGE predicate
    [a, b] (RangePredicate.java:26)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    cond = P.and_(
        P.between("l_quantity", 10, 20),
        P.between("l_shipdate",
                  F.lit("1996-01-01").cast("timestamp"),
                  F.lit("1997-12-31").cast("timestamp")),
    )
    return li.where(cond).agg(F.count(F.lit(1)).alias("cnt"),
                              dsum("l_quantity").alias("qty"))


@query("filter_range_exclusive", """
SELECT COUNT(*) AS cnt FROM lineitem
WHERE l_quantity > 45 AND l_discount < 0.03
""")
def filter_range_exclusive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict range bounds — range strings like ``(45\\t\\t*)``
    (RangePredicateEvaluatorFactory.java:34)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    cond = P.and_(
        P.range_("l_quantity", low=45, low_inclusive=False),
        P.range_("l_discount", high=0.03, high_inclusive=False),
    )
    return li.where(cond).agg(F.count(F.lit(1)).alias("cnt"))


@query("filter_regexp_like", """
SELECT COUNT(*) AS cnt FROM part WHERE regexp_matches(p_name, '^(red|blue) .*')
""")
def filter_regexp_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGEXP_LIKE predicate (RegexpLikePredicate.java:27) — Java regex in
    both Spark (rlike) and the oracle (regexp_matches)."""
    p = Catalog(spark, sf_dir).table("part")
    return (p.where(P.regexp_like("p_name", "^(red|blue) .*"))
             .agg(F.count(F.lit(1)).alias("cnt")))


@query("filter_and_or_tree", f"""
SELECT COUNT(*) AS cnt,
       {OSUM('l_extendedprice')} AS total
FROM lineitem
WHERE (l_returnflag = 'A' AND l_quantity > 25)
   OR (l_linestatus = 'O' AND l_discount BETWEEN 0.02 AND 0.05)
""")
def filter_and_or_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested AND/OR filter tree (request.thrift:60-75,
    AndFilterOperator.java:29 / OrFilterOperator.java:29)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    cond = P.or_(
        P.and_(P.eq("l_returnflag", "A"), P.range_("l_quantity", low=25, low_inclusive=False)),
        P.and_(P.eq("l_linestatus", "O"), P.between("l_discount", 0.02, 0.05)),
    )
    return li.where(cond).agg(F.count(F.lit(1)).alias("cnt"),
                              dsum("l_extendedprice").alias("total"))
