"""PQL front-end suite — queries issued through the PQL dialect parser
(entry point A analog) and verified against the same DuckDB oracles,
proving the parse → compile → execute path end-to-end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from realtime_olap_spark.plans.pql import PQLEngine
from realtime_olap_spark.suite.registry import query
from realtime_olap_spark.suite.sqlgen import OSUM


@query("pql_selection", """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 250000
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 12
""")
def pql_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return PQLEngine(spark, sf_dir).dataframe(
        "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders "
        "WHERE o_orderstatus = 'O' AND o_totalprice > 250000 "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 12")


@query("pql_agg_groupby_top", f"""
SELECT l_returnflag, {OSUM('l_quantity')} AS sum_l_quantity
FROM lineitem
WHERE l_linestatus = 'F' AND l_quantity BETWEEN 5 AND 45
GROUP BY l_returnflag
ORDER BY sum_l_quantity DESC, l_returnflag ASC
LIMIT 10
""")
def pql_agg_groupby_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation group-by through PQL: implicit TOP 10 ordered by the
    aggregate desc (docs/pql_examples.rst:169-172,224)."""
    return PQLEngine(spark, sf_dir).dataframe(
        "SELECT l_returnflag, sum(l_quantity) FROM lineitem "
        "WHERE l_linestatus = 'F' AND l_quantity BETWEEN 5 AND 45 "
        "GROUP BY l_returnflag")


@query("pql_transform_having", f"""
SELECT (l_quantity / 10) AS div_l_quantity_10,
       COUNT(*) AS count_star,
       {OSUM('l_extendedprice * l_discount')} AS sum_mult_l_extendedprice_l_discount
FROM lineitem
GROUP BY div_l_quantity_10
HAVING COUNT(*) > 100
ORDER BY count_star DESC, div_l_quantity_10 ASC
LIMIT 10
""")
def pql_transform_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transform expressions in group-key and aggregation-argument positions
    (infix ``/`` and ``*`` compile to DIV/MULT — PQL2.g4
    binaryMathOperator; DivisionTransformFunction.java:32) composed with
    HAVING (HavingClauseComparisonTree.java:32) and an explicit TOP — the
    reference trims on the FIRST aggregation function."""
    return PQLEngine(spark, sf_dir).dataframe(
        "SELECT l_quantity / 10, count(*), sum(l_extendedprice * l_discount) "
        "FROM lineitem GROUP BY l_quantity / 10 "
        "HAVING count_star > 100 TOP 10")
