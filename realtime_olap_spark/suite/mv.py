"""Multi-value (MV) column suite — SURVEY.md §2.4 MV aggregations, §2.2 MV
predicates, §2.5 MV group-by.

Reference MV semantics: an MV column is a variable-length array of a
primitive (FieldSpec.java:72-73); predicates match if ANY element matches;
a row contributes to EVERY group of its MV column
(AggregationFunction.java:87-93 aggregateGroupByMV); MV aggregations run
over all elements (CountMVAggregationFunction.java …).

Fixtures per FIXTURES.md: ``embeddings.embedding`` (list<float> — MV FLOAT)
and the derived ``split(p_name, ' ')`` (MV STRING).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators import filters as P
from realtime_olap_spark.operators.groupby import Agg, Key, group_by_agg, top_n
from realtime_olap_spark.suite.registry import query

# DuckDB fragment: exact fixed-point (2^35) element term — deterministic in
# any engine because multiplying by a power of two never rounds (see
# aggregation.FX).
_FX = "34359738368"
_EL = f"CAST(FLOOR(CAST(u AS DOUBLE) * {_FX}) AS BIGINT)"


@query("mv_eq_filter", """
SELECT COUNT(*) AS cnt FROM part
WHERE list_contains(string_split(p_name, ' '), 'red')
""")
def mv_eq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQ on an MV column = any element equals
    (EqualsPredicateEvaluatorFactory.java:30, MV path)."""
    p = Catalog(spark, sf_dir).table("part")
    return (p.where(P.mv_eq(F.split("p_name", " "), "red"))
             .agg(F.count(F.lit(1)).alias("cnt")))


@query("mv_in_filter", """
SELECT COUNT(*) AS cnt FROM part
WHERE len(list_intersect(string_split(p_name, ' '), ['bolt', 'gear', 'widget'])) > 0
""")
def mv_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN on an MV column = any element in the set (InPredicate MV path)."""
    p = Catalog(spark, sf_dir).table("part")
    return (p.where(P.mv_isin(F.split("p_name", " "), ["bolt", "gear", "widget"]))
             .agg(F.count(F.lit(1)).alias("cnt")))


@query("mv_range_filter", """
SELECT COUNT(*) AS cnt FROM embeddings
WHERE EXISTS (SELECT 1 FROM unnest(embedding) AS t(u) WHERE u BETWEEN 0.99 AND 1.0)
""")
def mv_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE on an MV column: any element in [low, high]
    (RangePredicateEvaluatorFactory MV path)."""
    e = Catalog(spark, sf_dir).table("embeddings")
    return (e.where(P.mv_between("embedding", F.lit(0.99).cast("float"),
                                 F.lit(1.0).cast("float")))
             .agg(F.count(F.lit(1)).alias("cnt")))


@query("mv_groupby", """
SELECT w AS word, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
GROUP BY w
ORDER BY cnt DESC, w ASC
LIMIT 10
""")
def mv_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV group-by: a row lands in every element's group
    (AggregationFunction.java:87-93), TOP-10 by count desc."""
    p = Catalog(spark, sf_dir).table("part")
    g = group_by_agg(p, keys=[Key(F.split("p_name", " "), "word", mv=True)],
                     aggs=[Agg("count", None, "cnt")])
    return top_n(g, "cnt", 10, key_names=["word"])


@query("mv_agg_basic", f"""
SELECT COUNT(*) AS rows_cnt,
       SUM(len(embedding)) AS countmv,
       MIN(el.mn) AS minmv,
       MAX(el.mx) AS maxmv
FROM embeddings,
     LATERAL (SELECT MIN(CAST(u AS DOUBLE)) AS mn, MAX(CAST(u AS DOUBLE)) AS mx
              FROM unnest(embedding) AS t(u)) el
""")
def mv_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNTMV / MINMV / MAXMV — element-count and element-extrema aggregates
    (CountMVAggregationFunction.java, MinMVAggregationFunction.java) computed
    as JVM-side array folds; no explode in the Spark plan."""
    e = Catalog(spark, sf_dir).table("embeddings")
    return group_by_agg(e, keys=[], aggs=[
        Agg("count", None, "rows_cnt"),
        Agg("countmv", "embedding", "countmv"),
        Agg("minmv", "embedding", "minmv"),
        Agg("maxmv", "embedding", "maxmv"),
    ])


@query("mv_agg_sum_avg", f"""
SELECT (CAST(SUM({_EL}) AS DOUBLE) / {_FX}.0) AS summv,
       (CAST(SUM({_EL}) AS DOUBLE) / {_FX}.0 / COUNT(u)) AS avgmv,
       MAX(CAST(u AS DOUBLE)) - MIN(CAST(u AS DOUBLE)) AS rangemv
FROM (SELECT unnest(embedding) AS u FROM embeddings)
""")
def mv_agg_sum_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUMMV / AVGMV / MINMAXRANGEMV over all elements
    (SumMVAggregationFunction.java, AvgMV…, MinMaxRangeMV…) — exact decimal
    folds per row, then exact decimal merge."""
    e = Catalog(spark, sf_dir).table("embeddings")
    return group_by_agg(e, keys=[], aggs=[
        Agg("summv", "embedding", "summv"),
        Agg("avgmv", "embedding", "avgmv"),
        Agg("minmaxrangemv", "embedding", "rangemv"),
    ])


@query("mv_distinctcount", """
SELECT COUNT(DISTINCT w) AS dc_words
FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
""")
def mv_distinctcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCTCOUNTMV — exact distinct over the union of elements
    (DistinctCountMVAggregationFunction.java); element-level path of the
    group-by executor (explode once, aggregate)."""
    p = Catalog(spark, sf_dir).table("part")
    return group_by_agg(p, keys=[], aggs=[
        Agg("distinctcountmv", F.split("p_name", " "), "dc_words"),
    ])


@query("mv_percentile", """
SELECT quantile_cont(CAST(u AS DOUBLE), 0.5) AS p50,
       quantile_cont(CAST(u AS DOUBLE), 0.9) AS p90
FROM (SELECT unnest(embedding) AS u FROM embeddings WHERE label = 3)
""")
def mv_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE<N>MV — exact percentile over all elements of a filtered
    row set (PercentileMVAggregationFunction.java)."""
    e = Catalog(spark, sf_dir).table("embeddings").where(P.eq("label", 3))
    el = e.select(F.explode("embedding").alias("u"))
    return el.agg(
        F.percentile(F.col("u").cast("double"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("u").cast("double"), F.lit(0.9)).alias("p90"))


@query("mv_groupby_label_elements", f"""
SELECT label,
       SUM(len(embedding)) AS countmv,
       (CAST(SUM(el.s) AS DOUBLE) / {_FX}.0) AS summv
FROM embeddings,
     LATERAL (SELECT SUM({_EL}) AS s FROM unnest(embedding) AS t(u)) el
GROUP BY label
""")
def mv_groupby_label_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped MV aggregation: per-dimension COUNTMV/SUMMV — grouped
    element folds with exact decimal merge."""
    e = Catalog(spark, sf_dir).table("embeddings")
    return group_by_agg(e, keys=[Key("label", "label")], aggs=[
        Agg("countmv", "embedding", "countmv"),
        Agg("summv", "embedding", "summv"),
    ])
