"""Transform-function suite: the 7-function registry in select / filter /
group-by positions, incl. DATETIMECONVERT bucketing (SURVEY.md §2.9 / M3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.functions import (add, datetimeconvert, div, mult, sub,
                                           timeconvert, valuein)
from realtime_olap_spark.operators.groupby import Agg, Key, group_by_agg, top_n
from realtime_olap_spark.suite.registry import query
from realtime_olap_spark.suite.sqlgen import OSUM


@query("tf_arithmetic", f"""
SELECT COUNT(*) AS cnt,
       {OSUM('(l_quantity + (l_tax * 100)) - (l_extendedprice / 50)')} AS combo
FROM lineitem
WHERE (l_extendedprice * (1 - l_discount)) > 50000
""")
def tf_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD/SUB/MULT/DIV in projection and filter positions
    (AdditionTransformFunction.java:32 … DivisionTransformFunction.java:32);
    infix arithmetic compiles to the same functions (PQL2.g4)."""
    li = Catalog(spark, sf_dir).table("lineitem")
    combo = sub(add("l_quantity", mult("l_tax", F.lit(100))),
                div("l_extendedprice", F.lit(50)))
    pred = mult("l_extendedprice", sub(F.lit(1), "l_discount")) > 50000
    return li.where(pred).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(combo.cast("decimal(38,10)")).cast("double").alias("combo"))


@query("tf_timeconvert", f"""
SELECT CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS ts_hour,
       COUNT(*) AS cnt, {OSUM('value')} AS total
FROM events
GROUP BY ts_hour
ORDER BY cnt DESC, ts_hour ASC
LIMIT 10
""")
def tf_timeconvert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMECONVERT(epochMillis, MILLISECONDS, HOURS) as a group key with the
    reference's default TOP-10-by-aggregate ordering
    (TimeConversionTransformFunction.java:33)."""
    ev = Catalog(spark, sf_dir).table("events")
    hour = timeconvert(F.unix_millis("ts"), "MILLISECONDS", "HOURS")
    g = group_by_agg(ev, keys=[Key(hour, "ts_hour")],
                     aggs=[Agg("count", None, "cnt"), Agg("sum", "value", "total")])
    return top_n(g, "cnt", 10, key_names=["ts_hour"])


@query("tf_datetimeconvert_bucket", f"""
SELECT CAST(FLOOR(epoch_ms(ts) / 900000) * 900000 AS BIGINT) AS bucket_ms,
       COUNT(*) AS cnt, {OSUM('value')} AS total
FROM events
WHERE event_type = 'purchase'
GROUP BY bucket_ms
ORDER BY total DESC, bucket_ms ASC
LIMIT 10
""")
def tf_datetimeconvert_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATETIMECONVERT with 15:MINUTES bucketing granularity
    (DateTimeConversionTransformFunction.java:82) — epoch-ms in/out."""
    ev = Catalog(spark, sf_dir).table("events")
    bucket = datetimeconvert(F.unix_millis("ts"), "1:MILLISECONDS:EPOCH",
                             "1:MILLISECONDS:EPOCH", "15:MINUTES")
    g = group_by_agg(ev.where(F.col("event_type") == "purchase"),
                     keys=[Key(bucket, "bucket_ms")],
                     aggs=[Agg("count", None, "cnt"), Agg("sum", "value", "total")])
    return top_n(g, "total", 10, key_names=["bucket_ms"])


@query("tf_datetimeconvert_sdf", f"""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       COUNT(*) AS cnt, {OSUM('value')} AS total
FROM events
GROUP BY day
""")
def tf_datetimeconvert_sdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATETIMECONVERT epoch → SIMPLE_DATE_FORMAT output
    (DateTimeFieldSpec.java:39-75 format grammar) — daily string buckets."""
    ev = Catalog(spark, sf_dir).table("events")
    day = datetimeconvert(F.unix_millis("ts"), "1:MILLISECONDS:EPOCH",
                          "1:DAYS:SIMPLE_DATE_FORMAT:yyyy-MM-dd", "1:DAYS")
    return group_by_agg(ev, keys=[Key(day, "day")],
                        aggs=[Agg("count", None, "cnt"),
                              Agg("sum", "value", "total")])


@query("tf_valuein", """
SELECT w AS word, COUNT(*) AS cnt
FROM (SELECT unnest(list_filter(string_split(p_name, ' '),
                                x -> x IN ('red', 'blue', 'small'))) AS w
      FROM part)
GROUP BY w
ORDER BY cnt DESC, w ASC
""")
def tf_valuein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUEIN(mvCol, …): projection-side element filter on a derived MV
    column (ValueInTransformFunction.java:51); grouped per surviving element
    — the reference's MV group-by contract (a row lands in each element's
    group, AggregationFunction.java:87-93)."""
    p = Catalog(spark, sf_dir).table("part")
    words = valuein(F.split("p_name", " "), "red", "blue", "small")
    g = group_by_agg(p, keys=[Key(words, "word", mv=True)],
                     aggs=[Agg("count", None, "cnt")])
    return g.orderBy(F.col("cnt").desc(), F.col("word").asc())
