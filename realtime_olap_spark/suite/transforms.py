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


@query("tf_time_all", f"""
SELECT CAST(FLOOR(epoch_ms(ts) / 900000) * 900000 AS BIGINT) AS bucket_ms,
       CAST(FLOOR(epoch_ms(ts) / 3600000) AS BIGINT) AS ts_hour,
       strftime(ts, '%Y-%m-%d') AS day,
       COUNT(*) AS cnt, {OSUM('value')} AS total
FROM events
GROUP BY bucket_ms, ts_hour, day
""")
def tf_time_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three time-conversion registry functions as group keys at once:

    - TIMECONVERT(epochMillis, MILLISECONDS, HOURS)
      (TimeConversionTransformFunction.java:33);
    - DATETIMECONVERT 15:MINUTES epoch bucketing
      (DateTimeConversionTransformFunction.java:82);
    - DATETIMECONVERT epoch → SIMPLE_DATE_FORMAT daily strings
      (DateTimeFieldSpec.java:39-75 format grammar).

    Group cardinality equals the finest key (15-min buckets); the coarser
    hour/day keys are functionally dependent, so every conversion is
    value-checked across the whole time range in one query."""
    ev = Catalog(spark, sf_dir).table("events")
    ms = F.unix_millis("ts")
    hour = timeconvert(ms, "MILLISECONDS", "HOURS")
    bucket = datetimeconvert(ms, "1:MILLISECONDS:EPOCH",
                             "1:MILLISECONDS:EPOCH", "15:MINUTES")
    day = datetimeconvert(ms, "1:MILLISECONDS:EPOCH",
                          "1:DAYS:SIMPLE_DATE_FORMAT:yyyy-MM-dd", "1:DAYS")
    return group_by_agg(ev,
                        keys=[Key(bucket, "bucket_ms"), Key(hour, "ts_hour"),
                              Key(day, "day")],
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
