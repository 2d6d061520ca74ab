"""Skew-mitigation correctness: salted plans must equal unsalted plans
exactly (decimal-routed sums make two-phase aggregation bit-identical)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.skew import salted_groupby_agg, salted_join
from tests.conftest import SF_DIR


def _events(spark):
    return Catalog(spark, SF_DIR).table("events").drop("ts_ns")


def test_salted_agg_equals_direct(spark):
    ev = _events(spark)
    got = sorted(tuple(r) for r in salted_groupby_agg(
        ev, ["event_type"],
        [("count", None, "cnt"), ("sum", "value", "total"),
         ("min", "value", "mn"), ("max", "value", "mx"),
         ("avg", "value", "av")]).collect())
    want = sorted(tuple(r) for r in ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(38,10)")).cast("double").alias("total"),
        F.min("value").alias("mn"), F.max("value").alias("mx"),
        (F.sum(F.col("value").cast("decimal(38,10)")).cast("double")
         / F.count("value")).alias("av")).collect())
    assert got == want and len(got) > 0


def test_salted_agg_rejects_holistic(spark):
    import pytest

    with pytest.raises(ValueError, match="non-algebraic"):
        salted_groupby_agg(_events(spark), ["event_type"],
                           [("percentile", "value", "p")])


def test_salted_join_equals_plain_join(spark):
    ev = _events(spark)
    dim = ev.select("event_type").distinct() \
            .withColumn("weight", F.length("event_type"))
    got = sorted(tuple(r) for r in
                 salted_join(ev, dim, "event_type")
                 .select("event_id", "weight").collect())
    want = sorted(tuple(r) for r in
                  ev.join(dim, "event_type")
                    .select("event_id", "weight").collect())
    assert got == want and len(got) > 0
