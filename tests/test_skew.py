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


def test_ivf_write_time_partitioning_prunes_scan(spark, tmp_path):
    """The IVF scale path as shipped (ivf_index_write / ivf_topk_indexed):
    the index materializes cell assignment as a partition column, and the
    probe's cell filter must prune the file listing (PartitionFilters),
    reading nprobe/K of the corpus — while returning exactly the rows the
    on-the-fly ivf_topk computes."""
    from pyspark.sql import functions as F

    from realtime_olap_spark.operators import similarity as S
    from realtime_olap_spark.suite.similarity import CENTROIDS, QUERY_VEC

    emb = Catalog(spark, SF_DIR).table("embeddings")
    path = str(tmp_path / "emb_ivf")
    S.ivf_index_write(emb, path, CENTROIDS)

    probe = S.ivf_topk_indexed(spark, path, QUERY_VEC, CENTROIDS,
                               "vec_id", "embedding", k=10, nprobe=2)
    got = [tuple(r) for r in probe.collect()]
    # the EXECUTED plan prunes partitions on the cell filter
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf_line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "cell" in pf_line.split("PartitionFilters")[1]
    # pruning is real: the probed read is a strict subset of the corpus
    back = spark.read.parquet(path)
    probes = S._nearest_centroids(QUERY_VEC, CENTROIDS, nprobe=2)
    n_probed = back.where(F.col("cell").isin(probes)).count()
    assert 0 < n_probed < back.count()

    # indexed probe == on-the-fly probe, row for row
    want = [tuple(r) for r in
            S.ivf_topk(emb, QUERY_VEC, CENTROIDS, "vec_id", "embedding",
                       k=10, nprobe=2).collect()]
    assert got == want
