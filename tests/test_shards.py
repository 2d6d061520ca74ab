"""Training-shard sink — totals conservation, deterministic assignment,
manifest agreement, partition-pruned subset reads, and the atomic
completion marker."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.sources.shards import (MARKER, read_manifest,
                                                read_shards, with_shard,
                                                write_training_shards)
from tests.conftest import SF_DIR

N = 8


@pytest.fixture(scope="module")
def dataset(spark, tmp_path_factory):
    docs = (Catalog(spark, SF_DIR).table("documents")
            .select("doc_id", "text",
                    F.size(F.split(F.col("text"), r"\s+")).alias("ntok")))
    path = str(tmp_path_factory.mktemp("shards") / "ds")
    write_training_shards(docs, path, "doc_id", N, token_col="ntok")
    return docs, path


def test_marker_and_layout(dataset):
    _, path = dataset
    assert os.path.exists(os.path.join(path, MARKER))
    assert os.path.isdir(os.path.join(path, "data"))
    assert os.path.isdir(os.path.join(path, "manifest"))


def test_totals_conserved_and_manifest_agrees(spark, dataset):
    docs, path = dataset
    back = read_shards(spark, path)
    assert back.count() == docs.count()
    assert (back.agg(F.sum("ntok")).first()[0]
            == docs.agg(F.sum("ntok")).first()[0])
    # manifest rows equal the actual per-shard contents
    man = {r["shard"]: (r["n_rows"], r["n_tokens"])
           for r in read_manifest(spark, path).collect()}
    got = {r["shard"]: (r["n"], r["t"])
           for r in back.groupBy("shard")
                        .agg(F.count(F.lit(1)).alias("n"),
                             F.sum("ntok").alias("t")).collect()}
    assert man == got
    assert len(man) == N  # every shard non-empty on this corpus


def test_assignment_is_a_row_property(spark, dataset):
    docs, path = dataset
    a = {r["doc_id"]: r["shard"]
         for r in with_shard(docs, "doc_id", N).collect()}
    b = {r["doc_id"]: r["shard"]
         for r in with_shard(docs.repartition(13), "doc_id", N).collect()}
    c = {r["doc_id"]: r["shard"]
         for r in read_shards(spark, path).select("doc_id",
                                                  "shard").collect()}
    assert a == b == c


def test_subset_read_prunes_partitions(spark, dataset):
    _, path = dataset
    sub = read_shards(spark, path, shards=[0, 3])
    assert set(r["shard"] for r in sub.select("shard")
               .distinct().collect()) == {0, 3}
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_unmarked_dataset_refused(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_shards(spark, str(tmp_path / "nope"))


def test_republish_requires_overwrite(spark, tmp_path):
    docs = (Catalog(spark, SF_DIR).table("documents")
            .select("doc_id", "text").limit(50))
    path = str(tmp_path / "ds")
    write_training_shards(docs, path, "doc_id", 2)
    with pytest.raises(FileExistsError):
        write_training_shards(docs, path, "doc_id", 2)
    # overwrite swaps in the new build (here: fewer rows)
    write_training_shards(docs.limit(20), path, "doc_id", 2,
                          overwrite=True)
    assert read_shards(spark, path).count() == 20
    assert os.path.exists(os.path.join(path, MARKER))


def test_published_bloom_gates_next_batch(spark, tmp_path):
    """Publish with a content bloom; gate an overlapping second batch
    against the dataset — result must equal the plain anti-join, and the
    filter file must live inside the atomic publish."""
    from realtime_olap_spark.sources.shards import (BLOOM_FILE,
                                                    dedup_against_dataset,
                                                    read_bloom)
    docs = (Catalog(spark, SF_DIR).table("documents")
            .select("doc_id", "text"))
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "ds")
    write_training_shards(corpus, path, "doc_id", 4, content_key="text")
    assert os.path.exists(os.path.join(path, BLOOM_FILE))
    assert read_bloom(path) is not None

    batch = docs.where(F.col("doc_id") % 2 == 0)
    want = sorted(r["doc_id"] for r in batch
                  .withColumn("__ck", F.md5(F.col("text")))
                  .join(corpus.select(F.md5("text").alias("__ck"))
                        .distinct(), "__ck", "left_anti").collect())
    for large in (False, True):
        got = sorted(r["doc_id"] for r in dedup_against_dataset(
            batch, path, "text", large_corpus=large).collect())
        assert got == want, f"large_corpus={large}"
    assert 0 < len(want) < batch.count()  # overlap is real both ways


def test_dataset_without_bloom_still_gates_exactly(spark, tmp_path):
    from realtime_olap_spark.sources.shards import (dedup_against_dataset,
                                                    read_bloom)
    docs = (Catalog(spark, SF_DIR).table("documents")
            .select("doc_id", "text").limit(60))
    path = str(tmp_path / "ds")
    write_training_shards(docs, path, "doc_id", 2)
    assert read_bloom(path) is None
    got = dedup_against_dataset(docs, path, "text").count()
    assert got == 0  # every batch row already shipped


def test_large_corpus_shape_never_shuffles_the_corpus(spark, tmp_path):
    """In the large-corpus join shape both joins must be broadcast-hash:
    no sort-merge exchange may touch the dataset key scan."""
    from realtime_olap_spark.sources.shards import dedup_against_dataset
    docs = (Catalog(spark, SF_DIR).table("documents")
            .select("doc_id", "text"))
    path = str(tmp_path / "ds")
    write_training_shards(docs.where(F.col("doc_id") % 3 == 0), path,
                          "doc_id", 4, content_key="text")
    out = dedup_against_dataset(docs.where(F.col("doc_id") % 2 == 0),
                                path, "text", large_corpus=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_dataset_diff_counts(spark, tmp_path):
    from realtime_olap_spark.sources.shards import dataset_diff
    docs = (Catalog(spark, SF_DIR).table("documents")
            .select("doc_id", "text", "source"))
    a = docs.where(F.col("doc_id") % 3 != 2)         # yesterday
    b = docs.where(F.col("doc_id") % 2 == 0)         # today
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(a, pa, "doc_id", 2)
    write_training_shards(b, pb, "doc_id", 2)
    got = {r["status"]: r["n_contents"] for r in
           dataset_diff(spark, pa, pb, "text").collect()}
    ka = {r[0] for r in a.select(F.md5("text")).collect()}
    kb = {r[0] for r in b.select(F.md5("text")).collect()}
    assert got.get("added", 0) == len(kb - ka)
    assert got.get("removed", 0) == len(ka - kb)
    assert got.get("common", 0) == len(ka & kb)
    # dimensional breakdown sums to the flat counts
    by_src = dataset_diff(spark, pa, pb, "text", dims=["source"])
    flat = {r["status"]: r["n"] for r in
            by_src.groupBy("status").agg(F.sum("n_contents").alias("n"))
            .collect()}
    # per-(status, source) rows can exceed flat content counts only if a
    # content key appears under several sources; the synthetic corpus
    # keys are source-unique, so totals must agree exactly
    assert flat == got


def test_published_theta_metadata_answers_distinct(spark, tmp_path):
    """Per-shard theta publish: merged sketches are BIT-IDENTICAL to a
    direct build over the dataset (merge law over the shard partition of
    rows), shard-subset estimates equal direct builds over the subset,
    and the metadata-only distinct estimate lands within bounds — all
    without reading a single data file after the publish."""
    from realtime_olap_spark.operators.theta import (theta_build,
                                                     theta_estimate,
                                                     theta_union_all)
    from realtime_olap_spark.sources.shards import (
        dataset_distinct_estimate, read_theta)
    df = (spark.range(6000)
          .select(F.col("id").alias("doc_id"),
                  F.concat(F.lit("u"), (F.col("id") % 3700))
                  .alias("author")))
    path = str(tmp_path / "ds")
    write_training_shards(df, path, "doc_id", 4,
                          theta_columns=("author",), theta_k=512)
    per_shard = read_theta(path, "author")
    assert set(per_shard) == {0, 1, 2, 3}
    direct = theta_build(df, F.col("author").cast("string"), k=512)
    assert theta_union_all(list(per_shard.values())) == direct
    est = dataset_distinct_estimate(path, "author")
    assert abs(est - 3700) / 3700 < 4.0 / (512 - 1) ** 0.5
    # shard-subset estimate == direct build over exactly those rows
    sub = with_shard(df, "doc_id", 4).where(F.col("shard").isin([0, 2]))
    sub_direct = theta_build(sub, F.col("author").cast("string"), k=512)
    assert (dataset_distinct_estimate(path, "author", shards=[0, 2])
            == theta_estimate(sub_direct))
    assert read_theta(path, "other_col") is None


def test_dataset_key_overlap_metadata_only(spark, tmp_path):
    from realtime_olap_spark.sources.shards import dataset_key_overlap
    a = (spark.range(4000)
         .select(F.col("id").alias("doc_id"),
                 F.concat(F.lit("k"), F.col("id")).alias("ck")))
    b = (spark.range(2500, 5500)
         .select(F.col("id").alias("doc_id"),
                 F.concat(F.lit("k"), F.col("id")).alias("ck")))
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(a, pa, "doc_id", 3, theta_columns=("ck",),
                          theta_k=1024)
    write_training_shards(b, pb, "doc_id", 5, theta_columns=("ck",),
                          theta_k=1024)
    ov = dataset_key_overlap(pa, pb, "ck")
    tol = 6.0 / (1024 - 1) ** 0.5 * 5500  # RSE over the union size
    assert abs(ov["union"] - 5500) < tol
    assert abs(ov["intersect"] - 1500) < tol
    assert abs(ov["a_not_b"] - 2500) < tol
    assert abs(ov["b_not_a"] - 1500) < tol
    assert abs(ov["jaccard"] - 1500 / 5500) < 0.06


def test_theta_metadata_preview_agrees_with_content_diff(spark, tmp_path):
    """The metadata-only overlap preview and the content-level
    dataset_diff must tell the same story on the same two snapshots:
    here both sides are below k so the sketches are EXACT and the
    preview equals the diff's counts exactly (at scale the preview is
    the same numbers at RSE 1/sqrt(k-1), instantly and scan-free)."""
    from realtime_olap_spark.sources.shards import (dataset_diff,
                                                    dataset_key_overlap)
    day1 = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(120)], "doc_id long, text string")
    day2 = spark.createDataFrame(  # drop 20, keep 100, add 40
        [(i, f"doc {i}") for i in range(20, 160)],
        "doc_id long, text string")
    p1, p2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    # NOTE: overlap compares the same key column on both sides; publish
    # sketches over the md5 content key, the diff's own key expression
    for df, p in ((day1.withColumn("ck", F.md5("text")), p1),
                  (day2.withColumn("ck", F.md5("text")), p2)):
        write_training_shards(df, p, "doc_id", 4, theta_columns=("ck",),
                              theta_k=512)
    diff = {r["status"]: r["n_contents"] for r in
            dataset_diff(spark, p1, p2, "text").collect()}
    ov = dataset_key_overlap(p1, p2, "ck")
    assert diff == {"common": 100, "removed": 20, "added": 40}
    assert ov["intersect"] == 100.0
    assert ov["a_not_b"] == 20.0
    assert ov["b_not_a"] == 40.0
    assert ov["union"] == 160.0
