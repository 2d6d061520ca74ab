"""Streaming dedup: exact and watermarked in-stream dedup + against-corpus
anti join, each drained with availableNow and compared to the batch
semantics on the same data."""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import functions as F

from realtime_olap_spark.streaming.dedup import (corpus_key_table,
                                                 dedup_against_corpus,
                                                 dedup_stream,
                                                 dedup_stream_exact)

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
])


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        [(i, f"2024-01-01 00:{m:02d}:00", t) for i, m, t in rows],
        ["doc_id", "ts_s", "text"]) \
        .select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "text")
    df.coalesce(1).write.mode("append").parquet(path)


def _drain(stream_df, sink, ckpt):
    q = (stream_df.writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)


def _stream(spark, src, files_per_trigger=1):
    return (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", files_per_trigger).parquet(src))


def test_dedup_stream_exact_first_arrival_wins(spark, tmpdir):
    src, sink, ckpt = f"{tmpdir}/src", f"{tmpdir}/sink", f"{tmpdir}/ckpt"
    _write_batch(spark, src, [(1, 1, "alpha"), (2, 2, "beta"), (3, 3, "alpha")])
    _write_batch(spark, src, [(4, 4, "beta"), (5, 5, "gamma"), (6, 6, "alpha")])
    _drain(dedup_stream_exact(_stream(spark, src)).drop("__ck"), sink, ckpt)

    got = {r["text"]: r["doc_id"]
           for r in spark.read.schema(SCHEMA).parquet(sink).collect()}
    assert set(got) == {"alpha", "beta", "gamma"}
    # batches arrive in file order -> the FIRST doc_id of each text survives
    assert got["alpha"] == 1 and got["beta"] == 2 and got["gamma"] == 5


def test_dedup_stream_watermarked_drops_dups_within_delay(spark, tmpdir):
    src, sink, ckpt = f"{tmpdir}/src", f"{tmpdir}/sink", f"{tmpdir}/ckpt"
    _write_batch(spark, src, [(1, 1, "alpha"), (2, 2, "beta")])
    _write_batch(spark, src, [(3, 3, "alpha"), (4, 4, "gamma")])  # dup in delay
    _write_batch(spark, src, [(5, 5, "beta"), (6, 6, "delta")])
    _drain(dedup_stream(_stream(spark, src), "ts", "1 hour").drop("__ck"),
           sink, ckpt)

    texts = sorted(r["text"]
                   for r in spark.read.schema(SCHEMA).parquet(sink).collect())
    assert texts == ["alpha", "beta", "delta", "gamma"]


def test_dedup_stream_bounded_state_in_plan(spark, tmpdir):
    """The watermarked variant must plan a dedup-within-watermark node
    (TTL state), not the unbounded dropDuplicates state store."""
    src = f"{tmpdir}/src"
    _write_batch(spark, src, [(1, 1, "alpha")])
    plan = dedup_stream(_stream(spark, src), "ts", "10 minutes") \
        ._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan


def test_dedup_against_corpus_matches_batch_anti_join(spark, tmpdir):
    src, sink, ckpt = f"{tmpdir}/src", f"{tmpdir}/sink", f"{tmpdir}/ckpt"
    corpus = spark.createDataFrame(
        [(100, "alpha"), (101, "gamma")], ["doc_id", "text"])
    keys = corpus_key_table(corpus)
    _write_batch(spark, src, [(1, 1, "alpha"), (2, 2, "beta")])
    _write_batch(spark, src, [(3, 3, "gamma"), (4, 4, "delta"), (5, 5, "beta")])
    _drain(dedup_against_corpus(_stream(spark, src), keys), sink, ckpt)

    got = sorted((r["doc_id"], r["text"])
                 for r in spark.read.schema(SCHEMA).parquet(sink).collect())
    # corpus texts dropped; in-stream dups NOT deduped by this operator
    assert got == [(2, "beta"), (4, "delta"), (5, "beta")]


def test_streaming_decontamination_matches_batch(spark, tmp_path):
    """Decontamination at ingest: the benchmark gram-hash set (tiny,
    broadcast) left-anti-joins the STREAM of incoming documents — the
    stream-static shape Spark supports statelessly, so contaminated docs
    never enter the corpus. availableNow drain must equal the batch
    decontaminate on the same files."""
    from realtime_olap_spark.operators.decontam import (
        benchmark_gram_hashes, decontaminate, ngram_hash_set)

    src = f"{tmp_path}/src"
    _write_batch(spark, src, [(1, 1, "alpha beta gamma delta epsilon"),
                              (2, 2, "zeta eta theta iota kappa"),
                              (3, 3, "alpha beta gamma zz qq")])
    _write_batch(spark, src, [(4, 4, "completely novel words here now"),
                              (5, 5, "zeta eta theta wholly reused")])

    bench = spark.createDataFrame(
        [("alpha beta gamma was seen",), ("zeta eta theta too",)], ["text"])
    bh = benchmark_gram_hashes(bench, "text", 3)

    # stream side: stateless per-row flag — any doc gram in the benchmark
    # set contaminates (array intersect against the broadcast hash set)
    bench_hashes = [r["gram_hash"] for r in bh.collect()]
    flag = F.arrays_overlap(
        ngram_hash_set(F.col("text"), 3),
        F.array(*[F.lit(h) for h in bench_hashes]))
    clean_stream = _stream(spark, src).where(~flag)
    sink, ckpt = f"{tmp_path}/sink", f"{tmp_path}/ckpt"
    _drain(clean_stream, sink, ckpt)
    got = {r["doc_id"] for r in spark.read.parquet(sink).collect()}

    batch = decontaminate(spark.read.schema(SCHEMA).parquet(src), bench,
                          "doc_id", "text", n=3)
    want = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert got == want
    # 1,3 hit 'alpha beta gamma'; 2,5 hit 'zeta eta theta' — only 4 is clean
    assert got == {4}
