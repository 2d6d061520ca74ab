"""Theta (KMV) sketches: exact mode, estimation bounds, the union
merge law (bit-identical to build-over-union, batch AND per-microbatch
foreachBatch fold), intersection / A-NOT-B accuracy, grouped build ≡
per-group builds, Jaccard, JSON round-trip, build plan shape."""

from __future__ import annotations

import random

import pyspark.sql.types as T
from pyspark.sql import functions as F

from realtime_olap_spark.operators.theta import (HASH_DOMAIN, ThetaSketch,
                                                 jaccard_estimate,
                                                 theta_a_not_b, theta_bounds,
                                                 theta_build,
                                                 theta_build_grouped,
                                                 theta_estimate,
                                                 theta_intersect, theta_union,
                                                 theta_union_all)


def _keys(spark, prefix, n, start=0):
    return (spark.range(start, start + n)
            .select(F.concat(F.lit(prefix), F.col("id")).alias("key")))


def test_exact_mode_below_k(spark):
    df = _keys(spark, "u", 300)
    s = theta_build(df, "key", k=1024)
    assert s.theta == HASH_DOMAIN and len(s.entries) == 300
    assert theta_estimate(s) == 300.0
    lo, hi = theta_bounds(s)
    assert lo == hi == 300.0


def test_duplicates_and_nulls_ignored(spark):
    base = _keys(spark, "u", 200)
    noisy = (base.unionAll(base).unionAll(base)
             .unionAll(base.select(F.lit(None).cast("string").alias("key"))))
    assert theta_build(noisy, "key", k=64) == theta_build(base, "key", k=64)


def test_estimation_accuracy_within_bounds(spark):
    n = 20000
    s = theta_build(_keys(spark, "u", n), "key", k=1024)
    assert s.theta < HASH_DOMAIN and len(s.entries) == 1024
    est = theta_estimate(s)
    # 4 standard errors at RSE = 1/sqrt(k-1) ~ 3.1%
    assert abs(est - n) / n < 4.0 / (1024 - 1) ** 0.5
    lo, hi = theta_bounds(s, num_std=3.0)
    assert lo <= n <= hi


def test_union_bit_identical_to_build_over_union(spark):
    # overlapping, disjoint, nested, and exact-mode operand shapes
    cases = [(2000, 1500, 1000), (800, 800, 0), (5000, 200, 200),
             (50, 40, 10)]
    for k in (256, 1024):
        for na, nb, overlap in cases:
            a = _keys(spark, "x", na)
            b = _keys(spark, "x", nb, start=na - overlap)
            sa, sb = theta_build(a, "key", k), theta_build(b, "key", k)
            merged = theta_union(sa, sb)
            direct = theta_build(a.unionAll(b), "key", k)
            assert merged == direct, (k, na, nb, overlap)


def test_union_all_fold_order_invariant(spark):
    parts = [_keys(spark, "p", 700, start=i * 500) for i in range(4)]
    sketches = [theta_build(p, "key", 256) for p in parts]
    direct = theta_build(parts[0].unionAll(parts[1]).unionAll(parts[2])
                         .unionAll(parts[3]), "key", 256)
    assert theta_union_all(sketches) == direct
    random.Random(7).shuffle(sketches)
    assert theta_union_all(sketches) == direct


def test_intersection_and_a_not_b_accuracy(spark):
    na, nb, overlap, k = 12000, 9000, 4000, 2048
    a = _keys(spark, "v", na)
    b = _keys(spark, "v", nb, start=na - overlap)
    sa, sb = theta_build(a, "key", k), theta_build(b, "key", k)
    tol = 6.0 / (k - 1) ** 0.5  # intersection error is over the UNION size
    inter = theta_estimate(theta_intersect(sa, sb))
    anb = theta_estimate(theta_a_not_b(sa, sb))
    union_n = na + nb - overlap
    assert abs(inter - overlap) < tol * union_n
    assert abs(anb - (na - overlap)) < tol * union_n
    # sample-exact identity: A restricted to the common theta splits
    # exactly into (A∩B) + (A\B)
    tc = min(sa.theta, sb.theta)
    restricted = (sum(1 for e in sa.entries if e < tc)
                  * (HASH_DOMAIN / tc))
    assert abs((inter + anb) - restricted) < 1e-6


def test_jaccard_estimate(spark):
    na, nb, overlap, k = 6000, 6000, 3000, 2048
    a = _keys(spark, "j", na)
    b = _keys(spark, "j", nb, start=na - overlap)
    jac = jaccard_estimate(theta_build(a, "key", k),
                           theta_build(b, "key", k))
    true = overlap / (na + nb - overlap)
    assert abs(jac - true) < 0.05
    empty = ThetaSketch((), HASH_DOMAIN, 64)
    assert jaccard_estimate(empty, empty) == 0.0


def test_grouped_build_equals_per_group(spark):
    df = (spark.range(5000)
          .select((F.col("id") % 3).cast("string").alias("g"),
                  F.concat(F.lit("m"), (F.col("id") % 1700)).alias("key")))
    grouped = theta_build_grouped(df, ["g"], "key", k=128)
    assert set(grouped) == {("0",), ("1",), ("2",)}
    for gv, sk in grouped.items():
        direct = theta_build(df.where(F.col("g") == gv[0]), "key", k=128)
        assert sk == direct, gv


def test_events_audience_overlap_vs_exact(spark):
    from tests.conftest import SF_DIR
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    by_type = theta_build_grouped(ev, ["event_type"], "user_id", k=512)
    types = sorted(t for (t,) in by_type)
    assert len(types) >= 2
    ta, tb = types[0], types[1]
    exact = (ev.where(F.col("event_type") == ta).select("user_id")
             .intersect(ev.where(F.col("event_type") == tb)
                        .select("user_id")).count())
    est = theta_estimate(theta_intersect(by_type[(ta,)], by_type[(tb,)]))
    denom = max(1, exact)
    assert abs(est - exact) / denom < 0.25 or abs(est - exact) < 20


def test_json_round_trip(spark):
    s = theta_build(_keys(spark, "u", 3000), "key", 128)
    assert ThetaSketch.from_json(s.to_json()) == s


def test_build_plan_is_take_ordered(spark):
    df = _keys(spark, "u", 1000)
    h = (df.select(F.shiftrightunsigned(F.xxhash64("key"), 1).alias("h"))
         .where(F.col("h").isNotNull()).distinct().orderBy("h").limit(129))
    plan = h._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_streaming_foreachbatch_fold_equals_batch(spark, tmpdir):
    """Per-microbatch sketches union-folded in foreachBatch are
    bit-identical to one batch build over all files — the consuming→
    immutable rollup path for the distinct-count sketch."""
    src = f"{tmpdir}/src"
    ckpt = f"{tmpdir}/ckpt"
    df = (spark.range(4000)
          .select(F.concat(F.lit("s"), (F.col("id") % 2500)).alias("key")))
    df.repartition(4).write.mode("overwrite").parquet(src)
    schema = T.StructType([T.StructField("key", T.StringType())])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    folded: list[ThetaSketch] = []

    def fold(batch_df, _bid):
        folded.append(theta_build(batch_df, "key", k=256))

    q = (stream.writeStream.foreachBatch(fold)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert len(folded) >= 2  # genuinely incremental
    batch = theta_build(spark.read.schema(schema).parquet(src), "key", 256)
    assert theta_union_all(folded) == batch


def test_theta_profile_one_pass_equals_per_column(spark):
    from realtime_olap_spark.operators.theta import theta_profile
    from tests.conftest import SF_DIR
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cols = ["lang", "source", "doc_id"]
    prof = theta_profile(docs, cols, k=512)
    assert set(prof) == set(cols)
    for c in cols:
        direct = theta_build(docs, F.col(c).cast("string"), k=512)
        assert prof[c] == direct, c  # same hash family, bit-identical
        exact = docs.select(c).na.drop().distinct().count()
        est = theta_estimate(prof[c])
        assert abs(est - exact) <= max(3, 4.0 * exact / (512 - 1) ** 0.5), c


def test_suggest_encodings(spark):
    from realtime_olap_spark.operators.theta import suggest_encodings
    df = (spark.range(4000)
          .select((F.col("id") % 5).cast("string").alias("lang"),
                  F.md5(F.col("id").cast("string")).alias("content")))
    got = suggest_encodings(df, ["lang", "content"], k=512)
    assert got == {"lang": "dictionary", "content": "raw"}


def test_sliding_distinct_exact_below_k(spark):
    """Trailing 7-day distinct users per day: with k above the key
    cardinality every sketch stays exact, so the window unions must
    EQUAL the exact trailing COUNT(DISTINCT) — and the bounds bracket
    it at small k."""
    import datetime as dt

    from realtime_olap_spark.operators.theta import sliding_distinct
    from tests.conftest import SF_DIR

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    DAY = 86400
    got = sliding_distinct(ev, "ts", F.col("user_id").cast("string"),
                           DAY, 7, k=65536)
    rows = ev.select(
        F.col("user_id"),
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.col("ts").cast("timestamp"))
         % (DAY * 1_000_000)).alias("b")).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["b"], set()).add(r["user_id"])
    assert len(got) == len(by_bucket) > 5
    for rec in got:
        b_us = int(rec["bucket"].timestamp() * 1_000_000)
        want = set()
        for bb, users in by_bucket.items():
            if b_us - 6 * DAY * 1_000_000 <= bb <= b_us:
                want |= users
        assert rec["estimate"] == float(len(want)), rec
    # small-k run: estimates may deviate but 4-sigma bounds must bracket
    small = sliding_distinct(ev, "ts", F.col("user_id").cast("string"),
                             DAY, 7, k=16)
    for rec, exact_rec in zip(small, got):
        assert rec["lo"] <= exact_rec["estimate"] <= rec["hi"], (rec, exact_rec)


def test_partial_topk_is_bounded_per_partition(spark):
    """r16 verdict item 3: the per-partition KMV partial must emit at
    most k+1 rows per partition (bounded state/exchange) and exactly the
    k+1 smallest distinct hashes of each partition."""
    from realtime_olap_spark.operators.theta import (_partial_topk_hashes,
                                                     theta_hash)

    df = _keys(spark, "u", 5000).repartition(4)
    src = (df.select(theta_hash("key").alias("h"))
           .where(F.col("h").isNotNull()))
    k1 = 17
    rows = (_partial_topk_hashes(src, k1)
            .withColumn("__pid", F.spark_partition_id()).collect())
    # mapInArrow emits one bounded batch per input partition
    from collections import Counter
    per_pid = Counter(r["__pid"] for r in rows)
    assert all(c <= k1 for c in per_pid.values()), per_pid
    # the union of partials contains the global k1 smallest distinct
    got_k1 = sorted({r["h"] for r in rows})[:k1]
    want = [r["h"] for r in
            src.distinct().orderBy("h").limit(k1).collect()]
    assert got_k1 == want


def test_grouped_build_handles_null_group_and_long_group(spark):
    """The mapInPandas grouped partial passes group values through as
    original-frame slices: NULL string group values and non-string
    (long) group columns must round-trip. (Nullable INT group columns
    arrive as pandas float keys — nan/7.0 — through the final toPandas,
    the same as every earlier build; callers use string/long keys.)"""
    rows = [(None, "a"), (None, "b"), ("g1", "a"), ("g1", "c"),
            ("g1", "a")]
    df = spark.createDataFrame(rows, "g string, key string")
    sk = theta_build_grouped(df, ["g"], "key", k=64)
    assert set(sk) == {(None,), ("g1",)}
    assert sk[(None,)] == theta_build(
        df.where(F.col("g").isNull()), "key", k=64)
    assert sk[("g1",)] == theta_build(
        df.where(F.col("g") == "g1"), "key", k=64)
    # long (non-null) group column round-trips as python ints
    dl = spark.createDataFrame([(5, "x"), (5, "y"), (9, "x")],
                               "g long, key string")
    skl = theta_build_grouped(dl, ["g"], "key", k=64)
    assert set(skl) == {(5,), (9,)}
    assert skl[(5,)] == theta_build(dl.where(F.col("g") == 5), "key",
                                    k=64)
