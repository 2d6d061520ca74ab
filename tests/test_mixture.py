"""Temperature mixture sampling — exact DuckDB differential at α=1 (pure
division, bit-stable across engines), numpy-reference equality for general
α, and the mixture-shape properties (α→0 flattens, α→1 is proportional,
rates cap at 1, realized tokens track the target)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.mixture import (apply_mixture_rates,
                                                   temperature_mixture_rates,
                                                   temperature_mixture_sample)
from tests.conftest import SF_DIR, assert_matches_oracle

_NTOK = (r"CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), "
         r"x -> x != '')) AS BIGINT)")


def _docs(spark):
    d = Catalog(spark, SF_DIR).table("documents")
    return d.select(
        "doc_id", "source",
        F.size(F.filter(F.split(F.lower("text"), r"\s+"),
                        lambda w: w != "")).cast("long").alias("ntok"))


def test_rates_alpha1_match_duckdb(spark, duck):
    """α=1: weight = n_s/N and rate = min(1, target/N) — one division,
    IEEE-exact in both engines, so the rate table hash-matches."""
    target = 20_000.0
    out = temperature_mixture_rates(_docs(spark), "source", "ntok",
                                    alpha=1.0, target_tokens=target)
    assert_matches_oracle(out, duck(SF_DIR), f"""
        WITH toks AS (SELECT source, {_NTOK} AS ntok FROM documents),
        totals AS (SELECT source, SUM(ntok) AS group_tokens FROM toks
                   GROUP BY source),
        z AS (SELECT SUM(CAST(group_tokens AS DOUBLE) ** 1.0) AS zz
              FROM totals)
        SELECT source, CAST(group_tokens AS BIGINT) AS group_tokens,
               CAST(group_tokens AS DOUBLE) ** 1.0 / zz AS weight,
               least(1.0, {target} * (CAST(group_tokens AS DOUBLE) ** 1.0 / zz)
                          / CAST(group_tokens AS DOUBLE)) AS rate
        FROM totals, z
        """, name="mixture_rates_alpha1")


def test_rates_match_numpy_reference(spark):
    """General α: Spark's rate table equals the same formula computed with
    Python floats (same IEEE ops, same order via sorted groups)."""
    docs = _docs(spark)
    totals = {r["source"]: r["t"] for r in
              docs.groupBy("source").agg(F.sum("ntok").alias("t")).collect()}
    for alpha, target in ((0.0, 5_000.0), (0.5, 20_000.0), (0.7, 1e9)):
        got = {r["source"]: r for r in
               temperature_mixture_rates(docs, "source", "ntok", alpha,
                                         target).collect()}
        z = sum(t ** alpha for t in totals.values())
        assert set(got) == set(totals)
        for s, t in totals.items():
            w = t ** alpha / z
            rate = min(1.0, target * w / t)
            assert math.isclose(got[s]["weight"], w, rel_tol=1e-12), (s, alpha)
            assert math.isclose(got[s]["rate"], rate, rel_tol=1e-12), (s, alpha)
            assert 0.0 <= got[s]["rate"] <= 1.0


def test_alpha_temperature_shape(spark):
    """α=0 gives every source the same weight; α between 0 and 1 gives a
    small source MORE weight than proportional but never more than
    uniform; rates at a huge target cap at 1."""
    docs = _docs(spark)
    r0 = temperature_mixture_rates(docs, "source", "ntok", 0.0, 1.0).collect()
    weights0 = {r["source"]: r["weight"] for r in r0}
    assert all(math.isclose(w, 1.0 / len(weights0), rel_tol=1e-9)
               for w in weights0.values())

    r1 = {r["source"]: r["weight"] for r in
          temperature_mixture_rates(docs, "source", "ntok", 1.0, 1.0).collect()}
    rh = {r["source"]: r["weight"] for r in
          temperature_mixture_rates(docs, "source", "ntok", 0.5, 1.0).collect()}
    smallest = min(r1, key=r1.get)
    assert r1[smallest] < rh[smallest] < weights0[smallest] + 1e-12

    capped = temperature_mixture_rates(docs, "source", "ntok", 0.5, 1e12)
    assert all(r["rate"] == 1.0 for r in capped.collect())


def test_sample_is_deterministic_and_tracks_target(spark):
    """The realized sample is identical across two runs (content-hash
    decisions), keeps only whole groups' members at rate 1, and realizes
    the token target within hash noise (±20%)."""
    docs = _docs(spark).cache()
    target = float(docs.agg(F.sum("ntok")).first()[0]) * 0.3
    a = temperature_mixture_sample(docs, "source", "doc_id", "ntok",
                                   0.5, target)
    ids1 = {r["doc_id"] for r in a.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in a.select("doc_id").collect()}
    assert ids1 == ids2 and ids1
    realized = a.agg(F.sum("ntok")).first()[0]
    assert 0.8 * target <= realized <= 1.2 * target

    flagged = apply_mixture_rates(
        docs, "source", "doc_id",
        temperature_mixture_rates(docs, "source", "ntok", 0.5, target),
        decision_col="keep")
    assert flagged.count() == docs.count()
    kept = {r["doc_id"] for r in
            flagged.where("keep").select("doc_id").collect()}
    assert kept == ids1
    docs.unpersist()


def test_unmatched_and_null_rate_groups_get_concrete_false(spark):
    """Groups missing from the rate table, and groups whose rate is NULL
    (zero-token group → 0/0), must flag keep=false — not vanish through an
    inner join, not emit NULL (r5 advisory)."""
    docs = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "ghost", 10), (4, "zero", 10)],
        ["doc_id", "source", "ntok"])
    rates = spark.createDataFrame(
        [("a", 10, 0.5, 1.0), ("b", 10, 0.5, 1.0),
         ("zero", 0, None, None)],
        "source string, group_tokens long, weight double, rate double")
    flagged = apply_mixture_rates(docs, "source", "doc_id", rates,
                                  decision_col="keep")
    rows = {r["doc_id"]: r["keep"] for r in flagged.collect()}
    assert set(rows) == {1, 2, 3, 4}          # no row lost
    assert rows[1] is True and rows[2] is True
    assert rows[3] is False and rows[4] is False  # concrete, never NULL
    # and the filtering path drops exactly those rows
    kept = {r["doc_id"] for r in
            apply_mixture_rates(docs, "source", "doc_id", rates).collect()}
    assert kept == {1, 2}


def test_rates_broadcast_into_scan(spark):
    """Applying rates must broadcast the rate table — the corpus is never
    exchanged for the mix decision."""
    docs = _docs(spark)
    out = temperature_mixture_sample(docs, "source", "doc_id", "ntok",
                                     0.5, 10_000.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
