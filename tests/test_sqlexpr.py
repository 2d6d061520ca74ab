"""sqlexpr twins must be the SAME expression tree as their Column
builders: optimized-plan equality modulo auto-generated lambda-variable
names, plus value bit-equality on the real corpus. A twin that drifts
from its builder fails here before it can drift a query result."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark import sqlexpr as X
from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators import decontam as DC
from realtime_olap_spark.operators import importance as IMP
from realtime_olap_spark.operators import text as TX
from realtime_olap_spark.operators.dedup import word_hash60, word_set

from conftest import SF_DIR

_LAMBDA_VAR = re.compile(r"lambda `?\w+`?#\d+[L]?")
_EXPR_ID = re.compile(r"#\d+[L]?")


def _norm_plan(df) -> str:
    s = df._jdf.queryExecution().optimizedPlan().toString()
    s = _LAMBDA_VAR.sub("lambda V", s)
    return _EXPR_ID.sub("#N", s)


def _docs(spark):
    return Catalog(spark, SF_DIR).table("documents")


def _assert_twin(spark, col_version, sql_version, check_values=True):
    d = _docs(spark)
    a = d.select(col_version.alias("v"))
    b = d.select(sql_version.alias("v"))
    assert _norm_plan(a) == _norm_plan(b)
    if check_values:
        assert a.collect() == b.collect()


@pytest.mark.parametrize("n", [2, 3])
def test_word_ngrams_twin(spark, n):
    _assert_twin(spark, TX.word_ngrams(F.col("text"), n),
                 F.expr(X.word_ngrams_sql("text", n)))


def test_words_twin(spark):
    _assert_twin(spark, TX.words(F.col("text")),
                 F.expr(X.words_sql("text")))


def test_ngram_hash_set_twin(spark):
    _assert_twin(spark, DC.ngram_hash_set(F.col("text"), 3),
                 F.expr(X.ngram_hash_set_sql("text", 3)))


def test_doc_grams_twin(spark):
    _assert_twin(spark, IMP.doc_grams(F.col("text")),
                 F.expr(X.doc_grams_sql("text")))


def test_gram_buckets_md5_twin(spark):
    _assert_twin(spark, IMP.gram_buckets_md5(F.col("text"), 1024),
                 F.expr(X.gram_buckets_md5_sql("text", 1024)))


def test_favored_hits_twin(spark):
    favored = [(i * 7 + 3) % 2 for i in range(1024)]
    _assert_twin(spark, IMP.favored_hits(F.col("text"), favored),
                 F.expr(X.favored_hits_sql("text", favored)))


def test_quality_features_twin(spark):
    d = _docs(spark)
    a = d.select(*TX.quality_features(F.col("text")))
    b = d.select(*X.quality_features_sql("text"))
    assert _norm_plan(a) == _norm_plan(b)
    assert a.collect() == b.collect()


def test_rolling_fingerprint_twin(spark):
    _assert_twin(
        spark, TX.rolling_fingerprint(F.col("text")),
        F.expr(X.rolling_fingerprint_sql("text", TX.FINGERPRINT_MOD)))


def test_word_set_and_hash_twin(spark):
    _assert_twin(spark, word_set(F.col("text")),
                 F.expr(X.word_set_sql("text")))
    _assert_twin(spark,
                 F.transform(word_set(F.col("text")),
                             lambda w: word_hash60(w)),
                 F.expr(f"transform({X.word_set_sql('text')}, "
                        f"w -> {X.word_hash60_sql('w')})"))


def test_simhash_fp_twin(spark):
    d = _docs(spark).select(
        "doc_id",
        F.transform(word_set(F.col("text")),
                    lambda w: word_hash60(w)).alias("__wh"))
    wh = F.col("__wh")
    n = F.size(wh)
    fp = None
    for j in range(16):
        cnt = F.aggregate(
            wh, F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, j).bitwiseAND(F.lit(1)))
        term = F.when(cnt * 2 > n, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    a = d.select(fp.cast("long").alias("v"))
    b = d.select(F.expr(X.simhash_fp_sql("__wh", 16)).alias("v"))
    assert _norm_plan(a) == _norm_plan(b)
    assert a.collect() == b.collect()
