"""r17 hardening pins (r16 verdict item 8 + ADVICE items 1-3).

- Merged-percentile accuracy: the same-column percentile-family merge
  (groupby._merged_agg_columns) and the unmerged est/tdigest builders
  must share ONE accuracy constant, or the merged path silently diverges
  from a lone call the first time someone retunes a default.
- ngram_hash_set(str) treats the string as a COLUMN NAME (word_set
  convention) — a name that is a reserved word or contains operators
  must not be parsed as a SQL expression.
- quality_features marker literals are escaped, so a marker containing
  an apostrophe cannot break (or silently alter) the SQL twin.
- sqlexpr refuses to render under spark.sql.parser.escapedStringLiterals
  =true, where its backslash literals would mean different regexes.
"""

from __future__ import annotations

import inspect
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from realtime_olap_spark.operators.aggregation import (  # noqa: E402
    PERCENTILE_APPROX_ACCURACY, agg_percentile_est, agg_percentile_tdigest)


def test_percentile_accuracy_single_constant():
    """Every call site's unmerged builder defaults to the SAME accuracy
    constant the merged path uses (r16 verdict item 8)."""
    for fn in (agg_percentile_est, agg_percentile_tdigest):
        default = inspect.signature(fn).parameters["accuracy"].default
        assert default == PERCENTILE_APPROX_ACCURACY, fn.__name__
    # the merged path references the constant, not a literal
    import realtime_olap_spark.operators.groupby as G
    src = inspect.getsource(G._merged_agg_columns)
    assert "PERCENTILE_APPROX_ACCURACY" in src
    assert "10000" not in src


def test_merged_and_unmerged_percentile_est_agree(spark):
    """Value check behind the constant pin: a merged 2-percentile family
    equals two lone est calls on the same data."""
    from realtime_olap_spark.operators.groupby import _merged_agg_columns
    from realtime_olap_spark.operators.groupby import Agg

    df = spark.range(0, 500).select(
        (F.col("id") % 7).alias("v"))
    alist = [Agg("percentileest50", "v", "p50"),
             Agg("percentileest90", "v", "p90")]
    agg_cols, post = _merged_agg_columns(alist)
    merged = df.agg(*agg_cols).select(*post).first()
    lone50 = df.agg(agg_percentile_est("v", 50).alias("x")).first()["x"]
    lone90 = df.agg(agg_percentile_est("v", 90).alias("x")).first()["x"]
    assert merged["p50"] == lone50
    assert merged["p90"] == lone90


def test_ngram_hash_set_str_is_column_name(spark):
    """ADVICE #1: a str argument is a column name under the word_set
    convention — even when the name is a reserved word or contains an
    operator character, it must resolve to the column, not parse (or
    fail) as a SQL expression."""
    from realtime_olap_spark.operators.decontam import ngram_hash_set

    df = spark.createDataFrame(
        [("a b c d",)], "`select` string").withColumn(
        "a+b", F.col("`select`"))
    via_col = df.select(
        ngram_hash_set(F.col("`select`"), 2).alias("h")).first()["h"]
    for name in ["select", "a+b"]:
        got = df.select(ngram_hash_set(name, 2).alias("h")).first()["h"]
        assert got == via_col, name
    # the common plain-identifier case still matches the Column path
    df2 = spark.createDataFrame([("x y z",)], "text string")
    a = df2.select(ngram_hash_set("text", 2).alias("h")).first()["h"]
    b = df2.select(
        ngram_hash_set(F.col("text"), 2).alias("h")).first()["h"]
    assert a == b


def test_quality_marker_escaping(spark):
    """ADVICE #3: a marker containing an apostrophe renders as a valid,
    value-correct SQL literal (the fr profile could contain l')."""
    from realtime_olap_spark import sqlexpr as X

    orig = X.LANG_MARKERS["en"]
    X.LANG_MARKERS["en"] = ["l'", "the"]
    try:
        cols = X.quality_features_sql("text")
        row = (spark.createDataFrame([("l' the l' ok",)], "text string")
               .select(*cols).first())
        # 3 stopword tokens of 4: l', the, l'
        assert abs(row["stopword_ratio"] - 0.75) < 1e-12
    finally:
        X.LANG_MARKERS["en"] = orig


def test_sqlexpr_rejects_legacy_parser_mode(spark):
    """ADVICE #2: under escapedStringLiterals=true the twins would
    silently mean different regexes — the builders must raise instead."""
    from realtime_olap_spark import sqlexpr as X

    X._parser_conf_ok.clear()
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        with pytest.raises(RuntimeError, match="escapedStringLiterals"):
            X.words_sql("text")
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")
        X._parser_conf_ok.clear()
    # and the default mode passes + caches (second call, no raise)
    X.words_sql("text")
    X.words_sql("text")


def test_token_count_regexp_count_parity(spark):
    """token_count / bpe_ish_token_count now count matches via
    regexp_count instead of materializing token arrays — value-identical
    to the array forms on whitespace/punct/unicode edge cases."""
    from realtime_olap_spark.operators.text import (BPE_ISH_PATTERN,
                                                    bpe_ish_token_count,
                                                    token_count, words)

    rows = [("",), ("   ",), ("a",), (" a  b\tc\nd ",),
            ("Hello, WORLD!! a1b2 3.14 -- x_y",),
            ("tab\t\tdouble  space\r\nmix",), ("1+1=2; 'quoted'",)]
    df = spark.createDataFrame(rows, "text string")
    got = df.select(
        token_count(F.col("text")).alias("nt"),
        bpe_ish_token_count(F.col("text")).alias("nb")).collect()
    want = df.select(
        F.size(words(F.col("text"))).alias("nt"),
        F.size(F.regexp_extract_all(
            F.col("text"), F.lit(BPE_ISH_PATTERN), 0)).alias("nb")
    ).collect()
    assert got == want
