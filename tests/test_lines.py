"""Line-level curation (operators/lines.py) — DuckDB differential for the
corpus-wide duplicate-line removal, plus the C4 line-filter contracts and
the composition/idempotence properties the operators promise.

Multi-line documents are derived from the real corpus (the synthetic
texts are single-line): each document's word soup is re-joined into
8-word lines, which the tiny vocabulary makes naturally duplicate-heavy
across documents — the boilerplate shape line dedup exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.lines import (
    c4_line_filter,
    dedup_duplicate_lines,
    doc_lines,
    duplicate_line_removals,
)
from tests.conftest import SF_DIR, assert_matches_oracle

_WORDS_PER_LINE = 8


def _lined_docs(spark, sf_dir=SF_DIR):
    """documents with text rebuilt as newline-joined 8-word lines."""
    d = Catalog(spark, sf_dir).table("documents")
    ws = F.filter(F.split(F.col("text"), r"\s+", -1), lambda w: w != "")
    n_lines = F.ceil(F.size(ws) / F.lit(_WORDS_PER_LINE)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(
            F.slice(ws, i * _WORDS_PER_LINE + 1, _WORDS_PER_LINE), " "))
    return d.where(F.size(ws) > 0).select(
        "doc_id", F.array_join(lines, "\n").alias("text"))


@pytest.fixture(scope="module")
def lined(spark, tmp_path_factory):
    """The multi-line corpus written once, so Spark and DuckDB read the
    IDENTICAL bytes (no cross-engine re-derivation drift)."""
    path = str(tmp_path_factory.mktemp("lines") / "docs.parquet")
    _lined_docs(spark).write.mode("overwrite").parquet(path)
    return path


# DuckDB twin of doc_lines: trimmed, non-empty lines
_DLINES = ("list_filter(list_transform(string_split(text, chr(10)), "
           "s -> trim(s)), s -> s != '')")


def _dedup_oracle(path: str, min_count: int, keep: str) -> str:
    """Duplicate-line removal in DuckDB: group occurrences by the line
    STRING (Spark groups by xxhash64 — identical absent collisions),
    canonical occurrence = min (doc_id, pos) encoded as one key."""
    keep_pred = ("AND o.ckey != d.canon" if keep == "first" else "")
    return f"""
WITH docs AS (SELECT doc_id, {_DLINES} AS lines
              FROM read_parquet('{path}/*.parquet')),
occ AS (
  SELECT doc_id, u.s.pos AS pos, u.s.line AS line,
         doc_id * 1000000 + u.s.pos AS ckey
  FROM docs, UNNEST(list_transform(lines,
       (x, i) -> {{'pos': i - 1, 'line': x}})) AS u(s)),
dup AS (SELECT line, min(ckey) AS canon FROM occ
        GROUP BY line HAVING count(*) >= {min_count}),
drops AS (
  SELECT o.doc_id, list_sort(list(o.pos)) AS drop_pos
  FROM occ o JOIN dup d ON o.line = d.line {keep_pred}
  GROUP BY o.doc_id)
SELECT docs.doc_id,
       COALESCE(array_to_string(
         list_transform(
           list_filter(list_transform(lines,
               (x, i) -> {{'pos': i - 1, 'line': x}}),
             s -> NOT list_contains(COALESCE(drop_pos, []), s.pos)),
           s -> s.line), chr(10)), '') AS text
FROM docs LEFT JOIN drops ON docs.doc_id = drops.doc_id
"""


@pytest.mark.parametrize("keep", ["first", "none"])
def test_dedup_lines_matches_duckdb(spark, duck, lined, keep):
    docs = spark.read.parquet(lined)
    out = dedup_duplicate_lines(docs, "doc_id", "text", keep=keep)
    con = duck(SF_DIR)
    assert_matches_oracle(out.select("doc_id", "text"), con,
                          _dedup_oracle(lined, 2, keep),
                          name=f"dedup_lines_{keep}")


def test_corpus_actually_has_duplicate_lines(spark, lined):
    docs = spark.read.parquet(lined)
    removals = duplicate_line_removals(docs, "doc_id", "text")
    assert removals.count() > 0, (
        "test corpus produced no duplicate lines — the differential "
        "proves nothing; lower _WORDS_PER_LINE")


def test_keep_first_keeps_exactly_one_occurrence(spark, lined):
    docs = spark.read.parquet(lined)
    out = dedup_duplicate_lines(docs, "doc_id", "text", keep="first")
    after = (out.select(F.explode(doc_lines(F.col("text"))).alias("line"))
             .groupBy("line").count())
    # every line that was duplicated now occurs exactly once
    assert after.where(F.col("count") >= 2).count() == 0


def test_keep_none_removes_all_duplicated_occurrences(spark, lined):
    docs = spark.read.parquet(lined)
    before = (docs.select(F.explode(doc_lines(F.col("text"))).alias("line"))
              .groupBy("line").count())
    dup_lines = {r["line"] for r in
                 before.where(F.col("count") >= 2).collect()}
    out = dedup_duplicate_lines(docs, "doc_id", "text", keep="none")
    surviving = {r["line"] for r in
                 out.select(F.explode(doc_lines(F.col("text")))
                            .alias("line")).distinct().collect()}
    assert not (surviving & dup_lines)


def test_dedup_lines_idempotent(spark, lined):
    once = dedup_duplicate_lines(spark.read.parquet(lined),
                                 "doc_id", "text", keep="first")
    twice = dedup_duplicate_lines(once, "doc_id", "text", keep="first")
    assert (once.select("doc_id", "text").exceptAll(
        twice.select("doc_id", "text")).count() == 0)
    assert once.count() == twice.count()


def test_dedup_preserves_document_identity_and_line_order(spark, lined):
    docs = spark.read.parquet(lined)
    out = dedup_duplicate_lines(docs, "doc_id", "text", keep="first")
    assert out.count() == docs.count()  # lossless on identity
    # surviving lines are a subsequence of the original lines
    joined = (docs.select("doc_id", doc_lines(F.col("text")).alias("orig"))
              .join(out.select("doc_id",
                               doc_lines(F.col("text")).alias("kept")),
                    "doc_id"))
    bad = joined.where(
        F.size(F.array_except("kept", "orig")) > 0).count()
    assert bad == 0


def test_c4_line_filter_rules(spark):
    rows = [
        (1, "one two three.\nshort\nenable javascript to view\n"
            "a decent length line here"),
        (2, "tiny\nx y"),  # everything under min_words
        (3, "Cookie consent required words words\nreal content line kept"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = c4_line_filter(docs, "text", min_words=3).collect()
    by_id = {r["doc_id"]: r["text"] for r in out}
    assert by_id[1] == "one two three.\na decent length line here"
    assert 2 not in by_id  # zero surviving lines -> doc dropped
    assert by_id[3] == "real content line kept"


def test_c4_terminal_punct_and_min_lines(spark):
    rows = [(1, "ends with period three.\nno terminal punct here\n"
                "ends with bang three!")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = c4_line_filter(docs, "text", min_words=3,
                         require_terminal_punct=True).collect()
    assert out[0]["text"] == "ends with period three.\nends with bang three!"
    # min_lines=3 drops the doc (only 2 lines survive)
    assert c4_line_filter(docs, "text", min_words=3,
                          require_terminal_punct=True,
                          min_lines=3).count() == 0


def test_line_dedup_plan_is_scan_side_on_corpus(spark, lined):
    """The corpus side must not shuffle: the only Exchanges in the plan
    hang off the (hash, id, pos) removal computation, and the final join
    is a BroadcastHashJoin against the removal lists."""
    docs = spark.read.parquet(lined)
    out = dedup_duplicate_lines(docs, "doc_id", "text", keep="first")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # force the shuffled path and confirm it is available
    out2 = dedup_duplicate_lines(docs, "doc_id", "text", keep="first",
                                 broadcast_removals=False)
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan2 or "ShuffledHashJoin" in plan2


def test_cms_gate_preserves_line_dedup_exactly(spark):
    """Gated duplicate-line removal ≡ ungated: the sketch never
    undercounts, so no qualifying line is lost, and every occurrence of
    a qualifying line passes the gate, so counts/canon stay complete."""
    from realtime_olap_spark.operators.cms import cms_build
    from realtime_olap_spark.operators.lines import (
        dedup_duplicate_lines, doc_lines)

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text")
            .withColumn("text", F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.col("text"), F.lit("\nBOILER FOOTER")))
                .otherwise(F.col("text"))))
    lines = docs.select(F.explode(doc_lines(F.col("text"))).alias("line"))
    sk = cms_build(lines, "line", width=4096, depth=4)
    for keep in ("first", "none"):
        want = sorted(map(tuple, dedup_duplicate_lines(
            docs, "doc_id", "text", min_count=3, keep=keep).collect()))
        got = sorted(map(tuple, dedup_duplicate_lines(
            docs, "doc_id", "text", min_count=3, keep=keep,
            gate=sk).collect()))
        assert got == want, keep
