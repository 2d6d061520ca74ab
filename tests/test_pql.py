"""Unit tests for the PQL front end: parser IR shape (Pql2CompilerTest.java
analog), defaults, and response shaping."""

from __future__ import annotations

import pytest

from realtime_olap_spark.plans.pql import (BoolOp, Between, Cmp, Func, Ident,
                                           In, Lit, PQLEngine, RegexpLike,
                                           parse_pql)
from tests.conftest import SF_DIR


def test_parse_selection_defaults():
    q = parse_pql("SELECT a, b FROM t")
    assert q.table == "t"
    assert q.select == [(Ident("a"), None), (Ident("b"), None)]
    assert q.limit is None and q.top is None and not q.is_aggregation


def test_parse_star():
    q = parse_pql("SELECT * FROM t LIMIT 5")
    assert q.select == [(Ident("*"), None)] and q.limit == (0, 5)


def test_parse_limit_offset():
    q = parse_pql("SELECT a FROM t LIMIT 20, 30")
    assert q.limit == (20, 30)


def test_parse_infix_compiles_to_functions():
    q = parse_pql("SELECT a + b * 2 FROM t")
    assert q.select[0][0] == Func("add", (Ident("a"), Func("mult", (Ident("b"), Lit(2)))))


def test_parse_filter_tree():
    q = parse_pql("SELECT a FROM t WHERE (x = 1 AND y <> 'z') OR w BETWEEN 2 AND 3")
    p = q.where
    assert isinstance(p, BoolOp) and p.op == "OR"
    assert isinstance(p.operands[0], BoolOp) and p.operands[0].op == "AND"
    assert p.operands[0].operands[0] == Cmp("=", Ident("x"), Lit(1))
    assert p.operands[1] == Between(Ident("w"), Lit(2), Lit(3))


def test_parse_in_notin_regexp():
    q = parse_pql("SELECT a FROM t WHERE a IN (1, 2) AND b NOT IN ('x') "
                  "AND REGEXP_LIKE(c, '^r.*')")
    ops = q.where.operands
    assert ops[0] == In(Ident("a"), (1, 2))
    assert ops[1] == In(Ident("b"), ("x",), negated=True)
    assert ops[2] == RegexpLike(Ident("c"), "^r.*")


def test_parse_aggregation_with_top():
    q = parse_pql("SELECT flag, sum(qty) FROM t GROUP BY flag TOP 7")
    assert q.is_aggregation and q.top == 7
    assert q.group_by == [Ident("flag")]


def test_parse_percentile_names():
    q = parse_pql("SELECT percentile95(x), percentiletdigest50(y) FROM t")
    assert q.is_aggregation


def test_parse_escaped_quote():
    q = parse_pql("SELECT a FROM t WHERE b = 'it''s'")
    assert q.where == Cmp("=", Ident("a" if False else "b"), Lit("it's"))


def test_parse_error_is_clean():
    with pytest.raises(ValueError, match="PQL"):
        parse_pql("SELECT FROM t")
    with pytest.raises(ValueError, match="PQL"):
        parse_pql("SELECT a FROM t WHERE ???")


def test_execute_selection_default_limit(spark):
    eng = PQLEngine(spark, SF_DIR)
    res = eng.execute("SELECT l_orderkey FROM lineitem")
    assert len(res["selectionResults"]["results"]) == 10  # request.thrift:130-131


def test_execute_scalar_aggregation_response(spark):
    eng = PQLEngine(spark, SF_DIR)
    res = eng.execute("SELECT count(*) FROM lineitem")
    assert res["aggregationResults"][0]["function"] == "count_star"
    assert res["aggregationResults"][0]["value"] == 6000


def test_execute_groupby_response_shape(spark):
    eng = PQLEngine(spark, SF_DIR)
    res = eng.execute("SELECT l_returnflag, count(*) FROM lineitem GROUP BY l_returnflag")
    agg = res["aggregationResults"][0]
    assert agg["groupByColumns"] == ["l_returnflag"]
    assert 1 <= len(agg["groupByResult"]) <= 10
    # TOP ordering: values descending (reference orders by aggregate desc)
    vals = [g["value"] for g in agg["groupByResult"]]
    assert vals == sorted(vals, reverse=True)


def test_execute_valuein_and_timeconvert(spark):
    eng = PQLEngine(spark, SF_DIR)
    df = eng.dataframe(
        "SELECT timeconvert(l_partkey, 'DAYS', 'HOURS') FROM lineitem LIMIT 3")
    assert df.collect()[0][0] % 24 == 0


def test_execute_groupby_topn_is_per_function(spark):
    """Reference TOP semantics (docs/pql_examples.rst:239-258): every
    aggregation function returns its OWN top-n groups ordered by that
    function's value desc — the lists can rank groups differently."""
    from realtime_olap_spark.plans.pql import PQLEngine
    from tests.conftest import SF_DIR

    out = PQLEngine(spark, SF_DIR).execute(
        "SELECT l_linenumber, sum(l_quantity), min(l_extendedprice) "
        "FROM lineitem GROUP BY l_linenumber TOP 3")
    results = {r["function"]: r["groupByResult"] for r in out["aggregationResults"]}
    assert set(results) == {"sum_l_quantity", "min_l_extendedprice"}
    for fn, groups in results.items():
        assert len(groups) == 3
        vals = [g["value"] for g in groups]
        assert vals == sorted(vals, reverse=True)


def test_execute_reports_scan_stats(spark):
    """BrokerResponse-style stats come from real executed-plan metrics."""
    from realtime_olap_spark.plans.pql import PQLEngine
    from tests.conftest import SF_DIR

    out = PQLEngine(spark, SF_DIR).execute(
        "SELECT count(*) FROM lineitem WHERE l_returnflag = 'R'")
    assert out["totalDocs"] and out["totalDocs"] > 0
    assert out["numDocsScanned"] is not None
    assert out["numDocsScanned"] <= out["totalDocs"]
    # the filter actually filtered
    assert out["numDocsScanned"] < out["totalDocs"]


def test_execute_reports_full_broker_stat_block(spark):
    """The complete BrokerResponseNative stat block on a FILTERED GROUP-BY
    (BaseBrokerRequestHandler.java:114 fills all of these): entry counts
    derive from filter input rows x predicate columns and docs x ReadSchema
    width; segments = parquet files post pruning; servers = executors."""
    from realtime_olap_spark.plans.pql import PQLEngine
    from tests.conftest import SF_DIR

    out = PQLEngine(spark, SF_DIR).execute(
        "SELECT sum(l_quantity) FROM lineitem WHERE l_returnflag = 'R' "
        "GROUP BY l_linestatus TOP 5")
    total, scanned = out["totalDocs"], out["numDocsScanned"]
    assert total > 0 and 0 < scanned < total
    # filter phase read >= one column value per input doc
    assert out["numEntriesScannedInFilter"] >= total
    # post-filter entries = surviving docs x pruned-scan width (>0 cols)
    assert out["numEntriesScannedPostFilter"] >= scanned
    assert out["numEntriesScannedPostFilter"] % scanned == 0
    width = out["numEntriesScannedPostFilter"] // scanned
    assert 1 <= width <= 4  # column pruning kept the scan narrow
    assert out["numSegmentsQueried"] >= 1
    assert out["numSegmentsProcessed"] == out["numSegmentsQueried"]
    assert out["numSegmentsMatched"] == out["numSegmentsProcessed"]
    assert out["numServersQueried"] == out["numServersResponded"] >= 1
    assert out["totalTimeMs"] >= 0


def test_parse_is_null_rejected_with_pinot_shape():
    """IS [NOT] NULL parses (PQL2.g4 isClause) then rejects with the
    unsupported-operation message — the IR has no null predicate
    (request.thrift:25-34) — not a token-level syntax error."""
    import pytest

    for pql, frag in [
        ("SELECT count(*) FROM events WHERE props IS NULL", "IS NULL"),
        ("SELECT count(*) FROM events WHERE props IS NOT NULL", "IS NOT NULL"),
    ]:
        with pytest.raises(ValueError, match="Unsupported filter operator"):
            parse_pql(pql)
        with pytest.raises(ValueError, match=frag):
            parse_pql(pql)
    # a malformed IS clause is still a parse error, not the rejection
    with pytest.raises(ValueError, match="expected"):
        parse_pql("SELECT count(*) FROM events WHERE props IS 3")


def test_exact_segments_matched_opt_in(spark, tmp_path):
    """``execute(..., exact_segments=True)`` replaces the bounded
    numSegmentsMatched with the exact count of parquet files that produced
    at least one post-filter row (one extra column-pruned scan with
    input_file_name() above the filtered scan).

    A 4-file table where the predicate matches rows in exactly 2 files
    distinguishes exact from the bound: the default path reports
    files-processed (4) when anything matched; the exact path reports 2."""
    import os

    from realtime_olap_spark.plans.pql import PQLEngine, exact_segments_matched
    from pyspark.sql import functions as F

    path = str(tmp_path / "lineitem")
    # 4 files keyed by bucket; l_returnflag matches only buckets 0 and 1
    df = spark.range(0, 400).select(
        (F.col("id") % 4).alias("bucket"),
        F.when(F.col("id") % 4 < 2, F.lit("R")).otherwise(F.lit("N"))
        .alias("l_returnflag"),
        F.col("id").alias("l_quantity"))
    df.repartition("bucket").write.partitionBy("bucket").parquet(path)
    os.makedirs(str(tmp_path / "as_table"), exist_ok=True)
    spark.read.parquet(path).write.mode("overwrite") \
        .parquet(str(tmp_path / "as_table" / "lineitem.parquet"))

    eng = PQLEngine(spark, str(tmp_path / "as_table"))
    src = eng.catalog.table("lineitem")
    n_files = src.select(F.input_file_name()).distinct().count()
    assert n_files >= 2  # multi-file table, else the probe proves nothing

    exact = exact_segments_matched(src, F.col("l_returnflag") == "R")
    by_hand = (src.where(F.col("l_returnflag") == "R")
               .select(F.input_file_name().alias("f")).distinct().count())
    assert exact == by_hand
    assert exact < n_files  # the bound would have said n_files

    out = eng.execute(
        "SELECT count(*) FROM lineitem WHERE l_returnflag = 'R'",
        exact_segments=True)
    assert out["numSegmentsMatched"] == exact
    assert out["numSegmentsProcessed"] >= exact
    # no predicate: every file with rows matches
    out_all = eng.execute("SELECT count(*) FROM lineitem",
                          exact_segments=True)
    assert out_all["numSegmentsMatched"] == n_files
