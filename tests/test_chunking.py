"""Document chunking — DuckDB differential on the real corpus plus the
coverage/overlap invariants the sliding-window construction promises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators.chunking import chunk_documents
from tests.conftest import SF_DIR, assert_matches_oracle

_WS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x != '')"


def _oracle(chunk: int, overlap: int) -> str:
    stride = chunk - overlap
    return f"""
WITH t AS (SELECT doc_id, {_WS} AS ws, len({_WS}) AS n FROM documents),
c AS (SELECT doc_id, ws, n,
             unnest(generate_series(0,
                 CAST(ceil(greatest(n - {chunk}, 0) / {stride}.0) AS INT)))
               AS chunk_idx
      FROM t WHERE n > 0)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       array_to_string(list_slice(ws, chunk_idx * {stride} + 1,
                                  chunk_idx * {stride} + {chunk}), ' ')
         AS chunk_text,
       CAST(least({chunk}, n - chunk_idx * {stride}) AS BIGINT)
         AS chunk_ntok
FROM c
"""


@pytest.mark.parametrize("chunk,overlap", [(16, 0), (16, 4), (7, 3)])
def test_chunks_match_duckdb(spark, duck, chunk, overlap):
    d = Catalog(spark, SF_DIR).table("documents")
    out = chunk_documents(d, "doc_id", "text", chunk, overlap)
    assert_matches_oracle(out, duck(SF_DIR), _oracle(chunk, overlap),
                          name=f"chunks_{chunk}_{overlap}")


def test_chunk_invariants(spark):
    """Every token covered exactly once net of overlap; consecutive chunks
    share exactly `overlap` tokens; only the final chunk may be short;
    short docs give one chunk; empty docs give none."""
    chunk, overlap = 12, 5
    stride = chunk - overlap
    d = Catalog(spark, SF_DIR).table("documents")
    ntok = d.select(
        "doc_id",
        F.size(F.filter(F.split(F.lower("text"), r"\s+"),
                        lambda w: w != "")).alias("n"))
    chunks = chunk_documents(d, "doc_id", "text", chunk, overlap)
    per_doc = (chunks.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_chunks"),
                    F.sum("chunk_ntok").alias("tok_sum"),
                    F.max("chunk_idx").alias("max_idx"),
                    F.sum(F.when(F.col("chunk_ntok") < chunk, 1).otherwise(0))
                    .alias("n_short"))
               .join(ntok, "doc_id"))
    bad = per_doc.where(
        (F.col("max_idx") != F.col("n_chunks") - 1)
        | (F.col("n_short") > 1)
        # total chunk tokens = n + overlap re-counted per extra chunk
        | (F.col("tok_sum") != F.col("n")
           + (F.col("n_chunks") - 1) * overlap)).count()
    assert bad == 0

    edge = spark.createDataFrame(
        [("a", "one two three"), ("b", ""), ("c", "   "),
         ("d", " ".join(f"w{i}" for i in range(30)))],
        ["doc_id", "text"])
    got = {(r["doc_id"], r["chunk_idx"]): r
           for r in chunk_documents(edge, "doc_id", "text", chunk,
                                    overlap).collect()}
    assert ("a", 0) in got and got[("a", 0)]["chunk_ntok"] == 3
    assert not any(k[0] == "b" or k[0] == "c" for k in got)
    # 30 tokens, stride 7: chunks at 0,7,14,21 → 4 chunks (last covers 21..30)
    d_chunks = sorted(k[1] for k in got if k[0] == "d")
    assert d_chunks == [0, 1, 2, 3]
    first = got[("d", 0)]["chunk_text"].split()
    second = got[("d", 1)]["chunk_text"].split()
    assert first[-overlap:] == second[:overlap]  # exact overlap
    assert got[("d", 3)]["chunk_ntok"] == 30 - 3 * stride
