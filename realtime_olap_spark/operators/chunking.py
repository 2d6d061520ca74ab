"""Document chunking — fixed-token sliding windows for RAG / embedding
pipelines.

Splits every document into chunks of ``chunk_tokens`` whitespace tokens
with ``overlap_tokens`` of overlap (stride = chunk − overlap). Chunk
boundaries are pure token arithmetic — deterministic, engine-independent,
and (unlike sentence-split heuristics) exactly mirrorable in SQL, so the
operator carries a DuckDB differential like every other curation pass.

Scale design: chunking is a scan-side array expression (split → sequence
of starts → slice per start) followed by ``posexplode`` — no shuffle, no
UDF, no state. Output size is input size × ~(1/stride) amplification; the
explode pipelines straight into whatever embeds or writes the chunks, so
at 100 TB the cost is the scan plus the downstream operator. An empty
document yields zero chunks; a document shorter than one chunk yields
exactly one.

Chunk-count discipline: ``n_chunks = 1 + ceil(max(n − chunk, 0) /
stride)`` — every token is covered, the final chunk is the only one that
may be short, and consecutive chunks share exactly ``overlap_tokens``
tokens (the standard retrieval-window construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_olap_spark.operators.text import words


def chunk_spans(text: Column, chunk_tokens: int,
                overlap_tokens: int = 0) -> Column:
    """Array of ``struct<chunk_text, chunk_ntok>`` sliding windows over the
    whitespace tokens of ``text``."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap_tokens}) < chunk ({chunk_tokens})")
    stride = chunk_tokens - overlap_tokens
    ws = words(text)
    n = F.size(ws)
    n_chunks = (F.lit(1)
                + F.ceil(F.greatest(n - chunk_tokens, F.lit(0))
                         / F.lit(stride)).cast("int"))
    starts = F.when(n > 0, F.sequence(F.lit(0), n_chunks - 1)) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts,
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(ws, i * stride + 1, chunk_tokens))
            .alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - i * stride)
            .cast("long").alias("chunk_ntok")))


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int, overlap_tokens: int = 0) -> DataFrame:
    """One row per chunk: ``(id, chunk_idx, chunk_text, chunk_ntok)``.
    ``chunk_idx`` is 0-based within the document; ``(id, chunk_idx)`` is
    the deterministic chunk key downstream embedding tables join on."""
    spans = chunk_spans(F.col(text_col), chunk_tokens, overlap_tokens)
    return (df.select(F.col(id_col),
                      F.posexplode(spans).alias("chunk_idx", "c"))
            .select(id_col, "chunk_idx",
                    F.col("c.chunk_text").alias("chunk_text"),
                    F.col("c.chunk_ntok").alias("chunk_ntok")))
