"""Sequence packing — fitting documents into fixed-token training
sequences. Outside the reference's surface (it has no string functions at
all, SURVEY.md §2.9); this is the step between curation and the trainer.

Two standard disciplines, both deterministic:

- **Chunked (concat-and-cut, GPT-style)**: concatenate documents in a
  fixed order, cut every ``budget`` tokens; a document may straddle a cut.
  Pure prefix-sum arithmetic → one window cumsum, fully SQL-expressible
  (oracle-paired in ``suite/text.py``).
- **Greedy whole-doc (no-split first-fit-in-order)**: a new sequence
  starts whenever the next document would overflow the budget; oversized
  documents get a sequence of their own. A running recurrence, not a
  prefix sum — implemented per group in an Arrow ``applyInPandas`` pass.

Scale design: packing order only needs to be deterministic WITHIN a shard
(real pipelines pack per shard and train on shards in any order), so both
operators take ``partition_cols`` — the window / group key that bounds
state and keeps every shard's pack independent. A single global ordering
(partition_cols=[] → one window partition) is supported for small tables
and oracle tests, and documented as non-scalable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _window(partition_cols: list[str], order_cols: list[str]):
    w = (Window.partitionBy(*partition_cols) if partition_cols
         else Window.partitionBy())
    return w.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding,
                                              Window.currentRow)


def pack_chunked(df: DataFrame, token_col: Column | str,
                 order_cols: list[str], budget: int,
                 partition_cols: list[str] | None = None) -> DataFrame:
    """Concat-and-cut assignment: adds ``start_tok`` (tokens before this
    doc in its shard), ``first_seq``/``last_seq`` (the cut intervals the
    doc lands in), and ``n_splits`` (cuts through the doc's body)."""
    t = F.col(token_col) if isinstance(token_col, str) else token_col
    t = t.cast("long")
    w = _window(partition_cols or [], order_cols)
    start = (F.sum(t).over(w) - t).alias("start_tok")
    first = F.floor(F.col("start_tok") / budget).cast("long")
    last = F.when(t > 0, F.floor((F.col("start_tok") + t - 1) / budget))  \
        .otherwise(first).cast("long")
    return (df.withColumn("start_tok", start)
              .withColumn("first_seq", first)
              .withColumn("last_seq", last)
              .withColumn("n_splits", (F.col("last_seq")
                                       - F.col("first_seq")).cast("long")))


def pack_greedy(df: DataFrame, token_col: str,
                order_cols: list[str], budget: int,
                partition_cols: list[str] | None = None) -> DataFrame:
    """Whole-doc first-fit-in-order: adds ``seq_id`` (0-based per shard).
    The recurrence (running fill, reset on overflow) runs once per shard
    inside an Arrow batch; rows come back in the same order with the
    grouping key intact. Shards are independent — state is O(1) per shard,
    the shuffle is the groupBy on ``partition_cols``."""
    partition_cols = partition_cols or []
    schema_df = df.withColumn("seq_id", F.lit(0).cast("long"))
    out_schema = schema_df.schema
    cols = [f.name for f in out_schema.fields if f.name != "seq_id"]

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        seq_ids, fill, seq = [], 0, 0
        for t in pdf[token_col].astype("int64"):
            # new sequence only when a non-empty one would overflow —
            # an oversized doc takes the (empty) current sequence alone
            if fill > 0 and fill + t > budget:
                seq += 1
                fill = 0
            seq_ids.append(seq)
            fill += t
        pdf = pdf[cols].copy()
        pdf["seq_id"] = pd.Series(seq_ids, index=pdf.index, dtype="int64")
        return pdf

    if partition_cols:
        grouped = df.groupBy(*partition_cols)
    else:
        grouped = df.withColumn("__g", F.lit(0)).groupBy("__g")
        cols.append("__g")
        out_schema = df.withColumn("__g", F.lit(0))  \
            .withColumn("seq_id", F.lit(0).cast("long")).schema
    out = grouped.applyInPandas(assign, schema=out_schema)
    return out.drop("__g") if not partition_cols else out


def pack_stats(packed: DataFrame, token_col: str, budget: int,
               partition_cols: list[str] | None = None,
               seq_col: str = "seq_id") -> DataFrame:
    """Per-shard packing summary: sequences used, token fill ratio."""
    keys = partition_cols or []
    return (packed.groupBy(*keys)
            .agg((F.max(seq_col) + 1).alias("n_seqs"),
                 F.sum(token_col).alias("tokens"),
                 (F.sum(token_col).cast("double")
                  / ((F.max(seq_col) + 1) * budget).cast("double"))
                 .alias("fill_ratio")))
