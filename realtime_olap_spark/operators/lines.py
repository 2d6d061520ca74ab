"""Line-level curation — C4-style per-line cleaning and corpus-wide
duplicate-line removal.

Outside the reference's surface (no string functions there, SURVEY.md
§2.9); these are the standard web-corpus hygiene passes: C4 drops lines
that are too short, lack terminal punctuation, or carry boilerplate
markers (Raffel et al. 2020 §2.2), and RefinedWeb/CCNet remove lines that
repeat across the corpus (headers, nav bars, cookie banners) before
document-level dedup.

Scale design (100 TB corpus):

- Per-line FILTERS are pure scan-side array expressions (split → filter →
  array_join): zero shuffle, zero UDF, whole-stage codegen.
- Corpus-wide LINE DEDUP needs global per-line counts, which costs one
  shuffle — but only over (line_hash, doc, pos) tuples, 8-byte hashes
  instead of line strings. The removal decisions are then aggregated into
  per-document position lists (only documents that lose a line appear —
  a small fraction on real corpora), and the corpus itself is NEVER
  shuffled: the final pass is a join against the removal lists
  (broadcast when small, shuffled hash join otherwise) plus a scan-side
  positional array filter.
- A line-hash collision can only remove an extra line (conservative for
  dedup); hashes are xxhash64, JVM-side.

No reference analog (line curation is a training-data concern); the
removal-list join mirrors the decontamination broadcast shape
(operators/decontam.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Substrings that mark a boilerplate line (C4 drops lines containing
#: "javascript", the Pile/RefinedWeb add cookie/consent boilerplate).
DEFAULT_LINE_BLACKLIST = ("javascript", "cookie", "lorem ipsum", "{")

#: C4 keeps lines ending in terminal punctuation.
TERMINAL_PUNCT = (".", "!", "?", '"', "'")


def doc_lines(text: Column, sep: str = "\n") -> Column:
    """The document's trimmed, non-empty lines, in order. Pure per-row
    array expression — scan-side at any scale."""
    return F.filter(F.transform(F.split(text, F.lit(sep), -1),
                                lambda s: F.trim(s)),
                    lambda s: s != "")


def line_keep_predicate(line: Column,
                        min_words: int = 3,
                        require_terminal_punct: bool = False,
                        blacklist: tuple[str, ...] = DEFAULT_LINE_BLACKLIST,
                        ) -> Column:
    """C4 §2.2 line rules as one boolean expression over a line: at least
    ``min_words`` whitespace words, optionally terminal punctuation, and
    no blacklist marker (case-insensitive containment)."""
    lower = F.lower(line)
    keep = F.size(F.filter(F.split(line, r"\s+", -1), lambda w: w != "")) \
        >= F.lit(min_words)
    if require_terminal_punct:
        ends = [F.endswith(line, F.lit(p)) for p in TERMINAL_PUNCT]
        terminal = ends[0]
        for e in ends[1:]:
            terminal = terminal | e
        keep = keep & terminal
    for marker in blacklist:
        keep = keep & ~F.contains(lower, F.lit(marker.lower()))
    return keep


def c4_line_filter(docs: DataFrame, text_col: str, sep: str = "\n",
                   min_words: int = 3,
                   require_terminal_punct: bool = False,
                   blacklist: tuple[str, ...] = DEFAULT_LINE_BLACKLIST,
                   min_lines: int = 1,
                   out_col: str | None = None) -> DataFrame:
    """Rebuild each document from its surviving lines; drop documents left
    with fewer than ``min_lines`` lines (C4 drops pages under 3
    sentences). Scan-side only: split → per-line predicate → array_join;
    no shuffle, no UDF."""
    kept = F.filter(
        doc_lines(F.col(text_col), sep),
        lambda s: line_keep_predicate(s, min_words, require_terminal_punct,
                                      blacklist))
    out = out_col or text_col
    return (docs
            .withColumn("__kept", kept)
            .where(F.size("__kept") >= F.lit(min_lines))
            .withColumn(out, F.array_join("__kept", sep))
            .drop("__kept"))


def duplicate_line_removals(docs: DataFrame, id_col: str, text_col: str,
                            sep: str = "\n", min_count: int = 2,
                            keep: str = "first",
                            gate=None) -> DataFrame:
    """Per-document removal lists for corpus-wide duplicate lines:
    ``(id, drop_pos array<int>)`` — 0-based positions (within the
    trimmed/non-empty line array) to delete.

    A line is *duplicated* when its hash occurs ``min_count`` or more
    times across the corpus. ``keep='first'`` preserves the canonical
    occurrence — minimum ``(id, pos)`` — and removes the rest;
    ``keep='none'`` removes every occurrence (the RefinedWeb choice for
    boilerplate).

    Only documents that actually lose a line appear in the output, so the
    result is join-side small on real corpora.

    ``gate`` (optional ``operators/cms.CMSketch`` built over the corpus
    LINES) pre-filters occurrences scan-side before the hash shuffle:
    a line whose estimate is below ``min_count`` can't truly reach it
    (CMS never undercounts), and every occurrence of a qualifying line
    shares the estimate, so per-hash counts and the canonical occurrence
    stay complete — the result is identical with or without the gate
    (tested), but only possibly-duplicated lines shuffle. The 100 TB
    default for mostly-unique corpora."""
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    occ = docs.select(
        F.col(id_col),
        F.posexplode(doc_lines(F.col(text_col), sep)).alias("pos", "line"),
    )
    if gate is not None:
        from realtime_olap_spark.operators.cms import cms_estimate
        occ = occ.where(cms_estimate(docs.sparkSession, F.col("line"),
                                     gate) >= F.lit(int(min_count)))
    occ = occ.select(id_col, "pos", F.xxhash64("line").alias("h"))
    per_hash = occ.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct(id_col, "pos")).alias("canon"))
    dups = per_hash.where(F.col("n") >= F.lit(min_count))
    hits = occ.join(dups, "h")
    if keep == "first":
        hits = hits.where(
            (F.col(id_col) != F.col("canon").getField(id_col))
            | (F.col("pos") != F.col("canon").getField("pos")))
    return (hits.groupBy(id_col)
            .agg(F.sort_array(F.collect_list("pos")).alias("drop_pos")))


def dedup_duplicate_lines(docs: DataFrame, id_col: str, text_col: str,
                          sep: str = "\n", min_count: int = 2,
                          keep: str = "first",
                          broadcast_removals: bool | None = None,
                          out_col: str | None = None,
                          gate=None) -> DataFrame:
    """Remove corpus-duplicated lines from every document and rebuild its
    text. The corpus is never shuffled: the one shuffle is over
    (hash, id, pos) tuples inside ``duplicate_line_removals``; the final
    pass joins the per-document removal lists back (broadcast when
    ``broadcast_removals`` — default on, matching the common case where
    few documents lose lines; pass False to force a shuffled hash join
    when boilerplate is pervasive) and filters the line array by position
    scan-side.

    Documents left with zero lines survive with empty text — compose with
    ``c4_line_filter(min_lines=...)`` to drop them; the operator itself
    is lossless on document identity."""
    removals = duplicate_line_removals(docs, id_col, text_col, sep,
                                       min_count, keep, gate=gate)
    if broadcast_removals is None or broadcast_removals:
        removals = F.broadcast(removals)
    else:
        # caller declares the removal lists too big to broadcast
        # (pervasive boilerplate): force the shuffled merge join so
        # Catalyst's size estimate can't pick broadcast anyway
        removals = removals.hint("merge")
    lines = doc_lines(F.col(text_col), sep)
    no_drops = F.array().cast("array<int>")
    rebuilt = F.array_join(
        # two-arg filter lambda: (element, 0-based index) — positional
        # deletion without materializing an index array
        F.filter(lines, lambda x, i: ~F.array_contains(
            F.coalesce(F.col("drop_pos"), no_drops), i)),
        sep)
    out = out_col or text_col
    return (docs.join(removals, id_col, "left")
            .withColumn(out, rebuilt)
            .drop("drop_pos"))
