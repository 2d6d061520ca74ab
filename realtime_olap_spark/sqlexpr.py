"""SQL-string twins of the hot Column-builder expressions.

Building a deep expression through the PySpark Column API costs one py4j
round trip per operator call — ~1.4 ms each on this box (measured), so a
word-trigram tree is ~40 ms of driver time PER CONSTRUCTION and a
16-fold SimHash ~200 ms. Rendering the same tree as ONE SQL string and
parsing it JVM-side (`F.expr`) is a single round trip: the measured
construction drop for `word_ngrams` is 39.8 ms → 0.54 ms (~74×), and the
optimizer sees the identical expression tree (plan equality modulo
auto-generated lambda-variable NAMES, value bit-equality — both pinned in
tests/test_sqlexpr.py for every builder here).

These are construction-time twins, not new semantics: each `*_sql`
function renders exactly the tree its Column-builder counterpart in
`operators/{text,dedup,importance,decontam}.py` builds, and the
counterpart's docstring remains the contract. String arguments are SQL
EXPRESSIONS (a bare column name is the common case), not quoted names.

Parser assumption (r16 ADVICE #2): every escaped string literal here
(``_WS_RE``, the punct/upper regexes) is rendered for the DEFAULT
``spark.sql.parser.escapedStringLiterals=false``. Under the legacy
``true`` setting ``'\\s+'`` parses to a different regex and every twin
would silently diverge from its Column builder — so the first ``F.expr``
construction per session asserts the conf (``_check_parser_conf``) and
raises loudly instead.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from realtime_olap_spark.operators.text import LANG_MARKERS

#: SQL string literal whose VALUE is the regex \s+ (backslash is an
#: escape character inside Spark SQL string literals).
_WS_RE = r"'\\s+'"

import weakref

_parser_conf_ok: "weakref.WeakSet" = weakref.WeakSet()


def _check_parser_conf() -> None:
    """Raise if the active session parses string literals in legacy mode
    (escapedStringLiterals=true), under which every backslash literal in
    this module means a different string than its Column twin. Checked
    once per SESSION OBJECT via a WeakSet — zero py4j round trips on the
    warm path (the very overhead this module exists to remove), and a
    ``spark.newSession()`` (new object, shared applicationId) gets its
    own check. Limits, by design: a session that flips the conf AFTER
    its first render is not re-checked (re-checking per render would
    re-add an RPC per construction), and rendering with no active
    session skips the check (pure string building)."""
    spark = SparkSession.getActiveSession()
    if spark is None or spark in _parser_conf_ok:
        return
    flag = spark.conf.get("spark.sql.parser.escapedStringLiterals",
                          "false")
    if str(flag).lower() == "true":
        raise RuntimeError(
            "sqlexpr twins require spark.sql.parser."
            "escapedStringLiterals=false (the default); the session has "
            "the legacy mode enabled, under which these SQL strings parse "
            "to different regexes than their Column builders")
    _parser_conf_ok.add(spark)


def _sql_str(s: str) -> str:
    """Single-quoted SQL string literal with embedded quotes doubled —
    safe for any marker content (r16 ADVICE #3: a future fr profile
    could legitimately contain an apostrophe, e.g. l')."""
    return "'" + s.replace("'", "''") + "'"


def words_sql(text: str) -> str:
    """operators.text.words — whitespace tokens of the lowercased text."""
    _check_parser_conf()
    return f"filter(split(lower({text}), {_WS_RE}), w -> w != '')"


def ngrams_sql(ws: str, n: int) -> str:
    """operators.text.ngrams_from — n−1 nested zip_with over n shifted
    slices; ``ws`` is textually pasted exactly as the Column form pastes
    its subtree."""
    m = f"greatest(size({ws}) - {n - 1}, 0)"
    out = f"slice({ws}, 1, {m})"
    for j in range(1, n):
        out = (f"zip_with({out}, slice({ws}, {j + 1}, {m}), "
               f"(a, b) -> concat(a, ' ', b))")
    return out


def word_ngrams_sql(text: str, n: int) -> str:
    """operators.text.word_ngrams."""
    return ngrams_sql(words_sql(text), n)


def ngram_hash_set_sql(text: str, n: int) -> str:
    """operators.decontam.ngram_hash_set — distinct xxhash64 gram codes."""
    return (f"array_distinct(transform({word_ngrams_sql(text, n)}, "
            f"g -> xxhash64(g)))")


def bigrams_sql(ws: str) -> str:
    """operators.text.bigrams_from."""
    m = f"greatest(size({ws}) - 1, 0)"
    return (f"zip_with(slice({ws}, 1, {m}), slice({ws}, 2, {m}), "
            f"(a, b) -> concat(a, ' ', b))")


def doc_grams_sql(text: str) -> str:
    """operators.importance.doc_grams — unigrams + bigrams, one array."""
    ws = words_sql(text)
    return f"concat({ws}, {bigrams_sql(ws)})"


def gram_buckets_md5_sql(text: str, n_buckets: int) -> str:
    """operators.importance.gram_buckets_md5."""
    return (f"transform({doc_grams_sql(text)}, "
            f"g -> CAST(CAST(conv(substring(md5(g), 1, 8), 16, 10) "
            f"AS BIGINT) % {n_buckets} AS INT))")


def favored_hits_sql(text: str, favored: list[int]) -> str:
    """operators.importance.favored_hits — integer fold against the
    0/1 bucket bitmap (rendered as the same single-node from_json
    literal litarray.lit_ints produces)."""
    bitmap = "from_json('[" + ",".join(str(int(v)) for v in favored) + \
        "]', 'array<int>')"
    return (f"aggregate({gram_buckets_md5_sql(text, len(favored))}, "
            f"CAST(0 AS BIGINT), "
            f"(acc, bk) -> acc + CAST(element_at({bitmap}, bk + 1) "
            f"AS BIGINT))")


def quality_features_sql(text: str) -> list[Column]:
    """operators.text.quality_features — the six aliased signal columns."""
    _check_parser_conf()
    ws = words_sql(text)
    n_tok = f"size({ws})"
    n_chars = f"length({text})"
    stop_terms = "0"
    for m in LANG_MARKERS["en"]:
        stop_terms += (f" + ({n_tok} - size(array_remove({ws}, "
                       f"{_sql_str(m)})))")
    n_punct = (f"({n_chars} - length(regexp_replace({text}, "
               f"'[^\\\\w\\\\s]', '')))")
    n_upper = f"({n_chars} - length(regexp_replace({text}, '[A-Z]', '')))"
    mean_wl = (f"CAST(CAST(length(concat_ws('', {ws})) AS BIGINT) "
               f"AS DOUBLE) / CAST({n_tok} AS DOUBLE)")
    return [
        F.expr(n_chars).alias("n_chars_m"),
        F.expr(n_tok).alias("n_tokens"),
        F.expr(mean_wl).alias("mean_word_len"),
        F.expr(f"CAST({stop_terms} AS DOUBLE) / CAST({n_tok} AS DOUBLE)")
        .alias("stopword_ratio"),
        F.expr(f"CAST({n_punct} AS DOUBLE) / CAST({n_chars} AS DOUBLE)")
        .alias("punct_ratio"),
        F.expr(f"CAST({n_upper} AS DOUBLE) / CAST({n_chars} AS DOUBLE)")
        .alias("upper_ratio"),
    ]


def rolling_fingerprint_sql(text: str, mod: int) -> str:
    """operators.text.rolling_fingerprint — per-char polynomial fold."""
    codes = (f"transform(filter(split({text}, ''), c -> c != ''), "
             f"c -> CAST(ascii(c) AS BIGINT))")
    return (f"aggregate({codes}, CAST(0 AS BIGINT), "
            f"(acc, c) -> ((acc * 31) + c) % CAST({mod} AS BIGINT))")


def word_set_sql(text: str) -> str:
    """operators.dedup.word_set — distinct space-split lowercase words."""
    return f"array_distinct(split(lower({text}), ' '))"


def word_hash60_sql(w: str) -> str:
    """operators.dedup.word_hash60 — 60-bit md5-prefix hash."""
    return f"CAST(conv(substring(md5({w}), 1, 15), 16, 10) AS BIGINT)"


def simhash_fp_sql(wh: str, bits: int) -> str:
    """operators.dedup.simhash's fingerprint fold over the materialized
    word-hash array column ``wh`` — ``bits`` independent single-long
    accumulator folds, summed into the fingerprint."""
    terms = []
    for j in range(bits):
        cnt = (f"aggregate({wh}, CAST(0 AS BIGINT), "
               f"(acc, h) -> acc + (shiftright(h, {j}) & 1))")
        terms.append(
            f"CASE WHEN ({cnt} * 2) > size({wh}) THEN {1 << j} ELSE 0 END")
    fp = terms[0]
    for t in terms[1:]:
        fp = f"({fp} + {t})"
    return f"CAST({fp} AS BIGINT)"
