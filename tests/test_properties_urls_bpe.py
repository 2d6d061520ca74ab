"""Hypothesis property sweeps for the second-session r6 operators:
URL normalization is IDEMPOTENT (its output is its own fixpoint — the
contract that makes it a safe dedup key even when re-applied at every
pipeline stage), and BPE encode/decode round-trips arbitrary word soup."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtime_olap_spark.operators import bpe as B
from realtime_olap_spark.operators import urls as U

_host_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-",
                      min_size=1, max_size=8).filter(
    lambda s: not s.startswith("-") and not s.endswith("-"))
_path_seg = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789._-",
                    min_size=0, max_size=8)
_param = st.tuples(
    st.sampled_from(["q", "id", "page", "utm_source", "utm_medium",
                     "fbclid", "ref", "sort"]),
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", max_size=5))


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "ftp", "HTTPS"]))
    labels = draw(st.lists(_host_label, min_size=1, max_size=4))
    host = ".".join(labels)
    if draw(st.booleans()):
        host = "www." + host
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(_path_seg, max_size=3))
    path = "/" + "/".join(segs) if segs else draw(st.sampled_from(["", "/"]))
    params = draw(st.lists(_param, max_size=4))
    query = ("?" + "&".join(f"{k}={v}" for k, v in params)) if params else ""
    frag = draw(st.sampled_from(["", "#x", "#/a?b=1"]))
    return f"{scheme}://{host}{port}{path}{query}{frag}"


@settings(max_examples=20, deadline=None)
@given(st.lists(_urls(), min_size=1, max_size=8))
def test_normalize_url_is_idempotent(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = df.select(U.normalize_url("url").alias("c1"))
    twice = once.select(F.col("c1").alias("url")).select(
        "url", U.normalize_url("url").alias("c2"))
    for r in twice.collect():
        assert r["c2"] == r["url"], f"not a fixpoint: {r['url']} -> {r['c2']}"


@settings(max_examples=15, deadline=None)
@given(st.lists(
    st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
             min_size=1, max_size=10),
    min_size=1, max_size=6), st.integers(0, 30))
def test_bpe_roundtrip_random_corpora(spark, docs, n_merges):
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(list(enumerate(texts)), ["id", "t"])
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    merges = B.train_merges_from_counts(counts, n_merges)
    enc = B.encode(df, "t", merges)
    got = {r["id"]: r["d"] for r in
           enc.select("id", B.decode(F.col("bpe")).alias("d")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == t          # already lowercase single-spaced


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet="abcde", min_size=1, max_size=5),
                min_size=2, max_size=20))
def test_bpe_merge_count_monotone(spark, words_list):
    """More merges never increase a doc's token count (each merge can
    only contract adjacent pairs)."""
    counts: dict[str, int] = {}
    for w in words_list:
        counts[w] = counts.get(w, 0) + 1
    text = " ".join(words_list)
    df = spark.createDataFrame([(1, text)], ["id", "t"])
    prev = None
    for k in (0, 2, 8, 32):
        merges = B.train_merges_from_counts(counts, k)
        n = B.bpe_token_count(df, "t", merges).collect()[0]["n_bpe"]
        if prev is not None:
            assert n <= prev
        prev = n
