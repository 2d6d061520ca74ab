"""URL curation: DuckDB differentials for normalization / registered-domain
(identical RE2-safe regexes on both engines — the PII-redactor discipline),
plus cap/blocklist/dedup property tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_olap_spark.operators import urls as U

URLS = [
    "https://www.Example.com:443/a/b/?utm_source=x&q=1#frag",
    "http://example.com:80/a/b",
    "https://example.com/a/b/",
    "https://news.bbc.co.uk/story?id=7&fbclid=zzz",
    "http://sub.deep.example.com/x?b=2&a=1",
    "http://user:pw@example.com:8080/x",
    "not a url at all",
    "ftp://files.example.org/pub/",
    "https://example.com",
    "https://example.com/?gclid=abc",
    "http://localhost/test",
    "https://shop.com.au/item?ref_=tag&size=9",
    "https://site.com/page#/a?id=5",      # '?' inside the fragment: NOT a query
    "https://site.com/p?q=1#also?x=2",    # real query + '?' in fragment
    "https://x.com/p?a=1?b=2",            # '?' INSIDE the query (RFC 3986)
    "http://www.com/",                    # registrable 2nd-level label 'www'
    "https://www.www.a.com/x",            # strippable stack of www labels
    "https://www.co.uk/x",                # www + bare public suffix: keep
]

_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^@/?#]*@)?([^/:?#]+)"
_PORT_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^@/?#]*@)?[^/:?#]+:([0-9]+)"
_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"

# tracking-key predicate with {k} substituted inline (DuckDB lambdas can't
# hold subqueries); mirrors urls.py: startswith(prefix) or key == prefix
# sans trailing underscore
_TRACK = ("(starts_with({k}, 'utm_') OR starts_with({k}, 'ref_') OR "
          "{k} IN ('fbclid','gclid','msclkid','mc_eid','igshid',"
          "'ref','utm'))")

_SUFFIX_SQL = ", ".join(f"'{s}'" for s in U.MULTIPART_SUFFIXES)

_NORM_SQL = f"""
WITH p0 AS (
  SELECT url,
    lower(regexp_extract(url, '{_SCHEME_RE}', 1)) AS scheme,
    lower(regexp_extract(url, '{_HOST_RE}', 1)) AS host0,
    regexp_extract(url, '{_PORT_RE}', 1) AS port,
    regexp_extract(url, '{_PATH_RE}', 1) AS path0,
    regexp_extract(url, '^[^?#]*\\?([^#]*)', 1) AS q
  FROM urls),
p AS (
  SELECT url, scheme, port, path0, q,
    CASE WHEN len(string_split(regexp_replace(host0, '^(www\\.)+', ''),
                               '.')) >= 2
          AND regexp_replace(host0, '^(www\\.)+', '')
              NOT IN ({_SUFFIX_SQL})
         THEN regexp_replace(host0, '^(www\\.)+', '')
         ELSE host0 END AS host
  FROM p0),
b AS (
  SELECT url, scheme, host,
    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
              OR (scheme = 'https' AND port = '443')
         THEN '' ELSE ':' || port END AS pp,
    CASE WHEN regexp_replace(CASE WHEN path0 = '' THEN '/' ELSE path0 END,
                             '/+$', '') = ''
         THEN '/'
         ELSE regexp_replace(CASE WHEN path0 = '' THEN '/' ELSE path0 END,
                             '/+$', '') END AS path,
    list_sort(list_filter(list_filter(string_split(q, '&'), x -> x <> ''),
      x -> NOT {_TRACK.format(k="string_split(x, '=')[1]")}
    )) AS kept
  FROM p)
SELECT url,
  CASE WHEN host = '' THEN url
       ELSE scheme || '://' || host || pp || path ||
            CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
                 ELSE '' END
  END AS canon
FROM b
"""


def test_normalize_url_matches_duckdb(spark, duck):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE urls AS SELECT * FROM (VALUES "
                + ",".join("(?)" for _ in URLS) + ") t(url)", URLS)
    want = dict(con.sql(_NORM_SQL).fetchall())
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    got = {r["url"]: r["canon"]
           for r in df.select("url",
                              U.normalize_url("url").alias("canon")).collect()}
    assert got == want


def test_normalize_url_expected_values(spark):
    df = spark.createDataFrame([(u,) for u in URLS], ["url"])
    got = {r["url"]: r["canon"]
           for r in df.select("url",
                              U.normalize_url("url").alias("canon")).collect()}
    assert got["https://www.Example.com:443/a/b/?utm_source=x&q=1#frag"] == \
        "https://example.com/a/b?q=1"
    assert got["http://example.com:80/a/b"] == "http://example.com/a/b"
    assert got["https://example.com/a/b/"] == "https://example.com/a/b"
    assert got["http://sub.deep.example.com/x?b=2&a=1"] == \
        "http://sub.deep.example.com/x?a=1&b=2"      # canonical param order
    assert got["http://user:pw@example.com:8080/x"] == \
        "http://example.com:8080/x"                  # userinfo out, port kept
    assert got["not a url at all"] == "not a url at all"   # passthrough
    assert got["https://example.com"] == "https://example.com/"
    assert got["https://example.com/?gclid=abc"] == "https://example.com/"
    # a '?' AFTER '#' belongs to the (dropped) fragment — never a query
    assert got["https://site.com/page#/a?id=5"] == "https://site.com/page"
    assert got["https://site.com/p?q=1#also?x=2"] == "https://site.com/p?q=1"
    # the query starts at the FIRST '?': a later '?' is query CONTENT
    assert got["https://x.com/p?a=1?b=2"] == "https://x.com/p?a=1?b=2"
    # 'www' as the registrable second-level label survives the strip
    assert got["http://www.com/"] == "http://www.com/"
    # stacked www labels strip when >= 2 labels remain
    assert got["https://www.www.a.com/x"] == "https://a.com/x"
    # stripping down to a bare public suffix would invent a key: keep
    assert got["https://www.co.uk/x"] == "https://www.co.uk/x"


def test_registered_domain_matches_duckdb(spark):
    import duckdb

    hosts = ["www.example.com", "news.bbc.co.uk", "a.b.c.example.com",
             "bbc.co.uk", "co.uk", "localhost", "example.com",
             "shop.com.au", "x.y.gov.uk", "deep.co.kr"]
    suffixes = list(U.MULTIPART_SUFFIXES)
    con = duckdb.connect()
    con.execute("CREATE TABLE hosts AS SELECT * FROM (VALUES "
                + ",".join("(?)" for _ in hosts) + ") t(h)", hosts)
    con.execute("CREATE TABLE ms AS SELECT * FROM (VALUES "
                + ",".join("(?)" for _ in suffixes) + ") t(s)", suffixes)
    want = dict(con.sql("""
      WITH p AS (SELECT h, string_split(h, '.') AS parts FROM hosts)
      SELECT h, CASE
        WHEN len(parts) <= 2 THEN h
        WHEN array_to_string(parts[greatest(len(parts)-1,1):], '.')
             IN (SELECT s FROM ms)
        THEN array_to_string(parts[greatest(len(parts)-2,1):], '.')
        ELSE array_to_string(parts[greatest(len(parts)-1,1):], '.')
      END FROM p""").fetchall())
    df = spark.createDataFrame([(h,) for h in hosts], ["h"])
    got = {r["h"]: r["d"] for r in
           df.select("h", U.registered_domain("h").alias("d")).collect()}
    assert got == want
    assert got["news.bbc.co.uk"] == "bbc.co.uk"
    assert got["a.b.c.example.com"] == "example.com"
    assert got["localhost"] == "localhost"


def test_registered_domain_lookalike_suffixes(spark):
    """Edge semantics pinned (r6 directive #8): the multipart check looks
    only at the TRUE TAIL of the host, so a suffix string embedded
    mid-host ('co.uk' inside 'foo.co.uk.evil.com') never triggers the
    three-label rule; bare public suffixes pass through unchanged (the
    operator never returns fewer labels than the host has)."""
    hosts = {
        # lookalike: 'co.uk' appears mid-host — tail is evil.com
        "foo.co.uk.evil.com": "evil.com",
        "co.uk.evil.com": "evil.com",
        # tail IS multipart: last THREE labels, even when deeper labels
        # contain another suffix string
        "evil.com.co.uk": "com.co.uk",
        "a.b.evil.com.co.uk": "com.co.uk",
        # bare suffixes and single labels: returned as-is (n <= 2 or
        # n == 1 — never sliced below the host's own label count)
        "co.uk": "co.uk",
        "uk": "uk",
        "com": "com",
        # 'www' is an ordinary label to THIS operator (normalize_url
        # owns www handling)
        "www.co.uk": "www.co.uk",
        "www.example.com": "example.com",
    }
    df = spark.createDataFrame([(h,) for h in hosts], ["h"])
    got = {r["h"]: r["d"] for r in
           df.select("h", U.registered_domain("h").alias("d")).collect()}
    assert got == hosts


def _url_corpus(spark, n=400, domains=("a.com", "b.com", "hot.com")):
    rows = []
    for i in range(n):
        dom = domains[i % len(domains)] if i % 10 else "hot.com"
        rows.append((i, f"https://www.{dom}/p{i}?utm_source=s", f"doc{i}"))
    return spark.createDataFrame(rows, ["id", "url", "text"])


def test_url_dedup_collapses_variants(spark):
    df = spark.createDataFrame([
        (1, "https://www.a.com/x/?utm_source=s"),
        (2, "https://a.com/x"),
        (3, "http://a.com/x"),          # different scheme: kept distinct
        (4, "https://a.com/y"),
    ], ["id", "url"])
    kept = U.url_dedup(df, "url", keep_by="id")
    assert sorted(r["id"] for r in kept.collect()) == [1, 3, 4]


def test_domain_blocklist_filter(spark):
    df = _url_corpus(spark, 60)
    blocked = spark.createDataFrame([("hot.com",)], ["domain"])
    out = U.domain_blocklist_filter(df, "url", blocked)
    hosts = [r["url"] for r in out.collect()]
    assert hosts and all("hot.com" not in u for u in hosts)
    # subdomains blocked with the domain
    df2 = spark.createDataFrame(
        [(1, "https://sub.hot.com/x"), (2, "https://ok.org/x")],
        ["id", "url"])
    assert [r["id"] for r in
            U.domain_blocklist_filter(df2, "url", blocked).collect()] == [2]


def test_domain_frequency_cap_exact(spark):
    df = _url_corpus(spark, 300)
    out = U.domain_frequency_cap(df, "url", F.col("text"), cap=20)
    counts = {r["d"]: r["n"] for r in
              out.select(U.registered_domain(U.url_host("url")).alias("d"))
                 .groupBy("d").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n <= 20 for n in counts.values())
    assert counts["hot.com"] == 20          # hot domain capped exactly
    # deterministic: same decision on a re-layouted frame
    again = U.domain_frequency_cap(df.repartition(7), "url",
                                   F.col("text"), cap=20)
    assert sorted(r["id"] for r in out.collect()) == \
        sorted(r["id"] for r in again.collect())


def test_domain_cap_rate_scan_side(spark):
    df = _url_corpus(spark, 400)
    out = U.domain_cap_rate(df, "url", F.col("text"), cap=25)
    counts = {r["d"]: r["n"] for r in
              out.select(U.registered_domain(U.url_host("url")).alias("d"))
                 .groupBy("d").agg(F.count(F.lit(1)).alias("n")).collect()}
    # expectation cap: binomial around 25 for the hot domain
    assert 10 <= counts["hot.com"] <= 45
    # under-cap domains are untouched (rate 1.0)
    orig = {r["d"]: r["n"] for r in
            df.select(U.registered_domain(U.url_host("url")).alias("d"))
              .groupBy("d").agg(F.count(F.lit(1)).alias("n")).collect()}
    for d, n in orig.items():
        if n <= 25:
            assert counts.get(d) == n
    # row-property determinism
    again = U.domain_cap_rate(df.repartition(5), "url", F.col("text"), cap=25)
    assert sorted(r["id"] for r in out.collect()) == \
        sorted(r["id"] for r in again.collect())
    # the corpus is never sorted: no Sort/Window in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_caps_keep_domainless_rows(spark):
    """NULL and unparseable urls form one '' pseudo-domain in BOTH cap
    variants — capped as a group, never silently dropped (the rate cap's
    inner join must not NULL-eliminate them)."""
    rows = [(i, None if i % 2 else "junk url", f"t{i}") for i in range(10)]
    rows += [(100 + i, f"https://ok.org/{i}", f"u{i}") for i in range(5)]
    df = spark.createDataFrame(rows, ["id", "url", "text"])
    for out in (U.domain_frequency_cap(df, "url", F.col("text"), cap=50),
                U.domain_cap_rate(df, "url", F.col("text"), cap=50)):
        assert out.count() == 15          # cap above group sizes: all kept
    capped = U.domain_frequency_cap(df, "url", F.col("text"), cap=3)
    # the 10 domain-less rows are ONE group, capped to 3
    assert capped.where(F.col("id") < 100).count() == 3


def test_exact_cap_deterministic_on_key_ties(spark):
    """Identical (key, url) pairs inside a domain tie on the hash; the
    tiebreak column pins which row survives across re-layouts."""
    rows = [(i, "https://a.com/x", "same text") for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "url", "text"])
    a = U.domain_frequency_cap(df, "url", F.col("text"), cap=5,
                               tiebreak=F.col("id"))
    b = U.domain_frequency_cap(df.repartition(7), "url", F.col("text"),
                               cap=5, tiebreak=F.col("id"))
    assert sorted(r["id"] for r in a.collect()) == \
        sorted(r["id"] for r in b.collect())


def test_exact_cap_plan_has_single_domain_shuffle(spark):
    df = _url_corpus(spark, 100)
    out = U.domain_frequency_cap(df, "url", F.col("text"), cap=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan or "WindowGroupLimit" in plan


def test_exact_cap_two_phase_skew_guard(spark):
    """The windowed rank consumes ONLY the over-cap remainder: under-cap
    domains pass through on the no-window branch (r6 directive #4)."""
    rows = [(i, "https://hot.com/p", f"t{i}") for i in range(200)]
    rows += [(1000 + i, f"https://cold{i % 7}.org/p{i}", f"u{i}")
             for i in range(35)]
    df = spark.createDataFrame(rows, ["id", "url", "text"])
    out = U.domain_frequency_cap(df, "url", F.col("text"), cap=10,
                                 tiebreak=F.col("id"))
    got = out.collect()
    assert sum(1 for r in got if r["id"] < 1000) == 10   # hot capped exactly
    assert sum(1 for r in got if r["id"] >= 1000) == 35  # cold untouched
    # plan: the Window's input is an INNER join with the over-cap domain
    # set (the optimizer folds the marker filter into the join; the join
    # strategy is left to Catalyst/AQE — the over-cap set is unbounded
    # under small caps, so no broadcast hint), so it consumes the
    # over-cap subset, not the corpus — and WindowGroupLimit bounds each
    # mapper to cap rows per domain
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" in plan
    window_part = plan[plan.index("Window ["):]
    assert "WindowGroupLimit" in window_part
    assert "Join Inner" in window_part
    # determinism across re-layouts (two-phase must not reintroduce
    # arrival-order sensitivity)
    again = U.domain_frequency_cap(df.repartition(9), "url", F.col("text"),
                                   cap=10, tiebreak=F.col("id"))
    assert sorted(r["id"] for r in got) == \
        sorted(r["id"] for r in again.collect())


# ---------------------------------------------------------------------------
# Table-driven PSL (registered_domain_psl): full publicsuffix.org semantics
# ---------------------------------------------------------------------------

_PSL_TEXT = """\
// excerpt in publicsuffix.org format
com
uk
co.uk
jp
ac.jp
pref.aichi.jp
*.ck
!www.ck
"""


def _psl_df(spark):
    from realtime_olap_spark.operators.urls import parse_psl, psl_table
    return psl_table(spark, parse_psl(_PSL_TEXT.splitlines()))


def test_psl_algorithm_vectors(spark):
    """publicsuffix.org algorithm on plain / multi-label / wildcard /
    exception rules, plus the implicit '*' default for unknown TLDs.
    A host that IS a public suffix yields NULL."""
    from realtime_olap_spark.operators.urls import registered_domain_psl

    cases = {
        "www.example.com": "example.com",
        "example.com": "example.com",
        "com": None,                      # bare suffix
        "b.example.co.uk": "example.co.uk",
        "news.bbc.co.uk": "bbc.co.uk",
        "co.uk": None,
        "test.ck": None,                  # *.ck makes test.ck a suffix
        "a.b.test.ck": "b.test.ck",
        "www.ck": "www.ck",               # !www.ck exception
        "x.www.ck": "www.ck",
        "y.pref.aichi.jp": "y.pref.aichi.jp",  # 3-label plain rule
        "pref.aichi.jp": None,
        "foo.ac.jp": "foo.ac.jp",
        "example.zz": "example.zz",       # implicit '*' default rule
        "zz": None,
        "foo.co.uk.evil.com": "evil.com", # lookalike suffix mid-host
        "WWW.Example.COM": "example.com", # case-folded
    }
    df = spark.createDataFrame([(h,) for h in cases], ["host"])
    out = registered_domain_psl(df, "host", _psl_df(spark))
    got = {r["host"]: r["registered_domain"] for r in out.collect()}
    # host column is lowercased only in the output domain, keys unchanged
    assert got == cases


def test_psl_matches_embedded_subset_where_both_apply(spark):
    """On hosts the embedded-literal fast path handles (known multipart
    suffix, >2 labels), the PSL table variant agrees with it."""
    from realtime_olap_spark.operators.urls import (registered_domain,
                                                    registered_domain_psl)

    hosts = ["news.bbc.co.uk", "a.b.c.example.com", "www.example.com",
             "sub.example.co.uk"]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    both = (registered_domain_psl(df, "host", _psl_df(spark))
            .withColumn("emb", registered_domain(F.col("host"))))
    for r in both.collect():
        assert r["registered_domain"] == r["emb"], r["host"]


def test_psl_plan_is_broadcast_no_corpus_shuffle(spark, tmp_path):
    """Scale contract: every PSL join broadcasts the rule table; the
    corpus side is never exchanged. The rule table is materialized (the
    production shape — psl_table's dedup agg runs once at publish, not
    per query), so the executed plan must carry ZERO hash exchanges."""
    from realtime_olap_spark.operators.urls import registered_domain_psl

    p = f"{tmp_path}/psl"
    _psl_df(spark).write.parquet(p)
    df = spark.createDataFrame([("www.example.com",)], ["host"])
    out = registered_domain_psl(df, "host", spark.read.parquet(p))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_psl_deep_rules_not_silently_ignored(spark):
    """Join depth follows the TABLE's own max rule depth (review r7):
    a 5-label private-section rule (e.g. AWS dualstack S3 suffixes)
    must resolve, not silently fall back to last-2."""
    from realtime_olap_spark.operators.urls import (parse_psl, psl_table,
                                                    registered_domain_psl)

    psl = psl_table(spark, parse_psl([
        "com", "s3.dualstack.ap-south-1.amazonaws.com"]))
    df = spark.createDataFrame(
        [("bucket.s3.dualstack.ap-south-1.amazonaws.com",),
         ("www.example.com",)], ["host"])
    got = {r["host"]: r["registered_domain"]
           for r in registered_domain_psl(df, "host", psl).collect()}
    assert got["bucket.s3.dualstack.ap-south-1.amazonaws.com"] == \
        "bucket.s3.dualstack.ap-south-1.amazonaws.com"
    assert got["www.example.com"] == "example.com"
