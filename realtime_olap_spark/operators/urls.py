"""URL / domain curation operators for web-corpus pipelines.

Every serious web-scale training corpus (C4, RefinedWeb, Gopher/MassiveWeb)
curates by URL before it curates by content: canonicalize the URL, dedup on
the canonical form, drop blocklisted domains, and cap how many documents
any one registered domain may contribute. These are the Spark-first
versions: everything is scan-side string expressions (regexp + higher-order
array functions — no UDFs, no shuffle except where a cap genuinely needs a
per-domain count), and every regex stays inside the Java-regex ∩ RE2 common
subset (no backrefs/lookaround) so DuckDB oracles run the IDENTICAL
pattern — the same discipline as the PII redactors (`operators/text.py`).

The reference engine has no URL functions at all; these extend the engine
the same way the dedup/similarity stack does (driver mandate).

Scale notes (100 TB):
- parsing/normalization/domain extraction are pure row properties — zero
  shuffle, whole-stage codegen;
- the blocklist is a broadcast semi-join (blocklists are KBs, corpora TBs);
- the exact per-domain cap is ONE shuffle on the domain plus a bounded
  per-domain rank; the rate-based cap never shuffles the corpus at all
  (per-domain counts broadcast back) — use it when domains are hot enough
  that sorting a single domain's rows in one task is the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared sub-patterns (Java-regex ∩ RE2: no backrefs, no lookaround).
_SCHEME = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^@/?#]*@)?([^/:?#]+)"
_PORT = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^@/?#]*@)?[^/:?#]+:([0-9]+)"
_PATH = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"
# anchored on the FIRST '?' before the first '#': RFC 3986 permits '?'
# INSIDE a query, so `?a=1?b=2` is one query string "a=1?b=2" (a greedy
# `^[^#]*\?` would re-anchor on the LAST '?' and silently drop a=1 —
# advice r6), while a '?' AFTER the first '#' belongs to the fragment
# (which normalization drops) and must not be promoted into a query
_QUERY = "^[^?#]*\\?([^#]*)"

#: Query parameters that identify a click, not a resource — stripped during
#: normalization (the standard tracking-param scrub).
TRACKING_PARAM_PREFIXES = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid",
                           "ref_", "igshid")

#: Common multi-part public suffixes — the embedded fast-path subset used
#: by :func:`registered_domain` (pure literal, zero joins). The FULL
#: publicsuffix.org semantics (arbitrary-depth, wildcard and exception
#: rules, PSL shipped as a broadcast TABLE so updates are data changes)
#: live in :func:`registered_domain_psl` / :func:`parse_psl` /
#: :func:`psl_table`.
MULTIPART_SUFFIXES = ("co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp",
                      "ne.jp", "or.jp", "com.au", "net.au", "org.au",
                      "com.br", "com.cn", "com.mx", "co.in", "co.kr",
                      "co.za", "com.tr", "com.ar")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(url), _SCHEME, 1))


def url_host(url: Column | str) -> Column:
    """Lowercased hostname (userinfo and port excluded); '' if unparseable."""
    return F.lower(F.regexp_extract(_c(url), _HOST, 1))


def url_path(url: Column | str) -> Column:
    return F.regexp_extract(_c(url), _PATH, 1)


def url_query(url: Column | str) -> Column:
    return F.regexp_extract(_c(url), _QUERY, 1)


def registered_domain(host: Column | str,
                      multipart: tuple[str, ...] = MULTIPART_SUFFIXES) -> Column:
    """Registrable domain of a hostname: the last two labels, or the last
    THREE when the two-label suffix is a known multi-part public suffix
    (``news.bbc.co.uk`` -> ``bbc.co.uk``, not ``co.uk``). Pure array
    slicing over ``split('.')`` — scan-side, no UDF."""
    h = _c(host)
    parts = F.split(h, "\\.")
    n = F.size(parts)
    # clamped slices, never out-of-bounds (ANSI mode turns a stray negative
    # element_at into a runtime error — see the verify-skill notes)
    last2 = F.array_join(
        F.slice(parts, F.greatest(n - 1, F.lit(1)), F.lit(2)), ".")
    last3 = F.array_join(
        F.slice(parts, F.greatest(n - 2, F.lit(1)), F.lit(3)), ".")
    is_multi = F.array_contains(F.array(*[F.lit(s) for s in multipart]), last2)
    return (F.when(n <= 2, h)
            .when(is_multi, last3)
            .otherwise(last2))


def parse_psl(lines) -> list[tuple[str, int, int, bool]]:
    """Parse public-suffix-list text (publicsuffix.org format: one rule
    per line, ``//`` comments, ``*.`` wildcard rules, ``!`` exception
    rules) into join-ready rows ``(match_key, key_depth, suffix_len,
    is_exception)``:

    - plain rule ``co.uk``      -> ("co.uk",  2, 2, False)
    - wildcard ``*.ck``         -> ("ck",     1, 2, False) — the known
      tail is the join key; the ``*`` label is implied by suffix_len
    - exception ``!www.ck``     -> ("www.ck", 2, 1, True) — the suffix
      is the rule minus its leftmost label (PSL algorithm step 5)

    The implicit default rule ``*`` (every bare TLD is a suffix) is NOT
    emitted — ``registered_domain_psl`` applies it as the fallback."""
    rules: list[tuple[str, int, int, bool]] = []
    for ln in lines:
        s = ln.strip().lower()
        if not s or s.startswith("//"):
            continue
        exc = s.startswith("!")
        if exc:
            s = s[1:]
        labels = s.split(".")
        if labels[0] == "*":
            tail = ".".join(labels[1:])
            if tail:
                rules.append((tail, len(labels) - 1, len(labels), False))
        elif exc:
            rules.append((s, len(labels), len(labels) - 1, True))
        else:
            rules.append((s, len(labels), len(labels), False))
    return rules


def psl_table(spark, rules) -> DataFrame:
    """The broadcast side of :func:`registered_domain_psl`: one row per
    PSL rule, deduplicated on the join key (exceptions outrank, then the
    longest suffix — mirroring the PSL's own precedence)."""
    from realtime_olap_spark.localframe import local_frame  # noqa: PLC0415
    df = local_frame(
        spark, rules, ["match_key", "key_depth", "suffix_len", "is_exc"],
        "match_key string, key_depth int, suffix_len int, is_exc boolean")
    w_best = F.struct(F.col("is_exc").cast("int").alias("p"),
                      F.col("suffix_len").alias("s"))
    return (df.groupBy("match_key", "key_depth")
            .agg(F.max(w_best).alias("b"))
            .select("match_key", "key_depth",
                    F.col("b.s").alias("suffix_len"),
                    (F.col("b.p") == 1).alias("is_exc")))


def registered_domain_psl(df: DataFrame, host_col: Column | str,
                          psl: DataFrame,
                          out_col: str = "registered_domain",
                          max_depth: int | None = None) -> DataFrame:
    """Registrable domain under a FULL public-suffix list — the
    production twin of :func:`registered_domain` (which embeds a small
    literal subset): the PSL ships as a broadcast TABLE, so updating it
    is a data change, not a code change.

    Implements the publicsuffix.org algorithm: among matching rules an
    exception wins, else the longest suffix, else the implicit ``*``
    default (bare TLD); the registrable domain is the suffix plus one
    label, and a host that IS a public suffix yields NULL (stricter than
    ``registered_domain``, which passes bare hosts through for dedup-key
    stability).

    Plan shape: the host's last-d label tails are scan-side slices; each
    depth left-joins the broadcast PSL slice for that depth; the winner
    folds with when/greatest. One broadcast join per distinct rule key
    depth PRESENT IN THE TABLE (``max_depth`` defaults to the table's
    own max — one driver-side aggregate over the tiny rule table at plan
    build, so a list with 5-label rules gets 5 joins and none is
    silently ignored); the corpus is never shuffled."""
    if max_depth is None:
        row = psl.agg(F.max("key_depth")).first()[0]
        max_depth = int(row) if row is not None else 1
    h = F.lower(_c(host_col))
    parts = F.split(h, "\\.")
    n = F.size(parts)
    out = df.withColumn("__h", h).withColumn("__n", n)
    for d in range(1, max_depth + 1):
        tail = F.array_join(
            F.slice(F.split(F.col("__h"), "\\."),
                    F.greatest(F.col("__n") - F.lit(d - 1), F.lit(1)),
                    F.lit(d)), ".")
        out = out.withColumn(f"__t{d}", F.when(F.col("__n") >= d, tail))
        side = (psl.where(F.col("key_depth") == d)
                .select(F.col("match_key").alias(f"__t{d}"),
                        F.col("suffix_len").alias(f"__sl{d}"),
                        F.col("is_exc").alias(f"__exc{d}")))
        out = out.join(F.broadcast(side), f"__t{d}", "left")
    # a rule only applies when the host has at least suffix_len labels
    # (a wildcard's * must bind a real label)
    valid = [F.when((F.col(f"__sl{d}").isNotNull())
                    & (F.col("__n") >= F.col(f"__sl{d}")), F.col(f"__sl{d}"))
             for d in range(1, max_depth + 1)]
    exc = F.coalesce(
        *[F.when(F.col(f"__exc{d}"), v) for d, v in enumerate(valid, 1)],
        F.lit(None).cast("int"))
    best = F.greatest(*[F.coalesce(v, F.lit(0)) for v in valid], F.lit(1))
    sl = F.coalesce(exc, best)
    parts2 = F.split(F.col("__h"), "\\.")
    reg = F.when(F.col("__n") > sl,
                 F.array_join(
                     F.slice(parts2, F.col("__n") - sl, sl + F.lit(1)), "."))
    out = out.withColumn(out_col, reg)
    drop = (["__h", "__n"]
            + [c for d in range(1, max_depth + 1)
               for c in (f"__t{d}", f"__sl{d}", f"__exc{d}")])
    return out.drop(*drop)


def _kept_params(query: Column,
                 drop_prefixes: tuple[str, ...]) -> Column:
    """Sorted surviving ``k=v`` tokens of a query string: split on '&',
    drop empties and tracking params (prefix match on the key), sort for a
    canonical order."""
    toks = F.filter(F.split(query, "&"), lambda t: t != F.lit(""))

    def is_tracking(t: Column) -> Column:
        # entries ending in '_' are prefix families (utm_*, ref_* — plus
        # the bare key itself); the rest match exactly
        key = F.split(t, "=")[0]
        cond = F.lit(False)
        for p in drop_prefixes:
            if p.endswith("_"):
                cond = cond | key.startswith(p) | (key == F.lit(p[:-1]))
            else:
                cond = cond | (key == F.lit(p))
        return cond

    return F.array_sort(F.filter(toks, lambda t: ~is_tracking(t)))


def normalize_url(url: Column | str,
                  drop_prefixes: tuple[str, ...] = TRACKING_PARAM_PREFIXES,
                  strip_www: bool = True) -> Column:
    """Canonical URL for dedup keys (the C4/RefinedWeb scrub):

    - scheme and host lowercased; ``www.`` prefix dropped (optional);
    - userinfo, default ports (``:80`` http / ``:443`` https) and the
      fragment dropped (any explicit non-default port is kept);
    - tracking query parameters dropped; survivors sorted for a canonical
      order (param order is presentation, not identity);
    - trailing ``/`` dropped from a non-root path; empty path -> ``/``.

    Unparseable urls (no ``scheme://host``) pass through unchanged —
    curation must never invent a key. One projection of regexp + array
    expressions; zero shuffle, zero UDF."""
    u = _c(url)
    scheme = url_scheme(u)
    host = url_host(u)
    if strip_www:
        # (www.)+ — 'www.www.x' must reach its fixpoint in ONE pass, or
        # normalization is not idempotent (the dedup-key contract). The
        # strip is all-or-nothing, GUARDED: it only applies when the
        # stripped host still has >= 2 labels and is not a bare public
        # suffix, so a registrable host whose second-level label IS
        # 'www' ('www.com', 'www.co.uk') keeps its identity instead of
        # collapsing onto a different host (advice r6). All-or-nothing
        # keeps the one-pass fixpoint property (hypothesis-tested).
        stripped = F.regexp_replace(host, "^(www\\.)+", "")
        bare_suffix = F.array_contains(
            F.array(*[F.lit(s) for s in MULTIPART_SUFFIXES]), stripped)
        ok = (F.size(F.split(stripped, "\\.")) >= 2) & ~bare_suffix
        host = F.when(ok, stripped).otherwise(host)
    port = F.regexp_extract(u, _PORT, 1)
    default_port = ((scheme == "http") & (port == "80")) | \
                   ((scheme == "https") & (port == "443"))
    port_part = F.when((port == "") | default_port, F.lit("")) \
                 .otherwise(F.concat(F.lit(":"), port))
    path = url_path(u)
    # '/+$' not '/$': '/a//' must reach '/a' in one pass (idempotence)
    path = F.when(path == "", F.lit("/")) \
            .otherwise(F.regexp_replace(path, "/+$", ""))
    path = F.when(path == "", F.lit("/")).otherwise(path)  # "/" stripped to ""
    kept = _kept_params(url_query(u), drop_prefixes)
    query_part = F.when(F.size(kept) > 0,
                        F.concat(F.lit("?"), F.array_join(kept, "&"))) \
                  .otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
    return F.when(host == "", u).otherwise(canon)


def url_dedup(df: DataFrame, url_col: str, keep_by: str,
              drop_prefixes: tuple[str, ...] = TRACKING_PARAM_PREFIXES
              ) -> DataFrame:
    """Keep one row per CANONICAL url (min ``keep_by``) — exact dedup on
    the normalized form, so ``?utm_source=x`` twins and trailing-slash
    variants collapse. Single shuffle on the canonical key."""
    from realtime_olap_spark.operators.dedup import dedup_exact
    canon = normalize_url(F.col(url_col), drop_prefixes)
    out = dedup_exact(df.withColumn("__canon", canon), ["__canon"],
                      keep_by=keep_by)
    return out.drop("__canon")


def domain_blocklist_filter(df: DataFrame, url_col: str,
                            blocked_domains: DataFrame,
                            block_col: str = "domain") -> DataFrame:
    """Drop rows whose REGISTERED domain is blocklisted — broadcast
    anti-join (blocklists are KBs; the corpus never shuffles). Subdomains
    of a blocked domain are blocked with it, which is what a domain
    blocklist means."""
    dom = registered_domain(url_host(F.col(url_col)))
    return (df.withColumn("__dom", dom)
            .join(F.broadcast(
                blocked_domains.select(F.col(block_col).alias("__dom"))),
                "__dom", "left_anti")
            .drop("__dom"))


def _cap_domain(url_col: str) -> Column:
    """Registered domain as a CAP GROUP key: NULL urls coalesce to the
    same '' pseudo-domain as unparseable ones (url_host returns '' on
    non-match, NULL only on NULL input), so both cap variants treat
    domain-less rows as one group instead of NULL-joining them away."""
    return F.coalesce(registered_domain(url_host(F.col(url_col))),
                      F.lit(""))


def domain_frequency_cap(df: DataFrame, url_col: str, key: Column | str,
                         cap: int,
                         tiebreak: Column | str | None = None) -> DataFrame:
    """EXACT per-registered-domain cap: keep the ``cap`` rows with the
    smallest content hash per domain — a row property given the domain's
    membership, stable across re-layouts.

    TWO-PHASE (skew guard, r6 directive): one per-domain count first;
    domains at-or-under cap PASS THROUGH untouched (a probe join against
    the over-cap domain set — on real corpora that is almost every row),
    and only the over-cap remainder enters the windowed rank. The window
    therefore consumes |over-cap rows|, not the corpus, and Spark's
    WindowGroupLimit additionally prunes each mapper's contribution to
    ``cap`` rows per domain before the shuffle, so even a domain holding
    a double-digit share of the corpus never materializes a full
    per-domain sort. The over-cap set is NOT broadcast-hinted: its size
    is corpus-dependent (cap=1 on a dup-heavy corpus makes it ~|distinct
    domains|), so Catalyst/AQE picks broadcast vs shuffle from the true
    runtime size — the same size-aware discipline as
    ``dedup.jaccard_verify``.

    Ties on ``hash(key)`` (true duplicate content inside one domain)
    would otherwise break by partition arrival order; the rank therefore
    also orders by ``tiebreak`` (default: the url itself). Pass a UNIQUE
    id as ``tiebreak`` for full determinism when url+key pairs can
    repeat exactly.

    ``domain_cap_rate`` remains the recommended 100 TB default (never
    shuffles or sorts the corpus at all); this exact variant is for
    cap contracts that must hold exactly."""
    from pyspark.sql.window import Window
    h = F.xxhash64(_c(key))
    tb = _c(tiebreak) if tiebreak is not None else F.col(url_col)
    with_dom = df.withColumn("__dom", _cap_domain(url_col))
    counts = with_dom.groupBy("__dom").agg(F.count(F.lit(1)).alias("__n"))
    over = (counts.where(F.col("__n") > cap)
            .select("__dom", F.lit(True).alias("__over")))
    flagged = with_dom.join(over, "__dom", "left")
    under = flagged.where(F.col("__over").isNull()).drop("__over", "__dom")
    w = Window.partitionBy("__dom").orderBy(h.asc(), tb.asc())
    capped = (flagged.where(F.col("__over").isNotNull())
              .withColumn("__rk", F.row_number().over(w))
              .where(F.col("__rk") <= cap)
              .drop("__rk", "__over", "__dom"))
    return under.unionByName(capped)


_MOD = 1_000_000


def domain_cap_rate(df: DataFrame, url_col: str, key: Column | str,
                    cap: int) -> DataFrame:
    """Rate-based per-domain cap — the 100 TB shape: ONE per-domain count
    aggregate (tiny: #domains rows, broadcast back), then a scan-side
    keep decision ``bucket(hash(key)) < round(1e6 * min(1, cap/n))``.
    The kept count per domain is cap in expectation (binomial, tight at
    these n); no row of the corpus is ever shuffled or sorted. Same
    deterministic row-property decision discipline as
    ``mixture.apply_mixture_rates``. Domain-less rows (NULL/unparseable
    url) form one '' pseudo-group — capped, never silently dropped."""
    with_dom = df.withColumn("__dom", _cap_domain(url_col))
    counts = with_dom.groupBy("__dom").agg(F.count(F.lit(1)).alias("__n"))
    rate = F.least(F.lit(1.0), F.lit(float(cap)) / F.col("__n"))
    cut = F.round(rate * _MOD).cast("long")
    bucket = F.pmod(F.xxhash64(_c(key)), F.lit(_MOD))
    return (with_dom
            .join(F.broadcast(counts.select("__dom", cut.alias("__cut"))),
                  "__dom")
            .where(bucket < F.col("__cut"))
            .drop("__dom", "__cut"))
