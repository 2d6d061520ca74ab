"""Randomized differential query generator — the reference's signature
correctness idea (pinot-integration-tests/.../QueryGenerator.java:65; header
:40-64 documents the generated surface: COMPARISON/IN/BETWEEN predicates,
SUM/MIN/MAX/AVG/COUNT aggregations, group-by, having, selection order-by).

Each seed yields a (PQL string, DuckDB SQL string) pair over lineitem; the
PQL runs through the full parse → compile → execute front end
(plans/pql.py), the SQL through the oracle, and results must match exactly.

Determinism rules baked into generation:
- selections ORDER BY every selected column ((l_orderkey, l_linenumber) is
  NOT unique in the synthetic data), so any rows tied at the LIMIT boundary
  are identical tuples and the limited set is well-defined;
- group-by emits TOP 100 with group cardinality ≤ 42×(expr-key fanout) →
  no trimming, the whole result set compares order-insensitively;
- SUM/AVG run in DECIMAL(38,10) on both sides (engine dsum/davg ↔ OSUM/OAVG);
- HAVING compares the integer-exact aggregates only (count_star /
  distinctcount_*), through the parser's full predicate grammar
  (comparison / BETWEEN / [NOT] IN / AND-OR compounds);
- DISTINCTCOUNT is exact both sides; PERCENTILE<N> is the exact
  interpolated quantile (Spark `percentile` ↔ DuckDB `quantile_cont`,
  bit-identical); arithmetic-expression aggregation args and group-by keys
  use the compiler's ``fn_arg1_arg2`` column-name convention so aliases
  line up without an AS (PQL has none).
"""

from __future__ import annotations

import random

from realtime_olap_spark.suite.sqlgen import OAVG, OPCT, OSUM

DIMS = {
    "l_returnflag": ["'A'", "'N'", "'R'"],
    "l_linestatus": ["'F'", "'O'"],
    "l_linenumber": [str(v) for v in range(1, 8)],
}
METRICS = {
    "l_quantity": (1, 50),
    "l_extendedprice": (900, 105000),
    "l_discount": (0, 1),
    "l_tax": (0, 1),
}
AGG_FNS = ["sum", "min", "max", "avg", "count", "distinctcount",
           "percentile"]
CMP_OPS = ["=", "<>", "<", "<=", ">", ">="]
DC_COLS = ["l_suppkey", "l_linenumber", "l_returnflag", "l_partkey"]
PCTS = [25, 50, 90, 99]
# arithmetic expression keys: (pql text, engine column name, sql).
# Engine arithmetic is DOUBLE (Pinot ArithmeticFunctions semantics), so the
# oracle side must cast — DuckDB would otherwise keep INTEGER.
EXPR_KEYS = [
    ("l_linenumber + 10", "add_l_linenumber_10",
     "CAST(l_linenumber + 10 AS DOUBLE)"),
    ("mult(l_linenumber, 3)", "mult_l_linenumber_3",
     "CAST(l_linenumber * 3 AS DOUBLE)"),
    ("l_linenumber - 1", "sub_l_linenumber_1",
     "CAST(l_linenumber - 1 AS DOUBLE)"),
]


def _regexp_pred(rng: random.Random) -> str:
    """REGEXP_LIKE on a dim; patterns kept in the Java∩RE2∩DuckDB common
    subset: anchored character classes, anchored parenthesized
    alternation, and the '.' wildcard."""
    col = rng.choice(["l_returnflag", "l_linestatus"])
    style = rng.choice(["class", "class", "alt", "dot"])
    if style == "dot":
        return f"REGEXP_LIKE({col}, '^.$')"
    picks = [v.strip("'") for v in rng.sample(DIMS[col], k=rng.randint(1, 2))]
    if style == "alt":
        alt = "|".join(picks)
        return f"REGEXP_LIKE({col}, '^({alt})$')"
    cls = "".join(picks)
    return f"REGEXP_LIKE({col}, '^[{cls}]$')"


def _predicate(rng: random.Random) -> str:
    kind = rng.choice(["cmp_dim", "in_dim", "cmp_metric", "between",
                       "regexp", "boundary"])
    if kind == "cmp_dim":
        col = rng.choice(list(DIMS))
        return f"{col} {rng.choice(['=', '<>'])} {rng.choice(DIMS[col])}"
    if kind == "in_dim":
        col = rng.choice(list(DIMS))
        vals = rng.sample(DIMS[col], k=min(len(DIMS[col]), rng.randint(1, 3)))
        if rng.random() < 0.2:  # duplicated IN values are legal
            vals.append(vals[0])
        neg = rng.random() < 0.3
        return f"{col} {'NOT IN' if neg else 'IN'} ({', '.join(vals)})"
    if kind == "cmp_metric":
        col = rng.choice(list(METRICS))
        lo, hi = METRICS[col]
        v = round(rng.uniform(lo, hi), 2)
        return f"{col} {rng.choice(CMP_OPS)} {v}"
    if kind == "between":
        col = rng.choice(list(METRICS))
        lo, hi = METRICS[col]
        a, b = sorted(round(rng.uniform(lo, hi), 2) for _ in range(2))
        if rng.random() < 0.15:
            b = a  # degenerate single-point BETWEEN
        elif rng.random() < 0.15:
            a, b = b, a + 1  # inverted bounds → empty in both engines
        return f"{col} BETWEEN {a} AND {b}"
    if kind == "boundary":
        # negative / zero / exact-edge literals: always-true and
        # always-false comparisons must agree too, and the PQL unary
        # minus must parse in comparisons, BETWEENs and IN lists
        col = rng.choice(list(METRICS) + ["l_linenumber"])
        lo, hi = METRICS.get(col, (1, 7))
        v = rng.choice([0, -1, lo, hi, -lo, hi + 1])
        shape = rng.choice(["cmp", "between", "in"])
        if shape == "between":
            return f"{col} BETWEEN {min(-1, -v)} AND {v}"
        if shape == "in" and col == "l_linenumber":
            return f"{col} IN (-1, 0, {rng.randint(1, 7)})"
        return f"{col} {rng.choice(CMP_OPS)} {v}"
    return _regexp_pred(rng)


def _where(rng: random.Random) -> str:
    n = rng.randint(0, 3)
    if n == 0:
        return ""
    if n == 3 and rng.random() < 0.25:
        # REGEXP_LIKE inside a nested OR tree (r9 verdict grammar corner)
        p1, p2 = _regexp_pred(rng), _predicate(rng)
        p3 = _predicate(rng)
        return f" WHERE ({p1} OR {p2}) AND {p3}"
    preds = [_predicate(rng) for _ in range(n)]
    if n == 3 and rng.random() < 0.5:
        # nested boolean tree with explicit parens (FilterQueryTree nesting)
        inner, outer = rng.choice(["AND", "OR"]), rng.choice(["AND", "OR"])
        if rng.random() < 0.3:  # deeper: two parenthesized subtrees
            p4 = _predicate(rng)
            return (f" WHERE ({preds[0]} {inner} {preds[1]}) "
                    f"{outer} ({preds[2]} {rng.choice(['AND', 'OR'])} {p4})")
        return (f" WHERE ({preds[0]} {inner} {preds[1]}) "
                f"{outer} {preds[2]}")
    op = rng.choice([" AND ", " OR "])
    return " WHERE " + op.join(preds)


def _metric_arg(rng: random.Random) -> tuple[str, str, str]:
    """A metric column or an arithmetic expression over it:
    (pql_arg, name_fragment, sql_arg). Names follow the compiler's
    ``fn_arg1_arg2`` convention (plans/pql._name_of)."""
    col = rng.choice(list(METRICS))
    kind = rng.choice(["plain", "plain", "mult", "add_cols"])
    if kind == "mult":
        k = rng.randint(2, 9)
        return f"{col} * {k}", f"mult_{col}_{k}", f"({col} * {k})"
    if kind == "add_cols":
        other = rng.choice([c for c in METRICS if c != col])
        return f"{col} + {other}", f"add_{col}_{other}", f"({col} + {other})"
    return col, col, col


def _agg(rng: random.Random) -> tuple[str, str, str]:
    """(pql_expr, oracle_expr_with_alias, alias)"""
    fn = rng.choice(AGG_FNS)
    if fn == "count":
        return "count(*)", "COUNT(*) AS count_star", "count_star"
    if fn == "distinctcount":
        col = rng.choice(DC_COLS)
        alias = f"distinctcount_{col}"
        return (f"distinctcount({col})",
                f"COUNT(DISTINCT {col}) AS {alias}", alias)
    if fn == "percentile":
        pct = rng.choice(PCTS)
        col = rng.choice(list(METRICS))
        alias = f"percentile{pct}_{col}"
        return (f"percentile{pct}({col})",
                f"{OPCT(col, pct / 100)} AS {alias}", alias)
    arg, frag, sql_arg = _metric_arg(rng)
    alias = f"{fn}_{frag}"
    if fn == "sum":
        return f"sum({arg})", f"{OSUM(sql_arg)} AS {alias}", alias
    if fn == "avg":
        return f"avg({arg})", f"{OAVG(sql_arg)} AS {alias}", alias
    return (f"{fn}({arg})",
            f"{fn.upper()}({sql_arg}) AS {alias}", alias)


def _having(rng: random.Random, int_aggs) -> tuple[str, str]:
    """HAVING over the integer-exact aggregates (count_star /
    distinctcount_*): simple comparison, BETWEEN, [NOT] IN, and two-term
    AND/OR compounds — the full predicate grammar the PQL parser accepts
    in HAVING position (r9 verdict grammar corner). Values span selective
    to empty; both engines must agree either way."""
    def one_cond(a):
        alias, sql_expr = a[2], a[1].split(" AS ")[0]
        kind = rng.choice(["cmp", "cmp", "between", "in", "not_in"])
        if kind == "cmp":
            k = rng.randint(1, 3000)
            op = rng.choice(CMP_OPS)
            return f"{alias} {op} {k}", f"{sql_expr} {op} {k}"
        if kind == "between":
            a_, b_ = sorted(rng.randint(0, 3000) for _ in range(2))
            return (f"{alias} BETWEEN {a_} AND {b_}",
                    f"{sql_expr} BETWEEN {a_} AND {b_}")
        vals = sorted({rng.randint(0, 2500) for _ in range(rng.randint(1, 4))})
        lst = ", ".join(map(str, vals))
        neg = "NOT IN" if kind == "not_in" else "IN"
        return f"{alias} {neg} ({lst})", f"{sql_expr} {neg} ({lst})"

    conds = [one_cond(a) for a in
             rng.sample(int_aggs, k=min(len(int_aggs),
                                        1 if rng.random() < 0.6 else 2))]
    if len(conds) == 1:
        p, s = conds[0]
    else:
        op = rng.choice(["AND", "OR"])
        p = f"{conds[0][0]} {op} {conds[1][0]}"
        s = f"{conds[0][1]} {op} {conds[1][1]}"
    return f" HAVING {p}", f" HAVING {s}"


def _events_agg(rng: random.Random) -> tuple[str, str]:
    """Aggregation over the events table with TIMESTAMP-literal predicates
    — the time-semantics hardening shape (string→timestamp coercion, UTC
    session, BETWEEN over timestamps must agree across engines)."""
    preds = []
    if rng.random() < 0.8:
        d1, d2 = sorted(rng.sample(range(1, 30), 2))
        preds.append(f"ts BETWEEN '2024-01-{d1:02d}' AND '2024-01-{d2:02d}'")
    if rng.random() < 0.5:
        types = rng.sample(["click", "view", "error", "signup", "purchase"],
                           k=rng.randint(1, 3))
        preds.append("event_type IN (" + ", ".join(f"'{t}'" for t in types) + ")")
    if rng.random() < 0.4:
        preds.append(f"value {rng.choice(CMP_OPS)} {round(rng.uniform(0, 100), 2)}")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    aggs = ["COUNT(*) AS count_star", f"{OSUM('value')} AS sum_value",
            "MIN(value) AS min_value"]
    pql_aggs = "count(*), sum(value), min(value)"
    keys = ["event_type"] + (["user_id"] if rng.random() < 0.4 else [])
    kl = ", ".join(keys)
    pql = (f"SELECT {kl}, {pql_aggs} FROM events{where} "
           f"GROUP BY {kl} TOP 1000")
    sql = (f"SELECT {kl}, {', '.join(aggs)} FROM events{where} "
           f"GROUP BY {kl}")
    return pql, sql


#: TIMECONVERT narrowing targets: (PQL unit, nanos per unit).
_TIME_UNITS = [("MINUTES", 60_000_000_000),
               ("HOURS", 3_600_000_000_000),
               ("DAYS", 86_400_000_000_000)]


def _time_bucket_agg(rng: random.Random) -> tuple[str, str]:
    """Group events by a TIMECONVERT epoch bucket — the transform-in-
    group-by shape over the time column, through the full PQL front end.
    The engine floor-divides epoch NANOS through DECIMAL (exact); the
    oracle twin is DuckDB integer floor-division of epoch_ns(ts)."""
    unit, per = rng.choice(_TIME_UNITS)
    alias = f"timeconvert_ts_ns_NANOSECONDS_{unit}"
    preds = []
    if rng.random() < 0.6:
        d1, d2 = sorted(rng.sample(range(1, 30), 2))
        preds.append(f"ts BETWEEN '2024-01-{d1:02d}' AND '2024-01-{d2:02d}'")
    if rng.random() < 0.4:
        types = rng.sample(["click", "view", "error", "signup", "purchase"],
                           k=rng.randint(1, 2))
        preds.append("event_type IN ("
                     + ", ".join(f"'{t}'" for t in types) + ")")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    key_pql = f"timeconvert(ts_ns, 'NANOSECONDS', '{unit}')"
    key_sql = f"CAST(epoch_ns(ts) // {per} AS BIGINT)"
    pql = (f"SELECT {key_pql}, count(*), sum(value) FROM events{where} "
           f"GROUP BY {key_pql} TOP 1000")
    sql = (f"SELECT {key_sql} AS {alias}, COUNT(*) AS count_star, "
           f"{OSUM('value')} AS sum_value FROM events{where} "
           f"GROUP BY 1")
    return pql, sql


def _docs_agg(rng: random.Random) -> tuple[str, str]:
    """Aggregation over the documents table — STRING dimensions with
    IN/REGEXP predicates and the n_chars metric, exercising the PQL
    front end on a second string-heavy table (text curation's home)."""
    preds = []
    if rng.random() < 0.7:
        langs = rng.sample(["en", "de", "fr", "es"], k=rng.randint(1, 3))
        neg = rng.random() < 0.3
        preds.append(f"lang {'NOT IN' if neg else 'IN'} ("
                     + ", ".join(f"'{x}'" for x in langs) + ")")
    if rng.random() < 0.5:
        a, b = sorted(rng.randint(0, 4000) for _ in range(2))
        preds.append(f"n_chars BETWEEN {a} AND {b}")
    if rng.random() < 0.3:
        d = rng.randint(0, 9)
        preds.append(f"REGEXP_LIKE(source, '^src[0-9]*{d}$')")
    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    sql_where = where.replace("REGEXP_LIKE(", "regexp_matches(")
    keys = rng.choice([["lang"], ["source"], ["lang", "source"]])
    kl = ", ".join(keys)
    aggs_pql = "count(*), sum(n_chars), max(n_chars), min(doc_id)"
    aggs_sql = (f"COUNT(*) AS count_star, {OSUM('n_chars')} AS sum_n_chars, "
                "MAX(n_chars) AS max_n_chars, MIN(doc_id) AS min_doc_id")
    pql = (f"SELECT {kl}, {aggs_pql} FROM documents{where} "
           f"GROUP BY {kl} TOP 1000")
    sql = (f"SELECT {kl}, {aggs_sql} FROM documents{sql_where} "
           f"GROUP BY {kl}")
    return pql, sql


def generate(seed: int) -> tuple[str, str]:
    """One differential pair (pql, duckdb_sql) for the given seed."""
    rng = random.Random(seed)
    shape = rng.choice(["selection", "scalar_agg", "group_by", "events_agg",
                        "time_bucket", "docs_agg"])
    if shape == "docs_agg":
        return _docs_agg(rng)
    if shape == "time_bucket":
        return _time_bucket_agg(rng)
    if shape == "events_agg":
        return _events_agg(rng)
    where = _where(rng)
    # same predicate text in both dialects, except DuckDB spells the regex
    # predicate regexp_matches
    sql_where = where.replace("REGEXP_LIKE(", "regexp_matches(")

    if shape == "selection":
        extra = rng.sample(
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_suppkey", "l_discount"], k=rng.randint(0, 3))
        cols = ["l_orderkey", "l_linenumber", *extra]
        limit = rng.randint(1, 40)
        offset = rng.choice([0, 0, rng.randint(1, 15)])
        sel = ", ".join(cols)
        # mixed ASC/DESC over EVERY selected column: total order → the
        # LIMIT/OFFSET window is well-defined in both engines
        dirs = [rng.choice(["ASC", "DESC"]) for _ in cols]
        order = "ORDER BY " + ", ".join(
            f"{c} {d}" for c, d in zip(cols, dirs))
        pql_lim = f"LIMIT {offset}, {limit}" if offset else f"LIMIT {limit}"
        sql_lim = (f"LIMIT {limit} OFFSET {offset}" if offset
                   else f"LIMIT {limit}")
        pql = f"SELECT {sel} FROM lineitem{where} {order} {pql_lim}"
        sql = f"SELECT {sel} FROM lineitem{sql_where} {order} {sql_lim}"
        return pql, sql

    n_aggs = rng.randint(1, 3)
    aggs = [_agg(rng) for _ in range(n_aggs)]
    # dedup aliases (same fn+col twice breaks column naming)
    seen, uniq = set(), []
    for a in aggs:
        if a[2] not in seen:
            seen.add(a[2])
            uniq.append(a)
    aggs = uniq
    pql_aggs = ", ".join(a[0] for a in aggs)
    sql_aggs = ", ".join(a[1] for a in aggs)

    if shape == "scalar_agg":
        return (f"SELECT {pql_aggs} FROM lineitem{where}",
                f"SELECT {sql_aggs} FROM lineitem{sql_where}")

    keys = rng.sample(list(DIMS), k=rng.randint(1, 2))
    pql_keys, sql_sel_keys, sql_grp_keys = list(keys), list(keys), list(keys)
    if rng.random() < 0.4:  # expression group-by key (transform-in-group-by)
        kp, kname, ksql = rng.choice(EXPR_KEYS)
        pql_keys.append(kp)
        sql_sel_keys.append(f"{ksql} AS {kname}")
        sql_grp_keys.append(ksql)
    having_pql = having_sql = ""
    int_aggs = [a for a in aggs
                if a[2] == "count_star" or a[2].startswith("distinctcount_")]
    if int_aggs and rng.random() < 0.5:
        having_pql, having_sql = _having(rng, int_aggs)
    pql = (f"SELECT {', '.join(pql_keys)}, {pql_aggs} FROM lineitem{where} "
           f"GROUP BY {', '.join(pql_keys)}{having_pql} TOP 100")
    sql = (f"SELECT {', '.join(sql_sel_keys)}, {sql_aggs} "
           f"FROM lineitem{sql_where} "
           f"GROUP BY {', '.join(sql_grp_keys)}{having_sql}")
    return pql, sql
