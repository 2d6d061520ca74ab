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
- group-by emits TOP 100 with group cardinality ≤ 42 → no trimming, the
  whole result set compares order-insensitively;
- SUM/AVG run in DECIMAL(38,10) on both sides (engine dsum/davg ↔ OSUM/OAVG);
- HAVING compares the integer count_star only.
"""

from __future__ import annotations

import random

from realtime_olap_spark.suite.sqlgen import OAVG, OSUM

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
AGG_FNS = ["sum", "min", "max", "avg", "count"]
CMP_OPS = ["=", "<>", "<", "<=", ">", ">="]


def _predicate(rng: random.Random) -> str:
    kind = rng.choice(["cmp_dim", "in_dim", "cmp_metric", "between", "regexp"])
    if kind == "cmp_dim":
        col = rng.choice(list(DIMS))
        return f"{col} {rng.choice(['=', '<>'])} {rng.choice(DIMS[col])}"
    if kind == "in_dim":
        col = rng.choice(list(DIMS))
        vals = rng.sample(DIMS[col], k=min(len(DIMS[col]), rng.randint(1, 3)))
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
        return f"{col} BETWEEN {a} AND {b}"
    # REGEXP_LIKE on a dim; patterns kept in the Java∩RE2 common subset
    col = rng.choice(["l_returnflag", "l_linestatus"])
    chars = "".join(v.strip("'") for v in rng.sample(DIMS[col], k=rng.randint(1, 2)))
    return f"REGEXP_LIKE({col}, '^[{chars}]$')"


def _where(rng: random.Random) -> str:
    n = rng.randint(0, 3)
    if n == 0:
        return ""
    preds = [_predicate(rng) for _ in range(n)]
    op = rng.choice([" AND ", " OR "])
    return " WHERE " + op.join(preds)


def _agg(rng: random.Random) -> tuple[str, str, str]:
    """(pql_expr, oracle_expr_with_alias, alias)"""
    fn = rng.choice(AGG_FNS)
    if fn == "count":
        return "count(*)", "COUNT(*) AS count_star", "count_star"
    col = rng.choice(list(METRICS))
    alias = f"{fn}_{col}"
    if fn == "sum":
        return f"sum({col})", f"{OSUM(col)} AS {alias}", alias
    if fn == "avg":
        return f"avg({col})", f"{OAVG(col)} AS {alias}", alias
    return f"{fn}({col})", f"{fn.upper()}({col}) AS {alias}", alias


def generate(seed: int) -> tuple[str, str]:
    """One differential pair (pql, duckdb_sql) for the given seed."""
    rng = random.Random(seed)
    shape = rng.choice(["selection", "scalar_agg", "group_by"])
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
        sel = ", ".join(cols)
        order = "ORDER BY " + ", ".join(f"{c} ASC" for c in cols)
        pql = f"SELECT {sel} FROM lineitem{where} {order} LIMIT {limit}"
        sql = f"SELECT {sel} FROM lineitem{sql_where} {order} LIMIT {limit}"
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
    key_list = ", ".join(keys)
    having_pql = having_sql = ""
    if any(a[2] == "count_star" for a in aggs) and rng.random() < 0.5:
        k = rng.randint(1, 50)
        having_pql = f" HAVING count_star > {k}"
        having_sql = f" HAVING COUNT(*) > {k}"
    pql = (f"SELECT {key_list}, {pql_aggs} FROM lineitem{where} "
           f"GROUP BY {key_list}{having_pql} TOP 100")
    sql = (f"SELECT {key_list}, {sql_aggs} FROM lineitem{sql_where} "
           f"GROUP BY {key_list}{having_sql}")
    return pql, sql
