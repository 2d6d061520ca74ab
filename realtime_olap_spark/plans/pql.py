"""PQL-dialect front end.

Replicates the reference's query language surface (grammar:
pinot-common/src/main/antlr4/.../PQL2.g4; compiler:
pinot-common/.../pql/parsers/Pql2Compiler.java:58,78 → thrift BrokerRequest,
request.thrift:138-159):

    SELECT <outputs> FROM <table>
    [WHERE <predicate tree>]
    [GROUP BY <expressions>]
    [HAVING <aggregate comparisons>]
    [ORDER BY col [ASC|DESC], ...]      -- selection queries only (reference)
    [TOP n]                              -- group-by result size, default 10
    [LIMIT n | LIMIT offset, n]          -- selection size, default 10

Outputs are columns, transform-function calls (the closed 7-function set,
§2.9), infix arithmetic (compiled to ADD/SUB/MULT/DIV like PQL2.g4's
binaryMathOperator), ``*``, or aggregation calls (the closed registry, §2.4).
Predicates: ``= <> != < <= > >= BETWEEN IN NOT IN REGEXP_LIKE`` composed with
AND/OR (request.thrift:25-34, :60-75).

Group-by semantics follow the reference: results are the TOP n groups
ordered by the (first) aggregate descending (docs/pql_examples.rst:169-172,
default 10 :224) — computed exactly, with group-key tie-break for
determinism. Selection defaults LIMIT 10 (request.thrift:130-131).

This is a hand-written recursive-descent parser (~the size of the
reference's ANTLR listener) producing a ``PQLQuery`` IR — our
BrokerRequest — compiled onto the operator layer.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.functions.transform import resolve_transform
from realtime_olap_spark.operators import aggregation as A
from realtime_olap_spark.operators.groupby import Agg, Key, group_by_agg, having, top_n

DEFAULT_TOP = 10
DEFAULT_LIMIT = 10


# ---------------------------------------------------------------------------
# AST (TransformExpressionTree analog: FUNCTION | IDENTIFIER | LITERAL)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Ident:
    name: str


@dataclass(frozen=True)
class Lit:
    value: object


@dataclass(frozen=True)
class Func:
    name: str
    args: tuple


@dataclass(frozen=True)
class Cmp:
    op: str  # = <> < <= > >=
    left: object
    right: object


@dataclass(frozen=True)
class Between:
    expr: object
    low: object
    high: object


@dataclass(frozen=True)
class In:
    expr: object
    values: tuple
    negated: bool = False


@dataclass(frozen=True)
class RegexpLike:
    expr: object
    pattern: str


@dataclass(frozen=True)
class BoolOp:
    op: str  # AND | OR
    operands: tuple


@dataclass
class PQLQuery:
    """IR #1 — the BrokerRequest analog (request.thrift:138-159)."""

    select: list = field(default_factory=list)  # (expr, alias) pairs
    table: str = ""
    where: object | None = None
    group_by: list = field(default_factory=list)
    having_: object | None = None
    order_by: list = field(default_factory=list)  # (expr, asc) pairs
    top: int | None = None
    limit: tuple[int, int] | None = None  # (offset, n)

    @property
    def is_aggregation(self) -> bool:
        return any(_is_agg(e) for e, _ in self.select)


def _is_agg(expr) -> bool:
    if isinstance(expr, Func):
        try:
            A.resolve(expr.name)
            return True
        except KeyError:
            return False
    return False


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
    | (?P<string>'(?:[^']|'')*')
    | (?P<ident>[A-Za-z_][A-Za-z0-9_$.]*)
    | (?P<op><=|>=|<>|!=|=|<|>|\(|\)|,|\*|\+|-|/|%)
    )""", re.VERBOSE)

_KEYWORDS = {"select", "from", "where", "group", "by", "having", "order",
             "top", "limit", "and", "or", "not", "in", "between",
             "asc", "desc", "regexp_like", "is", "null"}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"PQL syntax error at: {text[pos:pos+30]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "ident" and val.lower() in _KEYWORDS:
            out.append(("kw", val.lower()))
        else:
            out.append((kind, val))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind, val=None):
        k, v = self.peek()
        if k == kind and (val is None or v == val):
            return self.next()
        return None

    def expect(self, kind, val=None):
        t = self.accept(kind, val)
        if t is None:
            raise ValueError(f"PQL: expected {val or kind}, got {self.peek()!r}")
        return t

    # --- expressions (precedence: * / over + -) ---------------------------

    def expr(self):
        left = self.term()
        while True:
            if self.accept("op", "+"):
                left = Func("add", (left, self.term()))
            elif self.accept("op", "-"):
                left = Func("sub", (left, self.term()))
            else:
                return left

    def term(self):
        left = self.factor()
        while True:
            if self.accept("op", "*"):
                left = Func("mult", (left, self.factor()))
            elif self.accept("op", "/"):
                left = Func("div", (left, self.factor()))
            else:
                return left

    def factor(self):
        k, v = self.peek()
        if k == "op" and v == "-":
            # Unary minus, handled grammatically like PQL2.g4: negate a
            # numeric literal directly, otherwise compile to SUB(0, expr).
            self.next()
            f = self.factor()
            if isinstance(f, Lit) and isinstance(f.value, (int, float)):
                return Lit(-f.value)
            return Func("sub", (Lit(0), f))
        if k == "number":
            self.next()
            return Lit(float(v) if ("." in v or "e" in v.lower()) else int(v))
        if k == "string":
            self.next()
            return Lit(v[1:-1].replace("''", "'"))
        if k == "op" and v == "(":
            self.next()
            e = self.expr()
            self.expect("op", ")")
            return e
        if k == "op" and v == "*":
            self.next()
            return Ident("*")
        if k == "ident":
            self.next()
            if self.accept("op", "("):
                args = []
                if not self.accept("op", ")"):
                    args.append(self.expr())
                    while self.accept("op", ","):
                        args.append(self.expr())
                    self.expect("op", ")")
                return Func(v.lower(), tuple(args))
            return Ident(v)
        raise ValueError(f"PQL: unexpected token {self.peek()!r}")

    # --- predicates --------------------------------------------------------

    def predicate(self):
        return self.or_pred()

    def or_pred(self):
        terms = [self.and_pred()]
        while self.accept("kw", "or"):
            terms.append(self.and_pred())
        return terms[0] if len(terms) == 1 else BoolOp("OR", tuple(terms))

    def and_pred(self):
        terms = [self.atom_pred()]
        while self.accept("kw", "and"):
            terms.append(self.atom_pred())
        return terms[0] if len(terms) == 1 else BoolOp("AND", tuple(terms))

    def atom_pred(self):
        if self.accept("op", "("):
            p = self.or_pred()
            self.expect("op", ")")
            return p
        if self.accept("kw", "regexp_like"):
            self.expect("op", "(")
            e = self.expr()
            self.expect("op", ",")
            pat = self.expect("string")[1][1:-1].replace("''", "'")
            self.expect("op", ")")
            return RegexpLike(e, pat)
        e = self.expr()
        if self.accept("kw", "is"):
            # The reference GRAMMAR accepts IS [NOT] NULL (PQL2.g4
            # isClause) but the IR cannot carry it (request.thrift:25-34
            # has no null predicate) — Pinot parses it then rejects at
            # conversion. Match that: parse fully, then raise the
            # Pinot-shaped unsupported-operation message instead of a
            # token-level syntax error.
            negated = bool(self.accept("kw", "not"))
            self.expect("kw", "null")
            raise ValueError(
                "Unsupported filter operator: IS "
                + ("NOT NULL" if negated else "NULL")
                + " (the PQL IR has no null predicate; "
                "rewrite with a sentinel default value)")
        if self.accept("kw", "between"):
            low = self.expr()
            self.expect("kw", "and")
            return Between(e, low, self.expr())
        if self.accept("kw", "not"):
            self.expect("kw", "in")
            return In(e, self._value_list(), negated=True)
        if self.accept("kw", "in"):
            return In(e, self._value_list())
        k, v = self.next()
        if k != "op" or v not in ("=", "<>", "!=", "<", "<=", ">", ">="):
            raise ValueError(f"PQL: expected comparison operator, got {v!r}")
        return Cmp("<>" if v == "!=" else v, e, self.expr())

    def _value_list(self):
        self.expect("op", "(")
        vals = [self.factor()]
        while self.accept("op", ","):
            vals.append(self.factor())
        self.expect("op", ")")
        return tuple(v.value for v in vals)

    # --- statement ---------------------------------------------------------

    def statement(self) -> PQLQuery:
        q = PQLQuery()
        self.expect("kw", "select")
        q.select.append((self.expr(), None))
        while self.accept("op", ","):
            q.select.append((self.expr(), None))
        self.expect("kw", "from")
        q.table = self.expect("ident")[1]
        if self.accept("kw", "where"):
            q.where = self.predicate()
        if self.accept("kw", "group"):
            self.expect("kw", "by")
            q.group_by.append(self.expr())
            while self.accept("op", ","):
                q.group_by.append(self.expr())
        if self.accept("kw", "having"):
            q.having_ = self.predicate()
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            q.order_by.append(self._order_item())
            while self.accept("op", ","):
                q.order_by.append(self._order_item())
        if self.accept("kw", "top"):
            q.top = int(self.expect("number")[1])
        if self.accept("kw", "limit"):
            a = int(self.expect("number")[1])
            if self.accept("op", ","):
                q.limit = (a, int(self.expect("number")[1]))
            else:
                q.limit = (0, a)
        self.expect("eof")
        return q

    def _order_item(self):
        e = self.expr()
        if self.accept("kw", "desc"):
            return (e, False)
        self.accept("kw", "asc")
        return (e, True)


def parse_pql(text: str) -> PQLQuery:
    """Pql2Compiler.compileToBrokerRequest analog."""
    return _Parser(_tokenize(text)).statement()


# ---------------------------------------------------------------------------
# Compiler: PQLQuery → DataFrame plan
# ---------------------------------------------------------------------------

def _name_of(expr) -> str:
    if isinstance(expr, Ident):
        return "star" if expr.name == "*" else expr.name
    if isinstance(expr, Lit):
        return str(expr.value)
    if isinstance(expr, Func):
        return f"{expr.name}_{'_'.join(_name_of(a) for a in expr.args)}"
    raise ValueError(f"cannot name {expr!r}")


def _col(expr, agg_aliases: dict | None = None) -> Column:
    """Compile a scalar expression tree (FUNCTION | IDENTIFIER | LITERAL)."""
    if isinstance(expr, Ident):
        if agg_aliases and expr.name in agg_aliases:
            return F.col(agg_aliases[expr.name])
        return F.col(expr.name)
    if isinstance(expr, Lit):
        return F.lit(expr.value)
    if isinstance(expr, Func):
        if agg_aliases is not None and _is_agg(expr):
            # HAVING position: aggregate call refers to its output column.
            return F.col(_name_of(expr))
        fn = resolve_transform(expr.name)
        if expr.name in ("timeconvert", "datetimeconvert"):
            head = _col(expr.args[0])
            rest = [a.value for a in expr.args[1:]]
            return fn(head, *rest)
        if expr.name == "valuein":
            head = _col(expr.args[0])
            return fn(head, *[a.value for a in expr.args[1:]])
        return fn(*[_col(a) for a in expr.args])
    raise ValueError(f"cannot compile {expr!r}")


def _pred(expr, agg_aliases: dict | None = None) -> Column:
    if isinstance(expr, BoolOp):
        cols = [_pred(p, agg_aliases) for p in expr.operands]
        out = cols[0]
        for c in cols[1:]:
            out = (out & c) if expr.op == "AND" else (out | c)
        return out
    if isinstance(expr, Cmp):
        l, r = _col(expr.left, agg_aliases), _col(expr.right, agg_aliases)
        return {"=": l == r, "<>": l != r, "<": l < r,
                "<=": l <= r, ">": l > r, ">=": l >= r}[expr.op]
    if isinstance(expr, Between):
        return _col(expr.expr, agg_aliases).between(
            _col(expr.low, agg_aliases), _col(expr.high, agg_aliases))
    if isinstance(expr, In):
        c = _col(expr.expr, agg_aliases).isin(list(expr.values))
        return ~c if expr.negated else c
    if isinstance(expr, RegexpLike):
        return _col(expr.expr, agg_aliases).rlike(expr.pattern)
    raise ValueError(f"cannot compile predicate {expr!r}")


def compile_pql(q: PQLQuery, df: DataFrame, trim: bool = True) -> DataFrame:
    """BrokerRequest → DataFrame plan (the InstancePlanMaker analog — except
    Catalyst owns physical planning).

    ``trim=True`` (DataFrame entry point): group-by results are TOP-n by the
    FIRST aggregation function with a deterministic key tie-break — one
    DataFrame can carry only one ordering. ``trim=False`` keeps all groups;
    the response-shaping path uses it to trim PER FUNCTION like the broker
    (docs/pql_examples.rst:239-258: each aggregation function returns its
    own top-n group list)."""
    where = _pred(q.where) if q.where is not None else None

    if q.is_aggregation:
        aggs = []
        for expr, _ in q.select:
            if not _is_agg(expr):
                continue  # group keys echo implicitly
            arg = None
            if expr.args and not (len(expr.args) == 1 and expr.args[0] == Ident("*")):
                arg = _col(expr.args[0])
            aggs.append(Agg(expr.name, arg, _name_of(expr)))
        keys = [Key(_col(g), _name_of(g)) for g in q.group_by]
        out = group_by_agg(df, keys=keys, aggs=aggs, where=where)
        agg_aliases = {a.alias: a.alias for a in aggs}
        if q.having_ is not None:
            out = having(out, _pred(q.having_, agg_aliases))
        if keys and trim:
            n = q.top if q.top is not None else DEFAULT_TOP
            out = top_n(out, aggs[0].alias, n, key_names=[k.alias for k in keys])
        return out

    # Selection query
    if len(q.select) == 1 and q.select[0][0] == Ident("*"):
        cols = df.columns
    else:
        cols = [_col(e).alias(_name_of(e)) for e, _ in q.select]
    if where is not None:
        df = df.where(where)
    out = df.select(*cols)
    if q.order_by:
        order = [(_col(e).asc() if asc else _col(e).desc()) for e, asc in q.order_by]
        out = out.orderBy(*order)
    offset, n = q.limit if q.limit is not None else (0, DEFAULT_LIMIT)
    if offset:
        out = out.offset(offset)
    return out.limit(n)


def plan_scan_stats(df: DataFrame, total_time_ms: float | None = None) -> dict:
    """Pinot-style execution stats (BrokerResponseNative.java:43, filled by
    BaseBrokerRequestHandler.java:114) read from the EXECUTED plan's
    operator metrics — call after the query ran.

    Spark-semantics mapping (each a faithful analog, documented where the
    execution models diverge):

    - totalDocs — rows leaving the parquet scans (post row-group/partition
      pruning); numDocsScanned — rows surviving the filter operators.
    - numEntriesScannedInFilter — Σ per Filter of (input rows × columns
      referenced by the predicate): the column-value reads the filter
      phase performed, Pinot's definition.
    - numEntriesScannedPostFilter — numDocsScanned × columns materialized
      by the scan (ReadSchema width): the values the post-filter operators
      consumed (column pruning makes this narrow, as Pinot's projection
      phase does).
    - numSegments{Queried,Processed} — segment = parquet file: files the
      pruned listing handed to tasks. numSegmentsMatched — files that
      produced rows; per-file row counts aren't in Spark's scan metrics,
      so this reports files-processed when any row matched, 0 otherwise
      (exact at the two ends; in between Spark simply doesn't know).
    - numServers{Queried,Responded} — executors that hosted tasks (the
      driver alone in local mode). Spark retries failed tasks internally,
      so Queried == Responded by the time results exist.
    - totalTimeMs — wall-clock of parse→execute, passed by the caller.
    """
    totals, filtered, entries_filter = [], [], []
    files, scan_width = [], []
    seen: set[int] = set()  # plan-node ids — count reused subtrees once

    def metric(node, name):
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == name:
                return kv._2().value()
        return None

    def descendant_rows(node):
        """numOutputRows of the nearest descendant that tracks it (the
        Filter's input side — codegen-internal nodes still carry it)."""
        it = node.children().iterator()
        while it.hasNext():
            c = it.next()
            v = metric(c, "numOutputRows")
            if v is not None:
                return v
            v = descendant_rows(c)
            if v is not None:
                return v
        return None

    def walk(node):
        nid = node.id()
        if nid in seen:
            return
        seen.add(nid)
        name = node.nodeName()
        if name.startswith("Scan "):
            v = metric(node, "numOutputRows")
            if v is not None:
                totals.append(v)
            nf = metric(node, "numFiles")
            if nf is not None:
                files.append(nf)
            try:
                scan_width.append(node.output().size())
            except Exception:
                pass
        elif name == "Filter":
            v = metric(node, "numOutputRows")
            if v is not None:
                filtered.append(v)
            inp = descendant_rows(node)
            if inp is not None:
                try:
                    ncols = node.condition().references().size()
                except Exception:
                    ncols = 1
                entries_filter.append(inp * max(ncols, 1))
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if "QueryStage" in name:
            walk(node.plan())
            return
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    total = sum(totals) if totals else None
    scanned = sum(filtered) if filtered else total
    n_files = sum(files) if files else None
    width = max(scan_width) if scan_width else None

    sc = df.sparkSession.sparkContext
    try:
        n_exec = max(len(sc._jsc.sc().getExecutorIds()), 1)
    except Exception:
        n_exec = 1

    stats = {
        "totalDocs": total,
        "numDocsScanned": scanned,
        "numEntriesScannedInFilter": (sum(entries_filter)
                                      if entries_filter else 0),
        "numEntriesScannedPostFilter": (scanned * width
                                        if scanned is not None
                                        and width is not None else None),
        "numSegmentsQueried": n_files,
        "numSegmentsProcessed": n_files,
        "numSegmentsMatched": (n_files if scanned else 0)
                              if n_files is not None else None,
        "numServersQueried": n_exec,
        "numServersResponded": n_exec,
    }
    if total_time_ms is not None:
        stats["totalTimeMs"] = int(round(total_time_ms))
    return stats


def exact_segments_matched(src: DataFrame, where=None) -> int:
    """EXACT numSegmentsMatched: parquet files ('segments') contributing at
    least one post-filter row. Spark's scan metrics carry no per-file
    matched-row counts, so ``plan_scan_stats`` can only bound this; when
    the caller opts in, this runs one extra **column-pruned** scan —
    ``input_file_name()`` captured directly above the filtered scan (before
    any shuffle, where it is still well-defined) and a single
    count-distinct. The extra pass reads only the predicate's columns and
    benefits from the same row-group pruning as the query, so its cost is
    a fraction of the query's own scan (Pinot reads the same answer off
    per-segment metadata: BrokerResponseNative.numSegmentsMatched)."""
    df = src.where(where) if where is not None else src
    return df.select(F.input_file_name().alias("__seg")) \
             .agg(F.count_distinct("__seg")).first()[0]


def grouped_topn_frame(q: PQLQuery, src: DataFrame):
    """The bounded per-function trim plan for a grouped aggregation: one
    TakeOrderedAndProject branch per aggregation function over the SHARED
    grouped aggregate, unioned with a ``__fn`` marker — at most
    top × n_functions rows ever reach the driver (the reference's
    trim-at-server, AggregationGroupByTrimmingService.java:58-62).
    Catalyst/AQE reuses the aggregate exchange across branches.

    Returns (frame, key_cols, fn_cols, n)."""
    grouped = compile_pql(q, src, trim=False)
    cols = grouped.columns
    key_cols = [c for c in cols if c in {_name_of(g) for g in q.group_by}]
    fn_cols = [c for c in cols if c not in key_cols]
    n = q.top if q.top is not None else DEFAULT_TOP
    # reference semantics: EACH function returns its own top-n groups ordered
    # by that function's value desc (docs/pql_examples.rst:239-258;
    # BrokerReduceService trims per AggregationInfo).
    branches = [
        top_n(grouped, c, n, key_names=key_cols).withColumn("__fn", F.lit(c))
        for c in fn_cols]
    u = branches[0]
    for b in branches[1:]:
        u = u.unionByName(b)
    return u, key_cols, fn_cols, n


class QueryTimeout(Exception):
    """Query exceeded its broker deadline (the reference returns an
    in-band EXECUTION_TIMEOUT exception in the BrokerResponse)."""


class PQLEngine:
    """Entry point A analog (BaseBrokerRequestHandler.handleRequest):
    parse → compile → execute, plus Pinot-shaped response output
    (BrokerResponseNative.java:43)."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.catalog = Catalog(spark, sf_dir) if sf_dir else Catalog(spark)

    def dataframe(self, pql: str) -> DataFrame:
        q = parse_pql(pql)
        return compile_pql(q, self.catalog.table(q.table))

    def execute(self, pql: str, timeout_ms: int | None = None,
                exact_segments: bool = False) -> dict:
        """Run and shape like BrokerResponseNative: selectionResults or
        aggregationResults + stats.

        Grouped aggregations trim PER FUNCTION **in Spark** — one bounded
        TakeOrderedAndProject branch per aggregation function, unioned, so
        the driver collects ≤ top × n_functions rows no matter how many
        groups exist (the reference's trim-at-server,
        AggregationGroupByTrimmingService.java:58-62 — never a full-group
        collect).

        ``timeout_ms`` enforces the broker's per-query deadline
        (BaseBrokerRequestHandler brokerTimeoutMs; in-band TIMEOUT
        exception in BrokerResponse): the query's Spark jobs run in a
        dedicated job group and a watchdog cancels the group — repeatedly,
        so a cancel landing between two of the query's sequential jobs
        still kills the next one — until the call returns."""
        if timeout_ms is not None:
            import threading
            import uuid

            sc = self.catalog.spark.sparkContext
            group = f"pql-{uuid.uuid4().hex[:12]}"
            sc.setJobGroup(group, pql[:120], interruptOnCancel=True)
            done = threading.Event()
            timed_out = threading.Event()

            def watchdog() -> None:
                if not done.wait(timeout_ms / 1000.0):
                    timed_out.set()
                    while not done.wait(0.05):
                        sc.cancelJobGroup(group)

            t = threading.Thread(target=watchdog, daemon=True)
            t.start()
            try:
                return self.execute(pql, exact_segments=exact_segments)
            except Exception as ex:
                if timed_out.is_set():
                    raise QueryTimeout(
                        f"query exceeded {timeout_ms} ms") from ex
                raise
            finally:
                done.set()
                sc.setLocalProperty("spark.jobGroup.id", None)
        import time as _time
        t0 = _time.perf_counter()
        q = parse_pql(pql)
        src = self.catalog.table(q.table)

        def finish(stats: dict) -> dict:
            # ``exact_segments=True`` trades one extra column-pruned scan
            # for an exact numSegmentsMatched (see exact_segments_matched);
            # the default keeps the zero-cost bound from plan_scan_stats.
            if exact_segments:
                stats["numSegmentsMatched"] = exact_segments_matched(
                    src, _pred(q.where) if q.where is not None else None)
            return stats

        if q.is_aggregation and q.group_by:
            u, key_cols, fn_cols, n = grouped_topn_frame(q, src)
            rows = u.collect()  # ≤ n × n_functions rows
            stats = finish(plan_scan_stats(u, (_time.perf_counter() - t0) * 1000))

            def per_function(c: str) -> list[dict]:
                # same tie-break as top_n's Spark ordering: NATIVE-typed
                # key asc, nulls first (str(key) would rank 10 before 2
                # and could change which tied groups survive the trim)
                sel = [r for r in rows if r["__fn"] == c]
                sel.sort(key=lambda r: (
                    -(r[c] if r[c] is not None else float("-inf")),
                    tuple((r[k] is not None, r[k]) for k in key_cols)))
                return [{"group": [r[k] for k in key_cols], "value": r[c]}
                        for r in sel]

            return {
                "aggregationResults": [{
                    "function": c,
                    "groupByColumns": key_cols,
                    "groupByResult": per_function(c),
                } for c in fn_cols],
                **stats,
            }

        df = compile_pql(q, src)  # scalar aggregation or selection
        rows = df.collect()
        cols = df.columns
        stats = finish(plan_scan_stats(df, (_time.perf_counter() - t0) * 1000))
        if q.is_aggregation:
            return {
                "aggregationResults": [
                    {"function": c, "value": rows[0][c] if rows else None}
                    for c in cols],
                **stats,
            }
        return {
            "selectionResults": {
                "columns": cols,
                "results": [[r[c] for c in cols] for r in rows],
            },
            **stats,
        }
