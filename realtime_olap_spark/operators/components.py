"""Connected components over an edge list — the clustering step of a
near-dup pipeline (LSH/similarity pairs -> duplicate CLUSTERS -> keep one
representative per cluster). The reference engine has no graph operator;
this is a training-data-pipeline extension expressed Spark-first.

Algorithm: alternating *large-star* / *small-star* (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — converges in
O(log^2 n) rounds on any graph (O(log n) in practice), each round being
plain groupBy + equi-join shuffles:

  large-star(u): m = min(N(u) + {u});  emit (v, m) for v in N(u), v > u
  small-star(u): over parent-oriented edges (u > v):
                 m = min(N<=(u));      emit (u, m) + (v, m) for v != m

Both rounds are implemented as a per-node ``min`` aggregation joined back
to the edge list — NO ``collect_list`` of neighbor sets, so a hot node
(a million-member duplicate cluster in a 100 TB corpus) never materializes
its neighborhood in one task. Lineage is truncated every round with
``localCheckpoint`` (on a real cluster point ``spark.sparkContext
.setCheckpointDir`` at durable storage and flip ``use_local=False``);
convergence is detected by a star-forest test (one map-combined
O(nodes)-row aggregation per round) that fires THE round the fixpoint is
reached — see ``_is_star_forest``.

Scale notes: every shuffle keys on a node id; rounds strictly shrink edge
count toward one star edge per non-root node, so the heaviest round is the
first. Skewed star centers are exactly what the small-star step is for —
it rewires leaves in bulk without routing them through the center's
neighborhood list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_star_forest(edges: DataFrame) -> bool:
    """True iff the (child u, root v) edge set is a STAR FOREST — every
    child appears exactly once and no node is both child and root. The
    star rounds' fixpoint is exactly a star forest (large-star and
    small-star are both identities on one — Kiveris et al. §3), so this
    detects convergence THE round it happens, one round earlier than a
    changed-nothing fingerprint comparison. One map-combined shuffle of
    (node, flags) rows per round — the same O(nodes) cost as the old
    fingerprint, and it doubles as the lazy checkpoint's materializing
    action."""
    nodes = edges.select(F.col("u").alias("n"), F.lit(1).alias("c"),
                         F.lit(0).alias("r")).union(
        edges.select(F.col("v").alias("n"), F.lit(0).alias("c"),
                     F.lit(1).alias("r")))
    bad = (nodes.groupBy("n")
           .agg(F.sum("c").alias("c"), F.max("r").alias("r"))
           .where((F.col("c") > 1) | ((F.col("c") >= 1) & (F.col("r") == 1))))
    return bad.limit(1).count() == 0


#: Broadcast-solve cutoff: graphs at or below this many (deduplicated)
#: edges are resolved driver-side with union-find instead of distributed
#: star rounds. The star rounds cost ~0.3 s/round of planning +
#: convergence checking regardless of size (measured: 1.8 s for a
#: 344-edge graph at sf0.1), so small graphs — the common case for
#: τ-filtered near-dup edge sets — pay pure iteration overhead. This is
#: the CC analog of a broadcast join, and the cutoff is sized for the
#: PYTHON driver, not the raw bytes: 2^17 edges ≈ 130k Row objects
#: (tens of MB with object headers) plus a ≤2·2^17-entry union-find
#: dict — comfortably inside a default driver heap, while still orders
#: of magnitude above real τ-filtered near-dup edge sets. Above it the
#: O(log n)-round distributed path runs. Bounded driver fetch via
#: ``take(threshold + 1)`` — never an unbounded collect.
SMALL_GRAPH_EDGES = 1 << 17


def _union_find_local(spark, rows) -> DataFrame:
    """Driver-side union-find (path-halving, min-id roots) over an edge
    list that fit the broadcast threshold; same output contract as the
    star rounds: one (node, component=min member) row per non-isolated
    node, roots omitted (they appear only on the component side)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for r in rows:
        u, v = r[0], r[1]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by MIN id so the root is always the smallest member
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    out = [(n, find(n)) for n in parent]
    # Arrow-path local frame: the list-createDataFrame route costs a
    # Python-worker round trip (~0.28 s) on EVERY downstream action
    from realtime_olap_spark.localframe import local_frame  # noqa: PLC0415
    return local_frame(spark, [(n, c) for n, c in out if n != c],
                       ["node", "component"], "node long, component long")


def _local_contract(e: DataFrame) -> DataFrame:
    """Per-partition union-find contraction: hash-partition the edge
    list on ``u`` (co-locating every edge that shares a left node) and
    collapse each PARTITION-LOCAL component to a star rooted at its
    minimum member, via one Arrow ``mapInPandas`` pass.

    Replacing a partition's edges with its local spanning star forest
    preserves global connectivity — every original edge (u, v) is
    implied by (u → r) + (v → r) — so the star rounds that follow
    compute identical components over the contracted forest.

    The shrink per partition is exactly
    ``E_local − (V_local − C_local)`` — the number of partition-visible
    CYCLE edges. A SPARSE random graph has ~none: measured at the 100×
    soak (6M edges, avg degree 6), a u-keyed pass emitted 5,999,994 of
    5,999,996 edges — partitions see trees, so there is nothing to
    contract, and the pass is a wasted full shuffle. The CLUSTERED
    regime this pass was built for was then measured too
    (r10, scripts/scale_soak_components_clustered.py: dense 32-node
    blocks × 6 intra edges/node + sparse bridges, 1.5M/12M/49M edges):
    contraction LOSES there as well — 1.10× / 1.40× / 2.43× slower —
    because the window-min star rounds already collapse dense blocks in
    their first one or two exchanges (49M clustered edges solve in
    ~25 s where 60M random edges need ~120 s), and the python
    union-find pass adds a full extra shuffle + Arrow round-trip ahead
    of them. Hence ``local_contraction=False`` by default and NO known
    regime earns default-on; the knob stays for edge sets with
    partition-visible cycle density far beyond the measured shapes.
    (Dual-keying every edge to both endpoints exposes neighborhoods but
    was measured WORSE: the per-partition node copies grow the row set
    ~2× per pass — 6M → 11.8M → 15.6M at 100× — and convergence took 4
    passes of that.)"""
    def contract(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in batches:
            for u, v in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
                u = int(u); v = int(v)
                if u not in parent:
                    parent[u] = u
                if v not in parent:
                    parent[v] = v
                ru, rv = find(u), find(v)
                if ru != rv:
                    lo, hi = (ru, rv) if ru < rv else (rv, ru)
                    parent[hi] = lo
        out_u, out_v = [], []
        for n in parent:
            r = find(n)
            if r != n:
                out_u.append(n)
                out_v.append(r)
        yield pd.DataFrame({"u": pd.Series(out_u, dtype="int64"),
                            "v": pd.Series(out_v, dtype="int64")})

    return (e.repartition("u")
            .mapInPandas(contract, schema="u long, v long"))


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 25,
                         use_local_checkpoint: bool = True,
                         small_graph_edges: int | None = SMALL_GRAPH_EDGES,
                         local_contraction: bool = False,
                         ) -> DataFrame:
    """Resolve the undirected graph given by (src, dst) pairs into
    components. Returns one row per non-isolated node:
    ``(node, component)`` where ``component`` is the smallest node id in
    the node's component (the root maps to itself). Self-loops are
    ignored; edge direction and duplication don't matter.

    Adaptive strategy: graphs with ≤ ``small_graph_edges`` distinct
    edges are broadcast-solved driver-side (union-find — exact same
    min-id semantics); larger graphs run the distributed star rounds.
    Pass ``small_graph_edges=None`` (or 0) to force the distributed
    path.
    """
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .where(F.col("u") != F.col("v"))
         .where(F.col("u").isNotNull() & F.col("v").isNotNull()))

    if small_graph_edges:
        # RAW size probe, before distinct/checkpoint: union-find is
        # idempotent under duplicate edges, so the local path doesn't
        # need the distinct exchange — ≤ threshold RAW rows implies
        # ≤ threshold distinct edges, and the probe is a bounded take
        # straight off the filter (r16 A/B on the τ-filtered near-dup
        # shape: 0.277 s → 0.213 s, output identical). A duplicate-heavy
        # over-threshold list falls through and gets the distinct probe
        # below before anything distributed runs.
        head = e.take(small_graph_edges + 1)
        if len(head) <= small_graph_edges:
            return _union_find_local(e.sparkSession, head)

    e = e.distinct()
    # Truncate the INPUT lineage BEFORE the distinct size probe: the
    # edge list often hangs off a deep plan (e.g. the whole MinHash
    # verify pipeline), and every star round re-analyzes that logical
    # plan otherwise — round 0's cost was ~4 s of Catalyst re-analysis
    # on a 300-edge graph. Checkpointing first also makes the take()
    # probe below the checkpoint's materializing action, so an
    # over-threshold graph's distinct edge set is computed ONCE and the
    # star rounds reuse the cached partitions instead of recomputing
    # the heaviest stage. (Measured: sizing the loop's shuffle
    # partitions to the graph on top of this gains nothing — planning
    # time, not task count, was the overhead — so the session conf is
    # deliberately left alone: a global shuffle-partition mutation
    # would corrupt concurrently-planned queries, e.g. the PQL
    # server's.)
    if use_local_checkpoint:
        e = e.localCheckpoint(eager=False)

    if small_graph_edges:
        head = e.take(small_graph_edges + 1)
        if len(head) <= small_graph_edges:
            # raw probe overflowed but the DISTINCT edge set fits (a
            # duplicate-heavy pair list) — still broadcast-solvable
            return _union_find_local(e.sparkSession, head)
        # over threshold: fall through to the star rounds, which reuse
        # the (now partially materialized) checkpointed edge set
    if local_contraction:
        # collapse partition-local components first (pays on CLUSTERED
        # edge sets — see _local_contract's docstring for when not to)
        e = _local_contract(e)
        if use_local_checkpoint:
            e = e.localCheckpoint(eager=False)
    e, rounds = _star_rounds(e, max_iter, use_local_checkpoint)
    if rounds is None:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")

    # fixpoint edge set is a star forest: (node, root) with root < node
    return e.select(F.col("u").alias("node"), F.col("v").alias("component"))


def _star_rounds(e: DataFrame, max_iter: int,
                 use_local_checkpoint: bool) -> tuple[DataFrame, int | None]:
    """Alternating large-star / small-star, expressed as WINDOW minima
    rather than groupBy+join pairs: ``min(v) over (partition by u)``
    attaches each node's neighborhood minimum in ONE exchange of the
    edge set where the aggregate-then-join form paid two (the groupBy
    shuffle plus re-shuffling the edges to meet it). Measured at the
    100× soak this cut round 0 from 11.1 s to 8.3 s and the full solve
    ~20 %; the output fixpoint is bit-identical (same star forest).

    The star-forest convergence test costs its own O(nodes) shuffle, so
    it is DEFERRED while the edge count is still moving between rounds
    (>2 % delta — counts come free as the lazy checkpoint's
    materializing action): a strictly shrinking edge set cannot be two
    identical consecutive star forests. The final rounds (stable count)
    pay the check, which still fires THE round the fixpoint lands."""
    from pyspark.sql import Window

    wu = Window.partitionBy("u")
    spark = e.sparkSession
    base_par = spark.sparkContext.defaultParallelism
    prev_cnt: int | None = e.count()  # cheap: checkpoint already probed

    def _nparts(n_edges: int) -> int:
        """Size the window exchanges to ~500k sym rows per partition
        instead of the session's shuffle.partitions: the sort-based
        windows dominate round cost, and 32 partitions × ~4M rows each
        spill/sort poorly at the 60M-edge scale (measured 152.7 s →
        121.5 s at 256 partitions, same rounds). The explicit
        ``repartition(n, "u")`` REPLACES the exchange the window would
        insert anyway (its required distribution is satisfied), so
        small graphs at n = defaultParallelism pay nothing extra."""
        return int(min(2048, max(base_par, (2 * n_edges) // 500_000)))

    for it in range(max_iter):
        np_ = _nparts(prev_cnt)
        # -- large-star: connect every larger neighbor to the local
        # min m = min(N(u) + {u}), one window exchange over sym --
        sym = (e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
               .repartition(np_, "u"))
        ls = (sym.withColumn("m", F.least(F.min("v").over(wu), F.col("u")))
              .where(F.col("v") > F.col("u"))
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .repartition(np_, "u"))
        # -- small-star: over parent-oriented edges (u > v by
        # construction: m = min <= u < v), bulk-rewire the smaller
        # neighborhood onto its min; the closing distinct both bounds
        # the edge set and collapses the per-edge (u, m) copies the
        # window form emits where the old join form emitted one per u --
        ss = ls.withColumn("m", F.min("v").over(wu))
        e = (ss.where(F.col("v") != F.col("m"))
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .union(ss.select(F.col("u"), F.col("m").alias("v")))
             .distinct())
        if use_local_checkpoint:
            # LAZY checkpoint: the count below is this round's
            # materializing action, so an eager checkpoint would run a
            # second, redundant job per round
            e = e.localCheckpoint(eager=False)

        cnt = e.count()
        settled = (prev_cnt is not None
                   and abs(prev_cnt - cnt) <= 0.02 * max(cnt, 1))
        prev_cnt = cnt
        # the deferral is an optimization, never a correctness gate: a
        # fixpoint landing on the FINAL allowed round with a still-moving
        # count (>2% delta) must not be reported as non-convergence, so
        # the last iteration always pays the forest check
        if (settled or it == max_iter - 1) and _is_star_forest(e):
            return e, it
    return e, None


def duplicate_clusters(pairs: DataFrame, id_a: str = "id_a",
                       id_b: str = "id_b") -> DataFrame:
    """Near-dup pairs -> cluster assignment ``(node, component)``,
    including singleton-free closure: every id that appears in at least
    one pair gets a cluster; the cluster id is the min member (so the
    canonical 'keep the representative' rule is ``node == component``)."""
    comps = connected_components(pairs, src=id_a, dst=id_b)
    # roots themselves appear only on the component side of star edges
    roots = (comps.select(F.col("component").alias("node"))
             .distinct()
             .withColumn("component", F.col("node")))
    return comps.unionByName(roots)


def keep_best_representative(docs: DataFrame, pairs: DataFrame,
                             id_col: str, score: Column | str,
                             id_a: str = "id_a",
                             id_b: str = "id_b") -> DataFrame:
    """Near-dup keep-one with a QUALITY rule: within each duplicate
    cluster, keep the member with the highest ``score`` (ties broken by
    min id so the choice is deterministic); documents in no cluster
    survive untouched. The min-id keep rule (``node == component``) is
    what exact/LSH pipelines default to, but curation recipes routinely
    keep the best-quality member instead (e.g. the longest, the highest
    classifier score) — this operator makes that a one-call composition
    of the cluster table and any score column.

    Shape at scale: clusters come from the adaptive connected components
    (edges only — the corpus never enters the iteration); the keeper
    election is ONE ``max_by`` groupBy over clustered docs only (LSH
    keeps that ≪ corpus); survivors = anti-join of the (small) loser
    list, broadcast-side. Tie-break is encoded in the max_by key
    ``struct(score, -id)``: lexicographic struct ordering compares score
    first, then the negated id, so equal scores elect the SMALLEST id —
    deterministic under re-runs and re-partitioning."""
    c = F.col(score) if isinstance(score, str) else score
    clusters = duplicate_clusters(pairs, id_a, id_b)
    scored = (docs.select(F.col(id_col), c.alias("__score"))
              .join(clusters, on=F.col(id_col) == F.col("node"))
              .select(id_col, "__score", "component"))
    keepers = (scored.groupBy("component")
               .agg(F.max_by(
                   F.col(id_col),
                   F.struct(F.col("__score"), (-F.col(id_col)).cast("long")))
                   .alias("__keep")))
    losers = (scored.join(keepers, "component")
              .where(F.col(id_col) != F.col("__keep"))
              .select(id_col))
    return docs.join(F.broadcast(losers), on=id_col, how="left_anti")
