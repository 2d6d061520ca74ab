"""Connected components: differential vs DuckDB WITH RECURSIVE min-label
propagation on random graphs, plus adversarial shapes (long chains — worst
case for label propagation, handled in O(log n) star rounds; cycles;
skewed stars; duplicate/reversed/self-loop edges)."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from realtime_olap_spark.operators.components import (connected_components,
                                                      duplicate_clusters)


def _oracle(edge_list: list[tuple[int, int]]) -> dict[int, int]:
    """Min-reachable-label per node via DuckDB recursive CTE."""
    if not edge_list:
        return {}
    con = duckdb.connect()
    con.execute("CREATE TABLE e(u BIGINT, v BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edge_list)
    rows = con.execute("""
        WITH RECURSIVE sym AS (
            SELECT u, v FROM e WHERE u != v
            UNION SELECT v, u FROM e WHERE u != v),
        walk(node, lab) AS (
            SELECT DISTINCT u, u FROM sym
            UNION
            SELECT s.v, w.lab FROM walk w JOIN sym s ON s.u = w.node)
        SELECT node, MIN(lab) FROM walk GROUP BY node
    """).fetchall()
    return {int(n): int(c) for n, c in rows}


def _run(spark, edge_list):
    df = spark.createDataFrame(edge_list or [(0, 0)], "src long, dst long")
    got = connected_components(df).collect()
    return {int(r["node"]): int(r["component"]) for r in got}


def _check(spark, edge_list):
    want = _oracle(edge_list)
    got = _run(spark, edge_list)
    # operator omits roots (they map to themselves) — fold them in
    for root in set(want.values()):
        got.setdefault(root, root)
    assert got == want


def test_cc_fixpoint_on_final_round_converges(spark):
    """Fixpoint landing on the LAST allowed iteration with a still-large
    edge-count delta (K4: 6 edges -> 3-edge star forest in one round,
    50% delta so the deferred check would skip) must return success, not
    'did not converge' (ADVICE r9). The last round always pays the
    forest check."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4, "src long, dst long")
    got = {int(r["node"]): int(r["component"]) for r in
           connected_components(df, max_iter=1,
                                small_graph_edges=None).collect()}
    assert got == {1: 0, 2: 0, 3: 0}


def test_cc_shapes(spark):
    # chain (depth stress), cycle, two stars bridged, isolated pair,
    # duplicates + reversed + self-loops
    chain = [(i, i + 1) for i in range(40)]
    cycle = [(100 + i, 100 + (i + 1) % 7) for i in range(7)]
    stars = [(200, 200 + i) for i in range(1, 20)] + \
            [(300, 300 + i) for i in range(1, 20)] + [(219, 319)]
    noise = [(400, 401), (401, 400), (400, 401), (500, 500)]
    _check(spark, chain + cycle + stars + noise)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cc_random_graphs(spark, seed):
    rnd = random.Random(seed)
    n = 120
    m = rnd.randrange(30, 200)
    edges = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(m)]
    _check(spark, edges)


def test_cc_empty_and_self_loops_only(spark):
    assert _run(spark, []) == {}
    assert _run(spark, [(7, 7), (9, 9)]) == {}


def test_duplicate_clusters_includes_roots(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    got = {(int(r["node"]), int(r["component"]))
           for r in duplicate_clusters(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    # representative rule: node == component marks the kept doc
    reps = {n for n, c in got if n == c}
    assert reps == {1, 10}


def test_cc_plan_has_no_collect_list(spark):
    """Scale guard: the rounds must be agg+join only — a hot node's
    neighborhood must never be materialized into one task. Forces the
    distributed path (small graphs broadcast-solve by default)."""
    df = spark.createDataFrame([(i % 5, i) for i in range(10, 60)],
                               "src long, dst long")
    out = connected_components(df, small_graph_edges=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("seed", [11, 12])
def test_cc_small_and_distributed_paths_agree(spark, seed):
    """The broadcast union-find and the star rounds are the SAME
    operator: identical (node, component) sets on random graphs, and
    the threshold boundary routes correctly both ways."""
    rnd = random.Random(seed)
    edges = [(rnd.randrange(60), rnd.randrange(60)) for _ in range(80)]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = {(int(r["node"]), int(r["component"]))
            for r in connected_components(df).collect()}
    slow = {(int(r["node"]), int(r["component"]))
            for r in connected_components(
                df, small_graph_edges=None).collect()}
    assert fast == slow
    # a threshold below the edge count must route to the star rounds
    # and still produce the same answer
    tiny = {(int(r["node"]), int(r["component"]))
            for r in connected_components(
                df, small_graph_edges=1).collect()}
    assert tiny == slow


def test_keep_best_representative_elects_max_score(spark):
    from realtime_olap_spark.operators.components import \
        keep_best_representative
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.7), (9, 0.0)],
        "doc_id long, q double")
    # cluster A = {1,2,3} (max q tie 2 vs 3 -> min id 2 wins),
    # cluster B = {4,5} (5 wins), 9 is a singleton (survives)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in keep_best_representative(
        docs, pairs, "doc_id", "q").collect())
    assert kept == [2, 5, 9]


def test_keep_best_with_constant_score_equals_min_id_rule(spark):
    from realtime_olap_spark.operators.components import (
        duplicate_clusters, keep_best_representative)
    import pyspark.sql.functions as F
    docs = spark.createDataFrame([(i,) for i in range(1, 40)],
                                 "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30, 3)], "id_a long, id_b long")
    got = sorted(r["doc_id"] for r in keep_best_representative(
        docs, pairs, "doc_id", F.lit(1.0)).collect())
    # min-id rule: drop every clustered node that is not its component
    clusters = duplicate_clusters(pairs)
    losers = {r["node"] for r in clusters
              .where(F.col("node") != F.col("component")).collect()}
    want = sorted(i for i in range(1, 40) if i not in losers)
    assert got == want


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_cc_local_contraction_agrees(spark, seed):
    """The per-partition union-find contraction that now fronts the
    star rounds must not change the answer: contracted vs uncontracted
    distributed paths and the broadcast union-find all agree, across
    partition layouts (contraction quality varies with co-location,
    correctness must not)."""
    rnd = random.Random(seed)
    edges = [(rnd.randrange(200), rnd.randrange(200)) for _ in range(300)]
    df = spark.createDataFrame(edges, "src long, dst long")
    want = {(int(r["node"]), int(r["component"]))
            for r in connected_components(df).collect()}
    for parts in (1, 7):
        got = {(int(r["node"]), int(r["component"]))
               for r in connected_components(
                   df.repartition(parts), small_graph_edges=None,
                   local_contraction=True).collect()}
        assert got == want, parts
    off = {(int(r["node"]), int(r["component"]))
           for r in connected_components(
               df, small_graph_edges=None,
               local_contraction=False).collect()}
    assert off == want
