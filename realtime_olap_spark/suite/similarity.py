"""Similarity-search suite over the embeddings table.

Query vector, LSH hyperplanes, and IVF centroids are deterministic seeded
literals rendered identically into the Spark plan and the DuckDB oracle, so
even the approximate (bucketed) paths are value-verified end-to-end: both
engines evaluate the same IEEE-double expressions (sequential-fold dot
products) over the same data.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.operators import similarity as S
from realtime_olap_spark.operators.dedup import cosine
from realtime_olap_spark.suite.registry import query

_DIM = 64

_rng = random.Random(42)
QUERY_VEC = [round(_rng.gauss(0.0, 1.0), 3) for _ in range(_DIM)]
PLANES = [[round(_rng.gauss(0.0, 1.0), 3) for _ in range(_DIM)] for _ in range(6)]
# 8 k-means centroids (25 Lloyd iterations, numpy, seed 7) trained on the
# sf0.1 embeddings sample and baked as literals so both engines see the
# identical constants; balanced cells (232-270/2000 at sf0.1) vs the
# r1 seeded-Gaussian centroids that collapsed most vectors into cell 0.
CENTROIDS = [
    [0.001, 0.014, -0.016, -0.01, 0.002, -0.019, 0.011, -0.003, 0.037, 0.038, -0.062, -0.029, 0.019, -0.004, -0.061, -0.018, 0.033, -0.009, 0.012, 0.056, 0.006, 0.005, 0.028, 0.005, 0.002, -0.026, 0.017, 0.04, -0.021, 0.045, 0.027, -0.02, 0.042, -0.012, -0.028, -0.05, 0.035, -0.02, -0.046, -0.014, 0.029, -0.029, 0.002, 0.019, 0.0, 0.019, 0.018, 0.022, 0.008, 0.003, 0.012, -0.025, -0.039, 0.024, 0.019, -0.037, 0.001, 0.043, 0.006, -0.005, 0.004, 0.0, 0.054, -0.056],
    [0.007, 0.003, 0.035, -0.007, -0.077, 0.038, 0.057, -0.021, 0.016, 0.022, 0.011, 0.023, -0.059, -0.001, 0.018, 0.001, 0.001, -0.043, -0.028, 0.006, -0.017, -0.058, -0.031, 0.028, 0.04, 0.024, -0.024, -0.024, -0.02, -0.018, -0.016, 0.056, -0.01, 0.013, -0.006, 0.017, 0.017, -0.001, -0.035, 0.015, -0.035, -0.006, 0.015, 0.059, 0.017, -0.001, 0.061, 0.017, 0.006, 0.015, -0.017, -0.015, 0.024, -0.041, -0.042, -0.005, -0.026, 0.005, -0.031, -0.049, -0.05, -0.016, 0.027, -0.008],
    [0.026, -0.034, -0.008, 0.007, 0.034, 0.017, -0.036, 0.004, 0.006, -0.006, 0.024, 0.024, -0.01, 0.014, -0.033, 0.037, -0.015, -0.016, 0.026, 0.015, 0.042, -0.012, -0.002, 0.041, -0.026, 0.013, 0.019, 0.044, -0.05, 0.015, -0.045, -0.048, -0.026, -0.002, -0.002, 0.059, -0.005, -0.011, -0.01, -0.055, 0.01, -0.015, -0.022, -0.004, -0.007, 0.025, 0.028, 0.017, 0.006, -0.011, -0.005, 0.012, 0.04, -0.06, -0.022, 0.019, 0.008, 0.009, 0.069, 0.009, 0.009, -0.036, -0.045, 0.049],
    [-0.017, 0.035, -0.004, -0.011, -0.018, -0.001, -0.005, -0.008, -0.047, -0.027, 0.021, 0.008, 0.007, 0.019, -0.05, -0.001, 0.025, 0.057, 0.002, -0.018, -0.039, -0.006, 0.009, -0.048, 0.027, 0.015, 0.001, -0.04, -0.021, 0.016, -0.026, -0.017, 0.016, 0.003, -0.014, 0.051, 0.007, -0.008, -0.014, 0.055, 0.034, 0.022, 0.0, 0.029, 0.035, -0.01, -0.012, 0.012, 0.009, 0.067, -0.045, 0.043, -0.021, 0.002, 0.016, -0.034, -0.012, -0.027, -0.024, 0.024, 0.06, 0.028, -0.033, 0.053],
    [0.038, -0.011, -0.009, -0.055, -0.032, 0.035, 0.033, 0.014, -0.016, -0.078, -0.019, -0.022, -0.024, 0.04, -0.029, -0.061, -0.018, 0.003, 0.039, -0.039, -0.055, 0.039, 0.004, -0.034, -0.005, -0.012, 0.011, -0.002, 0.016, -0.029, -0.022, 0.003, 0.012, 0.017, 0.022, -0.045, -0.014, -0.005, 0.016, -0.032, -0.016, -0.02, -0.008, -0.049, -0.044, -0.054, -0.011, -0.024, -0.005, -0.0, 0.031, -0.001, -0.029, 0.018, -0.025, -0.028, 0.02, 0.037, -0.023, -0.009, -0.031, 0.033, -0.004, -0.021],
    [-0.032, 0.006, 0.019, 0.045, 0.026, 0.008, -0.016, -0.041, 0.017, -0.003, -0.0, 0.003, 0.022, -0.003, 0.072, -0.001, -0.019, 0.023, 0.008, -0.01, 0.047, -0.028, -0.026, -0.032, 0.02, -0.029, 0.011, -0.027, 0.066, -0.058, -0.033, -0.015, 0.003, -0.006, -0.016, 0.003, -0.05, 0.026, 0.047, -0.05, -0.028, 0.003, 0.008, -0.013, -0.008, 0.021, -0.046, 0.003, -0.04, 0.003, 0.0, 0.004, -0.018, 0.018, 0.007, 0.036, 0.025, 0.007, 0.01, -0.028, 0.01, -0.03, 0.014, -0.025],
    [-0.001, 0.001, 0.002, 0.027, -0.006, -0.047, -0.041, 0.06, 0.002, 0.008, 0.028, 0.03, 0.014, -0.022, 0.039, 0.011, -0.025, -0.0, -0.009, -0.005, 0.017, 0.057, -0.009, -0.003, -0.041, 0.025, -0.045, -0.003, 0.017, 0.041, 0.032, 0.022, -0.025, -0.024, 0.056, -0.015, 0.045, 0.007, 0.035, 0.021, 0.007, 0.021, -0.025, 0.03, -0.053, -0.021, -0.003, -0.02, 0.011, -0.076, 0.019, -0.05, -0.007, -0.031, 0.021, -0.005, -0.015, -0.036, -0.009, 0.011, 0.026, 0.04, 0.015, -0.036],
    [-0.013, 0.004, -0.026, -0.027, 0.069, -0.026, 0.023, 0.001, -0.002, 0.044, 0.008, 0.025, -0.028, -0.004, 0.023, 0.004, 0.003, -0.036, -0.041, 0.038, -0.024, -0.009, 0.043, 0.006, -0.018, -0.015, 0.028, 0.001, 0.007, -0.026, 0.057, 0.054, -0.042, 0.006, 0.02, -0.021, -0.005, -0.016, 0.02, 0.068, -0.0, -0.001, 0.026, -0.044, 0.064, -0.006, -0.014, -0.049, 0.057, 0.005, -0.007, 0.003, 0.026, 0.043, 0.001, 0.015, -0.009, -0.009, 0.033, 0.021, -0.039, -0.017, -0.017, 0.037],
]


def _sql_vec(v: list[float]) -> str:
    return "[" + ", ".join(repr(float(x)) for x in v) + "]::DOUBLE[]"


_E = "embedding::DOUBLE[]"
_Q = _sql_vec(QUERY_VEC)
_COS_Q = (f"list_inner_product({_E}, {_Q})"
          f" / (sqrt(list_inner_product({_E}, {_E})) * sqrt(list_inner_product({_Q}, {_Q})))")


@query("sim_topk_brute", f"""
SELECT vec_id, {_COS_Q} AS cos
FROM embeddings
ORDER BY cos DESC, vec_id ASC
LIMIT 10
""")
def sim_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 — one scan, TakeOrderedAndProject."""
    e = Catalog(spark, sf_dir).table("embeddings")
    return S.cosine_topk(e, QUERY_VEC, "vec_id", "embedding", k=10)


def _lsh_oracle() -> str:
    qb = S._query_bucket(QUERY_VEC, PLANES)
    bits = " + ".join(
        f"(CASE WHEN list_inner_product({_E}, {_sql_vec(p)}) > 0 THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(PLANES))
    return f"""
SELECT vec_id, {_COS_Q} AS cos
FROM embeddings
WHERE ({bits}) = {qb}
ORDER BY cos DESC, vec_id ASC
LIMIT 10
"""


@query("sim_topk_lsh", _lsh_oracle())
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via 6-bit random-hyperplane LSH: score only the query's bucket
    (~1/64 of the corpus once the bucket is a write-time partition key)."""
    e = Catalog(spark, sf_dir).table("embeddings")
    return S.lsh_topk(e, QUERY_VEC, PLANES, "vec_id", "embedding", k=10)


def sql_ivf_assign(centroids: list[list[float]] = CENTROIDS,
                   vec_expr: str = _E) -> str:
    """DuckDB rendering of operators.similarity.ivf_assign — b·b constants
    are the engine-side fold rendered at full precision (repr round-trips
    doubles exactly), so both engines assign identical cells."""
    aa = f"list_inner_product({vec_expr}, {vec_expr})"
    dists = ", ".join(
        f"{aa} - 2.0 * list_inner_product({vec_expr}, {_sql_vec(c)})"
        f" + {S._self_dot(c)!r}"
        for c in centroids)
    return f"(list_indexof([{dists}], list_min([{dists}])) - 1)"


def _ivf_oracle() -> str:
    probes = S._nearest_centroids(QUERY_VEC, CENTROIDS, nprobe=2)
    assign = sql_ivf_assign()
    in_list = ", ".join(str(p) for p in probes)
    return f"""
SELECT vec_id, {_COS_Q} AS cos
FROM embeddings
WHERE {assign} IN ({in_list})
ORDER BY cos DESC, vec_id ASC
LIMIT 10
"""


def _ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) the cell-partitioned IVF index for ``sf_dir``'s
    embeddings. The cache key includes the source file's mtime/size, so a
    refreshed corpus gets a fresh build — this is the ingest-time half of
    the IVF story; probe queries must never pay it per query."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:k{len(CENTROIDS)}".encode()
    ).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), f"rt_olap_ivf_{key}")
    marker = os.path.join(path, "_INDEX_BUILT")
    if not os.path.exists(marker):
        # Atomic publish: build into a private temp dir, then rename into
        # place — a concurrent reader can never observe a half-written
        # index, and two racing builders resolve to whichever rename wins
        # (same discipline as the streaming rollup merge). The marker is
        # written INSIDE the staging dir so path-with-marker implies a
        # complete build.
        stage = f"{path}.tmp-{os.getpid()}"
        S.ivf_index_write(Catalog(spark, sf_dir).table("embeddings"),
                          stage, CENTROIDS)
        open(os.path.join(stage, "_INDEX_BUILT"), "w").close()
        try:
            os.rename(stage, path)
        except OSError:
            # lost the race: another builder published first; keep theirs
            import shutil
            shutil.rmtree(stage, ignore_errors=True)
            if not os.path.exists(marker):
                raise
    return path


@query("sim_topk_ivf", _ivf_oracle())
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe against the MATERIALIZED cell-partitioned index (built
    once per corpus): the cell filter prunes partition directories, so
    the probe scans nprobe/K (2/8) of the corpus — exactly the plan a
    1000-executor cluster would run; exact cosine top-10 within the
    probed cells. Assignment bit-identity between the build's Arrow path
    and the oracle's fold rendering is equality-tested, so the oracle is
    unchanged."""
    path = _ensure_ivf_index(spark, sf_dir)
    # the resolved index frame is an ingest-time handle like a catalog
    # table: memoize it unmaterialized (plan-level reuse, FileScan +
    # partition pruning intact) so repeated probes skip the per-query
    # schema/footer job + DataSource re-resolution (r17 item 6)
    from realtime_olap_spark.suite.memo import session_memo  # noqa: PLC0415
    frame = session_memo(spark, sf_dir, "ivf_frame",
                         lambda: spark.read.parquet(path),
                         materialize=False)
    return S.ivf_topk_indexed(spark, path, QUERY_VEC, CENTROIDS,
                              "vec_id", "embedding", k=10, nprobe=2,
                              frame=frame)


@query("sim_topk_per_label", f"""
SELECT label, vec_id, cos FROM (
  SELECT label, vec_id, {_COS_Q} AS cos,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY {_COS_Q} DESC, vec_id ASC) AS rn
  FROM embeddings)
WHERE rn <= 3
ORDER BY label ASC, cos DESC, vec_id ASC
""")
def sim_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k (k-nearest within every label partition) via a ranking
    window — one shuffle on the partition key."""
    e = Catalog(spark, sf_dir).table("embeddings")
    scored = e.select("label", "vec_id",
                      cosine(F.col("embedding"), S._lit_vec(QUERY_VEC)).alias("cos"))
    w = Window.partitionBy("label").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("label", "vec_id", "cos")
            .orderBy(F.col("label").asc(), F.col("cos").desc(), F.col("vec_id").asc()))


def _ensure_pq_index(spark: SparkSession, sf_dir: str) -> tuple[str, list]:
    """Build (once) the PQ-coded index for ``sf_dir``'s embeddings:
    train the per-subspace codebooks (m=8, ksub=16 over the 64-dim
    corpus — 8 bytes/vector), encode scan-side, and publish
    ``(vec_id, pq_codes, embedding)`` parquet plus the codebooks JSON
    with the same mtime-keyed atomic-rename discipline as the IVF
    index. Returns (index_path, codebooks). Ingest-time work — probe
    queries must never pay it per query."""
    import hashlib
    import json
    import os
    import tempfile

    from realtime_olap_spark.operators import pq as PQ

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:pq-m8k16".encode()
    ).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), f"rt_olap_pq_{key}")
    marker = os.path.join(path, "_INDEX_BUILT")
    books_file = os.path.join(path, "_CODEBOOKS.json")
    if not os.path.exists(marker):
        stage = f"{path}.tmp-{os.getpid()}"
        emb = Catalog(spark, sf_dir).table("embeddings")
        books = PQ.pq_train(emb, "embedding", m=8, ksub=16, iters=3)
        (PQ.pq_encode(emb, "embedding", books)
         .select("vec_id", "pq_codes", "embedding")
         .write.mode("overwrite").parquet(os.path.join(stage, "data")))
        with open(os.path.join(stage, "_CODEBOOKS.json"), "w") as f:
            json.dump(books, f)
        open(os.path.join(stage, "_INDEX_BUILT"), "w").close()
        try:
            os.rename(stage, path)
        except OSError:
            import shutil
            shutil.rmtree(stage, ignore_errors=True)
    with open(books_file) as f:
        books = json.load(f)
    return os.path.join(path, "data"), books


def pq_probe_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only PQ probe (NOT in the driver window): the two-stage
    ADC-shortlist → exact-re-rank top-10 against the pre-built code
    index — times the code-only scan + LUT scoring + shortlist fetch,
    the probe-side cost of the compressed 100 TB ANN layout."""
    path, books = _ensure_pq_index(spark, sf_dir)
    from realtime_olap_spark.operators import pq as PQ
    # memoized unmaterialized read — same ingest-time-handle discipline
    # as Catalog.table / the IVF probe frame (r17 item 6)
    from realtime_olap_spark.suite.memo import session_memo  # noqa: PLC0415
    idx = session_memo(spark, sf_dir, "pq_frame",
                       lambda: spark.read.parquet(path),
                       materialize=False)
    return PQ.pq_topk_rerank(idx, QUERY_VEC, books, 10, shortlist=100)


def _pca_model(spark: SparkSession, sf_dir: str):
    """Exact-Gram PCA model over the embedding corpus (r=8 of 64), once
    per (session, corpus) — the train-once dimensionality-reduction
    artifact consumed by the projected-shortlist probe. One scan,
    bounded P·d² collect (``operators/pca.pca_fit``)."""
    from realtime_olap_spark.operators import pca as PC  # noqa: PLC0415
    from realtime_olap_spark.suite.memo import session_memo  # noqa: PLC0415

    def build():
        emb = Catalog(spark, sf_dir).table("embeddings")
        return PC.pca_fit(emb, "embedding", d=64, r=8, center=False)

    return session_memo(spark, sf_dir, "pca_model", build)


def pca_shortlist_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only projected-shortlist ANN (``operators/pca``): score the
    corpus in 8-dim projected space (scan-side zip_with folds), shortlist
    top-100 via TakeOrderedAndProject, exact-rerank only those in full
    64-dim space through a broadcast join — times the probe-side cost of
    the reduced-dimension ANN layout (the PCA fit is ingest-time,
    session-memoized and warmed untimed)."""
    from realtime_olap_spark.operators import pca as PC  # noqa: PLC0415
    emb = Catalog(spark, sf_dir).table("embeddings")
    return PC.pca_shortlist_topk(emb, QUERY_VEC, _pca_model(spark, sf_dir),
                                 "vec_id", "embedding", 10, shortlist=100)
