"""Distributed PCA + Frequent Directions for the embedding pipeline.

Embedding workloads at 100 TB routinely reduce dimensionality before
anything quadratic-in-d touches the corpus: a projected-space shortlist
makes ANN probes (``operators/similarity``/``pq``) cheaper, SemDeDup
clusters in a whitened space, and low-rank structure diagnostics
(spectrum, explained variance) guide index geometry. Two one-pass,
bounded-collect builders, both pure public methods:

- **Exact Gram PCA** (moderate d — the embedding case, d ≤ a few
  thousand): each partition folds its rows into one d×d partial Gram +
  d-sum + count inside an Arrow ``mapInPandas`` (numpy ``X.T @ X`` per
  batch); the driver sums P partials and eigendecomposes the d×d
  (centered) second-moment matrix. ONE scan, ZERO shuffles, collect
  bounded by P·d² — never by rows. This is textbook covariance PCA
  (Pearson 1901 / Hotelling 1933) in the same bounded-collect shape as
  ``bloom_build``'s words and ``theta_build``'s k+1 hashes.
- **Frequent Directions sketch** (huge d — hashed text features, where
  d² Grams stop fitting): Liberty KDD'13 / Ghashami et al. SIAM'16.
  Each partition streams rows through a 2ℓ×d buffer, SVD-shrinking to ℓ
  rows when full; the driver merges per-partition sketches by
  stack-and-shrink — FD sketches are MERGEABLE with the deterministic
  error bound intact: ``‖AᵀA − BᵀB‖₂ ≤ ‖A − A_k‖F² / (ℓ − k)`` for
  every k < ℓ (bound + merge both pytest-enforced against numpy).

Projection is scan-side: a broadcast components matrix inside an
Arrow-batched pandas UDF (matmul per batch) — zero shuffle,
streaming-legal, plan-asserted Exchange-free. The reference has no
matrix operators (vectors are outside its type system); this module is
part of the training-data extension surface alongside PQ/IVF and
SemDeDup, which consume its output space.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

import numpy as np
import pandas as pd  # noqa: F401  (module-level for stringized UDF hints)

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    """``components``: r×d rows = principal directions (descending
    variance); ``mean``: length-d (zeros when uncentered);
    ``explained_variance``: r eigenvalues; ``n_rows``: fit size."""

    components: tuple[tuple[float, ...], ...]
    mean: tuple[float, ...]
    explained_variance: tuple[float, ...]
    n_rows: int
    centered: bool

    @property
    def d(self) -> int:
        return len(self.mean)

    @property
    def r(self) -> int:
        return len(self.components)

    def to_json(self) -> str:
        return json.dumps({"components": [list(c) for c in self.components],
                           "mean": list(self.mean),
                           "explained_variance": list(self.explained_variance),
                           "n_rows": self.n_rows, "centered": self.centered})

    @staticmethod
    def from_json(s: str) -> "PCAModel":
        o = json.loads(s)
        return PCAModel(tuple(tuple(c) for c in o["components"]),
                        tuple(o["mean"]),
                        tuple(o["explained_variance"]),
                        o["n_rows"], o["centered"])


@dataclass(frozen=True)
class GramStats:
    """The sufficient statistics of a PCA fit — (ΣxxᵀT flat, Σx, n) —
    which are ADDITIVE: stats of a union are the elementwise sum of the
    parts, so per-batch / per-segment stats fold into corpus stats with
    no re-scan (``merge``; the consuming→immutable analog for PCA,
    matching ``bloom_merge``/``theta_union``/``cms_merge``), and a model
    refit from merged stats equals a from-scratch fit (tested)."""

    g: tuple[float, ...]  # d*d row-major
    s: tuple[float, ...]
    n: int

    @property
    def d(self) -> int:
        return len(self.s)

    def merge(self, other: "GramStats") -> "GramStats":
        if self.d != other.d:
            raise ValueError("cannot merge GramStats of different dims")
        return GramStats(tuple(a + b for a, b in zip(self.g, other.g)),
                         tuple(a + b for a, b in zip(self.s, other.s)),
                         self.n + other.n)

    def to_json(self) -> str:
        return json.dumps({"g": list(self.g), "s": list(self.s),
                           "n": self.n})

    @staticmethod
    def from_json(txt: str) -> "GramStats":
        o = json.loads(txt)
        return GramStats(tuple(o["g"]), tuple(o["s"]), o["n"])


def collect_gram_stats(df: DataFrame, vec_col: str, d: int) -> GramStats:
    """:func:`gram_stats` packaged as the mergeable artifact."""
    g, s, n = gram_stats(df, vec_col, d)
    return GramStats(tuple(float(x) for x in g.ravel()),
                     tuple(float(x) for x in s), int(n))


def pca_from_stats(stats: GramStats, r: int, center: bool = True
                   ) -> PCAModel:
    """Fit from (possibly merged) sufficient statistics — zero scans."""
    d = stats.d
    if not 1 <= r <= d:
        raise ValueError(f"need 1 <= r <= d, got r={r}, d={d}")
    if stats.n < 2:
        raise ValueError(f"need >= 2 rows to fit, got {stats.n}")
    g = np.asarray(stats.g, dtype=np.float64).reshape(d, d)
    s = np.asarray(stats.s, dtype=np.float64)
    return _fit_from_moments(g, s, stats.n, r, center)


def gram_stats(df: DataFrame, vec_col: str, d: int
               ) -> tuple[np.ndarray, np.ndarray, int]:
    """One-pass exact (Gram, sum, count): per-partition numpy folds via
    mapInPandas emit ONE (d², d, 1)-sized row each; the driver reduces P
    rows. Rows with NULL or wrong-length vectors are skipped (counted
    out), matching the NULL discipline of the aggregation suite."""
    schema = "g array<double>, s array<double>, n long"

    def fold(batches):  # closure: pickles by value (driver-sim rule)
        import numpy as _np
        g = _np.zeros((d, d)); s = _np.zeros(d); n = 0
        for pdf in batches:
            vecs = [v for v in pdf.iloc[:, 0]
                    if v is not None and len(v) == d]
            if not vecs:
                continue
            x = _np.asarray([_np.asarray(v, dtype=_np.float64)
                             for v in vecs])
            g += x.T @ x
            s += x.sum(axis=0)
            n += x.shape[0]
        import pandas as _pd
        yield _pd.DataFrame({"g": [g.ravel().tolist()],
                             "s": [s.tolist()], "n": [n]})

    rows = (df.select(F.col(vec_col))
            .mapInPandas(fold, schema).collect())
    g = np.zeros((d, d)); s = np.zeros(d); n = 0
    for r in rows:
        g += np.asarray(r["g"]).reshape(d, d)
        s += np.asarray(r["s"])
        n += r["n"]
    return g, s, n


def pca_fit(df: DataFrame, vec_col: str, d: int, r: int,
            center: bool = True) -> PCAModel:
    """Exact PCA from the one-pass Gram: eigendecompose the d×d second
    moment (mean-centered unless ``center=False`` — uncentered keeps
    dot-product geometry for cosine pipelines)."""
    if not 1 <= r <= d:
        raise ValueError(f"need 1 <= r <= d, got r={r}, d={d}")
    g, s, n = gram_stats(df, vec_col, d)
    if n < 2:
        raise ValueError(f"need >= 2 rows to fit, got {n}")
    return _fit_from_moments(g, s, n, r, center)


def _fit_from_moments(g: np.ndarray, s: np.ndarray, n: int, r: int,
                      center: bool) -> PCAModel:
    d = len(s)
    mu = s / n if center else np.zeros(d)
    cov = g / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:r]
    comps = vecs[:, order].T  # r×d
    # sign convention: largest-|coord| entry of each component positive,
    # so the fit is deterministic across LAPACK builds
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(tuple(tuple(float(x) for x in c) for c in comps),
                    tuple(float(x) for x in mu),
                    tuple(float(max(0.0, vals[o])) for o in order),
                    int(n), center)


def explained_variance_ratio(m: PCAModel) -> tuple[float, ...]:
    t = sum(m.explained_variance)
    if t <= 0:
        return tuple(0.0 for _ in m.explained_variance)
    return tuple(v / t for v in m.explained_variance)


def project(df: DataFrame, vec_col: str, model: PCAModel,
            out_col: str = "proj", whiten: bool = False) -> DataFrame:
    """Scan-side projection ``(x − μ) @ componentsᵀ`` — an Arrow-batched
    pandas UDF over a broadcast (r×d) matrix; zero shuffle (plan-asserted
    Exchange-free in tests), streaming-legal. NULL / wrong-length
    vectors project to NULL. ``whiten=True`` additionally scales each
    coordinate by 1/√eigenvalue (unit variance per direction — the PCA
    whitening SemDeDup-style cosine pipelines cluster in, so no single
    dominant direction owns the similarity)."""
    spark = df.sparkSession
    comps = np.asarray(model.components, dtype=np.float64)
    if whiten:
        scale = 1.0 / np.sqrt(np.maximum(
            np.asarray(model.explained_variance, dtype=np.float64), 1e-12))
        comps = scale[:, None] * comps
    bc = spark.sparkContext.broadcast(
        (comps, np.asarray(model.mean, dtype=np.float64)))
    d = model.d

    def _proj(col):  # closure; unannotated (stringized-hints rule)
        import numpy as _np
        import pandas as _pd
        comps, mu = bc.value
        out = []
        for v in col:
            if v is None or len(v) != d:
                out.append(None)
            else:
                out.append(((_np.asarray(v, dtype=_np.float64) - mu)
                            @ comps.T).tolist())
        return _pd.Series(out)

    udf = F.pandas_udf(_proj, "array<double>")
    return df.withColumn(out_col, udf(F.col(vec_col)))


def suggest_rank(model: PCAModel, target: float = 0.9) -> int:
    """Smallest r whose cumulative explained-variance ratio reaches
    ``target`` — fit once at full (or generous) rank, then pick the
    projection width from the spectrum instead of guessing (the analog
    of ``similarity.suggest_cells``'s √n rule for IVF geometry)."""
    if not 0.0 < target <= 1.0:
        raise ValueError("target must be in (0, 1]")
    ratios = explained_variance_ratio(model)
    acc = 0.0
    for i, r in enumerate(ratios):
        acc += r
        if acc >= target - 1e-12:
            return i + 1
    return len(ratios)


# ---------------------------------------------------------------- FD --

def _fd_shrink(b: np.ndarray, ell: int) -> np.ndarray:
    """The FD step: SVD, subtract σ_ℓ² from every squared singular
    value, keep the ℓ strongest directions. Rows of the result span the
    sketch; all-zero rows are kept (fixed ℓ×d shape simplifies merge)."""
    if b.shape[0] <= ell:
        out = np.zeros((ell, b.shape[1]))
        out[: b.shape[0]] = b
        return out
    _, sv, vt = np.linalg.svd(b, full_matrices=False)
    delta = sv[ell - 1] ** 2 if len(sv) >= ell else 0.0
    s2 = np.clip(sv[:ell] ** 2 - delta, 0.0, None)
    return (np.sqrt(s2)[:, None] * vt[:ell])


def fd_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Stack-and-shrink — FD's mergeability (Ghashami et al. §3): the
    merged ℓ×d sketch carries the SUM of both inputs' squared-norm
    budgets, so the covariance error bound survives composition
    (per-batch streaming folds, per-partition map sketches)."""
    if a.shape != b.shape:
        raise ValueError("cannot merge FD sketches of different shapes")
    return _fd_shrink(np.vstack([a, b]), a.shape[0])


def fd_sketch(df: DataFrame, vec_col: str, d: int, ell: int) -> np.ndarray:
    """Distributed Frequent Directions: each partition streams its rows
    through a 2ℓ buffer (shrink on overflow) and emits ONE ℓ×d sketch;
    the driver folds P sketches with :func:`fd_merge`. One scan, zero
    shuffles, collect bounded by P·ℓ·d. For any k < ℓ:
    ``‖AᵀA − BᵀB‖₂ ≤ ‖A − A_k‖F² / (ℓ − k)`` (tested)."""
    if ell < 2:
        raise ValueError("ell must be >= 2")
    schema = "b array<double>"

    def sketch(batches):  # closure (driver-sim pickling rule); carries
        # its OWN shrink — referencing module-level _fd_shrink would
        # pickle-by-reference into an import executors cannot resolve
        import numpy as _np
        import pandas as _pd

        def shrink(b):
            if b.shape[0] <= ell:
                out = _np.zeros((ell, b.shape[1]))
                out[: b.shape[0]] = b
                return out
            _, sv, vt = _np.linalg.svd(b, full_matrices=False)
            delta = sv[ell - 1] ** 2 if len(sv) >= ell else 0.0
            s2 = _np.clip(sv[:ell] ** 2 - delta, 0.0, None)
            return _np.sqrt(s2)[:, None] * vt[:ell]

        buf = _np.zeros((0, d))
        for pdf in batches:
            vecs = [v for v in pdf.iloc[:, 0]
                    if v is not None and len(v) == d]
            if not vecs:
                continue
            x = _np.asarray([_np.asarray(v, dtype=_np.float64)
                             for v in vecs])
            buf = _np.vstack([buf, x])
            while buf.shape[0] >= 2 * ell:
                head = shrink(buf[: 2 * ell])
                buf = _np.vstack([head, buf[2 * ell:]])
        final = shrink(buf)
        yield _pd.DataFrame({"b": [final.ravel().tolist()]})

    rows = df.select(F.col(vec_col)).mapInPandas(sketch, schema).collect()
    acc = np.zeros((ell, d))
    for row in rows:
        acc = fd_merge(acc, np.asarray(row["b"]).reshape(ell, d))
    return acc


def fd_pca(sk: np.ndarray, r: int) -> PCAModel:
    """Approximate (uncentered) principal directions from an FD sketch —
    the right-singular vectors of the sketch. The approximation error
    inherits FD's covariance bound; use for huge-d feature spaces where
    the exact d×d Gram is out of reach."""
    ell, d = sk.shape
    if not 1 <= r <= min(ell, d):
        raise ValueError(f"need 1 <= r <= min(ell, d), got {r}")
    _, sv, vt = np.linalg.svd(sk, full_matrices=False)
    comps = vt[:r].copy()
    for i in range(r):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(tuple(tuple(float(x) for x in c) for c in comps),
                    tuple(0.0 for _ in range(d)),
                    tuple(float(s) ** 2 for s in sv[:r]),
                    0, False)


# ----------------------------------------------- shortlist-and-rerank --

def pca_shortlist_topk(df: DataFrame, query_vec: list[float],
                       model: PCAModel, id_col: str, vec_col: str,
                       k: int, shortlist: int | None = None) -> DataFrame:
    """ANN with a projected-space shortlist: score EVERY row in r-dim
    projected space (cheap scan-side fold), keep the top ``shortlist``
    (TakeOrderedAndProject — per-partition top-s, no global sort), then
    exact-rerank ONLY those in full d-dim space via a broadcast join
    back to the corpus. Same shortlist-then-rerank discipline as the
    PQ/ADC probe (``operators/pq``); recall floors are pytest-enforced
    on low-rank data. Returns (id, cos) top-k by exact cosine."""
    shortlist = shortlist or max(4 * k, 64)
    q = np.asarray(query_vec, dtype=np.float64)
    qp = ((q - np.asarray(model.mean)) @
          np.asarray(model.components).T).tolist()
    proj = project(df.select(id_col, vec_col), vec_col, model, "__p")
    from realtime_olap_spark.litarray import lit_doubles  # noqa: PLC0415
    qlit = lit_doubles(qp)
    # projected cosine via one zip_with dot + norms (JVM-side folds)
    dot = F.aggregate(F.zip_with("__p", qlit, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = F.aggregate(F.transform("__p", lambda x: x * x),
                      F.lit(0.0), lambda acc, x: acc + x)
    qn = float(np.sqrt(np.dot(qp, qp))) or 1.0
    score = dot / (F.sqrt(nrm) * F.lit(qn) + F.lit(1e-12))
    cand = (proj.select(id_col, score.alias("__ps"))
            .orderBy(F.col("__ps").desc(), F.col(id_col))
            .limit(shortlist))
    from realtime_olap_spark.operators.similarity import cosine_topk
    hits = df.join(F.broadcast(cand.select(id_col)), id_col)
    return cosine_topk(hits, query_vec, id_col, vec_col, k)


def reconstruction_mse(df: DataFrame, vec_col: str, model: PCAModel
                       ) -> float:
    """Mean squared reconstruction error of the fitted subspace over
    ``df`` — the operational \"is r enough?\" diagnostic. One scan-side
    fold: project, back-project, per-row squared error; a single AVG
    shuffle-light aggregate."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (np.asarray(model.components, dtype=np.float64),
         np.asarray(model.mean, dtype=np.float64)))
    d = model.d

    def _err(col):  # closure
        import numpy as _np
        import pandas as _pd
        comps, mu = bc.value
        out = []
        for v in col:
            if v is None or len(v) != d:
                out.append(None)
            else:
                x = _np.asarray(v, dtype=_np.float64) - mu
                p = x @ comps.T
                out.append(float(((x - p @ comps) ** 2).sum()))
        return _pd.Series(out, dtype=float)

    udf = F.pandas_udf(_err, "double")
    row = (df.select(udf(F.col(vec_col)).alias("e"))
           .agg(F.avg("e").alias("mse")).first())
    return float(row["mse"]) if row["mse"] is not None else math.nan
