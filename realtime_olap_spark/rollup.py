"""Star-tree analog: materialized rollup tables + aggregate routing.

The reference pre-aggregates along a dimension split order into a star-tree
(pinot-core/.../startree/v2/StarTreeV2.java:29, builder
v2/builder/BaseSingleTreeBuilder.java:61, config maxLeafRecords=10k
StarTreeV2BuilderConfig.java:35) storing per-node aggregates for declared
function-column pairs (AggregationFunctionColumnPair.java:25-58 — e.g.
``sum__colX``, ``count__*``). At query time, eligible aggregation queries
(dims ⊆ tree dims, aggs ⊆ pairs) traverse the tree instead of raw docs
(StarTreeFilterOperator.java:55-88, StarTreeAggregationExecutor.java:40).

Spark-first reformulation: the rollup is ONE materialized
``groupBy(dims).agg(pairs)`` table (the star-tree's leaf level; Parquet
row-group stats replace interior nodes), and routing is an engine-level
rewrite: an eligible query aggregates the rollup's pre-aggregated columns —
SUM re-sums partials, COUNT sums counts, MIN/MAX re-min/max — which is
exact for decomposable aggregates. At 100 TB the rollup is smaller than the
fact table by the dimension-cardinality product, so routed queries scan
orders of magnitude less data; Catalyst still prunes/pushes down on it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from realtime_olap_spark.operators.aggregation import DEC

COUNT_COL = "count__star"  # AggregationFunctionColumnPair.java: count__*


@dataclass(frozen=True)
class RollupSpec:
    """Declared pre-aggregation: split-order dims + function/column pairs
    (StarTreeV2BuilderConfig analog)."""

    dims: tuple[str, ...]
    sum_cols: tuple[str, ...] = ()
    min_cols: tuple[str, ...] = ()
    max_cols: tuple[str, ...] = ()
    # FASTHLL analog (FastHLLAggregationFunction.java:33, HllUtil.java:33):
    # pre-serialized, MERGEABLE DataSketches HLL per group — distinct counts
    # re-aggregate across groups without rescanning the fact table.
    hll_cols: tuple[str, ...] = ()
    hll_lg_k: int = 12
    # Percentile-digest pairs (AggregationFunctionColumnPair.java:25-58
    # declares PERCENTILE_EST / PERCENTILE_TDIGEST pairs): a mergeable
    # DataSketches KLL quantile sketch per group, so routed
    # PERCENTILEEST<N>/PERCENTILETDIGEST<N> queries merge partials instead
    # of rescanning the fact table.
    kll_cols: tuple[str, ...] = ()
    kll_k: int = 200

    def pair_columns(self) -> list[str]:
        return ([COUNT_COL]
                + [f"sum__{c}" for c in self.sum_cols]
                + [f"min__{c}" for c in self.min_cols]
                + [f"max__{c}" for c in self.max_cols]
                + [f"hll__{c}" for c in self.hll_cols]
                + [f"kll__{c}" for c in self.kll_cols])


def build_rollup(df: DataFrame, spec: RollupSpec) -> DataFrame:
    """Materialize the rollup table (BaseSingleTreeBuilder analog — one
    shuffle, decimal-exact partial sums so routed SUMs equal raw SUMs)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias(COUNT_COL)]
    # Partial sums stay DECIMAL so re-aggregation merges exactly.
    aggs += [F.sum(F.col(c).cast(DEC)).alias(f"sum__{c}") for c in spec.sum_cols]
    aggs += [F.min(F.col(c).cast("double")).alias(f"min__{c}") for c in spec.min_cols]
    aggs += [F.max(F.col(c).cast("double")).alias(f"max__{c}") for c in spec.max_cols]
    aggs += [F.hll_sketch_agg(F.col(c).cast("string"), spec.hll_lg_k)
             .alias(f"hll__{c}") for c in spec.hll_cols]
    aggs += [F.kll_sketch_agg_double(F.col(c).cast("double"), spec.kll_k)
             .alias(f"kll__{c}") for c in spec.kll_cols]
    return df.groupBy(*spec.dims).agg(*aggs)


import re as _re

# PERCENTILEEST<N> / PERCENTILETDIGEST<N> — the digest-backed percentile
# kinds a star-tree pair can answer (exact PERCENTILE<N> is NOT eligible:
# a sketch cannot reproduce the exact interpolated value).
_PCT_SKETCH_RE = _re.compile(r"^percentile(?:est|tdigest)(\d{1,2}|100)$")


class RollupRouter:
    """Engine-level routing rule (the BrokerRequestPreProcessor.java:60-97 /
    star-tree executor analog): answer eligible aggregate queries from the
    rollup, fall back to the fact table otherwise."""

    def __init__(self, fact: DataFrame, rollup: DataFrame, spec: RollupSpec):
        self.fact = fact
        self.rollup = rollup
        self.spec = spec

    def eligible(self, group_dims: list[str], aggs: list[tuple[str, str | None]],
                 filter_dims: list[str] = ()) -> bool:
        """dims ⊆ rollup dims, filters only on rollup dims, and every agg is
        a materialized pair — StarTreeUtils eligibility rules."""
        if not set(group_dims) <= set(self.spec.dims):
            return False
        if not set(filter_dims) <= set(self.spec.dims):
            return False
        for fn, col in aggs:
            fn = fn.lower()
            if fn == "count":
                continue
            if fn == "sum" and col in self.spec.sum_cols:
                continue
            if fn == "avg" and col in self.spec.sum_cols:
                continue  # avg = sum__col / count__star
            if fn == "min" and col in self.spec.min_cols:
                continue
            if fn == "max" and col in self.spec.max_cols:
                continue
            if fn == "distinctcounthll" and col in self.spec.hll_cols:
                continue
            if _PCT_SKETCH_RE.match(fn) and col in self.spec.kll_cols:
                continue
            return False
        return True

    def query(self, group_dims: list[str], aggs: list[tuple[str, str | None, str]],
              where: Column | None = None,
              filter_dims: list[str] = ()) -> DataFrame:
        """Execute grouped aggregates, routed to the rollup when eligible.

        ``aggs``: (fn, col, alias); fn ∈ count/sum/avg/min/max/
        distinctcounthll (the latter answered from merged HLL sketches).
        ``where`` must reference only ``filter_dims``.
        """
        if self.eligible(group_dims, [(f, c) for f, c, _ in aggs], filter_dims):
            src = self.rollup if where is None else self.rollup.where(where)
            cols = []
            for fn, col, alias in aggs:
                fn = fn.lower()
                if fn == "count":
                    cols.append(F.sum(COUNT_COL).cast("long").alias(alias))
                elif fn == "sum":
                    cols.append(F.sum(f"sum__{col}").cast("double").alias(alias))
                elif fn == "avg":
                    cols.append((F.sum(f"sum__{col}").cast("double")
                                 / F.sum(COUNT_COL)).alias(alias))
                elif fn == "min":
                    cols.append(F.min(f"min__{col}").alias(alias))
                elif fn == "max":
                    cols.append(F.max(f"max__{col}").alias(alias))
                elif fn == "distinctcounthll":
                    # sketch union is exact over partials: the merged
                    # registers equal a single-pass sketch of the raw rows
                    cols.append(F.hll_sketch_estimate(
                        F.hll_union_agg(f"hll__{col}")).alias(alias))
                elif (m := _PCT_SKETCH_RE.match(fn)):
                    # routed percentile: merge the groups' KLL partials,
                    # then ask the merged sketch for the quantile —
                    # StarTreeAggregationExecutor over a tdigest/KLL pair
                    pct = int(m.group(1))
                    cols.append(F.kll_sketch_get_quantile_double(
                        F.kll_merge_agg_double(f"kll__{col}"),
                        F.lit(pct / 100.0)).alias(alias))
            g = src.groupBy(*group_dims) if group_dims else src.groupBy()
            return g.agg(*cols)
        # Fallback: raw fact-table aggregation (same decimal-exact semantics).
        from realtime_olap_spark.operators.groupby import Agg, Key, group_by_agg
        return group_by_agg(
            self.fact,
            keys=[Key(d, d) for d in group_dims],
            aggs=[Agg(fn, col, alias) for fn, col, alias in aggs],
            where=where)
