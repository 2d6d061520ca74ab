"""Z-order (Morton-interleaved) clustered segment writes.

The reference prunes segments with a SINGLE sorted column plus partition
columns (SortedInvertedIndexBasedFilterOperator.java:33,
ColumnValueSegmentPruner.java:41); a range predicate on any other column
scans everything. Z-ordering — the public technique behind Delta Lake's
``OPTIMIZE ... ZORDER BY`` and the classic Morton curve — generalizes the
sorted column to k dimensions: normalize each clustering column to a
``bits``-wide integer, interleave the bits into one z-value, then
range-partition + sort the data by it. Every file then covers a small
hyper-rectangle of the k-dim space, so min/max footer stats prune files
and row groups for range predicates on ANY clustered column, not just the
first.

Scale design: bounds are one tiny driver-side min/max aggregate (k values);
the z-value itself is a pure JVM bit expression (shift/and/or chain inside
WholeStageCodegen, no UDF); the layout move is ONE ``repartitionByRange``
shuffle — exactly what a write-time OPTIMIZE pays on a cluster. Queries
pay nothing: pruning comes from parquet min/max stats on the ORIGINAL
columns, which z-locality makes tight per file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension; k * bits must stay < 63 so the z-value fits a long.
DEFAULT_BITS = 16


def _normalize(col: Column, lo, hi, bits: int) -> Column:
    """Min/max-scale a numeric column onto [0, 2^bits) as a long. Constant
    columns (lo == hi) contribute nothing to the ordering → 0."""
    span = float(hi) - float(lo)
    if span <= 0.0:
        return F.lit(0).cast("long")
    scale = ((2 ** bits) - 1) / span
    scaled = ((col.cast("double") - float(lo)) * scale)
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)),
                   F.lit(2 ** bits - 1))


def zvalue(norm_cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of each already-normalized column
    into one Morton code (column j owns bit positions j, j+k, j+2k, …).
    Pure shift/and/or tree — whole-stage-codegen'd, no UDF."""
    k = len(norm_cols)
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(norm_cols):
        for i in range(bits):
            # bit i of column j -> bit i*k + j of the z-value
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def zorder_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """Driver-side per-column (min, max) — one scan-side agg, k tiny rows
    back. At 100 TB this is the only non-layout cost of the OPTIMIZE."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
    row = df.agg(*aggs).first()
    return {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}


def with_zvalue(df: DataFrame, cols: list[str],
                bounds: dict[str, tuple] | None = None,
                bits: int = DEFAULT_BITS,
                out: str = "__z") -> DataFrame:
    """Attach the Morton code of ``cols`` as column ``out``."""
    bounds = bounds or zorder_bounds(df, cols)
    norm = [_normalize(F.col(c), *bounds[c], bits) for c in cols]
    return df.withColumn(out, zvalue(norm, bits))


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   num_files: int = 16, bits: int = DEFAULT_BITS,
                   mode: str = "overwrite") -> None:
    """OPTIMIZE-style clustered rewrite: range-partition by z-value into
    ``num_files`` files, sort within each, write WITHOUT the helper column
    (ordering survives the projection; the payoff is tight min/max footer
    stats on the original columns in every file/row group)."""
    zdf = with_zvalue(df, cols, bits=bits)
    (zdf.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode).parquet(path))


def file_ranges(df_from_path: DataFrame, cols: list[str]) -> DataFrame:
    """Per-file min/max of the clustering columns — the footer stats a
    reader's pruning sees, surfaced as a DataFrame for introspection and
    tests (segment-metadata analog, common/metadata/segment/)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (df_from_path
            .groupBy(F.input_file_name().alias("file"))
            .agg(*aggs))
