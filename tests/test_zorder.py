"""Z-order clustered writes — Morton-code unit tests + file-pruning layout
properties (each clustered dimension's range predicate must be able to
skip most files, unlike a single-column sort)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realtime_olap_spark.catalog import Catalog
from realtime_olap_spark.sources.zorder import (file_ranges, with_zvalue,
                                                write_zordered, zvalue)
from tests.conftest import SF_DIR


def _py_morton(vals: list[int], bits: int) -> int:
    z = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zvalue_matches_python_morton(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (65535, 1),
            (12345, 54321)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = df.select("x", "y",
                    zvalue([F.col("x").cast("long"),
                            F.col("y").cast("long")], 16).alias("z")).collect()
    for r in out:
        assert r["z"] == _py_morton([r["x"], r["y"]], 16), (r["x"], r["y"])


def test_zvalue_locality_is_monotone_on_diagonal(spark):
    # points on the diagonal must be z-sorted in diagonal order
    rows = [(i, i) for i in range(0, 64)]
    df = spark.createDataFrame(rows, ["x", "y"])
    zs = [r["z"] for r in
          df.select(zvalue([F.col("x").cast("long"),
                            F.col("y").cast("long")], 8).alias("z"))
            .orderBy("x").collect()]
    assert zs == sorted(zs)


def _overlap_count(ranges, col, lo, hi):
    return sum(1 for r in ranges
               if not (r[f"{col}_max"] < lo or r[f"{col}_min"] > hi))


def test_zorder_write_prunes_both_dims(spark, tmp_path):
    li = Catalog(spark, SF_DIR).table("lineitem") \
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    zpath = os.path.join(str(tmp_path), "li_z")
    spath = os.path.join(str(tmp_path), "li_sorted")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], num_files=16)
    # strawman: classic single-column sorted layout (the reference's model)
    (li.repartitionByRange(16, "l_partkey").sortWithinPartitions("l_partkey")
       .write.mode("overwrite").parquet(spath))

    n_files = 16
    zr = file_ranges(spark.read.parquet(zpath),
                     ["l_partkey", "l_suppkey"]).collect()
    sr = file_ranges(spark.read.parquet(spath),
                     ["l_partkey", "l_suppkey"]).collect()
    assert len(zr) == n_files and len(sr) == n_files

    stats = li.agg(F.max("l_partkey").alias("p"),
                   F.max("l_suppkey").alias("s")).first()
    # a ~25% slab in each dimension
    p_hi, s_hi = stats["p"] // 4, stats["s"] // 4

    # dim 1: both layouts prune (z-order need not beat a dedicated sort)
    assert _overlap_count(zr, "l_partkey", 0, p_hi) <= n_files // 2
    # dim 2: z-order still prunes; the single-sort layout cannot
    z2 = _overlap_count(zr, "l_suppkey", 0, s_hi)
    s2 = _overlap_count(sr, "l_suppkey", 0, s_hi)
    assert z2 <= n_files // 2 < s2, (z2, s2)

    # correctness: clustered rewrite is the same table
    box = (F.col("l_partkey") <= p_hi) & (F.col("l_suppkey") <= s_hi)
    want = sorted(tuple(r) for r in li.filter(box).collect())
    got = sorted(tuple(r) for r in
                 spark.read.parquet(zpath).select(*li.columns)
                 .filter(box).collect())
    assert got == want and len(got) > 0


def test_constant_column_contributes_zero(spark):
    df = spark.createDataFrame([(i, 7) for i in range(10)], ["x", "c"])
    z1 = with_zvalue(df, ["x", "c"]).select("x", "__z")
    a = {r["x"]: r["__z"] for r in z1.collect()}
    # constant dim -> all its bits are 0; ordering must equal x-only order
    xs = sorted(a, key=lambda x: a[x])
    assert xs == sorted(a)
