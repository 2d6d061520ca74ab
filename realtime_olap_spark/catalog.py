"""Role-typed table catalog.

The reference declares an explicit JSON schema per table where every column
has a role — DIMENSION / METRIC / TIME
(pinot-common/.../data/FieldSpec.java:378-391, Schema.java:61). Types are
INT/LONG/FLOAT/DOUBLE/BOOLEAN/STRING/BYTES, single- or multi-value
(FieldSpec.java:385-391, :72-73). We keep the role model as engine metadata
on top of Spark's StructType; the physical schema is whatever Parquet says.

Missing values in the reference are replaced at ingest by per-role sentinel
defaults (FieldSpec.java:52-64) — ``TableConfig.null_defaults`` reproduces
that for ingest jobs (the driver's synthetic data has no NULLs, so the
correctness suite is unaffected).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Sentinel defaults per role, mirroring FieldSpec.java:52-64.
DIMENSION_DEFAULTS = {
    "int": -2147483648,
    "long": -9223372036854775808,
    "float": float("-inf"),
    "double": float("-inf"),
    "string": "null",
}
METRIC_DEFAULTS = {"int": 0, "long": 0, "float": 0.0, "double": 0.0}


@dataclass(frozen=True)
class TableConfig:
    """Engine-level table metadata: column roles + time granularity."""

    name: str
    dimensions: tuple[str, ...]
    metrics: tuple[str, ...] = ()
    time_column: str | None = None
    time_unit: str = "DAYS"  # granularity of the time column (TimeGranularitySpec)
    multi_value: tuple[str, ...] = ()  # ArrayType columns (MV semantics, §2.4/§2.9)
    sorted_column: str | None = None  # sorted-index analog: sortWithinPartitions on write

    @property
    def columns(self) -> tuple[str, ...]:
        cols = list(self.dimensions) + list(self.metrics)
        if self.time_column:
            cols.append(self.time_column)
        return tuple(cols)


# The driver's synthetic star schema (TESTDATA.md / FIXTURES.md).
TABLES: dict[str, TableConfig] = {
    t.name: t
    for t in [
        TableConfig(
            "lineitem",
            dimensions=("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                        "l_returnflag", "l_linestatus"),
            metrics=("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
            time_column="l_shipdate",
            time_unit="DAYS",
            sorted_column="l_returnflag",
        ),
        TableConfig(
            "orders",
            dimensions=("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"),
            metrics=("o_totalprice",),
            time_column="o_orderdate",
            time_unit="DAYS",
        ),
        TableConfig(
            "events",
            dimensions=("event_id", "user_id", "event_type", "props"),
            metrics=("value",),
            time_column="ts",
            time_unit="MILLISECONDS",
        ),
        TableConfig("customer",
                    dimensions=("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
                    metrics=("c_acctbal",)),
        TableConfig("supplier",
                    dimensions=("s_suppkey", "s_name", "s_nationkey"),
                    metrics=("s_acctbal",)),
        TableConfig("part",
                    dimensions=("p_partkey", "p_name", "p_brand", "p_type", "p_size"),
                    metrics=("p_retailprice",)),
        TableConfig("nation", dimensions=("n_nationkey", "n_name", "n_regionkey")),
        TableConfig("region", dimensions=("r_regionkey", "r_name")),
        TableConfig("documents",
                    dimensions=("doc_id", "text", "lang", "source"),
                    metrics=("n_chars",)),
        TableConfig("embeddings",
                    dimensions=("vec_id", "label"),
                    multi_value=("embedding",)),
    ]
}


@dataclass
class Catalog:
    """Loads the star-schema tables of one scale factor and registers views.

    A reference 'segment' maps to a Parquet file; a 'table' to the DataFrame
    over all its files (SURVEY.md §1.5). Queries address one table
    (README.md:27) — joins are an engine extension beyond reference parity.
    """

    spark: SparkSession
    sf_dir: str = DEFAULT_SF_DIR
    _cache: dict[str, DataFrame] = field(default_factory=dict)

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            if name not in TABLES:
                raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            if name == "events":
                # events.ts is Parquet TIMESTAMP(NANOS), which Spark's reader
                # rejects outright ([PARQUET_TYPE_ILLEGAL]). Read the physical
                # INT64 as epoch-nanos and re-derive a microsecond timestamp
                # (`ts div 1000` stays in long arithmetic — 1.7e18 ns doesn't
                # survive a double). Microsecond truncation also matches what
                # SQL engines (e.g. DuckDB) expose for ns parquet columns.
                df = self.spark.read.schema(
                    "event_id long, ts long, user_id long, event_type string, "
                    "value double, props string"
                ).parquet(path)
                df = (df.withColumnRenamed("ts", "ts_ns")
                        .withColumn("ts", F.expr("timestamp_micros(ts_ns div 1000)")))
                self._cache[name] = df
            else:
                self._cache[name] = self.spark.read.parquet(path)
        return self._cache[name]

    def config(self, name: str) -> TableConfig:
        return TABLES[name]

    def register_views(self) -> None:
        """Register every table as a temp view for the SQL entry point."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)
