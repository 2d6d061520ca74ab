"""Ingest-time record transformers (SURVEY.md §2.1).

Reference pipeline: CompoundTransformer composes ExpressionTransformer →
TimeTransformer → DataTypeTransformer → SanitationTransformer
(core/data/recordtransformer/CompoundTransformer.java:32 and siblings);
missing values become per-role sentinel defaults (FieldSpec.java:52-64);
STRING/BYTES truncate to maxLength, default 512 (FieldSpec.java:47,75-77).

Spark-first: every transformer is a pure DataFrame→DataFrame function built
from ``withColumn`` expressions, so the whole ingest pipeline stays inside
one WholeStageCodegen projection — per-row Java reflection calls
(FunctionInvoker.java:35) become Catalyst expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from realtime_olap_spark.catalog import (DIMENSION_DEFAULTS, METRIC_DEFAULTS,
                                         TableConfig)

_UNIT_MS = {"MILLISECONDS": 1, "SECONDS": 1_000, "MINUTES": 60_000,
            "HOURS": 3_600_000, "DAYS": 86_400_000}

DEFAULT_MAX_LENGTH = 512  # FieldSpec.java:47

# Spark simpleString spellings → reference type names (FieldSpec.DataType)
_TYPE_NAME = {"int": "int", "bigint": "long", "float": "float",
              "double": "double", "string": "string"}


@dataclass(frozen=True)
class ExpressionTransformer:
    """Derived columns from SQL expressions over the incoming record
    (FunctionExpressionEvaluator.java:45 analog — arbitrary expressions
    instead of a reflection registry)."""

    expressions: dict[str, str] = field(default_factory=dict)

    def __call__(self, df: DataFrame) -> DataFrame:
        for col, expr in self.expressions.items():
            df = df.withColumn(col, F.expr(expr))
        return df


@dataclass(frozen=True)
class TimeTransformer:
    """Incoming→outgoing time granularity conversion
    (TimeFieldSpec.java:36-39, TimeGranularitySpec.java:51): epoch integer
    arithmetic, floor semantics on coarsening."""

    time_column: str
    incoming_unit: str = "MILLISECONDS"
    outgoing_unit: str = "MILLISECONDS"

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.incoming_unit == self.outgoing_unit:
            return df
        c = F.col(self.time_column)
        in_ms, out_ms = _UNIT_MS[self.incoming_unit], _UNIT_MS[self.outgoing_unit]
        if in_ms >= out_ms:  # finer target: exact multiply
            out = c.cast("long") * F.lit(in_ms // out_ms)
        else:  # coarser target: floor divide
            out = F.floor(c.cast("long") * F.lit(in_ms) / F.lit(out_ms)).cast("long")
        return df.withColumn(self.time_column, out)


@dataclass(frozen=True)
class DataTypeTransformer:
    """Cast every declared column to its target Spark type; single values
    destined for a multi-value (array) column are wrapped
    (DataTypeTransformer.java:34 / PinotDataType.java:36 analog)."""

    types: dict[str, str] = field(default_factory=dict)  # col -> spark type name
    multi_value: tuple[str, ...] = ()

    def __call__(self, df: DataFrame) -> DataFrame:
        for col, t in self.types.items():
            if col not in df.columns:
                continue
            if col in self.multi_value:
                cur = df.schema[col].dataType
                if not isinstance(cur, ArrayType):
                    df = df.withColumn(col, F.array(F.col(col).cast(t)))
                else:
                    df = df.withColumn(col, F.col(col).cast(f"array<{t}>"))
            else:
                df = df.withColumn(col, F.col(col).cast(t))
        return df


@dataclass(frozen=True)
class SanitationTransformer:
    """String sanitation (SanitationTransformer.java:39): strip NUL bytes,
    truncate to maxLength (default 512, FieldSpec.java:47)."""

    string_columns: tuple[str, ...]
    max_length: int = DEFAULT_MAX_LENGTH

    def __call__(self, df: DataFrame) -> DataFrame:
        for col in self.string_columns:
            if col in df.columns:
                df = df.withColumn(
                    col, F.substring(F.regexp_replace(F.col(col), "\x00", ""),
                                     1, self.max_length))
        return df


@dataclass(frozen=True)
class NullDefaultTransformer:
    """Reference no-NULL semantics (FieldSpec.java:52-64): dimensions get
    sentinel defaults (MIN_VALUE / -inf / 'null'), metrics get 0."""

    config: TableConfig

    def __call__(self, df: DataFrame) -> DataFrame:
        fills: dict[str, object] = {}
        for col in self.config.dimensions:
            if col in df.columns and col not in self.config.multi_value:
                t = _TYPE_NAME.get(df.schema[col].dataType.simpleString())
                if t in DIMENSION_DEFAULTS:
                    fills[col] = DIMENSION_DEFAULTS[t]
        for col in self.config.metrics:
            if col in df.columns:
                t = _TYPE_NAME.get(df.schema[col].dataType.simpleString())
                if t in METRIC_DEFAULTS:
                    fills[col] = METRIC_DEFAULTS[t]
        # schema-declared defaultNullValue beats the per-role sentinel
        # (FieldSpec.getDefaultNullValue honors the declared override first)
        for col, v in self.config.null_value_overrides:
            if col in df.columns:
                fills[col] = v
        return df.fillna(fills) if fills else df


@dataclass(frozen=True)
class CompoundTransformer:
    """Reference composition order (CompoundTransformer.java:32):
    expressions → time conversion → type casts → sanitation, then the
    no-NULL sentinel fill."""

    transformers: tuple = ()

    @classmethod
    def for_table(cls, config: TableConfig,
                  expressions: dict[str, str] | None = None,
                  types: dict[str, str] | None = None,
                  incoming_time_unit: str | None = None,
                  string_columns: tuple[str, ...] = (),
                  max_length: int = DEFAULT_MAX_LENGTH) -> "CompoundTransformer":
        steps: list = []
        if expressions:
            steps.append(ExpressionTransformer(expressions))
        if incoming_time_unit and config.time_column:
            steps.append(TimeTransformer(config.time_column,
                                         incoming_time_unit, config.time_unit))
        if types:
            steps.append(DataTypeTransformer(types, config.multi_value))
        if string_columns:
            steps.append(SanitationTransformer(string_columns, max_length))
        steps.append(NullDefaultTransformer(config))
        return cls(tuple(steps))

    def __call__(self, df: DataFrame) -> DataFrame:
        for t in self.transformers:
            df = t(df)
        return df
