"""Transform (scalar) functions — reference parity set.

The reference registers exactly 7 built-ins
(TransformFunctionFactory.java:40-52): ADD, SUB, MULT, DIV, TIMECONVERT,
DATETIMECONVERT, VALUEIN; infix ``+ - * /`` compiles to the first four
(PQL2.g4 binaryMathOperator). Expression trees are FUNCTION | IDENTIFIER |
LITERAL (pinot-common/.../TransformExpressionTree.java:43). All of these are
plain Catalyst expressions here — JVM-side, codegen'd, no Python in the path.

Time units follow java.util.concurrent.TimeUnit (the reference's
TIMECONVERT contract, TimeConversionTransformFunction.java:33);
DATETIMECONVERT formats follow DateTimeFieldSpec
``size:timeunit:EPOCH|SIMPLE_DATE_FORMAT[:pattern]``
(pinot-common/.../data/DateTimeFieldSpec.java:39-75) with bucketing
granularity (BaseDateTimeTransformer.java:36).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNIT_MS: dict[str, int] = {
    "NANOSECONDS": 1,  # handled via sub-ms factor below
    "MICROSECONDS": 1,
    "MILLISECONDS": 1,
    "SECONDS": 1000,
    "MINUTES": 60_000,
    "HOURS": 3_600_000,
    "DAYS": 86_400_000,
}

# factors expressed in nanoseconds to keep sub-millisecond units exact
_UNIT_NS: dict[str, int] = {
    "NANOSECONDS": 1,
    "MICROSECONDS": 1_000,
    "MILLISECONDS": 1_000_000,
    "SECONDS": 1_000_000_000,
    "MINUTES": 60 * 1_000_000_000,
    "HOURS": 3_600 * 1_000_000_000,
    "DAYS": 86_400 * 1_000_000_000,
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dbl(col: Column | str) -> Column:
    return _c(col).cast("double")


# --- arithmetic (AdditionTransformFunction.java:32 …) -----------------------

def add(*cols: Column | str) -> Column:
    """ADD(a, b, …) — sum of ≥2 args as double."""
    out = _dbl(cols[0])
    for c in cols[1:]:
        out = out + _dbl(c)
    return out


def sub(a: Column | str, b: Column | str) -> Column:
    """SUB(a, b) — SubtractionTransformFunction.java:32."""
    return _dbl(a) - _dbl(b)


def mult(*cols: Column | str) -> Column:
    """MULT(a, b, …) — product of ≥2 args as double."""
    out = _dbl(cols[0])
    for c in cols[1:]:
        out = out * _dbl(c)
    return out


def div(a: Column | str, b: Column | str) -> Column:
    """DIV(a, b) — DivisionTransformFunction.java:32."""
    return _dbl(a) / _dbl(b)


# --- time conversion --------------------------------------------------------

def timeconvert(col: Column | str, from_unit: str, to_unit: str) -> Column:
    """TIMECONVERT(col, fromUnit, toUnit) — epoch quantity conversion
    (TimeConversionTransformFunction.java:33). Matches TimeUnit.convert for
    non-negative epochs: widening multiplies exactly in long arithmetic,
    narrowing floor-divides.
    """
    c = _c(col).cast("long")
    f, t = _UNIT_NS[from_unit.upper()], _UNIT_NS[to_unit.upper()]
    if f >= t:
        return (c * F.lit(f // t)).cast("long")
    # Narrowing: long floor-division, computed in decimal so 64-bit epochs
    # never round through a double.
    return F.floor(c.cast("decimal(38,0)") / F.lit(t // f)).cast("long")


def datetimeconvert(col: Column | str, input_fmt: str, output_fmt: str,
                    granularity: str) -> Column:
    """DATETIMECONVERT(col, inputFormat, outputFormat, granularity) —
    DateTimeConversionTransformFunction.java:82.

    Formats: ``<size>:<TIMEUNIT>:EPOCH`` or
    ``<size>:<TIMEUNIT>:SIMPLE_DATE_FORMAT:<pattern>``; granularity
    ``<size>:<TIMEUNIT>`` buckets the value by flooring
    (BaseDateTimeTransformer.java:36 + 4 subclasses).
    """
    in_size, in_unit, in_kind, *in_pat = input_fmt.split(":")
    out_size, out_unit, out_kind, *out_pat = output_fmt.split(":")
    g_size, g_unit = granularity.split(":")

    c = _c(col)
    # 1) input → epoch millis
    if in_kind.upper() == "EPOCH":
        ms = (c.cast("long") * F.lit(int(in_size) * _UNIT_MS[in_unit.upper()])).cast("long")
    else:  # SIMPLE_DATE_FORMAT
        ms = F.unix_millis(F.to_timestamp(c, in_pat[0]))

    # 2) bucket to granularity (floor)
    g_ms = int(g_size) * _UNIT_MS[g_unit.upper()]
    if g_ms > 1:
        ms = (F.floor(ms / F.lit(g_ms)) * F.lit(g_ms)).cast("long")

    # 3) epoch millis → output format
    if out_kind.upper() == "EPOCH":
        out_ms = int(out_size) * _UNIT_MS[out_unit.upper()]
        return F.floor(ms / F.lit(out_ms)).cast("long") if out_ms > 1 else ms
    return F.date_format(F.timestamp_millis(ms), out_pat[0])


# --- VALUEIN (MV projection filter) ----------------------------------------

def valuein(col: Column | str, *values) -> Column:
    """VALUEIN(mvCol, v1, v2, …) — filters an MV column's elements to the
    given set, projection-side (ValueInTransformFunction.java:51). Pairs with
    an IN filter the way the reference uses it."""
    vals = list(values)
    return F.filter(_c(col), lambda x: x.isin(vals))


# --- registry for the PQL front end ----------------------------------------

_REGISTRY = {
    "add": add,
    "sub": sub,
    "mult": mult,
    "div": div,
    "timeconvert": timeconvert,
    "datetimeconvert": datetimeconvert,
    "valuein": valuein,
}


def resolve_transform(name: str):
    """TransformFunctionFactory.get analog (compile-time closed set)."""
    try:
        return _REGISTRY[name.lower()]
    except KeyError:
        raise KeyError(f"unknown transform function: {name!r}") from None
