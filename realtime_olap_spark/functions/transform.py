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

    All arithmetic runs in epoch NANOSECONDS so sub-millisecond input/output
    units (``1:NANOSECONDS:EPOCH``) convert TimeUnit-correctly instead of
    being misread as millis. Divisions floor through DECIMAL(38,0), never a
    double, so 64-bit epoch-nano magnitudes (~1.7e18 today) keep full
    precision.
    """
    in_size, in_unit, in_kind, *in_pat = input_fmt.split(":")
    out_size, out_unit, out_kind, *out_pat = output_fmt.split(":")
    g_size, g_unit = granularity.split(":")

    def _floor_div(ns: Column, div: int) -> Column:
        return F.floor(ns.cast("decimal(38,0)") / F.lit(div)).cast("long")

    c = _c(col)
    # 1) input → epoch nanos
    if in_kind.upper() == "EPOCH":
        ns = (c.cast("long") * F.lit(int(in_size) * _UNIT_NS[in_unit.upper()])).cast("long")
    else:  # SIMPLE_DATE_FORMAT
        ns = (F.unix_millis(F.to_timestamp(c, in_pat[0])) * F.lit(1_000_000)).cast("long")

    # 2) bucket to granularity (floor)
    g_ns = int(g_size) * _UNIT_NS[g_unit.upper()]
    if g_ns > 1:
        ns = (_floor_div(ns, g_ns) * F.lit(g_ns)).cast("long")

    # 3) epoch nanos → output format
    if out_kind.upper() == "EPOCH":
        out_ns = int(out_size) * _UNIT_NS[out_unit.upper()]
        return _floor_div(ns, out_ns) if out_ns > 1 else ns
    return F.date_format(F.timestamp_millis(_floor_div(ns, 1_000_000)), out_pat[0])


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
