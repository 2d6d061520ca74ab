"""Large literal arrays as single-node typed literals.

``F.array(F.lit(x), …)`` and ``array(CAST('…' AS …), …)`` SQL strings
both build an N-child CreateArray tree that the JVM analyzer (and every
later rule pass over the plan) must walk on EVERY DataFrame
transformation that re-analyzes the plan — measured on this box at
~60 ms per 1k elements per withColumn, ~200 ms for a 20k-long array.
``from_json`` of one JSON string literal is a single expression node:
analysis is O(1), and Catalyst's ConstantFolding collapses it to one
array ``Literal`` at optimization time, so per-row execution is
IDENTICAL to the CreateArray form (the optimized plan contains the same
folded literal — plan-asserted in tests/test_opt_r16.py).

Value fidelity: doubles are rendered with ``repr()`` (shortest
round-trip decimal) and parsed by Jackson via ``Double.parseDouble``,
which is correctly rounded — bit-equal to the Python float
(pinned in tests/test_opt_r16.py). Strings go through ``json.dumps``
(exact escaping; no SQL-literal quoting rules involved). Non-finite
doubles fall back to the CreateArray path (JSON has no Infinity/NaN
tokens by default).
"""

from __future__ import annotations

import json
import math
from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_doubles(values: Iterable[float]) -> Column:
    """array<double> literal; bit-equal to per-element CAST literals."""
    vals = [float(x) for x in values]
    if not all(math.isfinite(v) for v in vals):
        return F.expr("array(" + ",".join(
            f"CAST('{v!r}' AS DOUBLE)" for v in vals) + ")")
    return F.from_json(
        F.lit("[" + ",".join(repr(v) for v in vals) + "]"),
        "array<double>")


def lit_longs(values: Iterable[int]) -> Column:
    """array<bigint> literal (exact for the full int64 range)."""
    return F.from_json(
        F.lit("[" + ",".join(str(int(v)) for v in values) + "]"),
        "array<bigint>")


def lit_ints(values: Iterable[int]) -> Column:
    """array<int> literal."""
    return F.from_json(
        F.lit("[" + ",".join(str(int(v)) for v in values) + "]"),
        "array<int>")


def lit_strings(values: Sequence[str]) -> Column:
    """array<string> literal; exact for any content via JSON escaping."""
    return F.from_json(F.lit(json.dumps(list(values))), "array<string>")
