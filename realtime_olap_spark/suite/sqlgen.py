"""Oracle-SQL fragments shared by the suite.

SUM/AVG determinism: both engines sum in DECIMAL(38,10) (exact, associative),
but BOTH decimal↔double boundary casts disagree between engines and must
route through VARCHAR:

- decimal→double (the final cast): DuckDB's direct cast is not correctly
  rounded (observed: 439046840.05 sums to ...049999995); VARCHAR forces a
  correctly-rounded strtod parse matching Spark's BigDecimal.doubleValue.
- double→decimal (the per-row cast): Spark converts via the double's
  SHORTEST decimal representation (scala BigDecimal.valueOf semantics), so
  x = 492561.30000000005 (exact binary ...049999...) becomes
  492561.3000000001 in Spark but 492561.3000000000 under DuckDB's
  exact-binary rounding — 151 of 6000 rows differed on real data, paid as
  rare last-ULP sum mismatches (r6 querygen soak, 5/1000 seeds).
  CAST(expr AS VARCHAR) first: DuckDB also prints shortest round-trip
  digits, and decimal-parsing the same digit string is engine-independent.
"""


def OSUM(expr: str) -> str:
    """Deterministic double sum — oracle twin of aggregation.dsum."""
    return ("CAST(CAST(SUM(CAST(CAST((" + expr + ") AS VARCHAR) "
            "AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)")


def OAVG(expr: str) -> str:
    """Deterministic average — oracle twin of aggregation.davg."""
    return f"({OSUM(expr)} / COUNT({expr}))"


def OPCT(col: str, pct: float) -> str:
    """Exact interpolated percentile — oracle twin of Spark's
    ``percentile`` down to the ULP. Identified empirically (r6 soak:
    5/1000 generated queries differed in the last ulp on tie-dense
    columns), Spark's algebra is NOT ``quantile_cont``'s
    ``lo·(1−d) + hi·d``:

    - equal flanking keys (a duplicate value spans both ranks) return
      the key DIRECTLY — no interpolation rounding;
    - otherwise ``(ceil(pos)−pos)·lo + (pos−floor(pos))·hi``, where the
      left weight is computed from ``ceil(pos)``, not ``1−d`` — one ulp
      apart from quantile_cont for large non-integral positions.

    The oracle spells this out over the sorted value list: position
    ``(n−1)·p`` in DOUBLE (p injected as a VARCHAR-cast literal — bare
    decimals parse as DECIMAL in DuckDB), flanking order statistics via
    1-based list indexing."""
    p = f"CAST('{float(pct)!r}' AS DOUBLE)"
    pos = f"(CAST(COUNT({col}) - 1 AS DOUBLE) * {p})"
    arr = f"list_sort(list({col}))"
    lo = f"CAST({arr}[CAST(FLOOR({pos}) AS BIGINT) + 1] AS DOUBLE)"
    hi = f"CAST({arr}[CAST(CEIL({pos}) AS BIGINT) + 1] AS DOUBLE)"
    return (f"(CASE WHEN {lo} = {hi} THEN {lo} "
            f"ELSE (CEIL({pos}) - {pos}) * {lo}"
            f" + ({pos} - FLOOR({pos})) * {hi} END)")
