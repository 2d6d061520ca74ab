"""Oracle-SQL fragments shared by the suite.

SUM/AVG determinism: both engines sum in DECIMAL(38,10) (exact, associative),
but DuckDB's decimal→double cast is not correctly rounded while Spark's is
(observed: 439046840.05 sums to ...049999995 in DuckDB). Routing the final
cast through VARCHAR forces a correctly-rounded strtod parse, which matches
Spark's BigDecimal.doubleValue bit-for-bit.
"""


def OSUM(expr: str) -> str:
    """Deterministic double sum — oracle twin of aggregation.dsum."""
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"


def OAVG(expr: str) -> str:
    """Deterministic average — oracle twin of aggregation.davg."""
    return f"({OSUM(expr)} / COUNT({expr}))"
