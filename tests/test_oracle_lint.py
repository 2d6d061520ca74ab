"""Registry-wide lint against the two driver-canonicalization failure
classes that produced every red CORRECTNESS row in rounds 1-2:

1. DuckDB ``SUM``/windowed-``SUM`` over integer args yields HUGEINT, which
   the driver's pandas-based canon (``rel.df()``) downcasts to float64 —
   so ``7949.0`` hashes differently from Spark's ``7949`` even though the
   values are equal. Oracles must CAST such sums to BIGINT (or DOUBLE on
   both sides).
2. List/struct/map-valued output columns crash the driver's pandas
   ``sort_values`` canonicalization (``TypeError: unhashable type``).
   Complex values must be serialized (e.g. ``array_join`` /
   ``array_to_string``) on BOTH sides.

Both checks run at plan/analysis time — DuckDB ``rel.types`` and Spark
``df.schema`` — no query execution, so the whole registry lints in
seconds. Reference analog: the H2-oracle value comparison
(ClusterIntegrationTestUtils.java:506) normalizes types before compare.
"""

from __future__ import annotations

import pyspark.sql.types as T
import pytest

from realtime_olap_spark.suite import ORACLES, QUERIES
from tests.conftest import SF_DIR

# DuckDB types whose pandas (.df()) rendering loses exactness or changes
# the printed repr vs Spark's value (HUGEINT -> float64 in pandas canon).
_BAD_DUCK = ("HUGEINT", "UHUGEINT")


def _oracle_names():
    return sorted(ORACLES)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_has_no_hugeint_or_complex_columns(duck, name):
    con = duck(SF_DIR)
    rel = con.sql(ORACLES[name])
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ)
        assert not any(b in t for b in _BAD_DUCK), (
            f"{name}.{col}: DuckDB type {t} becomes float64 in the driver's "
            f"pandas canon — CAST the aggregate to BIGINT in the oracle")
        assert "[]" not in t and not t.startswith(("STRUCT", "MAP")), (
            f"{name}.{col}: DuckDB type {t} is unhashable in the driver's "
            f"pandas sort_values — serialize it to a string on both sides")


def test_spark_queries_have_no_complex_columns_when_oracle_paired(spark):
    """Any oracle-paired query returning array/map/struct would crash the
    driver's pandas canonicalization regardless of oracle correctness."""
    bad = []
    for name, fn in QUERIES.items():
        if name not in ORACLES:
            continue
        schema = fn(spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, "unhashable driver-canon columns: " + "; ".join(bad)
