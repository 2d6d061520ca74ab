"""Query-language front end: PQL-dialect parser + compiler to DataFrame plans,
and Pinot-shaped response shaping."""

from realtime_olap_spark.plans.pql import PQLEngine, compile_pql, parse_pql

__all__ = ["PQLEngine", "parse_pql", "compile_pql"]
