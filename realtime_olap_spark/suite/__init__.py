"""The declared query inventory: every operator from SURVEY.md §2 (plus the
training-data extensions) exposed as (spark, sf_dir) -> DataFrame callables,
each paired where possible with a DuckDB-executable ANSI-SQL oracle.

This mirrors the reference's differential-testing strategy — every PQL query
paired with an H2 SQL equivalent and value-compared
(pinot-integration-tests/.../ClusterIntegrationTestUtils.java:506) — with
DuckDB as the oracle per FIXTURES.md.
"""

from realtime_olap_spark.suite.registry import ORACLES, QUERIES

# Importing the modules populates the registry. The consolidated inventory
# is exactly 50 queries so every one lands inside the driver's 50-entry
# CORRECTNESS window; the LLM-data-pipeline extensions register right after
# core so they stay inside even if the window ever shrinks.
from realtime_olap_spark.suite import core  # noqa: E402,F401

_MODULES = [core]

# Each area registers on import. Import errors must propagate loudly:
# a swallowed failure here would silently evict that module's queries
# from the driver's CORRECTNESS window (scorecard shrinks, not reddens).
for _name in ("dedup", "similarity", "text", "multimodal", "ext",
              "aggs", "transforms", "mv", "pqlq", "hybrid"):
    _mod = __import__(f"realtime_olap_spark.suite.{_name}",
                      fromlist=[_name])
    _MODULES.append(_mod)

EXPECTED_QUERY_COUNT = 50
if len(QUERIES) != EXPECTED_QUERY_COUNT:  # pragma: no cover - build guard
    raise RuntimeError(
        f"suite registry holds {len(QUERIES)} queries, expected "
        f"{EXPECTED_QUERY_COUNT}; a module failed to register or a query "
        "was added without consolidating another")
if not set(ORACLES) <= set(QUERIES):  # pragma: no cover - build guard
    raise RuntimeError(
        f"oracles without queries: {sorted(set(ORACLES) - set(QUERIES))}")

__all__ = ["QUERIES", "ORACLES"]
