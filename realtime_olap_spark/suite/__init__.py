"""The declared query inventory: every operator from SURVEY.md §2 (plus the
training-data extensions) exposed as (spark, sf_dir) -> DataFrame callables,
each paired where possible with a DuckDB-executable ANSI-SQL oracle.

This mirrors the reference's differential-testing strategy — every PQL query
paired with an H2 SQL equivalent and value-compared
(pinot-integration-tests/.../ClusterIntegrationTestUtils.java:506) — with
DuckDB as the oracle per FIXTURES.md.
"""

from realtime_olap_spark.suite.registry import ORACLES, QUERIES

# Importing the modules populates the registry.
from realtime_olap_spark.suite import core  # noqa: E402,F401

_MODULES = [core]

try:  # each area registers on import; keep import errors isolated
    from realtime_olap_spark.suite import aggs  # noqa: F401
    _MODULES.append(aggs)
except ImportError:
    pass
try:
    from realtime_olap_spark.suite import transforms  # noqa: F401
    _MODULES.append(transforms)
except ImportError:
    pass
try:
    from realtime_olap_spark.suite import mv  # noqa: F401
    _MODULES.append(mv)
except ImportError:
    pass
try:
    from realtime_olap_spark.suite import pqlq  # noqa: F401
    _MODULES.append(pqlq)
except ImportError:
    pass
try:
    from realtime_olap_spark.suite import hybrid  # noqa: F401
    _MODULES.append(hybrid)
except ImportError:
    pass
try:
    from realtime_olap_spark.suite import dedup  # noqa: F401
    _MODULES.append(dedup)
except ImportError:
    pass
try:
    from realtime_olap_spark.suite import similarity  # noqa: F401
    _MODULES.append(similarity)
except ImportError:
    pass
try:
    from realtime_olap_spark.suite import text  # noqa: F401
    _MODULES.append(text)
except ImportError:
    pass
try:
    from realtime_olap_spark.suite import multimodal  # noqa: F401
    _MODULES.append(multimodal)
except ImportError:
    pass
try:
    from realtime_olap_spark.suite import ext  # noqa: F401
    _MODULES.append(ext)
except ImportError:
    pass

__all__ = ["QUERIES", "ORACLES"]
