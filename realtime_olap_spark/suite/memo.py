"""One shared per-(session, corpus) memo for the suite's ingest-time
artifacts — the scored-pair table, span audit, LM freqs, DSIR LUTs, …
all follow the same contract: built once per (applicationId, sf_dir),
persisted if a DataFrame, reused by every consumer. Centralizing the
boilerplate means the session-lifecycle behavior (and any future
eviction/unpersist policy) lives in exactly one place."""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_STORE: dict[tuple[str, str, str], Any] = {}


def session_memo(spark: SparkSession, sf_dir: str, name: str,
                 build: Callable[[], Any]) -> Any:
    """Return the cached artifact for ``(session, corpus, name)``,
    building (and persisting, for DataFrames) on first use."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key not in _STORE:
        got = build()
        if isinstance(got, DataFrame):
            got = got.persist()
        _STORE[key] = got
    return _STORE[key]
