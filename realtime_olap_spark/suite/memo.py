"""Compatibility re-export: the session memo now lives at package top
level (``realtime_olap_spark.memo``) so low layers like ``catalog`` can
stage ingest artifacts through the same store without importing the
query suite. Suite modules keep importing from here."""

from __future__ import annotations

from realtime_olap_spark.memo import clear, session_memo

__all__ = ["clear", "session_memo"]
