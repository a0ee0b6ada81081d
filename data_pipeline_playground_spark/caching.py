"""Session-aware memo cache for reused DataFrames/models.

Cached frames are bound to the SparkSession that built them; a driver
that opens a fresh session per phase (smoke → correctness → bench)
must never receive a frame whose session has been stopped. Keys
therefore include the Spark application id + session hash.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

_STORE: dict[tuple, Any] = {}


def _session_key(spark: SparkSession) -> tuple:
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:
        app_id = "unknown"
    return (app_id, id(spark))


def memo(spark: SparkSession, name: str, sf_dir: str, build) -> Any:
    """Return the cached value for (session, name, sf_dir), building it
    with ``build()`` on first use.

    DataFrames that the builder `.cache()`d are defensively
    re-materialized on retrieval if something (the bench's
    `spark.catalog.clearCache()` between queries, an executor
    eviction) unpersisted them since: a multi-reference consumer plan
    over a memoized-but-evicted frame would otherwise silently re-run
    the expensive build subtree once PER reference — the failure mode
    that turned a 3 s query into minutes under memory pressure.
    Frames the builder deliberately left uncached are untouched.
    """
    key = (_session_key(spark), name, sf_dir)
    if key not in _STORE:
        value = build()
        _STORE[key] = (value, _was_cached(value))
    value, was_cached = _STORE[key]
    if was_cached and not _was_cached(value):
        try:
            value.cache()
            value.count()  # eager re-materialization, once
        except Exception:
            pass  # session gone / non-DF — caller surfaces real errors
    return value


def _was_cached(value: Any) -> bool:
    try:
        return bool(value.is_cached)
    except Exception:
        return False
