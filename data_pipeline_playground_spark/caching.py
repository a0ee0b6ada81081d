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
    with ``build()`` on first use."""
    key = (_session_key(spark), name, sf_dir)
    if key not in _STORE:
        _STORE[key] = build()
    return _STORE[key]
