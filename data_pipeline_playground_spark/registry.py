"""Query registry: one entry per implemented operator (SURVEY.md §2).

Each entry pairs a PySpark builder ``(spark, sf_dir) -> DataFrame`` with
the equivalent ANSI SQL for the DuckDB oracle (or ``None`` for
genuinely non-SQL-expressible operators — ML/iterative/streaming — which
get the driver's rows-only check plus our own invariant tests).

Design rules (SURVEY §5):
- alias every computed column identically in Spark and SQL;
- money aggregates go through DECIMAL then cast to DOUBLE so both
  engines produce bit-identical values regardless of summation order;
- arrays are sorted before hashing; ranking ties are broken by id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator registering a query builder and its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLE)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import data_pipeline_playground_spark.queries  # noqa: F401

    _LOADED = True
