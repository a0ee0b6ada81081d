"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_pipeline_playground_spark/``; queries
self-register in ``data_pipeline_playground_spark/queries/*``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fuzzy near-dup dedup over documents at sf0.001.

    Exercises scan → projection → similarity self-join (length-band
    pruned) → anti-join → aggregation (SURVEY §7 Milestone 0).
    """
    from data_pipeline_playground_spark.registry import all_queries

    return all_queries()["dedup_fuzzy"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from data_pipeline_playground_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from data_pipeline_playground_spark.registry import all_oracle_sql

    return all_oracle_sql()
