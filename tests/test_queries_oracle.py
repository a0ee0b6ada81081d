"""Every registered query with an oracle must match DuckDB exactly.

This mirrors the driver's CORRECTNESS gate (row-count + schema +
order-insensitive values) at sf0.001 so regressions surface locally
before the per-round driver run at sf0.01.
"""

from __future__ import annotations

import pytest

from data_pipeline_playground_spark.registry import all_oracle_sql, all_queries
from tests.oracle import compare

_QUERIES = all_queries()
_ORACLE = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    df = _QUERIES[name](spark, sf_dir)
    compare(df, oracle_con, _ORACLE[name], name=name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLE)))
def test_rows_only_query_runs(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
