"""Local Spark-vs-DuckDB oracle comparator, mimicking the driver gate:
row-count + column names + order-insensitive value comparison.

Stricter than a hash: on mismatch it prints example differing rows so
failures are debuggable. Values are canonicalized (floats via repr of
float64, timestamps via ISO) and rows sorted.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from data_pipeline_playground_spark.tables import TABLES


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_rows(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "query"):
    """Assert Spark result == DuckDB result (order-insensitive)."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
    if cs != cd:
        diff_s = [r for r in cs if r not in set(cd)][:5]
        diff_d = [r for r in cd if r not in set(cs)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n  spark-only: {diff_s}\n  duckdb-only: {diff_d}"
        )
