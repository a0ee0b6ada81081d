"""Local Spark-vs-DuckDB oracle comparator, mimicking the driver gate:
row-count + column names + order-insensitive value comparison.

Stricter than a hash: on mismatch it prints example differing rows so
failures are debuggable. Values are canonicalized (floats via repr of
float64, timestamps via ISO) and rows sorted.

Fetch-type fidelity (round 4): BOTH sides are fetched through pandas —
Spark via ``toPandas()``, DuckDB via ``.df()`` — exactly like the
driver's hasher. This is load-bearing: DuckDB ``sum(BIGINT)`` yields
HUGEINT, which pandas fetches as **float64** (``7.0``) while Spark
emits int64 (``7``); a ``fetchall()``-based mirror converts HUGEINT to
a native Python int and can never see that mismatch (the exact class
that shipped the round-3 ``bpe_top_merges`` driver failure). With
pandas fetching on both sides, an int-vs-float type skew canonicalizes
to ``'7'`` vs ``'7.0'`` and fails locally first.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

from data_pipeline_playground_spark.tables import TABLES


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    # pandas NaT / NaN / None scalars (after the array branch: pd.isna on
    # an array returns an array, so scalars only reach here)
    if pd.isna(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else "NULL"
        return "NULL"
    if isinstance(v, np.bool_):
        return str(bool(v))
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        # DuckDB's .df() renders DATE as datetime64 at midnight while
        # Spark's toPandas keeps datetime.date objects; normalize exact
        # midnights to the date string symmetrically on both sides.
        if v.hour == v.minute == v.second == v.microsecond == 0 and not getattr(
            v, "nanosecond", 0
        ):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon_pdf(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = [
        tuple(_canon(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
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
    """Assert Spark result == DuckDB result (order-insensitive).

    Both results travel through pandas, mirroring the driver's typed
    fetch path (see module docstring).
    """
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()
    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)

    assert s_cols == d_cols, (
        f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    )
    assert len(s_pdf) == len(d_pdf), (
        f"{name}: row count spark={len(s_pdf)} duckdb={len(d_pdf)}"
    )
    cs, cd = _canon_pdf(s_pdf), _canon_pdf(d_pdf)
    if cs != cd:
        set_cd, set_cs = set(cd), set(cs)
        diff_s = [r for r in cs if r not in set_cd][:5]
        diff_d = [r for r in cd if r not in set_cs][:5]
        raise AssertionError(
            f"{name}: value mismatch\n  spark-only: {diff_s}\n  duckdb-only: {diff_d}"
        )
