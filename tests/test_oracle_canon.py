"""Pure-Python tests for the comparator's canonicalization rules
(tests/oracle.py) — the typed-fetch semantics the driver gate relies
on. No SparkSession: these pin the rules themselves.
"""

from __future__ import annotations

from datetime import date, datetime

import numpy as np
import pandas as pd

from tests.oracle import _canon, _canon_pdf


def test_int_float_type_skew_is_visible():
    # THE round-3 bug class: DuckDB HUGEINT → float64 7.0 vs Spark 7
    assert _canon(np.int64(7)) == "7"
    assert _canon(np.float64(7.0)) == "7.0"
    assert _canon(np.int64(7)) != _canon(np.float64(7.0))


def test_null_and_nan_canonicalization():
    assert _canon(None) == "NULL"
    assert _canon(float("nan")) == "NaN"
    assert _canon(np.float64("nan")) == "NaN"
    assert _canon(pd.NaT) == "NULL"
    assert _canon(pd.NA) == "NULL"


def test_midnight_timestamp_normalizes_to_date():
    # DuckDB .df() renders DATE as datetime64 at midnight; Spark keeps
    # datetime.date — both must canonicalize identically
    assert _canon(pd.Timestamp("2024-01-03")) == "2024-01-03"
    assert _canon(datetime(2024, 1, 3)) == "2024-01-03"
    assert _canon(date(2024, 1, 3)) == "2024-01-03"
    # a real timestamp keeps its time part
    assert _canon(pd.Timestamp("2024-01-03 00:00:01")) == "2024-01-03T00:00:01"
    assert (
        _canon(pd.Timestamp("2024-01-03 12:30:00.000001"))
        == "2024-01-03T12:30:00.000001"
    )


def test_arrays_and_bytes():
    assert _canon(np.array([1, 2])) == "[1,2]"
    assert _canon([np.float64(0.5), None]) == "[0.5,NULL]"
    assert _canon(b"\x01\xff") == "01ff"
    assert _canon(np.bool_(True)) == "True"


def test_canon_pdf_sorts_columns_and_rows():
    a = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    b = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
    assert _canon_pdf(a) == _canon_pdf(b)
