"""Pure-logic tests for scripts/bench_compare.py's drift normalization
(VERDICT r11 #2): per-query ratios are scaled by the runs' probe-median
ratio and movers inside the measured drift envelope are classified as
noise — so round-over-round comparison stops re-litigating sub-second
box-drift suspects.
"""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench_compare",
    os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "scripts",
        "bench_compare.py",
    ),
)
bc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bc)


def test_probe_median_even_and_odd():
    assert bc.probe_median({"sentinel_probes": {"0": 0.5}}) == 0.5
    assert bc.probe_median(
        {"sentinel_probes": {"0": 0.4, "10": 0.8, "20": 0.6}}
    ) == 0.6
    assert abs(bc.probe_median(
        {"sentinel_probes": {"0": 0.4, "10": 0.8}}
    ) - 0.6) < 1e-9
    assert bc.probe_median({}) is None
    assert bc.probe_median({"sentinel_probes": {}}) is None


def test_uniform_box_drift_classified_as_noise():
    """A new run uniformly 1.25× slower with probes 1.25× slower is a
    hotter box, not a regression — every query lands in the noise
    bucket after correction."""
    old = {f"q{i}": 2.0 for i in range(5)}
    new = {f"q{i}": 2.5 for i in range(5)}
    rows = bc.classify(old, new, calib=1.25)
    assert all(r[5] == "noise" for r in rows)
    assert all(abs(r[4] - 1.0) < 1e-9 for r in rows)  # corrected = 1.0


def test_real_regression_survives_drift_correction():
    """An isolated 3× jump on a multi-second query clears both the
    band and the absolute floor even on a 1.2×-hotter box."""
    old = {"qa": 2.0, "qb": 2.0}
    new = {"qa": 6.0, "qb": 2.4}
    rows = {r[0]: r for r in bc.classify(old, new, calib=1.2)}
    assert rows["qa"][5] == "regressed"
    assert abs(rows["qa"][4] - 2.5) < 1e-9  # 3.0x raw / 1.2 box
    assert rows["qb"][5] == "noise"


def test_subsecond_multi_x_is_noise_by_abs_floor():
    """0.1 s → 0.25 s is 2.5× raw but a 0.15 s delta — never a finding
    (the r11 verdict dissolved ~18 such suspects by hand)."""
    rows = bc.classify({"qa": 0.1}, {"qa": 0.25}, calib=1.0)
    assert rows[0][5] == "noise"


def test_identical_carried_timing_is_noise():
    """A min-merged record carries base timings byte-identically; the
    box correction must not turn those into phantom movers."""
    rows = bc.classify({"qa": 2.404}, {"qa": 2.404}, calib=0.76)
    assert rows[0][5] == "noise"


def test_large_improvement_classified():
    rows = bc.classify({"qa": 5.0}, {"qa": 2.0}, calib=1.0)
    assert rows[0][5] == "improved"


def test_doc_queries_full_record_and_tail(tmp_path):
    full = {"queries": {"qa": 1.0, "memo_build:minhash_est": 3.0},
            "sentinel_probes": {"0": 0.5}}
    p = tmp_path / "full.json"
    p.write_text(json.dumps(full))
    q = bc.load_queries(str(p))
    assert q == {"qa": 1.0, "memo_build:minhash_est": 3.0}
    # driver tail capture: digit keys (probe positions) are skipped
    tail = {"tail": '"qa":1.25,"0":0.5,"value":99.0'}
    p2 = tmp_path / "tail.json"
    p2.write_text(json.dumps(tail))
    assert bc.load_queries(str(p2)) == {"qa": 1.25}


def test_missing_probes_degrades_to_raw():
    """calib falls back to 1.0 when either record lacks probes — the
    CLI prints raw ratios rather than inventing a correction."""
    assert bc.probe_median({"tail": '"qa":1.0'}) is None
