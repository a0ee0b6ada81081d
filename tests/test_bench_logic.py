"""Pure-logic tests for bench.py's contention-window bookkeeping.

No SparkSession: these pin the window→name mapping that both in-run
and cross-run self-heal rely on. Getting an interval boundary wrong
silently re-runs the wrong queries (or none), so the mapping is
pinned here exactly like a plan invariant.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

ORDER = [f"q{c}" for c in "abcdefghijklmnop"]  # 16 names, sorted


def test_hot_window_maps_lexicographic_interval():
    # probes every 5; hot probe at position 5 → window [0, 10) by name
    probes = {"0": 0.5, "5": 3.0, "10": 0.6, "15": 0.5}
    probe_names = {"0": "qa", "5": "qf", "10": "qk", "15": "qp"}
    hot = bench._hot_window_names(probes, probe_names, ORDER, 5)
    assert hot == set(ORDER[0:10])  # qa..qj: [probe@0's name, probe@10's name)


def test_hot_final_probe_window_reaches_list_end():
    probes = {"0": 0.5, "5": 0.6, "10": 0.6, "16": 9.9}
    probe_names = {"0": "qa", "5": "qf", "10": "qk", "16": "￿"}
    hot = bench._hot_window_names(probes, probe_names, ORDER, 5)
    # window [11, 21) → names from probe@11 (missing → from probe@16's
    # predecessor... the recorded lower bound is probe_names[16-5=11],
    # absent → "" → conservatively the whole list
    assert hot == set(ORDER)


def test_hot_window_subset_rerun_maps_onto_subset():
    # a heal pass over 4 names with one hot probe flags only that window
    retry = ["qb", "qd", "qf", "qh"]
    probes = {"0": 2.9, "4": 0.5}
    probe_names = {"0": "qb", "4": "￿"}
    hot = bench._hot_window_names(probes, probe_names, retry, 4)
    assert hot == set(retry)
    clean = bench._hot_window_names({"0": 0.5, "4": 0.5}, probe_names, retry, 4)
    assert clean == set()


def test_contaminated_prefers_still_hot_record():
    base = {
        "queries": {n: 1.0 for n in ORDER},
        "still_hot": ["qc", "qd"],
        "errors": {"qz": "boom"},
        # probe data that would flag a much wider window if consulted
        "sentinel_probes": {"0": 9.9},
        "probe_names": {"0": "qa"},
    }
    assert bench._contaminated_names(base) == {"qc", "qd", "qz"}


def test_contaminated_healed_clean_run_reruns_nothing():
    base = {
        "queries": {n: 1.0 for n in ORDER},
        "still_hot": [],
        "sentinel_probes": {"0": 9.9},  # pass-1 probes were hot...
        "probe_names": {"0": "qa"},  # ...but healing cleared them
    }
    assert bench._contaminated_names(base) == set()


def test_contaminated_legacy_positional_fallback():
    base = {
        "queries": {n: 1.0 for n in ORDER},
        "sentinel_probes": {"0": 0.5, "5": 3.0, "10": 0.5, "15": 0.5},
        # no probe_names → legacy positional windows [5-5, 5+5)
    }
    assert bench._contaminated_names(base) == set(ORDER[0:10])

def test_merge_keeps_min_of_base_and_rerun():
    # a burst during the heal re-run must not overwrite a cleaner base
    timings = {"qa": 18.4, "qb": 0.9}
    bench._merge_base_timings(
        timings, {}, {"qa": 2.1, "qb": 1.5, "qc": 0.7}, {"qa", "qb", "qc"}
    )
    assert timings == {"qa": 2.1, "qb": 0.9, "qc": 0.7}


def test_merge_drops_unregistered_and_errored():
    # qd no longer registered; qe errored this run → no stale timing
    timings = {"qa": 1.0}
    errors = {"qe": "Boom"}
    bench._merge_base_timings(
        timings, errors, {"qd": 3.0, "qe": 2.0, "qa": 1.2}, {"qa", "qe"}
    )
    assert timings == {"qa": 1.0}


def test_compact_summary_fits_tail_capture_worst_case():
    """VERDICT r7 #1: the stdout line must be a complete JSON object
    inside any ~2000-char tail capture, even for a large registry with
    long names, a contention warning, still-hot samples and the family
    rollup — and must keep the driver-contract fields."""
    import json

    queries = {f"a_very_long_query_name_number_{i:04d}": i * 0.017
               for i in range(1000)}
    out = {
        "metric": "total_query_wall_seconds",
        "value": round(sum(queries.values()), 4),
        "unit": "sec",
        "sf": 0.1,
        "queries": queries,
        "sentinel_probes": {str(i * 10): 0.6 for i in range(100)},
        "still_hot": sorted(queries)[:300],
        "errors": {"qe": "Boom"},
        "contention_warning": "sentinel queries exceeded idle-box "
        "bounds (section_rank_topk=42.5s; 300 queries never measured "
        "in a clean window); host was likely CPU-throttled",
        "merged_from": "BENCH_local_prev.json",
        "rerun_queries": sorted(queries)[:60],
        "families": {f"family_{i:02d}": i * 1.7 for i in range(30)},
    }
    line = json.dumps(
        bench._compact_summary(out, "/root/repo/BENCH_full_latest.json"),
        separators=(",", ":"),
    )
    assert len(line) <= 1500
    parsed = json.loads(line)
    for field in ("metric", "value", "unit", "sf", "queries",
                  "n_queries", "full_record", "still_hot_n"):
        assert field in parsed, field
    assert parsed["n_queries"] == 1000
    # top of the queries map is the slowest query
    if parsed["queries"]:
        worst = max(queries, key=queries.get)
        assert worst in parsed["queries"]
