"""Round-15 cold-path probe: reproduce the BENCH timing protocol for a
named query subset, including the parts r14_probe.py skips — the
sf0.001 warmup (NOT sf0.1) and the memo prebuild — so the timed numbers
include the same first-sf0.1-execution costs (AQE-shape-specific
codegen compiles, fresh exchange materializations) the driver's bench
pays.

    SPARK_GRAFT_CPUS=32 python scripts/r15_cold_probe.py \
        --names corpus_funnel,curriculum_stages [--second-pass]

Protocol per bench.py: get_spark() honoring $SPARK_GRAFT_CPUS, warm
each query once at sf0.001, prebuild all memos at the bench SF (ledger
drained/booked aside), then ONE timed execution per query with
clearCache + ledger-union subtraction — the exact bench slot. With
--second-pass a warm re-execution is also timed so cold-vs-warm
separates compile/shape costs from steady-state cost.

Output: one JSON line {"cpus":..,"cold":{..},"warm":{..},"memo_s":..}.
Iteration tool only; the driver-facing record stays bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--names", required=True)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--second-pass", action="store_true")
    p.add_argument("--no-prebuild", action="store_true")
    args = p.parse_args()

    from data_pipeline_playground_spark import caching, memo_prebuild
    from data_pipeline_playground_spark.registry import all_queries
    from data_pipeline_playground_spark.session import get_spark
    from bench import _union_seconds

    spark = get_spark("dpp-r15-cold-probe")
    queries = all_queries()
    names = [n.strip() for n in args.names.split(",") if n.strip()]

    # bench-identical warmup: smallest SF only
    for name in names:
        try:
            queries[name](spark, "/root/testdata/sf0.001").count()
        except Exception as exc:
            print(f"WARM ERROR {name}: {exc}", file=sys.stderr)
    spark.catalog.clearCache()
    caching.drain_ledger()

    memo_s = 0.0
    if not args.no_prebuild:
        t0 = time.perf_counter()
        failed: list[str] = []
        memo_prebuild.prebuild_all(spark, args.sf_dir, failed)
        memo_s = round(time.perf_counter() - t0, 3)
        caching.drain_ledger()

    def timed_pass() -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            spark.catalog.clearCache()
            caching.drain_ledger()
            t0 = time.perf_counter()
            try:
                queries[name](spark, args.sf_dir).count()
            except Exception as exc:
                print(f"ERROR {name}: {exc}", file=sys.stderr)
                continue
            t1 = time.perf_counter()
            entries = caching.drain_ledger()
            out[name] = round(
                max(0.001, (t1 - t0) - _union_seconds(entries, t0, t1)), 3
            )
        return out

    cold = timed_pass()
    warm = timed_pass() if args.second_pass else {}
    print(json.dumps(
        {"cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
         "sf_dir": args.sf_dir, "memo_prebuild_s": memo_s,
         "cold": cold, "warm": warm,
         "cold_total": round(sum(cold.values()), 2)},
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
