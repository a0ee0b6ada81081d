"""Physical-plan audit: every registered query's executed plan, scanned
for scale red flags.

    python scripts/plan_audit.py [--sf-dir /root/testdata/sf0.01]

Per query, prints shuffle/broadcast exchange counts plus `bnlj=` when a
BroadcastNestedLoopJoin appears (informational: every BNLJ in this repo
broadcasts a tiny side — hash-param tables, 1-row counts, the bounded
pairwise tiers — which is the intended plan; a LARGE side here would
surface as a slow broadcast build, not silently).

Hard failures (exit 1):
  CART   CartesianProduct — a partition-wise cross product; never
         acceptable, there is always a broadcast or blocking key
  PYUDF  row-at-a-time Python UDF (BatchEvalPython) outside ALLOW —
         the slow path; hot-path Python must be Arrow-batched
  ERROR  the query failed to plan/execute

Exit 0 = plan hygiene holds. tests/test_plans.py pins the per-query
invariants (pushdown, pruning, broadcast, single-shuffle) in CI; this
script is the whole-surface sweep.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query -> tolerated hard flags, each justified:
ALLOW = {
    # k-row (≤10) topic-vocab lookup on the driver-sized describeTopics
    # output — never touches row-scale data
    "lda_topics": {"PYUDF"},
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = p.parse_args()

    from data_pipeline_playground_spark.registry import all_queries
    from data_pipeline_playground_spark.session import get_spark

    spark = get_spark("dpp-plan-audit")
    bad = 0
    for name, fn in sorted(all_queries().items()):
        try:
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"{name:32s} ERROR {type(exc).__name__}: {exc}"[:120])
            bad += 1
            continue
        n_shuffle = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        n_bcast = plan.count("BroadcastExchange")
        n_bnlj = plan.count("BroadcastNestedLoopJoin")
        flags = set()
        if "CartesianProduct" in plan:
            flags.add("CART")
        if "BatchEvalPython" in plan:
            flags.add("PYUDF")
        unexpected = flags - ALLOW.get(name, set())
        marker = " !! " + ",".join(sorted(unexpected)) if unexpected else ""
        info = f" bnlj={n_bnlj}" if n_bnlj else ""
        print(f"{name:32s} shuffles={n_shuffle:2d} bcast={n_bcast}{info}{marker}")
        if unexpected:
            bad += 1
    print(f"\nqueries with unexpected flags: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
