"""Round-15 codegen-cost probe: per-query generated-code compile cost.

The driver's 32-core pathology (VERDICT r14 #1) is whole-stage-codegen
class compilation amplified under CPU-burst throttling: on an idle box
cold ~= warm, but each second of janino compile time is a second that
multiplies 5-10x when the box is throttled mid-bench. This probe
reports, per query, the DIRECT proxy metrics to minimize:

  - compile_ms: delta of Spark's CodegenMetrics compilation-time
    histogram total (janino wall) across the query's first execution
  - src_bytes: delta of generated-source-size histogram total
  - wscg: number of WholeStageCodegen units in the formatted plan
  - plan_lines / exchanges: formatted-plan bulk
  - cold_s / warm_s: first vs second execution wall seconds

    SPARK_GRAFT_CPUS=32 python scripts/r15_codegen_probe.py \
        --names corpus_funnel,lda_doc_topics [--no-prebuild]

Iteration tool only; the driver-facing record stays bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _codegen_totals(spark) -> tuple[float, float, int]:
    """(compile_ms_est, src_bytes_est, n_classes) from CodegenMetrics.

    Histogram reservoirs undercount deltas; getCount() is exact, so
    report count deltas plus mean*count estimates for magnitude.
    """
    jvm = spark.sparkContext._jvm
    m = jvm.org.apache.spark.metrics.source.CodegenMetrics
    comp = m.METRIC_COMPILATION_TIME()
    src = m.METRIC_SOURCE_CODE_SIZE()
    n = int(comp.getCount())
    comp_total = float(comp.getSnapshot().getMean()) * n
    src_total = float(src.getSnapshot().getMean()) * int(src.getCount())
    return comp_total, src_total, n


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--names", required=True)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--no-prebuild", action="store_true")
    args = p.parse_args()

    from data_pipeline_playground_spark import caching, memo_prebuild
    from data_pipeline_playground_spark.registry import all_queries
    from data_pipeline_playground_spark.session import get_spark

    spark = get_spark("dpp-r15-codegen-probe")
    queries = all_queries()
    names = [n.strip() for n in args.names.split(",") if n.strip()]

    for name in names:  # bench-identical sf0.001 warmup
        try:
            queries[name](spark, "/root/testdata/sf0.001").count()
        except Exception as exc:
            print(f"WARM ERROR {name}: {exc}", file=sys.stderr)
    spark.catalog.clearCache()
    caching.drain_ledger()
    if not args.no_prebuild:
        memo_prebuild.prebuild_all(spark, args.sf_dir, [])
        caching.drain_ledger()

    out: dict[str, dict] = {}
    for name in names:
        spark.catalog.clearCache()
        caching.drain_ledger()
        df = queries[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        c0, s0, n0 = _codegen_totals(spark)
        t0 = time.perf_counter()
        df.count()
        t1 = time.perf_counter()
        c1, s1, n1 = _codegen_totals(spark)
        t2 = time.perf_counter()
        queries[name](spark, args.sf_dir).count()
        t3 = time.perf_counter()
        out[name] = {
            "cold_s": round(t1 - t0, 3),
            "warm_s": round(t3 - t2, 3),
            "compile_ms": round(c1 - c0, 1),
            "src_kb": round((s1 - s0) / 1024.0, 1),
            "n_classes": n1 - n0,
            "plan_lines": plan.count("\n"),
            "exchanges": plan.count("Exchange"),
        }
        caching.drain_ledger()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
