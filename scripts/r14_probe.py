"""Round-14 focused timing probe: bench-protocol timings for a named
query subset in one session, optionally under extra Spark confs.

    python scripts/r14_probe.py --names q1,q2 [--reps 3] \
        [--sf-dir /root/testdata/sf0.1] \
        [--conf spark.sql.join.preferSortMergeJoin=false ...]

Mirrors bench.py's per-query methodology (clearCache between timings,
`.count()` as the action, memo-ledger seconds subtracted via the same
interval-union rule) so relative A/B reads carry over, but skips the
sf0.001 warmup/probe machinery: each query is timed ``reps`` times and
the MINIMUM is reported (one-sided contention noise, bench policy).
The first rep of the first query is additionally warmed once unrecorded
so JIT/codegen doesn't pollute rep 1.

Output: one JSON line {"confs": {...}, "queries": {name: min_sec}}.
This is an ITERATION tool for the optimization loop; the driver-facing
record stays bench.py.
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
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--conf", action="append", default=[])
    p.add_argument("--json-out", default="")
    args = p.parse_args()

    confs = dict(c.split("=", 1) for c in args.conf)
    # session.py owns the base config; extra confs go through its
    # $SPARK_GRAFT_EXTRA_CONFS hook (set BEFORE session creation).
    if confs:
        os.environ["SPARK_GRAFT_EXTRA_CONFS"] = ";".join(
            f"{k}={v}" for k, v in confs.items()
        )

    from data_pipeline_playground_spark import caching
    from data_pipeline_playground_spark.registry import all_queries
    from data_pipeline_playground_spark.session import get_spark

    spark = get_spark("dpp-r14-probe")
    queries = all_queries()
    names = [n.strip() for n in args.names.split(",") if n.strip()]

    # one unrecorded warm pass (JIT/codegen/parquet footers)
    for name in names:
        try:
            queries[name](spark, args.sf_dir).count()
        except Exception as exc:
            print(f"WARM ERROR {name}: {exc}", file=sys.stderr)
    spark.catalog.clearCache()
    caching.drain_ledger()

    out: dict[str, float] = {}
    for rep in range(args.reps):
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
            from bench import _union_seconds  # same subtraction rule

            memo_sec = _union_seconds(entries, t0, t1)
            sec = round(max(0.001, (t1 - t0) - memo_sec), 3)
            out[name] = min(out.get(name, float("inf")), sec)

    line = json.dumps(
        {"confs": confs, "sf_dir": args.sf_dir, "reps": args.reps,
         "queries": {k: out[k] for k in sorted(out)},
         "total": round(sum(out.values()), 2)},
        separators=(",", ":"),
    )
    print(line)
    if args.json_out:
        with open(args.json_out, "a") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
