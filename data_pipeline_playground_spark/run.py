"""CLI runner: execute any registered query against a testdata dir.

    python -m data_pipeline_playground_spark.run                  # list queries
    python -m data_pipeline_playground_spark.run pricing_summary  # run one
    python -m data_pipeline_playground_spark.run asof_last_click \
        --sf-dir /root/testdata/sf0.01 --limit 5 --explain
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("query", nargs="?", help="query name (omit to list)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--limit", type=int, default=20, help="rows to show")
    p.add_argument("--explain", action="store_true", help="print the formatted plan")
    args = p.parse_args(argv)

    from data_pipeline_playground_spark.registry import all_oracle_sql, all_queries

    queries, oracles = all_queries(), all_oracle_sql()
    if not args.query:
        for name in sorted(queries):
            marker = "oracle" if name in oracles else "rows-only"
            print(f"{name:36s} [{marker}]")
        return 0
    if args.query not in queries:
        print(f"unknown query: {args.query!r} (run with no args to list)", file=sys.stderr)
        return 2

    from data_pipeline_playground_spark.session import get_spark

    spark = get_spark(f"dpp-run-{args.query}")
    df = queries[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    start = time.perf_counter()
    rows = df.limit(args.limit).collect()
    n = df.count()
    elapsed = time.perf_counter() - start
    df.limit(args.limit).show(args.limit, truncate=80)
    print(f"{n} rows total in {elapsed:.2f}s ({args.query} @ {args.sf_dir})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
