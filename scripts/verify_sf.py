"""Driver-grade oracle parity check at an arbitrary SF (default sf0.01).

Runs every queries() entry against its oracle_sql() via tests/oracle.compare
and prints PASS/FAIL per query plus a summary. Usage:

    python scripts/verify_sf.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_playground_spark.registry import all_oracle_sql, all_queries
from data_pipeline_playground_spark.session import get_spark
from tests.oracle import compare, duckdb_conn


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark("dpp-spark-verify")
    con = duckdb_conn(sf_dir)
    queries, oracles = all_queries(), all_oracle_sql()
    failures: dict[str, str] = {}
    for name in sorted(queries):
        if only and name not in only:
            continue
        start = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                compare(df, con, oracles[name], name=name)
                status = "PASS"
            else:
                n = df.count()
                status = f"ROWS-ONLY ({n} rows)"
        except Exception as exc:
            failures[name] = f"{type(exc).__name__}: {exc}"
            traceback.print_exc(limit=3)
            status = "FAIL"
        print(f"{status:>18}  {name}  ({time.perf_counter() - start:.1f}s)", flush=True)
    print(f"\n{len(failures)} failures / {len(queries)} queries at {sf_dir}")
    for name, err in failures.items():
        print(f"  {name}: {err[:300]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
