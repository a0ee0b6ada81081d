"""Round-15 past-the-old-clamp LSH dial probe (VERDICT r14 #3).

The r13 self-setting plane dial was silently re-pinned by
MAX_PLANES = 16 above 2^16*64 ~ 4.2M vectors; round 15 raises the rail
to 34. This probe builds a synthetic embeddings corpus ONE POINT PAST
the old clamp (scale_probe's signed-coordinate-permutation replica
construction — per-replica bucket structure preserved, replicas
decorrelated) and measures, on the SAME corpus:

  A. derived mode (the fix): the dial must set 17 planes, and the
     bucket profile must hold per-bucket occupancy ~LSH_TARGET_BUCKET.
  B. $SPARK_GRAFT_LSH_PLANES=16 pinned (the old cap's behavior at this
     n, run in a subprocess so module constants rebuild): occupancy
     doubles and mutual_nn_pairs' bucket-pairwise work pays 2x per
     DOUBLING from here on — the n^2/2^planes law SCALE.md documents.

    python scripts/r15_planes_probe.py [--replicas 2150] \
        [--out /tmp/planes_probe] [--skip-build]

Output: one JSON line per mode {planes, n_vectors, n_buckets,
mean_occupancy, max_occupancy, mutual_nn_s, mutual_nn_rows}.
Iteration/evidence tool only; /root/testdata is never touched.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/testdata/sf0.1"


def build(out: str, replicas: int, batch: int = 50) -> None:
    """scale_probe's embedding replica construction, batched into a
    DuckDB temp table so a 2000+-replica UNION ALL never materializes
    as one SQL string."""
    import duckdb
    import random as _random

    from scripts.scale_probe import ID_OFFSET

    def perm_sql(r: int) -> str:
        # identical to scale_probe.build_corpus's nested
        # _signed_perm_sql (same 4242+r seed): replica r's signed
        # coordinate permutation, r=0 the identity
        if r == 0:
            return "embedding"
        rng = _random.Random(4242 + r)
        perm = list(range(1, 65))
        rng.shuffle(perm)
        terms = ", ".join(
            f"CAST({'-' if rng.random() < 0.5 else ''}embedding[{p}] AS FLOAT)"
            for p in perm
        )
        return f"[{terms}]"

    os.makedirs(out, exist_ok=True)
    dst = f"{out}/embeddings.parquet"
    if os.path.lexists(dst):
        os.unlink(dst)
    con = duckdb.connect()
    con.execute(
        "CREATE TEMP TABLE acc AS "
        f"SELECT * FROM read_parquet('{SF1}/embeddings.parquet') LIMIT 0"
    )
    for lo in range(0, replicas, batch):
        chunk = " UNION ALL ".join(
            f"""SELECT vec_id + {r * ID_OFFSET} AS vec_id,
                   {perm_sql(r)} AS embedding, label
                FROM read_parquet('{SF1}/embeddings.parquet')"""
            for r in range(lo, min(lo + batch, replicas))
        )
        con.execute(f"INSERT INTO acc {chunk}")
    con.execute(f"COPY acc TO '{dst}' (FORMAT PARQUET)")


def measure(sf_dir: str) -> dict:
    from data_pipeline_playground_spark.queries import similarity as s
    from data_pipeline_playground_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("dpp-r15-planes-probe")
    planes = s.lsh_planes(spark, sf_dir)
    prof = (
        s.ann_lsh_buckets(spark, sf_dir)
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("n_vectors").alias("n_vectors"),
            F.avg("n_vectors").alias("mean_occ"),
            F.max("n_vectors").alias("max_occ"),
        )
        .collect()[0]
    )
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    rows = s.mutual_nn_pairs(spark, sf_dir).count()
    dt = time.perf_counter() - t0
    out = {
        "planes": planes,
        "n_vectors": prof["n_vectors"],
        "n_buckets": prof["n_buckets"],
        "mean_occupancy": round(float(prof["mean_occ"]), 1),
        "max_occupancy": prof["max_occ"],
        "mutual_nn_s": round(dt, 2),
        "mutual_nn_rows": rows,
    }
    spark.stop()
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--replicas", type=int, default=2150)
    p.add_argument("--out", default="/tmp/planes_probe")
    p.add_argument("--skip-build", action="store_true")
    p.add_argument("--measure-only", action="store_true",
                   help="internal: measure current env mode and exit")
    args = p.parse_args()

    if args.measure_only:
        print(json.dumps(measure(args.out)))
        return

    if not args.skip_build:
        t0 = time.perf_counter()
        build(args.out, args.replicas)
        print(f"# corpus built in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    # run each mode in its own subprocess: similarity.py bakes the
    # pinned count into module constants at import time
    for env_pin, tag in (("", "derived"), ("16", "pinned16-oldcap")):
        env = dict(os.environ)
        env.pop("SPARK_GRAFT_LSH_PLANES", None)
        if env_pin:
            env["SPARK_GRAFT_LSH_PLANES"] = env_pin
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--measure-only", "--out", args.out],
            env=env, capture_output=True, text=True, check=True,
        )
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        rec["mode"] = tag
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
