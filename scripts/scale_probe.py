"""One-off 10× scaling probe for the document/ANN query families
(VERDICT r7 #6): generate a 10×-documents corpus under /tmp (never
touching /root/testdata), run the heaviest doc-family queries at 1×
and 10×, and print the measured runtime exponent per query
(log10(t10/t1) — 1.0 = linear, 2.0 = quadratic).

    python scripts/scale_probe.py [--replicas 10] [--out /tmp/scale10]

Corpus construction: each replica r shifts doc_id by r·10⁷ and
suffixes EVERY token with "zq{r}" — within-replica token structure
(lengths, repetition pattern, near-dup pairs) is preserved while
cross-replica shingle/window overlap is exactly zero, so pair-shaped
work (dedup candidates, truth joins, span matches) scales ×R, not
×R² as verbatim replication would force (every doc would gain R−1
exact copies, measuring duplicate-blowup rather than engine scaling).

Embedding replicas (round 13 — the third-decade probe found the OLD
construction bends): replica r applies a deterministic SIGNED
COORDINATE PERMUTATION (an orthogonal transform seeded per replica;
r=0 is the identity) — norms, pairwise-dot distribution, and
per-replica bucket structure are preserved while replicas decorrelate,
so LSH bucket occupancy grows ×R at fixed planes (the n²/2^planes law
the probe is supposed to measure) and nothing else. The pre-r13
construction (+r·10⁻³ uniform offset) had TWO artifacts the 300×
probe exposed: (a) the offset is monotonic in r, so by r≈150 it
saturates hyperplane signs along the all-ones direction — at 300
replicas ONE 12-plane bucket held 16.7% of 600 k vectors (0.8% at
100) and Σ bucket² jumped ×284 for ×3 data — and (b) every base
vector's R replicas are mutual near-duplicates, so bucket-local
pairwise work is Σ cluster² BY SEMANTICS (each vector's true NN is a
replica sibling), unmeasurably conflating data shape with engine
scaling.

Star-schema replica mode (round 11 — VERDICT r10 #3): customer /
orders / lineitem / part / supplier replicate as DISJOINT key
populations — every key column (custkey, orderkey, partkey, suppkey)
shifts by r·10⁷, dates/prices/attributes untouched, nation/region
symlinked 1×. This is the TPC-H growth mode (catalog and customer
base grow with the fact tables; per-key join density stays CONSTANT),
so a linear plan measures exponent ~1.0 and any super-linear reading
is the engine's, not the data's. Attribute-keyed groups (brand, type,
mktsegment, nation) keep fixed cardinality and see R× rows per group
— the partial-aggregation path that must stay linear. Time-bucketed
aggregates see R× rows per bucket (more business, same horizon —
matching the events replica's disjoint-user-population design).

Absolute times on a burst-credit-throttled host are meaningless; the
RATIO within one run is the signal (both scales measured back to
back, per query, smaller scale first). Run AFTER the round's clean
bench.

Second decade (round 12 — VERDICT r11 #1): every exponent in SCALE.md
was a 1×→10× reading; the 100 TB story extrapolates two more decades,
and the known non-linearity thresholds (SimHash bucket density, PQ's
O(n·M) ADC, the CMS full-corpus pass) are exactly the class a 10×→100×
reading would confirm or catch. `--base-dir`/`--base-replicas` chain
the probe onto an existing replica corpus:

    python scripts/scale_probe.py --replicas 100 --out /tmp/scale100 \
        --base-dir /tmp/scale10 --base-replicas 10 --only ...

measures each query at BOTH corpora and reports the exponent over the
replicas/base_replicas ratio (log(t_hi/t_lo) / log(R_hi/R_lo)).
`--skip-build` reuses an already-built --out corpus.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/testdata/sf0.1"
ID_OFFSET = 10_000_000

# heaviest doc/ANN-family queries with known scaling laws to check;
# dedup_fuzzy (banded-Levenshtein spec tier) is deliberately absent:
# it is O(pairs-in-band) by D1 spec and would dominate the probe.
PROBE_QUERIES = [
    "dedup_fuzzy_minhash",
    "dedup_minhash_pairs",
    "dedup_minhash_components",
    "dedup_simhash_pairs",
    "dedup_jaccard_pairs",
    "dedup_pr_audit_sampled",
    "lsh_s_curve_audit_sampled",
    "exact_substr_spans",
    "dup_cluster_histogram",
    "winnow_fingerprints",
    "ngram_novelty",
    "bm25_topk",
    "hybrid_rrf_topk",
    "embedding_cosine_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "mutual_nn_pairs",
    "news_pipeline",
    # round-10 additions: the new ExactSubstr removal half, the
    # span-gated funnel composition, and the heaviest doc/embedding
    # queries the first probe run left uncovered
    "exact_substr_removed",
    "corpus_funnel",
    "decontaminate_overlap",
    "news_summaries",
    "dedup_fuzzy_greedy",
    "lda_doc_topics",
    "power_iteration_clusters",
    "winnow_matches",
    # round-10 events-family probes (events replicate as disjoint user
    # populations — see build_corpus): windows/temporal/attribution
    # queries that the doc-only probe could not exercise
    "value_ks_drift",
    "daily_user_curves",
    "event_mix_chi2",
    "event_value_median_ci",
    "error_burst_runs",
    "purchases_asof_click_cogroup",
    "session_conversion",
    "events_throttle_1h",
    "interarrival_burstiness",
    "attribution_ushape",
]

# round-11 star-schema fact-family probes (VERDICT r10 #3): the
# heaviest lineitem/orders readers of the analytics / tpch_extra /
# graph-mining / sketches families — the families whose 100 TB case
# argued from plan shape only until this probe. Replication keeps
# per-key join density constant (see module docstring), so the
# documented laws are all ~linear; anything super-linear is a find.
FACT_PROBE_QUERIES = [
    "nation_pair_trade",
    "kcore_parts",
    "item_rec_backtest",
    "part_weekly_movers",  # carries the absorbed topk_stability churn@k
    "heavy_hitters_cms",
    "nation_trade_hops",
    "copurchase_assortativity",
    "item_item_neighbors",
    "customer_rfm_segments",
    "basket_rules",
    "link_prediction_ra",
    "unit_value_index",
    "late_shipment_pchart",
    "top_part_per_supplier",
]


ALL_TABLES = (
    "documents", "embeddings", "events",
    "customer", "orders", "lineitem", "part", "supplier",
)


def build_corpus(out: str, replicas: int,
                 tables: tuple[str, ...] = ALL_TABLES) -> None:
    """``tables`` restricts which replicated tables are written (round
    13 — a 300× documents+embeddings corpus for the post-fix probe does
    not need a 300× lineitem); nation/region symlink 1× regardless."""
    import duckdb

    os.makedirs(out, exist_ok=True)
    # a prior probe run symlinked events.parquet to the read-only
    # testdata; COPY TO through a stale symlink would try to write the
    # link TARGET — unlink any existing entry for the generated files
    for t in ("documents", "embeddings", "events"):
        if t not in tables:
            continue
        dst = f"{out}/{t}.parquet"
        if os.path.lexists(dst):
            os.unlink(dst)
    con = duckdb.connect()
    reps = " UNION ALL ".join(
        f"""SELECT doc_id + {r * ID_OFFSET} AS doc_id,
               array_to_string(list_transform(
                   regexp_split_to_array(text, ' '), t -> t || 'zq{r}'), ' ')
                 AS text,
               lang, source, n_chars
            FROM read_parquet('{SF1}/documents.parquet')"""
        for r in range(replicas)
    )
    if "documents" in tables:
        con.execute(
            f"COPY ({reps}) TO '{out}/documents.parquet' (FORMAT PARQUET)"
        )
    import random as _random

    def _signed_perm_sql(r: int) -> str:
        """64-element list constructor applying replica r's signed
        coordinate permutation (orthogonal — see module docstring);
        r=0 is the identity so the 1× corpus embeds unchanged."""
        if r == 0:
            return "embedding"
        rng = _random.Random(4242 + r)
        perm = list(range(1, 65))  # DuckDB lists are 1-indexed
        rng.shuffle(perm)
        terms = ", ".join(
            f"CAST({'-' if rng.random() < 0.5 else ''}embedding[{p}] AS FLOAT)"
            for p in perm
        )
        return f"[{terms}]"

    ereps = " UNION ALL ".join(
        f"""SELECT vec_id + {r * ID_OFFSET} AS vec_id,
               {_signed_perm_sql(r)} AS embedding,
               label
            FROM read_parquet('{SF1}/embeddings.parquet')"""
        for r in range(replicas)
    )
    if "embeddings" in tables:
        con.execute(
            f"COPY ({ereps}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)"
        )
    # events replicate as DISJOINT USER POPULATIONS over the same time
    # range (user_id + r·10⁷, event_id + r·10⁹, ts untouched): per-user
    # session/funnel/as-of structure is preserved exactly, user-keyed
    # work scales ×R, and time-bucketed aggregates see R× rows per
    # bucket — the realistic growth mode (more users, same horizon).
    evreps = " UNION ALL ".join(
        f"""SELECT event_id + CAST({r} AS BIGINT) * 1000000000 AS event_id,
               ts,
               user_id + {r * ID_OFFSET} AS user_id,
               event_type, value, props
            FROM read_parquet('{SF1}/events.parquet')"""
        for r in range(replicas)
    )
    if "events" in tables:
        con.execute(
            f"COPY ({evreps}) TO '{out}/events.parquet' (FORMAT PARQUET)"
        )
    # star-schema replicas: shift every KEY column, keep values — see
    # module docstring (disjoint key populations, constant join density)
    star = {
        "customer": ["c_custkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
    }
    for t, keys in star.items():
        if t not in tables:
            continue
        dst = f"{out}/{t}.parquet"
        if os.path.lexists(dst):
            os.unlink(dst)
        cols = [
            c[0] for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SF1}/{t}.parquet')"
            ).fetchall()
        ]
        treps = " UNION ALL ".join(
            "SELECT "
            + ", ".join(
                f"{c} + {r * ID_OFFSET} AS {c}" if c in keys else c
                for c in cols
            )
            + f" FROM read_parquet('{SF1}/{t}.parquet')"
            for r in range(replicas)
        )
        con.execute(f"COPY ({treps}) TO '{dst}' (FORMAT PARQUET)")
    for t in ("region", "nation"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF1}/{t}.parquet", dst)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--replicas", type=int, default=10)
    p.add_argument("--out", default="/tmp/scale10")
    p.add_argument(
        "--base-dir",
        default=SF1,
        help="smaller-scale corpus to measure against (default sf0.1; "
        "pass a prior --out to chain decades, e.g. /tmp/scale10)",
    )
    p.add_argument(
        "--base-replicas",
        type=int,
        default=1,
        help="replica count of --base-dir (10 when chaining onto a "
        "prior 10x corpus)",
    )
    p.add_argument(
        "--skip-build",
        action="store_true",
        help="reuse an already-built --out corpus",
    )
    p.add_argument(
        "--only",
        default="",
        help="comma-separated subset of the probe list to run",
    )
    p.add_argument(
        "--tables",
        default=",".join(ALL_TABLES),
        help="comma-separated replicated tables to build (default all; "
        "e.g. documents,embeddings for a doc-family-only corpus)",
    )
    p.add_argument(
        "--families",
        default="docs",
        choices=["docs", "fact", "all"],
        help="docs = document/embedding/events probes (default); "
        "fact = star-schema lineitem/orders probes; all = both",
    )
    args = p.parse_args()
    global PROBE_QUERIES
    if args.families == "fact":
        PROBE_QUERIES = list(FACT_PROBE_QUERIES)
    elif args.families == "all":
        PROBE_QUERIES = PROBE_QUERIES + FACT_PROBE_QUERIES
    if args.only:
        picked = [s for s in args.only.split(",") if s]
        PROBE_QUERIES = [n for n in PROBE_QUERIES if n in picked]

    from data_pipeline_playground_spark.registry import all_queries
    from data_pipeline_playground_spark.session import get_spark

    if not args.skip_build:
        build_corpus(
            args.out, args.replicas,
            tuple(t for t in args.tables.split(",") if t),
        )
    spark = get_spark("dpp-scale-probe")
    queries = all_queries()

    scale_ratio = args.replicas / args.base_replicas
    lo_lab = f"t{args.base_replicas}x"
    hi_lab = f"t{args.replicas}x"
    print(f"{'query':34s} {lo_lab:>8s} {hi_lab:>8s} {'ratio':>7s} {'exp':>5s}")
    for name in PROBE_QUERIES:
        if name not in queries:
            print(f"{name:34s} (not registered, skipped)")
            continue
        try:
            queries[name](spark, "/root/testdata/sf0.001").count()  # warm
            row = []
            for sf_dir in (args.base_dir, args.out):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).count()
                row.append(time.perf_counter() - t0)
            t_lo, t_hi = row
            ratio = t_hi / t_lo
            exp = math.log10(ratio) / math.log10(scale_ratio)
            print(
                f"{name:34s} {t_lo:8.2f} {t_hi:8.2f} {ratio:7.2f} {exp:5.2f}",
                flush=True,
            )
        except Exception as exc:
            print(f"{name:34s} ERROR {type(exc).__name__}: {exc}"[:110])


if __name__ == "__main__":
    main()
