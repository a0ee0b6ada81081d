"""Graph-mining over the part co-purchase graph: k-core peeling and
resource-allocation link prediction.

Extends the graph family (`queries/graph.py`: pagerank, triangles,
components) with the two mining shapes a catalog/recommendation
pipeline adds on top — cohesive-subgraph extraction (Seidman 1983,
k-cores) and common-neighbor link scoring (Zhou, Lü & Zhang 2009,
resource allocation). The edge set is the same thresholded
co-purchase graph as `copurchase_assortativity`
(`queries/analytics.py`): part pairs co-ordered ≥ 2 times.

Scale notes (SCALE.md §Graph):
- kcore: each peel round is ONE window pass over the symmetric edge
  list (count per source = degree; the symmetric list makes the
  per-target window the other endpoint's degree), so a round costs two
  hash exchanges on a monotonically SHRINKING edge list — no
  node↔edge join ping-pong, and the round chain references each
  previous round exactly once (linear plan growth, not 2^N; cf. the
  round-5 lineage-blowup note). Rounds are a fixed unrolled constant:
  the peel trace is the defined semantics, converged or not, and the
  sf0.001 idempotence test pins that 6 rounds suffice there.
- link prediction: intermediates are hub-capped (deg ≤ 64) BEFORE the
  wedge join, so per-vertex fanout is ≤ 64² regardless of scale — the
  standard guard that keeps common-neighbor enumeration linear in
  edges instead of quadratic in hub degree. Scores are fixed-point
  integers (10⁹ // deg), so sums are order-free int64 and both
  engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table

# k=2 converges within 6 rounds at every driven scale (verified by
# monotone size traces: sf0.001 trivially total, sf0.01 stable at
# round 3, sf0.1 stable at round 5 — peel sets only shrink, so equal
# counts imply equal sets); k=3 was measured UNconverged at sf0.01
# after 6 rounds and empty at sf0.1, so the 2-core is the right
# fixed-round semantics for this graph's density profile.
KCORE_K = 2
KCORE_ROUNDS = 6
RA_HUB_CAP = 64
RA_SCALE = 1_000_000_000


def _edge_cte(li: str) -> str:
    """Shared co-purchase edge CTEs (same thresholds as
    copurchase_assortativity): distinct (order, part) pairs, pairs
    co-ordered >= 2 times, symmetrized."""
    return f"""
op AS (SELECT DISTINCT l_orderkey, l_partkey FROM {li}),
pair AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING count(*) >= 2
),
e0 AS (SELECT pa AS u, pb AS v FROM pair
       UNION ALL SELECT pb AS u, pa AS v FROM pair)
"""


def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The thresholded co-purchase pair list (pa < pb, co-ordered ≥ 2
    times), materialized ONCE via an eager localCheckpoint and MEMOIZED
    per (session, sf_dir) — round 14: three queries build the identical
    edge list (kcore_parts, link_prediction_ra, and analytics'
    copurchase_assortativity), each paying the lineitem distinct +
    per-order self-join + aggregate (~2 s at sf0.1); in a long-lived
    session the graph's edge list is a shared artifact exactly like the
    ANN codebooks and the MinHash signatures, so it gets the same
    caching.memo treatment (booked to memo_build:copurchase_pairs by
    the bench, built once in the prebuild phase).

    Both graph-mining queries also reference the pair list several
    times within one plan (symmetrize = 2×, plus the anti join in link
    prediction); without materialization Catalyst re-executes the
    subtree PER REFERENCE — at 100 TB that re-execution IS the query
    cost, so checkpointing the (tiny, node-bounded) pair list is the
    scale-correct shape, the same per-round pattern the PIC iteration
    uses (queries/graph.py)."""
    from data_pipeline_playground_spark.caching import memo

    def build() -> DataFrame:
        # derives from the shared unthresholded basket pair counts
        # (queries/analytics._basket_pairs_memo) — a nested memo build;
        # the ledger's exclusive-second accounting keeps both line
        # items honest. The >= 2 threshold + column drop is this
        # graph's own view, re-checkpointed so the multi-reference
        # consumers (symmetrize ×2, anti join) read final blocks.
        from data_pipeline_playground_spark.queries.analytics import (
            _basket_pairs_memo,
        )

        _op, pair = _basket_pairs_memo(spark, sf_dir)
        return (
            pair.filter(F.col("cab") >= 2)
            .select("pa", "pb")
            .localCheckpoint(eager=True)
        )

    return memo(spark, "copurchase_pairs", sf_dir, build)


def kcore_rounds_sql(
    pair: str, k: int = KCORE_K, rounds: int = KCORE_ROUNDS
) -> str:
    """The peel-round chain: `rounds` unrolled rounds over a pair
    relation, each a single windowed degree filter over the previous
    round's edges. The SAME text runs in both engines (the oracle
    inlines the pair CTEs via kcore_sql; Spark feeds the checkpointed
    pair view)."""
    ctes = [
        f"""e0 AS (SELECT pa AS u, pb AS v FROM {pair}
       UNION ALL SELECT pb AS u, pa AS v FROM {pair})"""
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""e{i} AS (
  SELECT u, v FROM (
    SELECT u, v,
           count(*) OVER (PARTITION BY u) AS du,
           count(*) OVER (PARTITION BY v) AS dv
    FROM e{i - 1}
  ) t WHERE du >= {k} AND dv >= {k}
)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT u AS part_node, CAST(count(*) AS BIGINT) AS core_degree
FROM e{rounds} GROUP BY u
"""


def kcore_sql(li: str, k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    """Self-contained text (pair build inlined) — the DuckDB oracle
    and the convergence tests run this."""
    edge = _edge_cte(li).strip()
    # _edge_cte ends with the symmetrized e0; reuse only op/pair here
    # and let kcore_rounds_sql define e0 from the pair CTE.
    edge_wo_e0 = edge[: edge.rindex(",\ne0 AS")]
    rounds_text = kcore_rounds_sql("pair", k=k, rounds=rounds)
    return rounds_text.replace("WITH e0 AS", f"WITH {edge_wo_e0},\ne0 AS", 1)


@query("kcore_parts", oracle=kcore_sql("lineitem"))
def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts surviving a 6-round 2-core peel of the co-purchase graph,
    with their within-core degree — the cohesive catalog backbone
    (nodes outside the 2-core are tree-like attachments; the core is
    where basket-recommendation signal concentrates).

    Spark materializes the pair list once (copurchase_pairs) and runs
    the identical unrolled round text as the oracle: the whole peel is
    pure Catalyst (window + filter per round), each round consumes the
    previous exactly once, and the edge list only shrinks — at 1000
    executors each round is two exchanges of the surviving edges,
    nothing more.
    """
    copurchase_pairs(spark, sf_dir).createOrReplaceTempView("_kcore_pair")
    return spark.sql(kcore_rounds_sql("_kcore_pair"))


_RA_SQL = f"""
WITH {_edge_cte("lineitem").strip()},
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM e0 GROUP BY u),
mid AS (SELECT node, d FROM deg WHERE d <= {RA_HUB_CAP}),
cand AS (
  SELECT e1.u AS part_a, e2.v AS part_b,
         CAST(count(*) AS BIGINT) AS n_common,
         CAST(SUM({RA_SCALE} // m.d) AS BIGINT) AS ra_scaled
  FROM e0 e1
  JOIN mid m ON m.node = e1.v
  JOIN e0 e2 ON e2.u = e1.v AND e1.u < e2.v
  LEFT JOIN pair p ON p.pa = e1.u AND p.pb = e2.v
  WHERE p.pa IS NULL
  GROUP BY e1.u, e2.v
)
SELECT part_a, part_b, n_common, ra_scaled,
       CAST(ra_scaled AS DOUBLE) / {RA_SCALE}.0 AS ra_index
FROM cand
ORDER BY ra_scaled DESC, part_a, part_b
LIMIT 100
"""


@query("link_prediction_ra", oracle=_RA_SQL)
def link_prediction_ra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 predicted co-purchase links by resource-allocation
    index (Zhou, Lü & Zhang 2009): for part pairs NOT currently
    linked, RA = Σ 1/deg(v) over common neighbors v — the
    "recommend these together next" candidate list.

    Determinism + scale: 1/deg is fixed-point (10⁹ DIV deg — both
    engines truncate non-negative integer division identically), so
    the score sum is exact int64; intermediates are hub-capped at
    deg ≤ {RA_HUB_CAP} before the wedge join (bounded fanout, the LSH-style
    guard against quadratic hubs — a documented approximation shared
    by Spark and oracle); existing edges leave via an anti join; the
    top-100 is a TakeOrdered with full (score, a, b) tie-break.
    """
    pair = copurchase_pairs(spark, sf_dir)
    e0 = pair.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        pair.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = e0.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    mid = deg.filter(F.col("d") <= RA_HUB_CAP)
    e1 = e0.select(F.col("u").alias("part_a"), F.col("v").alias("via"))
    e2 = e0.select(F.col("u").alias("via2"), F.col("v").alias("part_b"))
    wedges = (
        e1.join(F.broadcast(mid), F.col("via") == F.col("node"))
        .join(e2, (F.col("via2") == F.col("via")) & (F.col("part_a") < F.col("part_b")))
        .select("part_a", "part_b", "d")
    )
    cand = (
        wedges.join(
            pair,
            (F.col("pa") == F.col("part_a")) & (F.col("pb") == F.col("part_b")),
            "left_anti",
        )
        .groupBy("part_a", "part_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.expr(f"{RA_SCALE} div d")).alias("ra_scaled"),
        )
    )
    return (
        cand.select(
            "part_a",
            "part_b",
            "n_common",
            "ra_scaled",
            (F.col("ra_scaled").cast("double") / F.lit(float(RA_SCALE))).alias(
                "ra_index"
            ),
        )
        .orderBy(F.desc("ra_scaled"), "part_a", "part_b")
        .limit(100)
    )
