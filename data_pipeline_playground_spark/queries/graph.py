"""Iterative graph analytics: weighted PageRank over the trade graph.

Sibling of the connected-components operator (operators/components.py):
components use label propagation to a fixpoint; PageRank is the other
canonical iterative-join pattern — rank_{i+1} = (1-d)/N + d·Σ_in p·rank_i
— expressed as a fixed number of DataFrame join+agg rounds. Spark is
the natural home for this shape (each round is one shuffle); the DuckDB
oracle unrolls the same five iterations as chained CTEs, and both
engines round each iterate to 12 decimals so the comparison is exact
despite float summation-order differences.

Graph: nations as vertices, supplier-nation → customer-nation trade
volume as edge weights (the nation_pair_trade topology, TPC-H Q7).
Edge probabilities are DECIMAL-exact volumes normalized per source —
division of identical exact operands, so p is bit-identical across
engines.

At 100 TB the vertex set stays dimension-sized here, but the same loop
scales to large graphs: edges partition by dst (the aggregation key),
ranks re-broadcast (or co-partitioned by src) each round, and lineage
is truncated by localCheckpoint every few rounds as in
operators/components.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table

PR_ITERS = 5
PR_DAMPING = 0.85
PR_N = 25  # |nation|
_ITER_ROUND = 12  # per-iteration rounding (kills float-order noise)


def _build_pagerank_sql() -> str:
    head = f"""
edges0 AS (
  SELECT ns.n_name AS src, nc.n_name AS dst,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS w_dec
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  WHERE ns.n_name <> nc.n_name
  GROUP BY ns.n_name, nc.n_name
),
edges AS (
  SELECT src, dst,
         CAST(w_dec AS DOUBLE) / CAST(SUM(w_dec) OVER (PARTITION BY src) AS DOUBLE) AS p
  FROM edges0
),
nodes AS (SELECT n_name AS node FROM nation),
r0 AS (SELECT node, 1.0/{PR_N} AS r FROM nodes)"""
    iters = []
    for i in range(1, PR_ITERS + 1):
        iters.append(f"""
r{i} AS (
  SELECT n.node,
         round({1 - PR_DAMPING}/{PR_N}
               + {PR_DAMPING} * COALESCE(SUM(e.p * r{i-1}.r), 0),
               {_ITER_ROUND}) AS r
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r{i-1} ON r{i-1}.node = e.src
  GROUP BY n.node
)""")
    return (
        "WITH " + head + "," + ",".join(iters)
        + f"\nSELECT node, round(r, 6) AS pagerank FROM r{PR_ITERS}"
    )


@query("pagerank_nations", oracle=_build_pagerank_sql())
def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (d=0.85, 5 rounds) over the nation trade
    graph. Each round is one join (ranks⋈edges on src — broadcast;
    the rank table is vertex-sized) plus one aggregation (inflow per
    dst); dangling-mass redistribution is deliberately omitted on both
    sides, the standard simplification."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    ns = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("src"))
    nc = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("dst"))
    e0 = (
        l.join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), l.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("w_dec"))
    )
    wsrc = Window.partitionBy("src")
    edges = e0.select(
        "src",
        "dst",
        (
            F.col("w_dec").cast("double")
            / F.sum("w_dec").over(wsrc).cast("double")
        ).alias("p"),
    ).cache()
    # materialize eagerly: every iteration references edges, and without
    # the cache the 6-table edge derivation re-executes once per round
    # (the plan showed 5 lineitem scans); the edge table is ≤ nations²
    # rows, so this is the cheap side of that trade at any scale
    edges.count()
    nodes = n.select(F.col("n_name").alias("node"))
    ranks = nodes.select("node", F.lit(1.0 / PR_N).alias("r"))
    base = F.lit((1 - PR_DAMPING) / PR_N)
    for _ in range(PR_ITERS):
        contrib = edges.join(F.broadcast(ranks), edges.src == ranks.node).select(
            "dst", (F.col("p") * F.col("r")).alias("pr")
        )
        agg = contrib.groupBy("dst").agg(F.sum("pr").alias("inflow"))
        ranks = nodes.join(
            F.broadcast(agg), nodes.node == agg.dst, "left"
        ).select(
            "node",
            F.round(
                base + F.lit(PR_DAMPING) * F.coalesce("inflow", F.lit(0.0)),
                _ITER_ROUND,
            ).alias("r"),
        )
    return ranks.select("node", F.round("r", 6).alias("pagerank"))


# ---- triangle counting over the trade graph --------------------------------

TRI_TOP_EDGES = 100  # sparsify: strongest trade pairs by exact volume

_TRIANGLES_SQL = f"""
WITH edges0 AS (
  SELECT ns.n_name AS src, nc.n_name AS dst,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS w_dec
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  WHERE ns.n_name <> nc.n_name
  GROUP BY ns.n_name, nc.n_name
),
tope AS (
  SELECT src, dst FROM edges0
  QUALIFY row_number() OVER (ORDER BY w_dec DESC, src, dst) <= {TRI_TOP_EDGES}
),
und AS (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v
  FROM tope GROUP BY 1, 2
)
SELECT a.u AS na, a.v AS nb, c.v AS nc
FROM und a
JOIN und b ON b.u = a.v
JOIN und c ON c.u = a.u AND c.v = b.v
"""


@query("trade_triangles", oracle=_TRIANGLES_SQL)
def trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the sparsified trade graph: keep the
    100 strongest nation-pair edges (DECIMAL-exact volume rank with
    name tie-breaks, so the edge set is engine-portable), symmetrize
    to undirected u<v edges, then the canonical ordered 3-join — each
    triangle (a<b<c) is produced exactly once. The node-ordering trick
    is what makes distributed triangle counting feasible: every join
    key is the shared vertex and no triangle is counted 6×. At web
    scale the same plan runs degree-ordered (orient edges low→high
    degree) so the join fan-out is bounded by max degree, and the edge
    list is the only shuffled table. Here edges are dimension-sized →
    both joins broadcast."""
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("src")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("dst")
    )
    edges0 = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nc), customer.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              lineitem.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("w_dec")
        )
    )
    tope = edges0.orderBy(
        F.desc("w_dec"), F.asc("src"), F.asc("dst")
    ).limit(TRI_TOP_EDGES)
    und = tope.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    a = und.select(F.col("u").alias("au"), F.col("v").alias("av"))
    b = und.select(F.col("u").alias("bu"), F.col("v").alias("bv"))
    c = und.select(F.col("u").alias("cu"), F.col("v").alias("cv"))
    return (
        a.join(F.broadcast(b), F.col("bu") == F.col("av"))
        .join(
            F.broadcast(c),
            (F.col("cu") == F.col("au")) & (F.col("cv") == F.col("bv")),
        )
        .select(
            F.col("au").alias("na"), F.col("av").alias("nb"),
            F.col("cv").alias("nc"),
        )
    )
