"""Distributed connected components over an undirected edge list.

The missing piece between pairwise near-dup detection and true
transitive dedup groups: every dedup tier emits (ci, cj) similar pairs
(SURVEY §2.3 — "connected components / keep-min-id"), and a duplicate
CLUSTER is the connected component of that graph. Pair-wise keep-min-id
(row i survives iff no similar j < i) and component-wise dedup differ
exactly when similarity chains are intransitive — A~B, B~C, not A~C —
which is the reference's greedy-chain behavior (pipeline.py:22-42).

Algorithm: iterative min-label propagation ("hash-to-min") —
  label(v) ← min(label(v), min over neighbors u of label(u))
each round is one join + partial-aggregatable min, converging in
O(graph diameter) rounds. Near-dup graphs have tiny components (dozens
of docs, diameter ≤ a few), so the loop runs 2-4 rounds in practice;
the per-round localCheckpoint truncates lineage so round k doesn't
replay rounds 1..k-1. For adversarially deep graphs (long chains),
switch to the large-star/small-star contraction of Kiveris et al.
("Connected Components in MapReduce and Beyond", SoCC'14), which
converges in O(log² n) with the same join-shaped rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 25


def connected_components(nodes: DataFrame, edges: DataFrame,
                         id_col: str = "doc_id",
                         src_col: str = "ci", dst_col: str = "cj") -> DataFrame:
    """(node → component representative) for an undirected edge list.

    ``nodes``: one row per vertex (singletons allowed — they become
    their own component). ``edges``: similar pairs, direction ignored.
    Returns (id_col, component_id) where component_id is the MIN vertex
    id in the component — deterministic, engine-portable.

    Every round shuffles by vertex id (the join and the min-agg share
    the key, so the exchange is reused); the edge list itself is
    symmetrized once and cached. Convergence is detected with a count
    of changed labels — one cheap action per round on a checkpointed
    frame.
    """
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .cache()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)

    for _round in range(MAX_ROUNDS):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    sym.unpersist()
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("component_id"))
