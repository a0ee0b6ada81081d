"""Embedding similarity search + multimodal joins (SURVEY §2.12).

The dot products are computed with JVM-side higher-order functions
(zip_with + aggregate) — a narrow, shuffle-free map over each candidate
pair; the only join is the broadcast of the (small) query-vector set.
At 100 TB the same plan holds: brute-force is a single broadcast-join
scan, and the LSH variant (random-hyperplane buckets) turns it into an
equi-join on bucket signatures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table

N_QUERY_VECTORS = 10  # vec_id < 10 are the "query" set
TOP_K = 5


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns.

    Both Spark's aggregate() and DuckDB's list_sum fold left-to-right,
    so the float rounding is identical on both sides.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def _embed_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        "label",
    )


# DuckDB mirrors (embedding FLOAT[] → DOUBLE[] first, as in Spark).
# list_reduce (not list_sum) so the fold is sequential like Spark's
# aggregate() — identical float rounding on both sides.
_SQL_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_SQL_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
    "(acc, v) -> acc + v)"
)
_SQL_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform({a}, x -> x * x)), (acc, v) -> acc + v))"
)


_COSINE_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, {_SQL_V} AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {N_QUERY_VECTORS}),
pairs AS (
  SELECT q.q_id, e.vec_id AS n_id,
         round({_SQL_DOT.format(a="q.qv", b="e.v")}
               / greatest({_SQL_NORM.format(a="q.qv")}
                          * {_SQL_NORM.format(a="e.v")}, 1e-12), 6) AS cosine
  FROM q, e
  WHERE e.vec_id <> q.q_id
)
SELECT q_id, n_id, cosine FROM (
  SELECT q_id, n_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rn
  FROM pairs
) WHERE rn <= {TOP_K}
"""


@query("embedding_cosine_topk", oracle=_COSINE_TOPK_SQL)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors against the
    full embedding table (one linear scan, no shuffle for the join),
    then per-query window top-k. Ranking uses the ROUNDED cosine with
    n_id tie-break for engine-portable determinism."""
    e = _embed_double(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERY_VECTORS).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    pairs = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(
                dot(F.col("qv"), F.col("v"))
                / F.greatest(
                    norm(F.col("qv")) * norm(F.col("v")), F.lit(1e-12)
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "n_id", "cosine")
    )


_EMBEDDING_NORMS_SQL = f"""
WITH e AS (SELECT vec_id, label, {_SQL_V} AS v FROM embeddings)
SELECT label,
       count(*) AS n_vectors,
       round(avg({_SQL_NORM.format(a="v")}), 4) AS avg_norm,
       round(min({_SQL_NORM.format(a="v")}), 4) AS min_norm,
       round(max({_SQL_NORM.format(a="v")}), 4) AS max_norm
FROM e GROUP BY label
"""


@query("embedding_norms_by_label", oracle=_EMBEDDING_NORMS_SQL)
def embedding_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile of the embedding column."""
    e = _embed_double(spark, sf_dir)
    n = norm(F.col("v"))
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(n), 4).alias("avg_norm"),
        F.round(F.min(n), 4).alias("min_norm"),
        F.round(F.max(n), 4).alias("max_norm"),
    )


_MULTIMODAL_JOIN_SQL = f"""
WITH e AS (SELECT vec_id, label, {_SQL_V} AS v FROM embeddings)
SELECT d.lang, e.label,
       count(*) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
       round(avg({_SQL_NORM.format(a="e.v")}), 4) AS avg_norm
FROM documents d JOIN e ON d.doc_id = e.vec_id
GROUP BY d.lang, e.label
"""


@query("multimodal_doc_embedding", oracle=_MULTIMODAL_JOIN_SQL)
def multimodal_doc_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ⋈ embedding modalities on doc_id = vec_id (SURVEY §2.12) —
    the canonical multimodal-column join, aggregated per (lang, label)."""
    docs = table(spark, sf_dir, "documents")
    e = _embed_double(spark, sf_dir)
    return (
        docs.join(e, docs.doc_id == e.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(F.avg(norm(F.col("v"))), 4).alias("avg_norm"),
        )
    )
