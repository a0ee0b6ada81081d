"""Count–min sketch heavy hitters (SURVEY §2.12 sketch family).

The approx-distinct / approx-quantile certificates live in
queries/analytics.py; this module adds the third classic streaming
sketch — a count–min sketch over the corpus term stream — built the
way a 1000-executor run would build it: the D×W counter table is a
map-side-combined groupBy over (depth, bucket) fan-out rows, so every
executor contributes partial counters and the final table is D·W rows
regardless of corpus size, then broadcasts to probe candidates.

Both engines derive bucket ids from the portable rolling hash, so the
sketch counters — and therefore the estimates — are bit-identical in
DuckDB: the oracle checks the ESTIMATES exactly, not just a bound.
The CMS overestimate guarantee (est ≥ exact, always) is still emitted
as a certificate column both engines compute.

Reference parity: the reference counts term frequencies exactly in a
dict (cluster.py TF-IDF build); the sketch is the bounded-memory
generalization a 100 TB vocabulary needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_playground_spark.functions.text import (
    rolling_hash,
    sql_rolling_hash,
)
from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table

CMS_DEPTH = 4
CMS_WIDTH = 1024
TOP_K = 20

_TOK = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"


def _sql_bucket(term_expr: str, d_expr: str) -> str:
    key = f"CAST({d_expr} AS VARCHAR) || ':' || {term_expr}"
    return f"({sql_rolling_hash(key)}) % {CMS_WIDTH}"


_CMS_SQL = f"""
WITH tok AS (SELECT unnest({_TOK}) AS term FROM documents),
depths AS (SELECT unnest(range(0, {CMS_DEPTH})) AS d),
cms AS (
  SELECT d, {_sql_bucket('term', 'd')} AS bucket, COUNT(*) AS c
  FROM tok CROSS JOIN depths GROUP BY d, bucket
),
exact AS (SELECT term, COUNT(*) AS exact_cnt FROM tok GROUP BY term),
cand AS (SELECT term, exact_cnt FROM exact
         ORDER BY exact_cnt DESC, term LIMIT {TOP_K}),
probe AS (
  SELECT cand.term, cand.exact_cnt, cms.c
  FROM cand CROSS JOIN depths
  JOIN cms ON cms.d = depths.d
          AND cms.bucket = {_sql_bucket('cand.term', 'depths.d')}
)
SELECT term, exact_cnt, CAST(MIN(c) AS BIGINT) AS cms_est,
       MIN(c) >= exact_cnt AS est_ge_exact
FROM probe GROUP BY term, exact_cnt
"""


def _buckets(term: F.Column) -> F.Column:
    """array<struct<d, bucket>> of the CMS_DEPTH bucket ids of a term."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (
                    rolling_hash(F.concat(F.lit(f"{d}:"), term)) % CMS_WIDTH
                ).alias("bucket"),
            )
            for d in range(CMS_DEPTH)
        ]
    )


@query("heavy_hitters_cms", oracle=_CMS_SQL)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K corpus terms with their count–min-sketch estimates and
    the overestimate certificate (cms_est ≥ exact_cnt, deterministic).

    Plan shape: one explode of the token stream feeding two aggregates
    — the CMS counter table (partial aggregation collapses it map-side
    to DEPTH×WIDTH = 4096 rows total, independent of corpus size) and
    the exact counts (only needed to pick candidates; a streaming
    deployment would probe externally-known candidates instead). The
    counter table is broadcast to the probe join. At 100 TB the CMS
    build is the only full-corpus pass and it shuffles just DEPTH×WIDTH
    partial rows per executor.
    """
    from data_pipeline_playground_spark.functions.text import tokenize

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokenize(F.col("text"))).alias("term"))
    cms = (
        tok.select(F.explode(_buckets(F.col("term"))).alias("db"))
        .select("db.d", "db.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = tok.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    cand = exact.orderBy(F.col("exact_cnt").desc(), "term").limit(TOP_K)
    probe = cand.select(
        "term", "exact_cnt", F.explode(_buckets(F.col("term"))).alias("db")
    ).select("term", "exact_cnt", "db.d", "db.bucket")
    return (
        probe.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("term", "exact_cnt")
        .agg(
            F.min("c").cast("long").alias("cms_est"),
            (F.min("c") >= F.col("exact_cnt")).alias("est_ge_exact"),
        )
    )
