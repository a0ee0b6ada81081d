"""Composed-pipeline and serialization query-surface entries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table


@query("news_pipeline")
def news_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end reference pipeline §3.1 (dedup → KMeans cluster →
    LexRank summarize → keywords) — iterative/ML, rows-only check;
    invariants in tests/test_multimodal_and_pipeline.py."""
    from data_pipeline_playground_spark.plans.news_pipeline import run_news_pipeline

    return run_news_pipeline(spark, sf_dir)


_JSON_SERIALIZE_SQL = """
SELECT doc_id,
       to_json(struct_pack(doc_id := doc_id, lang := lang, source := source)) AS doc_json
FROM documents
"""


@query("json_serialize", oracle=_JSON_SERIALIZE_SQL)
def json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 json_response_sink as an in-plan operator: one JSON string
    per row; key order fixed by the struct, identical in both engines."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "source")).alias("doc_json"),
    )
