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


_DECODE_HIST_SQL = """
WITH b AS (
  SELECT doc_id,
         greatest(length(text), 1) AS total,
         list_transform(range(1, length(text) + 1),
                        i -> ascii(substr(text, CAST(i AS INT), 1)) % 8) AS residues
  FROM documents
)
SELECT doc_id AS media_id,
       array_to_string(
         list_transform(range(0, 8),
                        k -> printf('%.6f',
                                    floor(len(list_filter(residues, r -> r = k))
                                          * 1000000.0 / total + 0.5) / 1000000.0)),
         ' ') AS features
FROM b
"""


@query("multimodal_decode_histogram", oracle=_DECODE_HIST_SQL)
def multimodal_decode_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode stage, oracle-checked end-to-end: documents →
    binary payload column → mapInPandas stub decode (8-bucket byte
    histogram) → per-media feature vector. The corpus is pure ASCII, so
    DuckDB reproduces the UTF-8 byte residues with ascii(); rounding is
    the engine-portable half-away formula (multimodal/media.py). This
    pins the whole Arrow plumbing — schema, batching, null handling —
    to exact values, not just row counts. The vector is emitted as a
    space-joined %.6f string: the driver's pandas hasher cannot
    factorize list cells, and both engines hold the identical double
    (same half-away rounding), so fixed-point formatting is stable."""
    from data_pipeline_playground_spark.multimodal.media import (
        _stub_decode,
        attach_payload_from_text,
        decode_features,
    )

    docs = table(spark, sf_dir, "documents")
    # stub decoder PINNED (not default_decoder): the payloads are
    # synthetic UTF-8 bytes and the oracle reproduces the stub's byte
    # histogram — a PIL-bearing environment must not flip this gate
    decoded = decode_features(attach_payload_from_text(docs), decoder=_stub_decode)
    return decoded.select(
        "media_id",
        F.array_join(
            F.transform("features", lambda x: F.format_string("%.6f", x)), " "
        ).alias("features"),
    )


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
