"""Webhose-shaped JSON ingestion (reference S1, pipeline.py:17-26).

The reference loads a nested JSON dump ``{posts: [{thread:
{title_full}, text}]}`` and flattens it into article rows. Here the
same shape becomes an explicit-schema ``spark.read.json`` plus one
``explode`` — schema-on-read with none of the inference cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEBHOSE_SCHEMA = T.StructType(
    [
        T.StructField(
            "posts",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "thread",
                            T.StructType(
                                [T.StructField("title_full", T.StringType())]
                            ),
                        ),
                        T.StructField("text", T.StringType()),
                    ]
                )
            ),
        )
    ]
)


def read_webhose(spark: SparkSession, path: str) -> DataFrame:
    """JSON dump → article rows (P1 nested_field_get + P2 project +
    P3 trim + M3 deterministic ids; reference pipeline.py:22-42)."""
    raw = spark.read.schema(WEBHOSE_SCHEMA).option("multiLine", True).json(path)
    posts = raw.select(F.explode("posts").alias("post"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("title"))
    return (
        posts.select(
            F.col("post.thread.title_full").alias("title"),
            F.trim(F.col("post.text")).alias("text"),
        )
        .withColumn("_id", F.row_number().over(w) - 1)
        .select("_id", "title", "text")
    )


def write_json_sink(df: DataFrame, path: str) -> None:
    """S7 json_response_sink: serialize result rows to JSON lines."""
    df.write.mode("overwrite").json(path)


def to_json_column(df: DataFrame, *cols: str) -> DataFrame:
    """In-plan JSON serialization (S7): one JSON string per row."""
    return df.select(F.to_json(F.struct(*cols)).alias("json"))
