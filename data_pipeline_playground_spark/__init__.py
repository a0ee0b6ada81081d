"""data_pipeline_playground_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of the reference news-aggregation ETL/NLP pipeline
(newsbias/data-pipeline-playground, surveyed in /root/repo/SURVEY.md),
generalized with LLM-data-pipeline primitives (dedup families,
similarity search, text analytics, multimodal columns) and designed for
100 TB scale: declarative DataFrame/SQL plans, broadcast/blocked joins,
no driver-side loops, Arrow-batched pandas UDFs only where SQL cannot
express the semantics.
"""

from data_pipeline_playground_spark.session import get_spark
from data_pipeline_playground_spark.tables import TABLES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]
