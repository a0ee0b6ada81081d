"""Query modules — importing this package registers every query."""

from data_pipeline_playground_spark.queries import dedup  # noqa: F401
