from data_pipeline_playground_spark.functions import text  # noqa: F401
