"""Query modules — importing this package registers every query."""

from data_pipeline_playground_spark.queries import (  # noqa: F401
    analytics,
    corpus_stats,
    dedup,
    dedup_advanced,
    graph,
    layout,
    maintenance,
    ml,
    packing,
    pipelines,
    relational,
    retrieval,
    sampling,
    similarity,
    sketches,
    temporal,
    text,
    timeseries,
    tpch_extra,
    windows,
)
