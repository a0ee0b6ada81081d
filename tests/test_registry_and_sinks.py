"""Registry consistency + partitioned parquet sink round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_playground_spark.registry import all_oracle_sql, all_queries
from data_pipeline_playground_spark.tables import table


def test_every_oracle_has_a_query():
    qs, osql = all_queries(), all_oracle_sql()
    assert set(osql) <= set(qs)
    # every query is callable and named sanely
    assert all(callable(fn) for fn in qs.values())
    assert all(n == n.lower() and " " not in n for n in qs)


def test_rows_only_queries_are_the_ml_set():
    """Non-SQL queries must be exactly the iterative/UDF operators —
    anything else missing an oracle is an accidental coverage gap."""
    qs, osql = all_queries(), all_oracle_sql()
    rows_only = set(qs) - set(osql)
    assert rows_only == {
        "ann_ivf_trained_topk",
        "kmeans_clusters",
        "bisecting_kmeans_clusters",
        "power_iteration_clusters",
        "lda_topics",
        "lda_doc_topics",
        "lexrank_representatives",
        "news_pipeline",
        "stem_profile",
        "pos_noun_profile",
        "lexrank_summaries",
    }


def test_partitioned_parquet_roundtrip(spark, sf_dir, tmp_path):
    """Scale-practice sink: write partitioned by lang, read back with a
    partition-pruned scan (the layout a 100 TB corpus would use)."""
    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    en = back.filter(F.col("lang") == "en")
    plan = en.queryExecution.executedPlan.toString() if hasattr(en, "queryExecution") else ""
    # partition pruning: the lang filter must land in PartitionFilters
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        en.explain()
    assert "PartitionFilters" in buf.getvalue()
    n_en = docs.filter(F.col("lang") == "en").count()
    assert en.count() == n_en
