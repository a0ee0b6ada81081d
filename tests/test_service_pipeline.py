"""End-to-end §3.2 service-pipeline test over fixture-shaped inputs
derived from driver tables (documents supplies the article bodies)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_playground_spark.tables import table


def test_service_pipeline_end_to_end(spark, sf_dir):
    from data_pipeline_playground_spark.plans.service_pipeline import (
        run_service_pipeline,
    )

    # sections: a few real + reserved headings (score-0) + extras >10
    rows = [("Page", f"Sec{i}", 1) for i in range(12)] + [
        ("Page", "References", 1),
        ("Page", "External links", 1),
    ]
    sections = spark.createDataFrame(
        rows, "page_title string, line string, toclevel int"
    )

    # articles from documents, fanned out to sections round-robin;
    # a few null-text rows simulate failed fetches (P6)
    docs = table(spark, sf_dir, "documents").limit(120)
    articles = docs.select(
        F.col("doc_id").alias("_id"),
        F.substring("text", 1, 30).alias("title"),
        F.when(F.col("doc_id") % 17 == 0, F.lit(None)).otherwise(F.col("text")).alias("text"),
        F.concat(F.lit("Sec"), (F.col("doc_id") % 12).cast("string")).alias("section_line"),
    )

    out = run_service_pipeline(sections, articles).collect()
    sections_out = {r.section for r in out}
    assert "References" not in sections_out  # reserved headings demoted out
    assert len(out) >= 8
    for r in out:
        assert r.n_articles > 0  # P9: no empty sections
        assert r.summary_ids and 1 <= len(r.summary_ids) <= 3  # N10 top-3
        assert set(r.summary_ids) <= set(r.article_ids)
        # dedup + null-filter: every listed article has text and survived
    all_ids = [i for r in out for i in r.article_ids]
    assert len(all_ids) == len(set(all_ids))  # each article in one section
