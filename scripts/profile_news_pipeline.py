"""Stage-level timing for the composed news_pipeline (VERDICT r10 #2).

Replays the exact stage sequence of plans/news_pipeline.py with a
materialization barrier after each stage, so the +Δ vs the r8w 5.56 s
lineage baseline is attributable to a STAGE, not the composition.
Runs in a fresh session with the bench's sf0.001 warmup so numbers
are comparable to clean bench timings. Memo ledger costs (the
dedup-pairs memo build) are reported separately, mirroring the
bench's memo-exclusive accounting.

    python scripts/profile_news_pipeline.py [sf_dir] [repeats]

Point PYTHONPATH at an older worktree to profile that revision's
OPERATORS under the same stage harness (the harness mirrors today's
plan; older plan deltas — e.g. the pre-coalesce KMeans fit — are
called out inline).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def profile(spark, sf_dir: str) -> dict[str, float]:
    from data_pipeline_playground_spark import caching
    from data_pipeline_playground_spark.operators.lexrank import (
        lexrank_scores_grouped,
        lexrank_sentence_summaries,
        tfidf_term_weights,
        top_k_representatives,
    )
    from data_pipeline_playground_spark.queries.dedup import (
        dedup_fuzzy_minhash,
    )
    from data_pipeline_playground_spark.queries.ml import (
        KMEANS_K_CAP,
        KMEANS_MAX_ITER,
    )
    from data_pipeline_playground_spark.functions.text import tokenize
    from data_pipeline_playground_spark.tables import table
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import IDF, CountVectorizer, Normalizer
    from pyspark.sql import Window

    t: dict[str, float] = {}
    memo: dict[str, float] = {}

    def stage(name):
        class _S:
            def __enter__(self):
                caching.drain_ledger()
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                wall = time.perf_counter() - self.t0
                msec = sum(e["sec"] for e in caching.drain_ledger())
                if msec:
                    memo[name] = round(msec, 3)
                t[name] = round(wall - msec, 3)

        return _S()

    docs = table(spark, sf_dir, "documents")
    with stage("1_dedup_survivors"):
        survivors = dedup_fuzzy_minhash(spark, sf_dir)
        survivors.count()
    with stage("2_deduped_cache"):
        deduped = docs.join(survivors, "doc_id").select(
            "doc_id", "text"
        ).cache()
        n = deduped.count()
    toks = deduped.select(
        "doc_id", "text", tokenize(F.col("text")).alias("tokens")
    )
    with stage("3_cv_fit"):
        cv_model = CountVectorizer(inputCol="tokens", outputCol="tf").fit(toks)
    tf = cv_model.transform(toks)
    with stage("4_idf_fit"):
        idf = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    with stage("5_feats_cache"):
        feats = Normalizer(
            inputCol="tfidf", outputCol="features", p=2.0
        ).transform(idf.transform(tf)).cache()
        feats.count()
    k = max(2, min(n // 4, KMEANS_K_CAP))
    with stage("6_kmeans_fit"):
        km = KMeans(
            k=k, maxIter=KMEANS_MAX_ITER, seed=42, featuresCol="features"
        ).fit(feats.coalesce(max(4, 1 + n // 600)))
    with stage("7_clustered_cache"):
        clustered = km.transform(feats).select(
            "doc_id", "text", F.col("prediction").alias("cluster_id")
        ).cache()
        clustered.count()
    with stage("8_best_branch"):
        groups = clustered.select("doc_id", F.col("cluster_id").alias("group"))
        weights = tfidf_term_weights(deduped)
        from data_pipeline_playground_spark.plans.news_pipeline import (
            LEXRANK_GROUP_CAP,
        )

        scores = lexrank_scores_grouped(
            weights, groups, group_type="int", group_cap=LEXRANK_GROUP_CAP
        )
        best = top_k_representatives(scores, k=1).select(
            F.col("group").alias("cluster_id"),
            F.col("doc_id").alias("top_doc_id"),
        )
        best.count()
    with stage("9_keywords_branch"):
        tok_c = clustered.select(
            "cluster_id", "doc_id",
            F.explode(tokenize(F.col("text"))).alias("term"),
        )
        ctf = tok_c.groupBy("cluster_id", "term").agg(
            F.count(F.lit(1)).alias("tf")
        )
        cdf = ctf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        w = ctf.join(cdf, "term").withColumn(
            "w",
            F.col("tf")
            * (F.log((F.lit(k) + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
        kw_win = Window.partitionBy("cluster_id").orderBy(
            F.desc(F.round("w", 9)), F.asc("term")
        )
        keywords = (
            w.withColumn("rn", F.row_number().over(kw_win))
            .filter(F.col("rn") <= 5)
            .groupBy("cluster_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("rn", "term"))),
                        lambda s: s["term"],
                    ),
                    " ",
                ).alias("keywords")
            )
        )
        keywords.count()
    with stage("10_summaries_branch"):
        summaries = lexrank_sentence_summaries(
            clustered.select("doc_id", "text"),
            clustered.select("doc_id", F.col("cluster_id").alias("group")),
            k=3,
            group_type="int",
            group_cap=LEXRANK_GROUP_CAP,
        ).select(
            F.col("group").alias("cluster_id"),
            F.col("summary").alias("sent_summary"),
        )
        summaries.count()
    with stage("11_assemble"):
        sizes = clustered.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("n_articles")
        )
        excerpt = clustered.select(
            F.col("doc_id").alias("top_doc_id"),
            F.substring("text", 1, 160).alias("excerpt_text"),
        )
        out = (
            sizes.join(keywords, "cluster_id", "left")
            .join(best, "cluster_id", "left")
            .join(summaries, "cluster_id", "left")
            .join(excerpt, "top_doc_id", "left")
            .select(
                "cluster_id", "n_articles", "keywords", "top_doc_id",
                F.coalesce("sent_summary", "excerpt_text").alias(
                    "summary_text"
                ),
            )
        )
        out.count()
    if memo:
        t["memo_excluded"] = round(sum(memo.values()), 3)
    return t


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from data_pipeline_playground_spark import caching
    from data_pipeline_playground_spark.plans.news_pipeline import (
        run_news_pipeline,
    )
    from data_pipeline_playground_spark.session import get_spark

    spark = get_spark("dpp-news-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # bench-protocol warmup
    run_news_pipeline(spark, "/root/testdata/sf0.001").count()
    for r in range(repeats):
        spark.catalog.clearCache()
        caching.drain_ledger()
        t0 = time.perf_counter()
        run_news_pipeline(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        msec = sum(e["sec"] for e in caching.drain_ledger())
        print(
            f"composed run {r}: {wall - msec:.2f}s memo-exclusive "
            f"({wall:.2f}s wall)"
        )
        spark.catalog.clearCache()
        stages = profile(spark, sf_dir)
        width = max(len(k) for k in stages)
        for kk, vv in stages.items():
            print(f"  {kk:{width}s} {vv:6.2f}s")
        print(f"  {'stage_sum':{width}s} "
              f"{sum(v for k, v in stages.items() if k != 'memo_excluded'):6.2f}s")


if __name__ == "__main__":
    main()
