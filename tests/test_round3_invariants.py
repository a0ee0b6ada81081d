"""Structural invariants of the round-3 operators — properties the
row-compare oracle cannot express (global conservation laws,
determinism across reruns, certificate semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_playground_spark.registry import all_queries

_QUERIES = all_queries()


def test_dedup_paragraph_conserves_distinct_segments(spark, sf_dir):
    """Global conservation: every distinct segment survives exactly
    once, so Σ n_kept == |distinct segments| and n_kept ≤ n_segs."""
    out = _QUERIES["dedup_paragraph"](spark, sf_dir)
    agg = out.agg(
        F.sum("n_kept").alias("kept"),
        F.sum("n_segs").alias("total"),
        F.sum((F.col("n_kept") > F.col("n_segs")).cast("int")).alias("bad"),
    ).first()
    assert agg["bad"] == 0

    from data_pipeline_playground_spark.queries.packing import SEG_W
    from data_pipeline_playground_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    nseg = F.ceil(F.size(toks) / SEG_W).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(F.slice(toks, i * SEG_W + 1, SEG_W), " "),
    )
    distinct_segs = (
        docs.select(F.explode(segs).alias("s")).distinct().count()
    )
    assert agg["kept"] == distinct_segs


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    """Bin accounting must conserve the per-source token totals and
    number bins contiguously from 0."""
    out = _QUERIES["pack_sequences"](spark, sf_dir).cache()
    from data_pipeline_playground_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    truth = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(F.split(F.col("text"), " "))).alias("t"))
        .collect()
    }
    got = {
        r["source"]: r["t"]
        for r in out.groupBy("source").agg(F.sum("bin_tokens").alias("t")).collect()
    }
    assert got == truth
    bins = out.groupBy("source").agg(
        F.min("bin_id").alias("lo"),
        F.max("bin_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    for r in bins.collect():
        assert r["lo"] == 0
        assert r["n"] == r["hi"] + 1  # contiguous: every bin has a doc start
    out.unpersist()


def test_sample_weighted_is_deterministic(spark, sf_dir):
    a = sorted(r["doc_id"] for r in _QUERIES["sample_weighted"](spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in _QUERIES["sample_weighted"](spark, sf_dir).collect())
    from data_pipeline_playground_spark.queries.packing import WSAMPLE_K

    assert a == b
    assert len(a) == WSAMPLE_K


def test_cms_certificate_holds(spark, sf_dir):
    rows = _QUERIES["heavy_hitters_cms"](spark, sf_dir).collect()
    assert rows
    assert all(r["est_ge_exact"] for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)


def test_bloom_no_false_negatives(spark, sf_dir):
    rows = _QUERIES["bloom_blocklist_hits"](spark, sf_dir).collect()
    assert rows
    assert all(r["no_false_neg"] for r in rows)
    assert all(r["bloom_hits"] >= r["exact_hits"] for r in rows)


def test_upsert_merge_semantics(spark, sf_dir):
    from data_pipeline_playground_spark.queries.maintenance import (
        DEL_MOD,
        UPD_MOD,
        UPDATED_STATUS,
    )

    rows = _QUERIES["orders_upsert_latest"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        k = r["o_orderkey"]
        assert k % DEL_MOD != 0  # tombstones gone
        if k % UPD_MOD == 0:
            assert r["o_orderstatus"] == UPDATED_STATUS
            assert r["version"] == 1
        else:
            assert r["version"] == 0


def test_pagerank_mass_and_floor(spark, sf_dir):
    """Rank mass stays in (teleport-floor·N, 1] — dangling nodes leak
    mass (the documented simplification) but never below the floor —
    and every node gets at least the teleport share."""
    from data_pipeline_playground_spark.queries.graph import PR_DAMPING, PR_N

    rows = _QUERIES["pagerank_nations"](spark, sf_dir).collect()
    assert len(rows) == PR_N
    floor = (1 - PR_DAMPING) / PR_N
    assert all(r["pagerank"] >= floor - 1e-9 for r in rows)
    total = sum(r["pagerank"] for r in rows)
    assert floor * PR_N - 1e-6 <= total <= 1.0 + 1e-6
