"""Dedup operator-family tests beyond the oracle mirror (SURVEY §2.3)."""

from __future__ import annotations

from data_pipeline_playground_spark.operators.dedup import fuzzy_dedup_survivors
from data_pipeline_playground_spark.tables import table


def test_minhash_candidates_match_band_survivors(spark, sf_dir):
    """The LSH-candidate fuzzy dedup must agree with the exact banded
    self-join on this corpus (recall-1 certificate at test scale; the
    operator docstring documents where recall can drop below 1)."""
    docs = table(spark, sf_dir, "documents")
    band = {r.doc_id for r in fuzzy_dedup_survivors(docs).collect()}
    mh = {
        r.doc_id
        for r in fuzzy_dedup_survivors(docs, candidates="minhash").collect()
    }
    assert mh == band


def test_minhash_mode_precision_subsetness(spark, sf_dir):
    """Survivors of either mode are a subset of input ids and include
    the global min id (nothing precedes it)."""
    docs = table(spark, sf_dir, "documents")
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    mh = {
        r.doc_id
        for r in fuzzy_dedup_survivors(docs, candidates="minhash").collect()
    }
    assert mh <= all_ids
    assert min(all_ids) in mh
