"""Named regression pins for fixes that the driver has never
re-sampled (VERDICT r4 §Next #9).

Both queries below had r2 driver value-failures, were fixed in r3
(array-hash canonicalization; decode-histogram rounding), and have
been green in the generic oracle mirror ever since — but the driver's
50-query sample never revisited them. The generic mirror
(test_queries_oracle.py) already covers them; these named pins exist
so a future regression fails a test that SAYS which long-ago fix
broke, rather than a parametrized row in a 158-case sweep.
"""

from __future__ import annotations

import pytest

from data_pipeline_playground_spark.registry import all_oracle_sql, all_queries
from tests.oracle import compare

_PINNED = ["group_collect_docs", "multimodal_decode_histogram"]


@pytest.mark.parametrize("name", _PINNED)
def test_never_resampled_r3_fix_stays_green(name, spark, sf_dir, oracle_con):
    queries, oracles = all_queries(), all_oracle_sql()
    assert name in oracles, f"{name} lost its oracle entry"
    compare(queries[name](spark, sf_dir), oracle_con, oracles[name], name=name)


def test_ks_drift_cross_sample_ties_synthetic(spark, tmp_path):
    """ADVICE r7 (medium): KS must evaluate the ECDF gap only AT each
    distinct pooled value (full tie group included). The pre-r8
    per-row formulation read D=1.0 on A={1,1}, B={1,1}; the correct
    statistic is 0. Second case pins a hand-computed D=0.5."""
    from data_pipeline_playground_spark.queries.sketches import value_ks_drift

    def run(rows):
        df = spark.createDataFrame(
            [(i, None, i, t, float(v), None) for i, (t, v) in enumerate(rows)],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string",
        )
        d = str(tmp_path / f"sf_{len(rows)}_{hash(tuple(rows)) & 0xffff}")
        df.write.mode("overwrite").parquet(d + "/events.parquet")
        return value_ks_drift(spark, d).collect()[0]

    all_tied = run([("click", 1), ("click", 1), ("purchase", 1), ("purchase", 1)])
    assert all_tied.ks_d == 0.0 and not all_tied.reject_05

    # F1 steps at 1(.5) 2(1.0); F2 at 1(.5) 3(1.0) -> sup gap 0.5 at v=2
    half = run([("click", 1), ("click", 2), ("purchase", 1), ("purchase", 3)])
    assert half.ks_d == 0.5


def test_exact_substr_spans_maximality_synthetic(spark, tmp_path):
    """ExactSubstr diagonal-islands construction, pinned on crafted
    docs: a 20-token substring shared at different offsets must emit
    EXACTLY one span with the true length and both 1-based start
    positions; a within-doc verbatim repeat must surface as a
    same-doc pair. Maximality: the reported length is exactly 20 even
    though the surrounding tokens differ (the bounding windows fail)."""
    from data_pipeline_playground_spark.queries.corpus_stats import (
        exact_substr_spans,
    )

    s = " ".join(f"s{i:02d}" for i in range(20))  # unique 20 tokens
    doc_a = "a1 a2 a3 a4 a5 " + s + " b1 b2 b3 b4 b5"
    doc_b = "c1 c2 c3 " + s + " d1 d2 d3 d4"
    doc_c = "e1 e2 " + s + " f1 f2 f3 " + s + " g1"  # within-doc repeat
    df = spark.createDataFrame(
        [(1, doc_a, "en", "t", len(doc_a)),
         (2, doc_b, "en", "t", len(doc_b)),
         (3, doc_c, "en", "t", len(doc_c))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path / "exsub")
    df.write.mode("overwrite").parquet(d + "/documents.parquet")
    rows = {
        (r.doc_a, r.doc_b, r.pos_a, r.pos_b): r.span_tokens
        for r in exact_substr_spans(spark, d).collect()
    }
    # cross-doc: S starts at token 6 of doc_a, token 4 of doc_b
    assert rows[(1, 2, 6, 4)] == 20
    # within-doc: S at tokens 3 and 26 of doc_c (2 + 20 + 3 + 1 = 26)
    assert rows[(3, 3, 3, 26)] == 20
    # doc_a/doc_c and doc_b/doc_c share S too; nothing longer than 20
    assert all(v == 20 for v in rows.values())
    assert len(rows) == 6  # C(3,2) cross-doc pairs x offsets + within-doc


def test_bpe_induced_merge_table_matches_retired_oracle(spark, sf_dir, oracle_con):
    """Round-12 consolidation pin: the standalone `bpe_top_merges`
    registry entry was absorbed into `bpe_encode` (which derives the
    same rank-ordered merge table and value-checks it transitively
    through the encodings) — this test keeps the induced table ITSELF
    directly oracle-checked against the retired entry's SQL, so the
    absorption is zero-loss by measurement, not by argument."""
    from data_pipeline_playground_spark.queries.corpus_stats import (
        _BPE_INDUCE_SQL,
        _bpe_top_merges_frame,
    )

    compare(
        _bpe_top_merges_frame(spark, sf_dir), oracle_con, _BPE_INDUCE_SQL,
        name="bpe_top_merges(retired->pinned)",
    )


def test_embedding_dim_audit_carries_both_absorbed_panels(spark, sf_dir):
    """Round-12 consolidation pin: the merged dim panel must carry every
    metric of BOTH absorbed queries (`embedding_dim_stats` +
    `embedding_int8_audit`, minus the definitionally-duplicate
    n_components == n_vectors) at dim grain — column-set drift here
    means a silently lost metric, even while the shared oracle stays
    green on whatever columns remain."""
    from data_pipeline_playground_spark.registry import all_queries

    df = all_queries()["embedding_dim_audit"](spark, sf_dir)
    assert set(df.columns) == {
        "dim", "n_vectors", "mean_v", "std_v", "min_v", "max_v",
        "scale", "mse", "max_abs_err", "n_codes",
    }


def test_source_text_profile_carries_absorbed_health_metrics(spark, sf_dir):
    """Round-12 consolidation pin: the source panel must carry every
    metric of the absorbed `source_quality_report` (total_chars,
    avg_tokens, avg_rep_frac, n_langs — n_docs was already a panel
    column) alongside the round-10 readability + lexical blocks."""
    from data_pipeline_playground_spark.registry import all_queries

    df = all_queries()["source_text_profile"](spark, sf_dir)
    assert set(df.columns) == {
        "source", "n_docs", "n_words", "n_syllables", "words_per_doc",
        "syllables_per_word", "flesch_score", "tokens", "types",
        "hapaxes", "ttr", "hapax_ratio",
        "total_chars", "avg_tokens", "avg_rep_frac", "n_langs",
    }
