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


def test_greedy_chain_intransitive_semantics(spark):
    """The greedy tier differs from the pairwise spec EXACTLY on
    intransitive chains: with titles A~B, B~C, A≁C, the pairwise spec
    keeps {A} (both B and C have a similar earlier row) while the
    reference's greedy chain keeps {A, C} (B is suppressed, so C is
    only compared against A). Crafted corpus pins both behaviors."""
    from data_pipeline_playground_spark.operators.dedup import (
        fuzzy_dedup_greedy_survivors,
    )

    # 20-char titles, 4 edits per adjacent pair in DISJOINT positions:
    # ratio(a,b) = ratio(b,c) = 90 (> 80), ratio(a,c) = 80 (NOT > 80)
    a = "abcdefghijklmnopqrst"
    b = "abcdefghijklmnopWXYZ"
    c = "QRSTefghijklmnopWXYZ"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id bigint, text string"
    )
    from data_pipeline_playground_spark.functions.text import fuzz_ratio
    from pyspark.sql import functions as F

    def ratio(x, y):
        return (
            spark.range(1)
            .select(fuzz_ratio(F.lit(x), F.lit(y)).alias("r"))
            .first()[0]
        )

    assert ratio(a, b) > 80 and ratio(b, c) > 80 and ratio(a, c) <= 80

    # pair set = the exact verified similar pairs for these ratios
    # (passed explicitly so the test pins CHAIN semantics; the full
    # LSH-candidate path is exercised by the corpus tests below and
    # the recursive-CTE oracle at driver scale)
    pairs = spark.createDataFrame([(2, 1), (3, 2)], "hi bigint, lo bigint")
    greedy = {
        r.doc_id
        for r in fuzzy_dedup_greedy_survivors(docs, pairs=pairs).collect()
    }
    pairwise = {r.doc_id for r in fuzzy_dedup_survivors(docs).collect()}
    assert greedy == {1, 3}
    assert pairwise == {1}


def test_greedy_survivors_partition_invariant(spark, sf_dir):
    """The component-parallel greedy chain must be a pure function of
    the data: identical survivor sets under different input
    partitionings (catches any accidental dependence on partition
    order inside the per-component sequential scan)."""
    from data_pipeline_playground_spark.operators.dedup import (
        fuzzy_dedup_greedy_survivors,
    )

    docs = table(spark, sf_dir, "documents")
    s1 = {r.doc_id for r in fuzzy_dedup_greedy_survivors(docs).collect()}
    s7 = {
        r.doc_id
        for r in fuzzy_dedup_greedy_survivors(docs.repartition(7)).collect()
    }
    assert s1 == s7 and len(s1) > 0


def test_lsh_pair_recall_is_exactly_one(spark, sf_dir):
    """PAIR-LEVEL recall certificate (the ADVICE-r5 triage check made
    executable): the LSH-candidate pair set must equal the exact
    all-pairs threshold predicate on this corpus. The dedup_fuzzy_greedy
    and dedup_fuzzy_minhash oracles walk EXACT pairs while the Spark
    side walks LSH-derived pairs, so their value checks assume recall
    1 — when one of them mismatches after an SF/corpus change, THIS
    test says whether the cause is LSH recall (this fails too) or
    chain/survivor logic (this still passes)."""
    from pyspark.sql import functions as F

    from data_pipeline_playground_spark.operators.dedup import (
        FUZZ_THRESHOLD,
        TITLE_PREFIX_LEN,
        fuzzy_similar_pairs_minhash,
    )

    docs = table(spark, sf_dir, "documents")
    got = {
        (r.hi, r.lo)
        for r in fuzzy_similar_pairs_minhash(docs).select("hi", "lo").collect()
    }
    # exact ground truth: genuine ALL-pairs (crossJoin, no candidate
    # pruning of any kind) with the same ratio formula via the JVM
    # levenshtein — independent of the LSH candidate path under test
    t = docs.select(
        "doc_id", F.substring("text", 1, TITLE_PREFIX_LEN).alias("title")
    )
    a = t.select(F.col("doc_id").alias("hi"), F.col("title").alias("ta"))
    b = t.select(F.col("doc_id").alias("lo"), F.col("title").alias("tb"))
    tot = F.length("ta") + F.length("tb")
    ratio = F.when(F.col("ta") == F.col("tb"), F.lit(100.0)).otherwise(
        F.lit(100.0) * (tot - F.levenshtein("ta", "tb")).cast("double")
        / F.greatest(tot, F.lit(1)).cast("double")
    )
    want = {
        (r.hi, r.lo)
        for r in a.crossJoin(b)
        .filter(F.col("hi") > F.col("lo"))
        .filter(ratio > F.lit(FUZZ_THRESHOLD))
        .select("hi", "lo")
        .collect()
    }
    assert got == want  # precision AND recall both exactly 1
