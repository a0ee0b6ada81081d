"""MinHash-LSH building blocks (SURVEY §2.12 minhash_dedup; the 100 TB
replacement for the reference's O(n²) greedy fuzzy dedup, D1).

Pipeline: word-3-gram shingles → K portable min-hashes → band buckets →
candidate pairs (equi-join on band key — shuffle ∝ candidates, not n²)
→ signature-similarity estimate → keep-min-id survivors.

All hashing is the engine-portable polynomial rolling hash (see
functions.text.rolling_hash), so the DuckDB oracle reproduces bit-equal
signatures — no reliance on Spark-internal murmur3 or ml.MinHashLSH
(whose hash seeds the oracle could not mirror).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_playground_spark.functions.text import (
    ROLL_MOD,
    rolling_hash,
    tokenize,
)

SHINGLE_N = 3  # word 3-gram shingles
NUM_HASHES = 16  # K signature components
BAND_ROWS = 4  # r rows per band → 4 bands
SIM_THRESHOLD = 0.5  # signature-estimate Jaccard cutoff

# Deterministic (a, b) hash params — fixed seed, inlined into oracle SQL.
_rng = random.Random(42)
HASH_PARAMS: list[tuple[int, int, int]] = [
    (i, _rng.randrange(1, ROLL_MOD), _rng.randrange(0, ROLL_MOD))
    for i in range(NUM_HASHES)
]


def shingle_hashes(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """doc_id × distinct shingle → portable int64 hash.

    Shingle strings are built with posexplode + lead() windows (whole-
    stage codegen) rather than array lambdas; the hash itself stays the
    oracle-portable polynomial fold (the one part DuckDB must mirror).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    last_lead = F.lead("tok", SHINGLE_N - 1).over(w)
    gram = F.concat_ws(
        " ", *(["tok"] + [F.lead("tok", i).over(w) for i in range(1, SHINGLE_N)])
    )
    return (
        toks.select("doc_id", F.when(last_lead.isNotNull(), gram).alias("sh"))
        .filter(F.col("sh").isNotNull())
        .distinct()
        .select("doc_id", rolling_hash(F.col("sh")).alias("h"))
    )


def signatures(spark: SparkSession, hashes: DataFrame) -> DataFrame:
    """K min-hash components per doc: min((a*h + b) mod P) per i.

    The K-way expansion is a broadcast cross-join against the tiny
    param table; the only shuffle is the (doc_id, i) min-aggregate.
    """
    params = spark.createDataFrame(HASH_PARAMS, "i int, a long, b long")
    return (
        hashes.join(F.broadcast(params))
        .select(
            "doc_id",
            "i",
            ((F.col("a") * F.col("h") + F.col("b")) % ROLL_MOD).alias("hv"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("hv").alias("v"))
    )


def band_keys(sig: DataFrame) -> DataFrame:
    """LSH band key per (doc, band): '-'-joined r signature values in
    component order."""
    return (
        sig.withColumn("band", (F.col("i") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "v"))),
                    lambda x: x["v"].cast("string"),
                ),
                "-",
            ).alias("bkey")
        )
    )


def candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (i > j) doc pairs sharing at least one band bucket."""
    left = bands.select(
        F.col("doc_id").alias("ci"), F.col("band").alias("band_l"), F.col("bkey").alias("bkey_l")
    )
    right = bands.select(
        F.col("doc_id").alias("cj"), F.col("band").alias("band_r"), F.col("bkey").alias("bkey_r")
    )
    return (
        left.join(
            right,
            (F.col("band_l") == F.col("band_r"))
            & (F.col("bkey_l") == F.col("bkey_r"))
            & (F.col("cj") < F.col("ci")),
        )
        .select("ci", "cj")
        .distinct()
    )


def estimated_similarity(cand: DataFrame, sig: DataFrame) -> DataFrame:
    """Signature-estimate Jaccard per candidate pair: fraction of equal
    components."""
    sa = sig.select(F.col("doc_id").alias("ci"), F.col("i").alias("ia"), F.col("v").alias("va"))
    sb = sig.select(F.col("doc_id").alias("cj2"), F.col("i").alias("ib"), F.col("v").alias("vb"))
    return (
        cand.join(sa, "ci")
        .join(sb, (F.col("cj") == F.col("cj2")) & (F.col("ia") == F.col("ib")))
        .groupBy("ci", "cj")
        .agg(
            (
                F.sum(F.when(F.col("va") == F.col("vb"), 1).otherwise(0))
                / F.lit(float(NUM_HASHES))
            ).alias("sim")
        )
    )
