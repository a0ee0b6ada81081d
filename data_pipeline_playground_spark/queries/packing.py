"""Corpus shaping for LLM training: segment-level dedup, sequence
packing, chunking, and weighted sampling (SURVEY §2.12 family).

These are the operators a 100 TB pretraining-corpus run applies after
document-level dedup (queries/dedup*.py) and before tokenized shards
are written:

- ``dedup_paragraph``: drop repeated text *segments* across the whole
  corpus (CCNet/Dolma-style paragraph dedup). The driver's synthetic
  documents have no newlines, so the segmenter is a deterministic
  fixed-width token window (SEG_W tokens) standing in for the
  ``\\n\\n`` split a real corpus would use — the dataflow (explode →
  global first-occurrence → reassemble in order) is identical.
- ``pack_sequences``: GPT-style sequence packing accounting — docs are
  concatenated per source in deterministic doc_id order and the token
  stream is chopped every PACK_BUDGET tokens; each doc is attributed
  to the bin where it starts.
- ``doc_chunks``: overlapping token-window chunking (RAG / long-doc
  sharding): CHUNK_SIZE-token windows every CHUNK_STRIDE tokens.
- ``sample_weighted``: deterministic weighted sampling without
  replacement (Efraimidis–Spirakis A-ES): key = ln(u)/w with u drawn
  from the portable rolling hash, so the SAME docs are selected on
  any engine, any partitioning, any rerun.

Reference parity: the reference has no corpus-shaping stage (it is a
single-process news pipeline); these generalize its dedup/grouping
intent (pipeline.py:22-42) to the training-data setting the north star
names. All four are engine-portable and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_playground_spark.functions.text import (
    rolling_hash,
    sql_rolling_hash,
)
from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table

SEG_W = 20          # tokens per dedup segment ("paragraph" stand-in)
PACK_BUDGET = 256   # tokens per packed training sequence
CHUNK_SIZE = 64     # tokens per retrieval chunk
CHUNK_STRIDE = 48   # chunk start stride (CHUNK_SIZE - CHUNK_STRIDE overlap)
WSAMPLE_K = 50      # weighted-sample size
WSAMPLE_SALT = "wsamp:"
_U_MOD = 1_000_003  # prime modulus mapping hash → uniform (0, 1]

_SEG_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
seg AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(list_slice(t, i*{SEG_W}+1, i*{SEG_W}+{SEG_W}), ' ') AS seg_text
  FROM (SELECT doc_id, t,
               unnest(range(0, CAST(ceil(len(t)/{SEG_W}.0) AS BIGINT))) AS i
        FROM toks)
),
rn AS (
  SELECT doc_id, seg_idx, seg_text,
         ROW_NUMBER() OVER (PARTITION BY seg_text ORDER BY doc_id, seg_idx) AS rn
  FROM seg
)
SELECT doc_id,
       COUNT(*) AS n_segs,
       COUNT(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
       COALESCE(string_agg(CASE WHEN rn = 1 THEN seg_text END, ' ' ORDER BY seg_idx),
                '') AS text_dedup
FROM rn GROUP BY doc_id
"""


@query("dedup_paragraph", oracle=_SEG_SQL)
def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide segment (paragraph) dedup: a segment survives only
    at its first occurrence in (doc_id, seg_idx) order; each doc is
    reassembled from its surviving segments in position order.

    Plan shape: the segment build is a narrow higher-order-function
    map (sequence + slice, no UDF); the only shuffles are the window
    on seg_text (first-occurrence) and the groupBy(doc_id) reassembly.
    At 100 TB the window key becomes a 128-bit digest of the segment
    (shrinks shuffle sort keys from ~120 B strings to 16 B) and the
    reassembly co-partitions with the explode via doc_id bucketing —
    the dataflow is exactly Dolma/CCNet paragraph dedup.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    nseg = F.ceil(F.size(toks) / SEG_W).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(F.slice(toks, i * SEG_W + 1, SEG_W), " "),
    )
    seg = docs.select(
        "doc_id", F.posexplode(segs).alias("seg_idx", "seg_text")
    )
    w = Window.partitionBy("seg_text").orderBy("doc_id", "seg_idx")
    flagged = seg.withColumn("rn", F.row_number().over(w))
    kept = F.when(
        F.col("rn") == 1, F.struct(F.col("seg_idx"), F.col("seg_text"))
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.count(F.when(F.col("rn") == 1, 1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda s: s["seg_text"]
            ),
            " ",
        ).alias("text_dedup"),
    )


_PACK_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT source,
       CAST(floor((cum - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c GROUP BY source, bin_id
"""


@query("pack_sequences", oracle=_PACK_SQL)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing accounting: concatenate docs per source in
    deterministic doc_id order, chop the token stream every
    PACK_BUDGET tokens, attribute each doc to the bin where it starts
    (GPT-style packing, where docs may straddle bin boundaries).

    One shuffle (the per-source window); the cumulative sum is a
    running aggregate inside each partition. At 100 TB the per-source
    window parallelizes across sources; within a giant source the
    stream is first split by a coarse deterministic doc_id range so no
    single partition sorts the whole source (the bin ids are then
    offset by the per-range token totals — a 2-pass prefix sum).
    """
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("n_tokens").over(w))
    bin_id = F.floor(
        (F.col("cum") - F.col("n_tokens")) / PACK_BUDGET
    ).cast("long")
    return (
        c.withColumn("bin_id", bin_id)
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


_CHUNK_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
s AS (SELECT doc_id, t,
             unnest(range(0, CAST(len(t) AS BIGINT), {CHUNK_STRIDE})) AS start
      FROM toks)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(t, start+1, start+{CHUNK_SIZE}), ' ') AS chunk_text,
       CAST(len(list_slice(t, start+1, start+{CHUNK_SIZE})) AS BIGINT) AS chunk_tokens
FROM s
"""


@query("doc_chunks", oracle=_CHUNK_SQL)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (RAG indexing / long-doc
    sharding): a CHUNK_SIZE-token window every CHUNK_STRIDE tokens,
    tail windows kept short rather than padded.

    Entirely narrow (sequence + posexplode + slice over the scan — no
    shuffle at all): at 100 TB this is a pure map stage whose output
    feeds the embedding UDF or the tokenizer directly, so it scales
    with input splits.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(0).cast("long"),
        (F.size(toks) - 1).cast("long"),
        F.lit(CHUNK_STRIDE).cast("long"),
    )
    s = docs.select(
        "doc_id",
        F.col("text"),
        F.explode(starts).alias("start"),
    )
    chunk = F.slice(F.split(F.col("text"), " "), F.col("start") + 1, CHUNK_SIZE)
    return s.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
    )


_WSAMPLE_KEY = f"'{WSAMPLE_SALT}' || CAST(doc_id AS VARCHAR)"

_WSAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         ln((({sql_rolling_hash(_WSAMPLE_KEY)}) % {_U_MOD} + 1) / {_U_MOD}.0)
           / GREATEST(n_chars, 1) AS k
  FROM documents
)
SELECT doc_id, source, n_chars
FROM keyed ORDER BY k DESC, doc_id LIMIT {WSAMPLE_K}
"""


@query("sample_weighted", oracle=_WSAMPLE_SQL)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): key_i = ln(u_i) / w_i with w = n_chars (longer docs more
    likely kept) and u_i a deterministic uniform from the portable
    rolling hash — the top-K keys ARE a weighted sample, and the same
    K docs are selected on every engine and every rerun.

    Plan shape: narrow map to compute keys, then TakeOrderedAndProject
    (per-partition top-K + driver merge of K·P candidates — never a
    global sort). At 100 TB this is the standard one-pass distributed
    weighted reservoir; ties broken by doc_id for determinism, and the
    float keys stay internal so the output is hash-comparable.
    """
    docs = table(spark, sf_dir, "documents")
    u = (
        rolling_hash(
            F.concat(F.lit(WSAMPLE_SALT), F.col("doc_id").cast("string"))
        )
        % _U_MOD
        + 1
    ) / float(_U_MOD)
    key = F.log(u) / F.greatest(F.col("n_chars"), F.lit(1))
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("k"))
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(WSAMPLE_K)
        .select("doc_id", "source", "n_chars")
    )
