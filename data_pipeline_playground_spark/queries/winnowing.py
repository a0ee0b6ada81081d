"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003) — the MOSS local fingerprinting algorithm — plus the
fingerprint-match pair detector built on top of it.

This generalizes the reference's whole-document fingerprint surface
(reference pipeline.py:22-42 dedups whole titles; `doc_fingerprint`
hashes whole docs) to LOCAL fingerprints: hashes of word k-grams,
winnowed so that any sufficiently long shared passage between two
documents is guaranteed to share at least one selected fingerprint
(the winnowing guarantee: a match of length >= w + k - 1 tokens is
always detected). That is the standard building block for
plagiarism / near-dup-passage detection in training-data pipelines.

Selection rule (plain winnowing, rightmost-min tie-break): slide a
window of W consecutive k-gram hashes; in each window select the
rightmost minimal hash. Rather than materializing windows, we use the
equivalent per-position characterization: position j (hash h) is
selected iff some window exists in which every hash left of j is
>= h and every hash right of j is > h. With consecutive-run lengths
L (left, >=) and R (right, >, both capped at W-1) and m grams total,
that is

    max(0, j + W-1 - m, W-1 - R) <= min(W-1, j-1, L)

— a pure O(W) neighborhood test per position, so fingerprint
extraction is MAP-ONLY (array higher-order functions, zero shuffle,
zero UDF); the only shuffles in the whole family are the final
aggregates/joins on the fingerprint value.

Engine parity: token hashes and gram hashes are the repo's 131-base
polynomial rolling hash mod 1e9+7 (functions/text.py:92) — pure
int64 arithmetic, bit-identical in DuckDB. Out-of-bounds neighbor
lookups are NULL in both engines (Spark ``get``, DuckDB list
indexing), collapsed with COALESCE(..., false).

Scale notes (SCALE.md §Dedup):
- extraction: embarrassingly parallel, O(tokens) per doc, expected
  fingerprint density 2/(W+1) of gram positions.
- matches: the self-join is keyed on the fingerprint VALUE with a
  document-frequency cap (boilerplate fingerprints shared by > DF_CAP
  docs are dropped, same guard as the inverted-index family), so
  per-key fan-out is bounded by DF_CAP² — never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_playground_spark.functions.text import (
    ROLL_BASE,
    ROLL_MOD,
    once,
    tokenize,
)
from data_pipeline_playground_spark.registry import query
from data_pipeline_playground_spark.tables import table

K = 3  # word k-gram size
W = 4  # winnowing window (in grams)
DF_CAP = 10  # matches: drop fingerprints appearing in more docs
MIN_SHARED = 2  # matches: min shared fingerprints to report a pair

_SQL_TOKENS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
)


def _token_hashes(text_col: str) -> Column:
    """array<long>: rolling char hash of each token."""
    return F.transform(
        tokenize(text_col),
        lambda t: F.aggregate(
            F.split(t, ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * ROLL_BASE + F.ascii(c).cast("long")) % ROLL_MOD,
        ),
    )


def _fingerprint_col() -> Column:
    """array<struct<pos,fp>> of winnowed fingerprints for ``text``."""

    def grams(th: Column) -> Column:
        # gram hash at i (1-based, i in 1..len-K+1): 3-token fold.
        return F.when(
            F.size(th) >= K,
            F.transform(
                F.sequence(F.lit(1), F.size(th) - (K - 1)),
                lambda i: (
                    (F.element_at(th, i) * ROLL_BASE + F.element_at(th, i + 1))
                    % ROLL_MOD
                    * ROLL_BASE
                    + F.element_at(th, i + 2)
                )
                % ROLL_MOD,
            ),
        )

    def winnow(g: Column) -> Column:
        m = F.size(g)

        def nb(j: Column, off: int) -> Column:
            # 0-based get → NULL out of bounds (never an ANSI error).
            return F.get(g, j + F.lit(off - 1))

        def sel(j: Column) -> Column:
            h = F.element_at(g, j)
            c = lambda x: F.coalesce(x, F.lit(False))  # noqa: E731
            l1 = c(nb(j, -1) >= h)
            l2 = l1 & c(nb(j, -2) >= h)
            l3 = l2 & c(nb(j, -3) >= h)
            r1 = c(nb(j, 1) > h)
            r2 = r1 & c(nb(j, 2) > h)
            r3 = r2 & c(nb(j, 3) > h)
            lmax = l1.cast("int") + l2.cast("int") + l3.cast("int")
            rmax = r1.cast("int") + r2.cast("int") + r3.cast("int")
            need = F.greatest(F.lit(0), j + (W - 1) - m, F.lit(W - 1) - rmax)
            have = F.least(F.lit(W - 1), j - 1, lmax)
            return need <= have

        return F.transform(
            F.filter(F.sequence(F.lit(1), m), sel),
            lambda j: F.struct(
                j.cast("long").alias("pos"), F.element_at(g, j).alias("fp")
            ),
        )

    return once(
        _token_hashes("text"), lambda th: once(grams(th), winnow)
    )


def _with_fingerprints(docs: DataFrame) -> DataFrame:
    """doc_id, pos (gram index, 1-based), fp (winnowed gram hash).

    Docs with fewer than W grams select nothing (the window-existence
    term of the predicate), so the explode drops them — no explicit
    length filter needed.
    """
    return docs.select(
        "doc_id", F.explode(_fingerprint_col()).alias("s")
    ).select("doc_id", "s.pos", "s.fp")


# Shared oracle CTE chain: tokens → token hashes → gram hashes →
# winnowed positions (identical arithmetic, DuckDB list functions).
# NB: DuckDB wraps NEGATIVE list indices Python-style (g[-1] = last),
# unlike Spark's ``get`` (NULL for any out-of-bounds index). The
# neighbor chains below never observe a wrapped value: indices shrink
# consecutively (j-1, j-2, j-3), so a negative index is only reached
# AFTER the j-1=0 link returned NULL→false, and the AND-chain is
# already false. Same masking on the right (indices only grow).
_FP_CTES = f"""
tok AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
th AS (
  SELECT doc_id,
         list_transform(toks, t ->
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(regexp_split_to_array(t, ''),
                              c -> CAST(ascii(c) AS BIGINT))),
             (acc, ch) -> (acc * {ROLL_BASE} + ch) % {ROLL_MOD})) AS th
  FROM tok
),
g AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(th) - {K - 1}), i ->
           ((th[i] * {ROLL_BASE} + th[i + 1]) % {ROLL_MOD} * {ROLL_BASE}
             + th[i + 2]) % {ROLL_MOD}) AS g
  FROM th WHERE len(th) >= {K}
),
sel AS (
  SELECT doc_id, g,
         list_filter(generate_series(1, len(g)), j ->
           GREATEST(0, j + {W - 1} - len(g), {W - 1} - (
             CASE WHEN COALESCE(g[j+1] > g[j], false) THEN 1 ELSE 0 END
           + CASE WHEN COALESCE(g[j+1] > g[j], false)
                   AND COALESCE(g[j+2] > g[j], false) THEN 1 ELSE 0 END
           + CASE WHEN COALESCE(g[j+1] > g[j], false)
                   AND COALESCE(g[j+2] > g[j], false)
                   AND COALESCE(g[j+3] > g[j], false) THEN 1 ELSE 0 END))
           <= LEAST({W - 1}, j - 1,
             CASE WHEN COALESCE(g[j-1] >= g[j], false) THEN 1 ELSE 0 END
           + CASE WHEN COALESCE(g[j-1] >= g[j], false)
                   AND COALESCE(g[j-2] >= g[j], false) THEN 1 ELSE 0 END
           + CASE WHEN COALESCE(g[j-1] >= g[j], false)
                   AND COALESCE(g[j-2] >= g[j], false)
                   AND COALESCE(g[j-3] >= g[j], false) THEN 1 ELSE 0 END))
           AS sel
  FROM g WHERE len(g) >= {W}
),
fp AS (
  SELECT doc_id, CAST(j AS BIGINT) AS pos, g[j] AS fp
  FROM (SELECT doc_id, g, unnest(sel) AS j FROM sel)
)
"""

_WINNOW_SQL = f"""
WITH {_FP_CTES}
SELECT doc_id, pos, fp FROM fp
"""


@query("winnow_fingerprints", oracle=_WINNOW_SQL)
def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed k-gram fingerprints per document: (doc_id, gram
    position, fingerprint hash). K=3-word grams, window W=4, so any
    shared passage of >= W+K-1 = 6 tokens between two docs shares a
    selected fingerprint (the winnowing guarantee).

    Plan: map-only — tokenize, hash, winnow entirely inside array
    higher-order functions; the explode is the only row expansion and
    there is NO shuffle at all (verified by plan pin).
    """
    return _with_fingerprints(table(spark, sf_dir, "documents"))


_MATCH_SQL = f"""
WITH {_FP_CTES},
fpd AS (SELECT DISTINCT doc_id, fp FROM fp),
keep AS (
  SELECT fp FROM fpd GROUP BY fp HAVING count(*) <= {DF_CAP}
),
pair AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS shared_fps
  FROM fpd a JOIN keep USING (fp) JOIN fpd b USING (fp)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, shared_fps FROM pair WHERE shared_fps >= {MIN_SHARED}
"""


@query("winnow_matches", oracle=_MATCH_SQL)
def winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style match candidates: document pairs sharing >=
    MIN_SHARED distinct winnowed fingerprints, after dropping
    boilerplate fingerprints present in more than DF_CAP documents
    (the same df-cap guard as the inverted-index family — it bounds
    the self-join fan-out to DF_CAP² per fingerprint value).

    Plan: distinct (hash agg) → df-cap agg → self-equi-join on fp →
    pair count. Every shuffle is keyed on the fingerprint value; no
    all-pairs stage anywhere.
    """
    fpd = (
        _with_fingerprints(table(spark, sf_dir, "documents"))
        .select("doc_id", "fp")
        .distinct()
    )
    keep = fpd.groupBy("fp").agg(F.count("*").alias("df")).where(
        F.col("df") <= DF_CAP
    )
    a = fpd.join(keep.select("fp"), "fp").alias("a")
    b = fpd.alias("b")
    return (
        a.join(b, on="fp")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared_fps"))
        .where(F.col("shared_fps") >= MIN_SHARED)
    )
