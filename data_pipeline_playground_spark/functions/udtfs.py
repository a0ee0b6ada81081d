"""Python UDTF surface (SURVEY §2.11).

The reference needs no table function — its per-doc expansions are
loops — but a complete engine exposes one: `split_sentences` turns a
document row into one row per sentence (N2's sent_tokenize shape,
summarize.py:5-26 consumes exactly this), usable from SQL as a LATERAL
table function. Arrow-optimized (`useArrow=True`) so batches cross the
JVM↔Python boundary columnar, same as the pandas UDFs.

Semantics match the inline array form used across the repo (split on
terminal punctuation, trim, drop empties) — asserted equivalent in
tests/test_text_functions.py.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"[.!?]+")


@udtf(returnType="sent_id int, sentence string", useArrow=True)
class SplitSentences:
    """(text) → rows of (sent_id, sentence); join keys ride the LATERAL."""

    def eval(self, text: str | None):
        if text is None:
            return
        i = 0
        for raw in _SENT_RE.split(text):
            # strip ASCII SPACE ONLY — Spark's F.trim (the jvm engine in
            # operators/lexrank.sentence_rows) and DuckDB's TRIM both
            # strip just ' '; Python's bare .strip() also eats
            # tabs/newlines/unicode whitespace, which would make the two
            # engines emit different sentences for 'A.\nB' (ADVICE r8).
            s = raw.strip(" ")
            if s:
                yield i, s
                i += 1


def register_udtfs(spark: SparkSession) -> None:
    """Make the table functions callable from SQL:

        SELECT d.doc_id, s.sent_id, s.sentence
        FROM documents d, LATERAL split_sentences(d.text) s
    """
    spark.udtf.register("split_sentences", SplitSentences)


# Ship the UDTF class (and _SENT_RE it captures) by value: executor
# Python workers do not necessarily have this package on sys.path
# (see functions/nlp_udfs.py for the same pattern).
import sys as _sys

from pyspark.cloudpickle import register_pickle_by_value as _by_value

_by_value(_sys.modules[__name__])
