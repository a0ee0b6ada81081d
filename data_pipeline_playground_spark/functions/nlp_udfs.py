"""Arrow-batched pandas UDFs for NLP that SQL cannot express
(SURVEY §2.11): stemming (N3) and POS filtering (N4).

These are the ONLY Python-side functions in the engine's hot paths, and
they are vectorized: one Arrow batch per invocation, token arrays in
and out. The reference used NLTK's PorterStemmer (cluster.py:13,17) and
nltk.pos_tag (lda.py:21-29); like the PIL gate in multimodal/media.py,
each UDF is IMPORT-GATED: when NLTK (and, for tagging, its
averaged-perceptron model data) is importable, the real NLTK stemmer /
tagger runs inside the same Arrow-batched UDF; otherwise the
self-contained fallbacks do:

- stemming: a self-contained implementation of the classic Porter
  suffix-stripping steps (public algorithm, Porter 1980) — covers the
  common suffix classes; documented as an approximation of NLTK's.
- POS noun filter: a deterministic suffix/shape heuristic standing in
  for a tagger (keeps NNP-like capitalized tokens and NNS-like plural
  nouns, the reference's accepted_pos = ['NNP','NNS'], lda.py:21-29).

The gate is decided DRIVER-SIDE at module import and CLOSURE-BOUND:
each UDF is built by a factory that closes over the probed bool, so
the flag travels inside the pickled closure cell regardless of how
the function itself is serialized (by value via the
register_pickle_by_value call below, or by reference on a cluster
where executors could re-import this module) — executors never
re-probe, and driver/executor NLTK skew cannot make output
partition-dependent (ADVICE r5 #1). This container ships no NLTK, so
CI exercises the fallbacks — tests pin the gate selection and, when
NLTK is present, the contract equality of both paths.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType, StringType


def _nltk_stemmer_available() -> bool:
    try:
        from nltk.stem import PorterStemmer  # noqa: F401

        return True
    except Exception:
        return False


def _nltk_tagger_available() -> bool:
    """Importable AND the perceptron model data is on disk (nltk
    downloads it separately; the resource name moved in nltk 3.9)."""
    try:
        import nltk
        from nltk import pos_tag  # noqa: F401
    except Exception:
        return False
    for res in (
        "taggers/averaged_perceptron_tagger_eng",
        "taggers/averaged_perceptron_tagger",
    ):
        try:
            nltk.data.find(res)
            return True
        except LookupError:
            continue
        except Exception:
            return False
    return False


_HAS_NLTK_STEM = _nltk_stemmer_available()
_HAS_NLTK_POS = _nltk_tagger_available()

# NB: return types are DataType objects, not DDL strings — a DDL string
# is parsed lazily via the active session, which blows up when the UDF
# is deserialized on an executor-side Python worker.
_ARR_STR = ArrayType(StringType())

_VOWELS = set("aeiou")


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences."""
    m, prev_v = 0, False
    for ch in stem:
        is_v = ch in _VOWELS or (ch == "y" and prev_v is False and m + prev_v > -1)
        if prev_v and not is_v:
            m += 1
        prev_v = is_v
    return m


def _has_vowel(stem: str) -> bool:
    return any(c in _VOWELS for c in stem) or "y" in stem[1:]


def porter_stem(word: str) -> str:
    """Simplified Porter stemmer: steps 1a/1b/common 2-4 suffixes."""
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        w = _post_1b(w)
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        w = _post_1b(w)
    # common step 2-4 suffixes (subset, longest-first)
    for suf, rep, min_m in (
        ("ational", "ate", 0), ("ization", "ize", 0), ("fulness", "ful", 0),
        ("ousness", "ous", 0), ("iveness", "ive", 0), ("tional", "tion", 0),
        ("ousli", "ous", 0), ("entli", "ent", 0), ("ement", "", 1),
        ("ment", "", 1), ("ness", "", 1), ("able", "", 1), ("ible", "", 1),
        ("ance", "", 1), ("ence", "", 1), ("tion", "t", 1), ("ful", "", 1),
        ("ant", "", 1), ("ent", "", 1), ("ism", "", 1), ("ate", "", 1),
        ("iti", "", 1), ("ous", "", 1), ("ive", "", 1), ("ize", "", 1),
    ):
        if w.endswith(suf) and _measure(w[: -len(suf)]) > min_m:
            w = w[: -len(suf)] + rep
            break
    return w


def _post_1b(w: str) -> str:
    if w.endswith(("at", "bl", "iz")):
        return w + "e"
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in "lsz" and w[-1] not in _VOWELS:
        return w[:-1]
    return w


def _make_stem_udf(has_nltk: bool):
    """Factory binding the driver-probed NLTK gate into the closure
    cell (see module docstring — the bool ships with the pickle, so
    the gate can never resolve differently per executor)."""

    @pandas_udf(_ARR_STR)
    def stem_tokens_udf(tokens: pd.Series) -> pd.Series:
        """N3 porter_stem over array<string> columns, Arrow-vectorized.
        Real NLTK PorterStemmer when importable (reference
        cluster.py:13), else the self-contained Porter fallback — same
        array<string> contract either way."""
        if has_nltk:
            from nltk.stem import PorterStemmer

            stem = PorterStemmer().stem
        else:
            stem = porter_stem
        return tokens.map(
            lambda toks: [stem(t) for t in toks] if toks is not None else None
        )

    return stem_tokens_udf


stem_tokens_udf = _make_stem_udf(_HAS_NLTK_STEM)


def _noun_like(token: str) -> bool:
    """NNP/NNS heuristic: capitalized (proper) or plural-shaped noun."""
    if not token:
        return False
    if token[0].isupper():
        return True  # NNP-like
    return (
        token.endswith("s")
        and not token.endswith(("ss", "us", "is"))
        and len(token) > 3
    )  # NNS-like


def _make_pos_udf(has_nltk: bool):
    """Factory twin of _make_stem_udf for the POS gate."""

    @pandas_udf(_ARR_STR)
    def pos_filter_nouns_udf(tokens: pd.Series) -> pd.Series:
        """N4 pos_filter (reference keeps only NNP/NNS tags,
        lda.py:21-29). Real nltk.pos_tag when importable with its model
        data, else the deterministic noun-shape heuristic — same
        contract either way."""
        if has_nltk:
            from nltk import pos_tag

            def keep(toks):
                return [t for t, tag in pos_tag(list(toks)) if tag in ("NNP", "NNS")]

        else:

            def keep(toks):
                return [t for t in toks if _noun_like(t)]

        return tokens.map(
            lambda toks: keep(toks) if toks is not None else None
        )

    return pos_filter_nouns_udf


pos_filter_nouns_udf = _make_pos_udf(_HAS_NLTK_POS)


# Ship this module's functions BY VALUE inside pickled UDFs: the driver
# process may run from any cwd (the package need not be importable on
# executor Python workers), so reference-pickling would fail there.
# NB: must register with pyspark's VENDORED cloudpickle — the one that
# actually serializes UDFs — not the standalone cloudpickle package.
import sys as _sys

from pyspark.cloudpickle import register_pickle_by_value as _by_value

_by_value(_sys.modules[__name__])


# --- grouped-aggregate pandas UDF (the one Arrow UDF variety the rest
# of the package doesn't already exercise: scalar pandas_udf above,
# grouped-map applyInPandas in operators/lexrank.py, mapInPandas in
# multimodal/media.py, UDTF in functions/udtfs.py) -----------------------

# DataType objects, not DDL strings: string return types are parsed
# against the ACTIVE session at decoration time, so a module-level
# string-typed pandas_udf made importing this module require a live
# SparkContext (broke any session-less import, e.g. running the
# pure-Python stemmer property test standalone).
@pandas_udf(DoubleType())
def median_udaf(v: pd.Series) -> float:
    """Exact median as a GROUPED_AGG pandas UDF (whole group's column
    arrives as one Arrow batch). numpy's median = mean of the two
    middle order statistics — identical to SQL quantile_cont(0.5)
    (selection + one halving, no accumulation), so the result is
    bitwise deterministic and DuckDB-oracle-checkable despite being a
    Python aggregate."""
    import numpy as np

    a = v.dropna().to_numpy(dtype=np.float64)
    if not len(a):
        return None
    return float(np.median(a))


@pandas_udf(LongType())
def count_udaf(v: pd.Series) -> int:
    """Non-null count companion: Spark disallows mixing GROUPED_AGG
    pandas UDFs with JVM aggregates in one agg(), so the count rides a
    second pandas UDAF in the same Arrow exchange."""
    return int(v.notna().sum())
