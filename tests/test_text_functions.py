"""Unit tests for scalar text functions and NLP UDF internals."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_porter_stem_basics():
    from data_pipeline_playground_spark.functions.nlp_udfs import porter_stem

    assert porter_stem("running") == "run"
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("agreed") == "agree"
    assert porter_stem("cats") == "cat"
    assert porter_stem("is") == "is"  # too short to touch
    # idempotent-ish on already-stemmed words
    assert porter_stem("run") == "run"


def test_noun_heuristic():
    from data_pipeline_playground_spark.functions.nlp_udfs import _noun_like

    assert _noun_like("London")  # NNP-like
    assert _noun_like("tables")  # NNS-like
    assert not _noun_like("is")
    assert not _noun_like("class")  # -ss excluded
    assert not _noun_like("")


def test_fuzz_ratio_expression(spark):
    from data_pipeline_playground_spark.functions.text import fuzz_ratio

    df = spark.createDataFrame(
        [("kitten", "sitting"), ("same", "same"), ("abc", "xyz")], "a string, b string"
    )
    rows = df.select(fuzz_ratio("a", "b").alias("r")).collect()
    # lev(kitten,sitting)=3 → 100*(6+7-3)/13
    assert abs(rows[0].r - 100 * 10 / 13) < 1e-9
    assert rows[1].r == 100.0
    # all-substitutions case: lev=3 → 100*(3+3-3)/6 = 50 (the documented
    # Levenshtein-ratio formula, not SequenceMatcher's 0)
    assert rows[2].r == 50.0


def test_word_ngrams_edges(spark):
    from data_pipeline_playground_spark.functions.text import tokenize, word_ngrams

    df = spark.createDataFrame([("a b c",), ("a",), ("",)], "text string")
    out = df.select(word_ngrams(tokenize(F.col("text")), 2).alias("g")).collect()
    assert out[0].g == ["a b", "b c"]
    assert out[1].g == []  # fewer tokens than n → empty, not [1,0] descent
    assert out[2].g == []


def test_rolling_hash_matches_duckdb(spark):
    import duckdb

    from data_pipeline_playground_spark.functions.text import (
        rolling_hash,
        sql_rolling_hash,
    )

    words = ["spark", "data pipeline", "x", ""]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {r.s: r.h for r in df.select("s", rolling_hash("s").alias("h")).collect()}
    con = duckdb.connect()
    for w in words:
        expect = con.execute(
            f"SELECT {sql_rolling_hash('?')}".replace("?", f"'{w}'")
        ).fetchone()[0]
        assert got[w] == expect, w


def test_sentence_split(spark):
    """N2 sent_tokenize approximation: split on terminal punctuation."""
    df = spark.createDataFrame(
        [("One sentence. Two! Three? ",), ("nopunct",)], "text string"
    )
    sent = F.filter(
        F.transform(
            F.split(F.col("text"), "[.!?]+"), lambda s: F.trim(s)
        ),
        lambda s: s != F.lit(""),
    )
    rows = df.select(sent.alias("s")).collect()
    assert rows[0].s == ["One sentence", "Two", "Three"]
    assert rows[1].s == ["nopunct"]


def test_split_sentences_udtf_lateral(spark, sf_dir):
    """The UDTF surface (§2.11): LATERAL table function from SQL, same
    semantics as the inline array splitter."""
    from data_pipeline_playground_spark.functions.udtfs import register_udtfs
    from data_pipeline_playground_spark.tables import table

    register_udtfs(spark)
    table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    got = spark.sql(
        """SELECT d.doc_id, s.sent_id, s.sentence
           FROM docs_udtf d, LATERAL split_sentences(d.text) s"""
    )
    # equivalent inline array form
    sent = F.filter(
        F.transform(F.split(F.col("text"), "[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )
    expect = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(sent).alias("sent_id", "sentence"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_sentence_rows_engines_agree_on_whitespace(spark):
    """ADVICE r8: the jvm engine's F.trim strips ONLY ASCII spaces while
    a bare Python str.strip() also eats tabs/newlines — the UDTF now
    strips ' ' alone so both engines emit identical sentences even for
    whitespace-rich text (the corpus pin alone was only empirical)."""
    from data_pipeline_playground_spark.operators.lexrank import sentence_rows

    docs = spark.createDataFrame(
        [
            (1, "A.\nB! \tC?  D"),          # newline/tab survive trim
            (2, "\tlead. trail \n. x"),      # whitespace-only edges
            (3, " . ! ?"),                   # space-only segments drop
            (4, "no terminal punctuation"),
            (5, "unicode\u00a0nbsp. kept\u00a0"),  # NBSP untouched
        ],
        "doc_id bigint, text string",
    )
    jvm = sorted(map(tuple, sentence_rows(docs, engine="jvm").collect()))
    udtf = sorted(map(tuple, sentence_rows(docs, engine="udtf").collect()))
    assert jvm == udtf
    # the load-bearing rows: embedded \n / \t are PRESERVED by both
    sents = {r[2] for r in jvm}
    assert "\nB" in sents and "\tC" in sents and "kept\u00a0" in sents


def test_pii_scrub_redacts_crafted_rows(spark):
    """The corpus has no PII, so the oracle check alone is vacuous on
    matches — drive the same expressions over crafted rows."""
    from data_pipeline_playground_spark.queries.text import EMAIL_RE, PHONE_RE

    df = spark.createDataFrame(
        [
            (1, "contact Jo.Doe+spam@example.co.uk or call +1 (555) 123-4567 now"),
            (2, "two mails: a@b.io c@d.org; digits 42 stay"),
            (3, "clean text with room 1234 and no pii"),
        ],
        "doc_id bigint, text string",
    )
    no_email = F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>")
    out = {
        r.doc_id: (r.n_emails, r.n_phones, r.clean)
        for r in df.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(EMAIL_RE)).alias("n_emails"),
            F.regexp_count(no_email, F.lit(PHONE_RE)).alias("n_phones"),
            F.regexp_replace(no_email, PHONE_RE, "<PHONE>").alias("clean"),
        ).collect()
    }
    assert out[1] == (1, 1, "contact <EMAIL> or call <PHONE> now")
    assert out[2] == (2, 0, "two mails: <EMAIL> <EMAIL>; digits 42 stay")
    assert out[3] == (0, 0, "clean text with room 1234 and no pii")


def test_nltk_gate_selection_and_real_path_contract():
    """NLP UDF import-gate (mirror of the PIL gate in
    multimodal/media.py): the flags are True exactly when NLTK (and
    tagger data) is importable; with NLTK present, the real stemmer
    must keep the fallback's str→str contract on a sample vocabulary
    and the real tagger path the list→sublist contract."""
    from data_pipeline_playground_spark.functions import nlp_udfs as N

    assert N._HAS_NLTK_STEM == N._nltk_stemmer_available()
    assert N._HAS_NLTK_POS == N._nltk_tagger_available()
    if not N._HAS_NLTK_STEM:
        return  # this container ships no NLTK; fallback paths are
        # exercised by stem_profile / pos_noun_profile queries
    from nltk.stem import PorterStemmer

    stem = PorterStemmer().stem
    for w in ["running", "caresses", "ponies", "agreed", "cats", "is"]:
        assert isinstance(stem(w), str)
    if N._HAS_NLTK_POS:
        from nltk import pos_tag

        toks = ["London", "cats", "run"]
        kept = [t for t, tag in pos_tag(toks) if tag in ("NNP", "NNS")]
        assert set(kept) <= set(toks)
