"""Parity tests: JVM/vectorized text-analysis columns vs the pure-Python
reference implementations (langid, quality score, fingerprint)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from coastsat_spark.functions import text as TX
from coastsat_spark.operators.dedup import token_hashes_col

ADVERSARIAL = [
    None,
    "",
    "   ",
    "the and with from they have this that quick brown fox",
    "los las con por para pero este esta casa",
    "der die das und mit von nicht sind haus",
    "xqzt bbbb zzzz qqqq",                       # no profile overlap -> und
    "!!! ??? ... ;;; :::",                       # punct only
    "word\tword\nword\r\nword  word",            # whitespace zoo
    "123 456 789 numbers only 42",
    "a b c d e f g h i j k l m",                 # 1-char words
    "Les des une dans pour AVEC cette sont",     # case mix
    "x" * 25000,                                  # long-doc length band
]


@pytest.fixture(scope="module")
def corpus(spark):
    from coastsat_spark.datagen import webpages_df

    texts = [r["text"] for r in webpages_df(spark, 300).select("text").collect()]
    texts += ADVERSARIAL
    pdf = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    return pdf, spark.createDataFrame(pdf)


def test_langid_col_matches_reference(spark, corpus):
    pdf, sdf = corpus
    got = {
        r["doc_id"]: r["pred"]
        for r in sdf.select("doc_id", TX.langid_col("text").alias("pred")).collect()
    }
    for _, row in pdf.iterrows():
        assert got[row["doc_id"]] == TX.langid_score(row["text"]), row["text"]


def test_quality_score_col_matches_reference(spark, corpus):
    pdf, sdf = corpus
    got = {
        r["doc_id"]: r["q"]
        for r in sdf.select("doc_id", TX.quality_score_col("text").alias("q")).collect()
    }
    for _, row in pdf.iterrows():
        assert got[row["doc_id"]] == pytest.approx(
            TX.quality_score_value(row["text"]), abs=1e-9
        ), row["text"]


def test_fingerprint_vectorized_matches_horner(spark, corpus):
    pdf, sdf = corpus
    th = {
        r["doc_id"]: list(r["th"]) if r["th"] is not None else []
        for r in sdf.select("doc_id", token_hashes_col("text").alias("th")).collect()
    }
    got = {
        r["doc_id"]: r["fp"]
        for r in sdf.select("doc_id", TX.fingerprint_col("text").alias("fp")).collect()
    }
    # batch-vectorized == per-doc Horner == Spark output
    batch = TX.np_fingerprints([np.array(th[d], dtype=np.int64) for d in sorted(th)])
    for i, d in enumerate(sorted(th)):
        ref = TX.fingerprint64_ref(th[d])
        assert got[d] == ref
        assert int(batch[i]) == ref
    # empty/None docs -> 0, and distinct docs get distinct fingerprints
    empties = [d for d in th if not th[d]]
    assert all(got[d] == 0 for d in empties)
    nonzero = [v for d, v in got.items() if th[d]]
    assert len(set(nonzero)) > 0.95 * len(nonzero)


def test_langid_identifies_marker_languages(spark):
    rows = [
        ("the and with from they have this that", "en"),
        ("los las con por para pero este esta", "es"),
        ("het een van voor met niet zijn maar", "nl"),
        ("111 222 333", "und"),  # digit bigrams overlap no profile
    ]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["text", "want"]))
    out = sdf.select("want", TX.langid_col("text").alias("pred")).collect()
    for r in out:
        assert r["pred"] == r["want"]


def test_repetition_stats_matches_python_reference(spark):
    rows = [
        (1, "the cat sat on the mat the cat"),
        (2, "a a a a a a"),                       # one word repeated: entropy 0
        (3, "all distinct words here now"),        # no repetition
        (4, "Ab ab AB cd CD!! cd"),                # case-folding + punct
        (5, ""),                                   # wordless -> no row
        (6, None),                                 # null -> no row
        (7, "solo"),                               # single word: no bigrams
        (8, "x y x y x y x y"),                    # fully duplicated bigrams
    ]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in TX.repetition_stats(sdf).collect()}
    import math

    for doc_id, text in rows:
        ref = TX.repetition_stats_ref(text)
        if ref is None:
            assert doc_id not in got
            continue
        r = got[doc_id]
        n, top, dist, dupbg, ent = ref
        assert r["n_words"] == n
        assert math.isclose(r["top_word_frac"], top, abs_tol=1e-9)
        assert math.isclose(r["distinct_word_frac"], dist, abs_tol=1e-9)
        assert math.isclose(r["dup_bigram_frac"], dupbg, abs_tol=1e-9)
        assert math.isclose(r["word_entropy"], ent, abs_tol=1e-6)
    # semantic spot checks
    assert got[2]["word_entropy"] == 0.0 and got[2]["top_word_frac"] == 1.0
    assert got[3]["distinct_word_frac"] == 1.0 and got[3]["dup_bigram_frac"] == 0.0
    assert got[7]["dup_bigram_frac"] == 0.0
    assert got[8]["dup_bigram_frac"] > 0.5


def test_pii_redaction_matches_python_reference(spark):
    rows = [
        (1, "mail me at jane.doe+spam@sub.example.co.uk today"),
        (2, "server at 192.168.0.1 and 10.255.255.255 up"),
        (3, "call +15551234567 or (555)1234567 now"),
        (4, "combo a@b.io 1.2.3.4 +4915712345678 end"),
        (5, "no pii here at all"),
        (6, ""),
        (7, None),
        (8, "not-an-ip 999.1 half@ @half 12-34"),
        (9, "email-digits x9@y.de then 12345678901 bare"),
    ]
    sdf = spark.createDataFrame(rows, ["i", "t"])
    got = {
        r["i"]: (r["red"], r["n"])
        for r in sdf.select(
            "i",
            TX.redact_pii_col("t").alias("red"),
            TX.pii_count_col("t").alias("n"),
        ).collect()
    }
    for i, t in rows:
        assert got[i][0] == TX.redact_pii_ref(t), (i, got[i][0])
        assert got[i][1] == TX.pii_count_ref(t), (i, got[i][1])
    # semantic checks: every kind found, placeholders present
    assert got[4][1] == 3 and "<EMAIL>" in got[4][0]
    assert "<IP>" in got[4][0] and "<PHONE>" in got[4][0]
    assert got[5] == ("no pii here at all", 0)
    assert got[7] == ("", 0)
