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
