"""Paragraph-level dedup (`dedup.dedup_paragraphs`) and the skew-safe
`duplicate_spans(strategy="agg")` variant: dual-engine parity on a
planted multi-line corpus plus plan-shape and invariant checks."""

import re

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from coastsat_spark.operators import dedup

BOILER = "copyright 2026 example site all rights reserved"
SHARED = "the quick brown fox jumps over the lazy dog"


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(31)
    vocab = [f"w{chr(97 + i)}{chr(97 + j)}" for i in range(20) for j in range(10)]

    def para(n):
        return " ".join(rng.choice(vocab, size=n))

    texts = []
    # 12 docs all carrying the boilerplate footer (hot paragraph)
    for _ in range(12):
        texts.append(para(9) + "\n" + para(7) + "\n" + BOILER)
    # two docs sharing one mid-doc paragraph
    texts.append(para(5) + "\n" + SHARED + "\n" + para(6))
    texts.append(SHARED + "\n" + para(8))
    # within-doc repeat: same paragraph twice in ONE doc — df=2, one keep
    rep = para(6)
    texts.append(rep + "\n" + para(4) + "\n" + rep)
    # whitespace-only and short lines, trailing newlines, empty text
    texts.append("  \n" + para(5) + "\nab\n\n")
    texts.append("")
    texts.append(None)
    pdf = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    con = duckdb.connect()
    con.register("documents", pdf)
    return pdf, spark.createDataFrame(pdf), con


def test_para_dedup_oracle_parity(corpus):
    _, docs, con = corpus
    key = ["doc_id", "para_idx"]
    got = (
        dedup.dedup_paragraphs(docs, min_chars=3)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    exp = (
        con.execute(dedup.dedup_paragraphs_oracle_sql(min_chars=3))
        .df()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) and len(got) > 0
    for c in ("doc_id", "para_idx", "n_chars", "df"):
        np.testing.assert_array_equal(
            got[c].to_numpy(np.int64), exp[c].to_numpy(np.int64)
        )
    np.testing.assert_array_equal(got["keep"], exp["keep"])


def test_para_dedup_planted(corpus):
    pdf, docs, _ = corpus
    out = dedup.dedup_paragraphs(docs, min_chars=3).toPandas()
    boiler = out[(out.n_chars == len(BOILER)) & (out.df == 12)]
    assert len(boiler) == 12 and boiler.keep.sum() == 1
    kept = boiler[boiler.keep].iloc[0]
    assert (kept.doc_id, kept.para_idx) == (0, 2)  # smallest (doc, idx)
    shared = out[out.df == 2].sort_values(["doc_id", "para_idx"])
    # SHARED pair + the within-doc repeat pair
    assert len(shared) == 4 and shared.keep.sum() == 2
    # within-doc repeat: doc 14 paragraphs 0 and 2, keeper is idx 0
    rep = shared[shared.doc_id == 14]
    assert list(rep.para_idx) == [0, 2] and list(rep.keep) == [True, False]
    # short ('ab'), whitespace-only, empty paragraphs dropped; indexes kept
    d15 = out[out.doc_id == 15]
    assert list(d15.para_idx) == [1]
    # empty-string (16) and NULL-text (17) docs contribute no rows
    assert not {16, 17} & set(out.doc_id)


def test_para_dedup_one_keep_per_group(corpus):
    _, docs, _ = corpus
    out = dedup.dedup_paragraphs(docs, min_chars=3)
    # reconstruct groups via df join-back invariant: total keeps == number
    # of distinct paragraphs == sum over keeps of 1, and each group of
    # size df contributes exactly df rows
    agg = (
        out.groupBy("df")
        .agg(F.count(F.lit(1)).alias("rows"), F.sum(F.col("keep").cast("int")).alias("keeps"))
        .toPandas()
    )
    for _, r in agg.iterrows():
        assert r["rows"] % r["df"] == 0
        assert r["keeps"] == r["rows"] // r["df"]


def test_para_dedup_plan_shape(corpus):
    """Paragraph text never shuffles and nothing crosses into Python:
    no Python eval nodes, and every Exchange key set is digest/doc_id
    ints (sha2 happens in the scan stage, before the first Exchange)."""
    _, docs, _ = corpus
    df = dedup.dedup_paragraphs(docs)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "row_number" not in plan  # keeper election is the agg, not a window


def test_duplicate_spans_agg_strategy_parity(spark):
    rng = np.random.default_rng(5)
    vocab = [f"t{chr(97 + i)}{chr(97 + j)}" for i in range(15) for j in range(10)]

    def words(n):
        return " ".join(rng.choice(vocab, size=n))

    shared = words(20)
    hot = words(10)
    texts = [words(30) + " " + hot for _ in range(25)]
    texts.append(words(8) + " " + shared + " " + words(5))
    texts.append(shared + " " + words(12))
    texts.append("")
    pdf = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    docs = spark.createDataFrame(pdf)
    key = ["doc_id", "span_start"]
    a = (
        dedup.duplicate_spans(docs, k=8, strategy="window")
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    b = (
        dedup.duplicate_spans(docs, k=8, strategy="agg")
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    # the agg plan elects dup digests without a digest-partitioned window
    df = dedup.duplicate_spans(docs, k=8, strategy="agg")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "HashAggregate" in plan
    with pytest.raises(ValueError):
        dedup.duplicate_spans(docs, strategy="nope")
