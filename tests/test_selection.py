"""Dual-engine checks for DSIR-style importance weighting: Spark vs the
bit-exact DuckDB xxhash64-bucket mirror on a planted corpus, plus
sampled-background behavior and plan shape."""

import re

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from coastsat_spark.operators import selection

B, NG = 512, 2


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    voc_bg = [f"bg{chr(97 + i)}{chr(97 + j)}" for i in range(15) for j in range(10)]
    voc_t = [f"tg{chr(97 + i)}" for i in range(20)]

    def words(v, n):
        return " ".join(rng.choice(v, size=n))

    # docs 0-29 background-flavored, 30-34 target-flavored, then
    # degenerate rows (empty + NULL text)
    texts = [words(voc_bg, 40) for _ in range(30)]
    texts += [words(voc_t, 40) for _ in range(5)]
    texts += ["", None]
    pdf = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    tgt = pd.DataFrame(
        {"doc_id": np.arange(12), "text": [words(voc_t, 30) for _ in range(12)]}
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    con.register("target", tgt)
    return pdf, spark.createDataFrame(pdf), spark.createDataFrame(tgt), con


def test_importance_weights_oracle_parity(corpus):
    pdf, docs, target, con = corpus
    got = (
        selection.importance_weights(docs, target, n_buckets=B, ngram=NG)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        con.execute(selection.importance_weights_oracle_sql(n_buckets=B, ngram=NG))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(pdf)  # one row per input doc, degenerates included
    np.testing.assert_array_equal(
        got.doc_id.to_numpy(np.int64), exp.doc_id.to_numpy(np.int64)
    )
    np.testing.assert_array_equal(
        got.n_feat.to_numpy(np.int64), exp.n_feat.to_numpy(np.int64)
    )
    np.testing.assert_allclose(got.logratio, exp.logratio, atol=1e-9)


def test_importance_weights_separates_planted(corpus):
    _, docs, target, _ = corpus
    g = (
        selection.importance_weights(docs, target, n_buckets=B, ngram=NG)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # every target-flavored doc outranks every background doc
    assert g.loc[30:34, "logratio"].min() > g.loc[:29, "logratio"].max()
    # token-less docs: zero features, zero score
    assert g.loc[35, "n_feat"] == 0 and g.loc[35, "logratio"] == 0.0
    assert g.loc[36, "n_feat"] == 0 and g.loc[36, "logratio"] == 0.0
    # n_feat = (tokens) 1-grams + (tokens-1) 2-grams = 40 + 39
    assert (g.loc[:34, "n_feat"] == 79).all()
    with pytest.raises(ValueError):
        selection.importance_weights(docs, target, ngram=0)


def test_importance_weights_sampled_background(corpus):
    """The 100 TB shape: background fit on a hash-bounded sample. Scores
    shift (different background model) but the ranking of planted
    target-like docs over background docs must hold, and target-only
    buckets (absent from the sample) stay scoreable via the FULL join."""
    _, docs, target, _ = corpus
    sample = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 0)
    g = (
        selection.importance_weights(
            docs, target, background=sample, n_buckets=B, ngram=NG
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(g) == 37
    assert g.loc[30:34, "logratio"].min() > g.loc[:29, "logratio"].max()
    assert np.isfinite(g.logratio).all()


def test_importance_weights_plan_shape(corpus):
    """The weight table joins broadcast (it is <= n_buckets rows), and no
    Python evaluation appears anywhere."""
    _, docs, target, _ = corpus
    df = selection.importance_weights(docs, target, n_buckets=B, ngram=NG)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the scoring join itself is broadcast, not a sort-merge over doc feats
    assert re.search(r"BroadcastHashJoin .*bucket", plan) or "BroadcastHashJoin" in plan
