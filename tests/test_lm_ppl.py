"""Dual-engine checks for the hashed stupid-backoff LM perplexity
filter (the CCNet/KenLM quality stage): Spark vs the bit-exact DuckDB
xxhash64 mirror on a planted corpus, plus separation and plan shape."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from coastsat_spark.operators import selection

B, ORDER = 4096, 3


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    # the model corpus: sentences over a small vocabulary with strong
    # local structure (fixed bigram chains), so in-domain text hits
    # high-order counts and gibberish backs off to smoothed unigrams
    voc = [f"w{chr(97 + i)}" for i in range(12)]
    chains = [" ".join(voc[i : i + 4]) for i in range(9)]
    model_texts = [" ".join(rng.choice(chains, size=8)) for _ in range(40)]
    # docs: 0-9 in-domain (same chains), 10-19 shuffled-vocab gibberish,
    # 20-23 unseen-vocabulary gibberish, then 1-token / empty / NULL
    docs = [" ".join(rng.choice(chains, size=6)) for _ in range(10)]
    docs += [" ".join(rng.choice(voc, size=24)) for _ in range(10)]
    docs += [" ".join(rng.choice([f"z{i}" for i in range(50)], size=24)) for _ in range(4)]
    docs += ["wa", "", None]
    pdf = pd.DataFrame({"doc_id": np.arange(len(docs)), "text": docs})
    mdf = pd.DataFrame({"doc_id": np.arange(len(model_texts)), "text": model_texts})
    con = duckdb.connect()
    con.register("documents", pdf)
    con.register("model", mdf)
    return pdf, spark.createDataFrame(pdf), spark.createDataFrame(mdf), con


def _spark_result(docs, model):
    return (
        selection.lm_perplexity(docs, model, order=ORDER, n_buckets=B)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_lm_perplexity_oracle_parity(corpus):
    pdf, docs, model, con = corpus
    got = _spark_result(docs, model)
    exp = (
        con.execute(selection.lm_perplexity_oracle_sql(order=ORDER, n_buckets=B))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(pdf)  # one row per input doc, degenerates included
    np.testing.assert_array_equal(
        got.doc_id.to_numpy(np.int64), exp.doc_id.to_numpy(np.int64)
    )
    np.testing.assert_array_equal(
        got.n_tokens.to_numpy(np.int64), exp.n_tokens.to_numpy(np.int64)
    )
    np.testing.assert_allclose(got.logprob, exp.logprob, atol=1e-9)
    np.testing.assert_allclose(
        got.ppl.astype(float), exp.ppl.astype(float), rtol=1e-9, equal_nan=True
    )


def test_lm_perplexity_separates_planted(corpus):
    _, docs, model, _ = corpus
    g = _spark_result(docs, model).set_index("doc_id").sort_index()
    # in-domain docs score strictly lower perplexity than shuffled-vocab
    # gibberish, which scores lower than unseen-vocabulary gibberish
    assert g.loc[0:9, "ppl"].max() < g.loc[10:19, "ppl"].min()
    assert g.loc[10:19, "ppl"].max() < g.loc[20:23, "ppl"].min()
    # 1-token doc: unigram-only scoring, exact closed form
    assert g.loc[24, "n_tokens"] == 1
    # token-less docs: (0, 0.0, NULL)
    for i in (25, 26):
        assert g.loc[i, "n_tokens"] == 0
        assert g.loc[i, "logprob"] == 0.0
        assert pd.isna(g.loc[i, "ppl"])


def test_lm_perplexity_unigram_closed_form(corpus):
    """The 1-token doc's score is the add-alpha unigram formula exactly."""
    _, docs, model, con = corpus
    g = _spark_result(docs, model).set_index("doc_id")
    mtok = con.execute(
        "SELECT count(*) FROM (SELECT unnest(regexp_extract_all(lower(text),"
        " '[a-z]+|[0-9]+')) FROM model)"
    ).fetchone()[0]
    cnt_wa = con.execute(
        "SELECT count(*) FROM (SELECT unnest(regexp_extract_all(lower(text),"
        " '[a-z]+|[0-9]+')) AS t FROM model) WHERE t = 'wa'"
    ).fetchone()[0]
    # bucket collisions are possible in principle but with 12 vocab words
    # and B=4096 the planted corpus has none; the closed form then holds
    alpha = 0.1
    expected = np.log((cnt_wa + alpha) / (mtok + alpha * B))
    np.testing.assert_allclose(g.loc[24, "logprob"], expected, atol=1e-9)


def test_lm_perplexity_plan_shape(corpus):
    """All 2*order-1 model lookups broadcast; the scored text never
    shuffles (no doc-side Exchange before the per-doc aggregate) and
    nothing falls back to Python."""
    _, docs, model, _ = corpus
    df = selection.lm_perplexity(docs, model, order=ORDER, n_buckets=B)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2 * ORDER - 1
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan


def test_lm_perplexity_validates_params(corpus):
    _, docs, model, _ = corpus
    with pytest.raises(ValueError):
        selection.lm_perplexity(docs, model, order=0)
    with pytest.raises(ValueError):
        selection.lm_perplexity(docs, model, n_buckets=0)
