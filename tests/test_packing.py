"""Dual-engine checks for sequence packing and domain mixing: Spark vs
the bit-exact DuckDB xxhash64 mirrors on a planted corpus (the driver
correctness-gate methodology: rows + schema + values), plus packing
invariants and plan-shape assertions."""

import re

import duckdb
import numpy as np
import pandas as pd
import pytest

from coastsat_spark.operators import packing

CTX = 64


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(5)
    vocab = [f"w{chr(97 + i)}{chr(97 + j)}" for i in range(20) for j in range(10)]
    texts = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(0, 120, size=80)
    ]
    # degenerate rows: empty text, NULL text, a one-token doc, and a doc
    # longer than several contexts (must span >2 chunks)
    texts += ["", None, "single", " ".join(rng.choice(vocab, size=3 * CTX + 7))]
    doms = rng.choice(["en", "fr", "de", "xx"], size=len(texts))
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(texts)), "text": texts, "lang": doms}
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    return pdf, spark.createDataFrame(pdf), con


def test_pack_sequences_oracle_parity(corpus):
    _, docs, con = corpus
    key = ["shard", "chunk_id", "chunk_off"]
    got = (
        packing.pack_sequences(docs, ctx_len=CTX, n_shards=4)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    exp = (
        con.execute(packing.pack_sequences_oracle_sql(ctx_len=CTX, n_shards=4))
        .df()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp) > 0
    for c in got.columns:
        np.testing.assert_array_equal(
            got[c].to_numpy(np.int64), exp[c].to_numpy(np.int64), err_msg=c
        )


def test_pack_sequences_invariants(corpus):
    pdf, docs, _ = corpus
    got = packing.pack_sequences(docs, ctx_len=CTX, n_shards=4).toPandas()
    # every chunk except each shard's last is filled to exactly ctx_len
    fill = got.groupby(["shard", "chunk_id"]).apply(
        lambda g: int((g.tok_to - g.tok_from).sum()), include_groups=False
    )
    last = got.groupby("shard")["chunk_id"].max()
    for (sh, ch), f in fill.items():
        assert f == CTX or ch == last[sh], (sh, ch, f)
    # segments tile each chunk contiguously from offset 0
    for (sh, ch), g in got.groupby(["shard", "chunk_id"]):
        pos = 0
        for _, r in g.sort_values("chunk_off").iterrows():
            assert r.chunk_off == pos
            pos += r.tok_to - r.tok_from
    # each doc's segments cover [0, n_tok) contiguously, chunk ids consecutive
    for did, g in got.groupby("doc_id"):
        g = g.sort_values("tok_from")
        assert g.tok_from.iloc[0] == 0 and g.tok_to.iloc[-1] == g.n_tok.iloc[0]
        assert (g.tok_from.values[1:] == g.tok_to.values[:-1]).all()
        assert (np.diff(g.chunk_id.values) == 1).all()
    # the 3*CTX+7-token doc spans >= 4 chunks; empty/NULL docs are dropped
    big = int(pdf.loc[pdf.text.str.len().fillna(0).idxmax(), "doc_id"])
    assert (got.doc_id == big).sum() >= 4
    empties = set(pdf.loc[pdf.text.isna() | (pdf.text == ""), "doc_id"])
    assert not (set(got.doc_id) & empties)
    # deterministic: a second run is byte-identical
    again = packing.pack_sequences(docs, ctx_len=CTX, n_shards=4).toPandas()
    key = ["shard", "chunk_id", "chunk_off"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        again.sort_values(key).reset_index(drop=True),
    )


def test_pack_sequences_precomputed_len(corpus, spark):
    """len_col packs by the provided count, no tokenizer involved."""
    pdf = pd.DataFrame({"doc_id": np.arange(6), "n_bpe": [10, 70, 64, 1, 3, 128]})
    got = packing.pack_sequences(
        spark.createDataFrame(pdf), ctx_len=CTX, n_shards=1, len_col="n_bpe"
    ).toPandas()
    assert int((got.tok_to - got.tok_from).sum()) == int(pdf.n_bpe.sum())
    assert set(got.doc_id) == set(pdf.doc_id)


def test_pack_sequences_single_exchange(corpus):
    """Text never shuffles: one Exchange (the shard hash partition) in the
    whole plan, and no Python evaluation anywhere."""
    _, docs, _ = corpus
    df = packing.pack_sequences(docs, ctx_len=CTX, n_shards=4)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:3000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mix_domains_oracle_parity(corpus):
    _, docs, con = corpus
    W = {"en": 2.5, "fr": 0.5, "de": 0.0}
    key = ["doc_id", "copy_idx"]
    got = (
        packing.mix_domains(docs, W, default_weight=1.0)
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    exp = (
        con.execute(packing.mix_domains_oracle_sql(W, default_weight=1.0))
        .df()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp) > 0
    for c in ("doc_id", "copy_idx"):
        np.testing.assert_array_equal(
            got[c].to_numpy(np.int64), exp[c].to_numpy(np.int64), err_msg=c
        )
    assert list(got.domain) == list(exp.domain)


def test_mix_domains_planted(corpus):
    pdf, docs, _ = corpus
    got = packing.mix_domains(
        docs, {"en": 2.5, "fr": 0.5, "de": 0.0, "xx": 3.0}, default_weight=1.0
    ).toPandas()
    cnt = got.groupby("doc_id").size()
    dom = pdf.set_index("doc_id")["lang"]
    # w=0 drops the domain entirely
    assert not (dom[cnt.index] == "de").any()
    # integer weight -> exactly w copies, copy_idx dense [0, w)
    xx = cnt[dom[cnt.index] == "xx"]
    assert (xx == 3).all() and len(xx) == (dom == "xx").sum()
    gxx = got[got.doc_id.isin(xx.index)]
    assert set(gxx.groupby("doc_id")["copy_idx"].apply(tuple)) == {(0, 1, 2)}
    # fractional weight -> floor or floor+1 copies, never more
    en = cnt[dom[cnt.index] == "en"]
    assert set(en.unique()) <= {2, 3}
    fr = cnt[dom[cnt.index] == "fr"]
    assert (fr == 1).all() and len(fr) < (dom == "fr").sum()
    # negative weight rejected
    with pytest.raises(ValueError):
        packing.mix_domains(docs, {"en": -1.0})


def test_mix_domains_no_shuffle(corpus):
    """Narrow plan: broadcast weight join + explode, zero Exchange other
    than the BroadcastExchange of the tiny weight table."""
    _, docs, _ = corpus
    df = packing.mix_domains(docs, {"en": 2.5, "fr": 0.5})
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastExchange" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan[:3000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mix_domains_negative_default_rejected(corpus):
    _, docs, _ = corpus
    with pytest.raises(ValueError, match="negative"):
        packing.mix_domains(docs, {"en": 1.0}, default_weight=-0.5)
    with pytest.raises(ValueError, match="negative"):
        packing.mix_domains_oracle_sql({"en": 1.0}, default_weight=-0.5)
