"""Unigram-LM tokenizer: Viterbi determinism, trainer coverage,
distributed-vs-pure parity, OOV handling, and plan shape."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from coastsat_spark.operators import unigram


CORPUS = [
    (0, "low low low low low lower lower newest newest newest"),
    (1, "newest newest newest widest widest widest"),
    (2, "the newest low widest lower the the"),
    (3, ""),
    (4, None),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _py_word_counts():
    c = Counter()
    for _, t in CORPUS:
        c.update((t or "").split())
    return c


def test_viterbi_prefers_longer_piece_on_tie():
    logp = {"a": -1.0, "b": -1.0, "ab": -2.0}
    # [ab] and [a,b] both score -2.0; the longer last piece wins
    assert unigram._viterbi("ab", logp, 4) == ["ab"]
    # strictly better single piece always wins
    assert unigram._viterbi("ab", {"a": -1.0, "b": -1.0, "ab": -1.5}, 4) == ["ab"]
    # uncoverable char -> None
    assert unigram._viterbi("ax", logp, 4) is None


def test_train_ref_covers_chars_and_learns_pieces():
    wc = sorted(_py_word_counts().items(), key=lambda kv: (-kv[1], kv[0]))
    logp = unigram.unigram_train_ref(wc, vocab_size=40, max_piece_len=6)
    chars = {c for w, _ in wc for c in w}
    assert chars <= set(logp)  # coverage invariant
    # the dominant suffix 'est' (newest+widest, 9 occurrences) must be
    # representable better than char-by-char: some multi-char piece
    # containing 'es' survives the prune
    assert any(len(p) > 1 and "es" in p for p in logp)
    # probabilities normalize to <= 1 (log-probs all negative)
    assert all(lp < 0 for lp in logp.values())
    # every training word is encodable and roundtrips by concatenation
    for w, _ in wc:
        seg = unigram._viterbi(w, logp, 6)
        assert seg is not None and "".join(seg) == w


def test_spark_train_matches_ref(docs):
    logp, vocab = unigram.unigram_train(docs, vocab_size=40, max_piece_len=6)
    wc = sorted(_py_word_counts().items(), key=lambda kv: (-kv[1], kv[0]))
    want = unigram.unigram_train_ref(wc, 40, 0, 6, 4)
    assert logp == want
    rows = {r["token"]: (r["token_id"], r["logp"]) for r in vocab.collect()}
    assert set(rows) == set(want)
    # deterministic dense ids in (len, lex) order
    ids = [rows[t][0] for t in sorted(rows, key=lambda p: (len(p), p))]
    assert ids == list(range(len(rows)))


def test_encode_matches_per_word_viterbi(docs):
    logp, vocab = unigram.unigram_train(docs, vocab_size=40, max_piece_len=6)
    inv = {r["token"]: r["token_id"] for r in vocab.collect()}
    enc = unigram.unigram_encode(docs, vocab, max_piece_len=6)
    got = enc.toPandas().set_index("doc_id").sort_index()
    for doc_id, text in CORPUS:
        want = [
            inv[s]
            for w in (text or "").split()
            for s in unigram._viterbi(w, logp, 6)
        ]
        assert list(got.loc[doc_id, "token_ids"]) == want, doc_id
        assert got.loc[doc_id, "n_tokens"] == len(want)


def test_encode_oov_word_dropped_whole(docs, spark):
    _, vocab = unigram.unigram_train(docs, vocab_size=40, max_piece_len=6)
    probe = spark.createDataFrame(
        [(0, "low πlow low"), (1, "πππ")], "doc_id long, text string"
    )
    got = unigram.unigram_encode(probe, vocab, max_piece_len=6).toPandas()
    got = got.set_index("doc_id")
    # the π-bearing word drops WHOLE (no partial symbols), the rest stay
    inv = {r["token_id"]: r["token"] for r in vocab.collect()}
    words0 = "".join(inv[i] for i in got.loc[0, "token_ids"])
    assert words0 == "lowlow"
    assert got.loc[1, "n_tokens"] == 0 and list(got.loc[1, "token_ids"]) == []


def test_encode_plan_is_shuffle_free(docs):
    _, vocab = unigram.unigram_train(docs, vocab_size=40, max_piece_len=6)
    df = unigram.unigram_encode(docs, vocab, max_piece_len=6)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "MapInPandas" in plan
