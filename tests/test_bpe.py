"""BPE tokenizer train/encode: textbook behavior, distributed-vs-pure
parity, train/encode consistency, roundtrip, OOV, and plan shape."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from coastsat_spark.operators import bpe


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


def test_train_ref_textbook():
    """Sennrich's example: with words low/lower/newest/widest the most
    frequent pair is (e, s) from newest+widest."""
    wc = sorted(_py_word_counts().items(), key=lambda kv: (-kv[1], kv[0]))
    merges = bpe.bpe_train_ref(wc, 3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")  # es+t continues the 'est' suffix
    # merges exhaust gracefully: asking for far more than exist stops early
    tiny = bpe.bpe_train_ref([("ab", 1)], 100)
    assert len(tiny) <= 2  # a+b, ab+</w>


def test_spark_train_matches_ref(docs):
    """The distributed word-count path feeds the trainer exactly what a
    pure-Python Counter would."""
    merges, vocab = bpe.bpe_train(docs, n_merges=8)
    wc = sorted(_py_word_counts().items(), key=lambda kv: (-kv[1], kv[0]))
    assert merges == bpe.bpe_train_ref(wc, 8)
    v = {r["token"]: r["token_id"] for r in vocab.collect()}
    # vocab covers every char + every merged symbol + the EOW marker,
    # with deterministic dense ids
    assert v["</w>"] == 0
    assert sorted(v.values()) == list(range(len(v)))
    for a, b in merges:
        assert a + b in v


def test_encode_roundtrip_and_consistency(docs):
    merges, vocab = bpe.bpe_train(docs, n_merges=8)
    enc = bpe.bpe_encode(docs, merges, vocab).toPandas().set_index("doc_id").sort_index()
    inv = {r["token_id"]: r["token"] for r in vocab.collect()}
    for doc_id, text in CORPUS:
        toks = [inv[i] for i in enc.loc[doc_id, "token_ids"]]
        # every char was seen at training, so decode is exact: concatenate
        # and split at </w>
        words = "".join(toks).split("</w>")[:-1] if toks else []
        assert words == (text or "").split(), doc_id
        assert enc.loc[doc_id, "n_tokens"] == len(toks)
    # a trained word's encoding IS its trained segmentation: 'newest'
    # must come out as the merged 'est' suffix pieces, not raw chars
    segs = bpe.bpe_encode_word("newest", merges)
    assert "est" in "".join(segs) and len(segs) < len("newest") + 1


def test_encode_oov_chars_dropped(docs, spark):
    merges, vocab = bpe.bpe_train(docs, n_merges=4)
    probe = spark.createDataFrame(
        [(0, "low π∆ low"), (1, "πππ")], "doc_id long, text string"
    )
    enc = bpe.bpe_encode(probe, merges, vocab).toPandas().set_index("doc_id")
    inv = {r["token_id"]: r["token"] for r in vocab.collect()}
    # doc 0: the two 'low' words survive; the OOV word contributes only
    # its </w> marker (every other symbol unseen at train time)
    toks0 = "".join(inv[i] for i in enc.loc[0, "token_ids"])
    assert toks0.split("</w>")[:-1] == ["low", "", "low"]
    # doc 1: nothing but the marker
    assert [inv[i] for i in enc.loc[1, "token_ids"]] == ["</w>"]


def test_encode_strategies_agree(docs, spark):
    """via='map' (shuffle-free mapInPandas) and via='join' (distinct-word
    broadcast join) must produce identical token streams — including
    empty/None docs and OOV-heavy words."""
    merges, vocab = bpe.bpe_train(docs, n_merges=6)
    probe = spark.createDataFrame(
        [(0, "low π∆ low"), (1, "πππ"), (2, ""), (3, None), (4, "the widest newest")],
        "doc_id long, text string",
    )
    for src in (docs, probe):
        m = bpe.bpe_encode(src, merges, vocab, via="map").toPandas()
        j = bpe.bpe_encode(src, merges, vocab, via="join").toPandas()
        m = m.sort_values("doc_id").reset_index(drop=True)
        j = j.sort_values("doc_id").reset_index(drop=True)
        assert list(m["doc_id"]) == list(j["doc_id"])
        assert list(m["n_tokens"]) == list(j["n_tokens"])
        assert [list(a) for a in m["token_ids"]] == [list(a) for a in j["token_ids"]]


def test_encode_map_plan_is_shuffle_free(docs):
    """The default strategy must be a single mapInPandas pass: no
    Exchange, no join — the property that makes it scale N->4N."""
    merges, vocab = bpe.bpe_train(docs, n_merges=4)
    df = bpe.bpe_encode(docs, merges, vocab, via="map")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "MapInPandas" in plan


def test_encode_plan_shape(docs):
    """Corpus-sized joins are broadcast, and the only Python evaluation
    sits above the distinct-word aggregate (vocab-bounded), never on the
    exploded corpus stream."""
    merges, vocab = bpe.bpe_train(docs, n_merges=4)
    df = bpe.bpe_encode(docs, merges, vocab, via="join")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # exactly one Arrow-batched Python eval node (the per-distinct-word
    # encoder) — formatted explain prints each node twice (tree + detail)
    assert plan.count("ArrowEvalPython") == 2
    # it is fed by the distinct-word HashAggregate, not the raw scan: the
    # explain lists children before parents, so the aggregate precedes it
    agg_first = re.search(r"HashAggregate", plan)
    py = re.search(r"ArrowEvalPython", plan)
    assert agg_first and py and agg_first.start() < py.start()


def test_word_counts_cap_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "aa bb bb cc cc cc dd dd dd dd") for i in range(3)],
        "doc_id long, text string",
    )
    top2 = {r["word"]: r["cnt"] for r in bpe.word_counts(df, max_words=2).collect()}
    assert top2 == {"dd": 12, "cc": 9}


def test_vocab_tokens_deduped():
    """Two merge paths can yield the same string ((a,bc) vs (ab,c) ->
    'abc'); the vocab must keep one row per token or the encode join
    fans out."""
    toks = bpe.build_vocab_tokens(
        ["a", "b", "c"], [("a", "b"), ("b", "c"), ("ab", "c"), ("a", "bc")]
    )
    assert toks.count("abc") == 1
    assert len(toks) == len(set(toks))
    # rank order preserved for the survivors
    assert toks.index("ab") < toks.index("bc") < toks.index("abc")
