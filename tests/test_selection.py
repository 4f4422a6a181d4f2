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


@pytest.fixture(scope="module")
def urls(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(10),
            "url": [
                "https://spam.example/page",            # exact match
                "https://sub.spam.example/x?q=1",       # subdomain of entry
                "http://clean.org/a",                   # clean
                "https://deep.a.b.ads.net:8443/t",      # port + deep subdomain
                "https://user:pw@spam.example/auth",    # userinfo
                "HTTPS://SPAM.EXAMPLE/UPPER",           # scheme/host case
                "not-a-url",                            # malformed: no scheme
                "ftp://tracker.ads.net/f",              # other scheme
                "https://spamexample.com/",             # NOT a suffix match
                "https://x.specific.spam.example/",     # longest-match probe
            ],
        }
    )
    bl = pd.DataFrame(
        {"domain": ["spam.example", "ads.net", "Specific.SPAM.example"]}
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    con.register("blocklist", bl)
    return pdf, spark.createDataFrame(pdf), spark.createDataFrame(bl), con


def test_url_blocklist_oracle_parity(urls):
    pdf, docs, bl, con = urls
    got = (
        selection.filter_url_blocklist(docs, bl)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        con.execute(selection.filter_url_blocklist_oracle_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(pdf)
    np.testing.assert_array_equal(
        got.doc_id.to_numpy(np.int64), exp.doc_id.to_numpy(np.int64)
    )
    assert list(got.host) == list(exp.host)
    np.testing.assert_array_equal(got.blocked.to_numpy(bool), exp.blocked.to_numpy(bool))
    assert list(got.matched_domain.fillna("-")) == list(exp.matched_domain.fillna("-"))


def test_url_blocklist_semantics(urls):
    _, docs, bl, _ = urls
    g = (
        selection.filter_url_blocklist(docs, bl)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(g.loc[0, "blocked"]) and g.loc[0, "matched_domain"] == "spam.example"
    assert bool(g.loc[1, "blocked"]) and g.loc[1, "matched_domain"] == "spam.example"
    assert not bool(g.loc[2, "blocked"]) and g.loc[2, "matched_domain"] is None
    # port and deep subdomain still match the registrable suffix
    assert bool(g.loc[3, "blocked"]) and g.loc[3, "matched_domain"] == "ads.net"
    assert g.loc[3, "host"] == "deep.a.b.ads.net"
    # userinfo stripped; case-insensitive both sides
    assert bool(g.loc[4, "blocked"]) and g.loc[4, "host"] == "spam.example"
    assert bool(g.loc[5, "blocked"]) and g.loc[5, "host"] == "spam.example"
    # malformed URL: empty host, never blocked
    assert g.loc[6, "host"] == "" and not bool(g.loc[6, "blocked"])
    assert bool(g.loc[7, "blocked"])  # ftp scheme parses too
    # "spamexample.com" is NOT blocked by "spam.example" (label suffix,
    # not string suffix)
    assert not bool(g.loc[8, "blocked"])
    # longest (most specific) entry wins
    assert g.loc[9, "matched_domain"] == "specific.spam.example"


def test_importance_weights_unseen_bucket_constant(spark):
    """A bucket absent from BOTH models (sampled background) scores the
    smoothed constant ln((tot_b+aB)/(tot_t+aB)), not 0 (review fix)."""
    import math

    docs = spark.createDataFrame(
        [(0, "xray yankee zulu"), (1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string")
    background = docs.filter("doc_id >= 1")  # doc 0's tokens unseen anywhere
    g = (
        selection.importance_weights(
            docs, target, background=background, n_buckets=10_000, ngram=1
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    tot_t, tot_b, aB = 2, 5, 10_000.0
    expect = 3 * math.log((tot_b + aB) / (tot_t + aB))
    assert g.loc[0, "n_feat"] == 3
    np.testing.assert_allclose(g.loc[0, "logratio"], expect, rtol=1e-9)


# ------------------------------------------------- Gopher rule filter

_GOOD = (
    "The quick brown fox jumps over the lazy dog and then settles down "
    "beside the river with a contented sigh. "
) * 3  # ~60 words, fluent, stopword-rich


@pytest.fixture(scope="module")
def gopher_docs(spark):
    texts = [
        _GOOD,                                          # 0: passes everything
        "short text only",                              # 1: under min_words
        " ".join(["supercalifragilistic"] * 60),        # 2: mean word len > 10
        # 3: symbol-heavy — 8 stopword-ish words + 15 hash/ellipsis marks
        "the cat sat on of that mat be " + "# … ... # # " * 3,
        _GOOD + ("\n- bullet point" * 40) + "\nplain",  # 4: >90% bullet lines
        _GOOD + ("\ntrailing thought...\n" * 9) + "x",  # 5: ellipsis lines
        " ".join(["1234567"] * 60),                     # 6: no alpha words, no stopwords
        "",                                             # 7: empty
        None,                                           # 8: NULL
        _GOOD + "\n",                                   # 9: trailing newline edge
    ]
    pdf = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("documents", pdf)
    return pdf, spark.createDataFrame(pdf), con


def test_gopher_rules_oracle_parity(gopher_docs):
    pdf, docs, con = gopher_docs
    got = (
        selection.gopher_rules(docs, min_words=20)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        con.execute(selection.gopher_rules_oracle_sql(min_words=20))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(pdf)
    for c in got.columns:
        if c == "mean_word_len":
            np.testing.assert_allclose(got[c], exp[c], atol=0)
        else:
            np.testing.assert_array_equal(
                got[c].to_numpy(), exp[c].to_numpy(), err_msg=c
            )


def test_gopher_rules_semantics(gopher_docs):
    _, docs, _ = gopher_docs
    g = (
        selection.gopher_rules(docs, min_words=20)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(g.loc[0, "keep"])
    assert not bool(g.loc[1, "r_word_count"]) and not bool(g.loc[1, "keep"])
    assert not bool(g.loc[2, "r_mean_word_len"])
    assert not bool(g.loc[3, "r_symbol_ratio"])
    assert bool(g.loc[3, "r_stopwords"])  # planted stopwords still count
    assert not bool(g.loc[4, "r_bullet_lines"])
    assert not bool(g.loc[5, "r_ellipsis_lines"])
    assert not bool(g.loc[6, "r_alpha_words"]) and not bool(g.loc[6, "r_stopwords"])
    # empty and NULL behave identically: zero words, keep = false
    for d in (7, 8):
        assert g.loc[d, "n_words"] == 0 and not bool(g.loc[d, "keep"])
        assert bool(g.loc[d, "r_symbol_ratio"])  # vacuous ratios hold
    assert bool(g.loc[9, "keep"])  # trailing newline is harmless


def test_gopher_rules_plan_shape(gopher_docs):
    """One scan, no joins, no exchanges, no Python — the filter must run
    at scan speed."""
    _, docs, _ = gopher_docs
    df = selection.gopher_rules(docs)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    for op in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython"):
        assert op not in plan, op


def test_holdout_split_is_domain_keyed_and_deterministic(spark):
    rows = [
        (1, "https://news.example.com/a"),
        (2, "https://example.com/b"),          # same registrable domain as 1
        (3, "http://user@blog.example.com:8080/c?q=1"),  # auth/port/query stripped
        (4, "https://shop.widgets.co.uk/x"),   # two-level public suffix
        (5, "https://widgets.co.uk/y"),        # same eTLD+1 as 4
        (6, "https://other.org/z"),
        (7, "not a url"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = selection.holdout_split(df, valid_frac=0.5, seed=7).collect()
    got = {r["doc_id"]: (r["domain_key"], r["split"]) for r in out}
    # one registrable domain per site, subdomains collapse onto it
    assert got[1][0] == got[2][0] == got[3][0] == "example.com"
    assert got[4][0] == got[5][0] == "widgets.co.uk"
    assert got[6][0] == "other.org"
    assert got[7][0] == ""
    # leakage-safety: same domain -> same split, always
    assert got[1][1] == got[2][1] == got[3][1]
    assert got[4][1] == got[5][1]
    # determinism across invocations
    again = {
        r["doc_id"]: r["split"]
        for r in selection.holdout_split(df, valid_frac=0.5, seed=7).collect()
    }
    assert again == {d: s for d, (_, s) in got.items()}
    # seed changes can move domains between sides; fraction bounds hold
    assert all(s in ("train", "valid") for _, s in got.values())


def test_holdout_split_fraction_converges(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://site"), F.col("id"), F.lit(".com/p")).alias("url"),
    )
    out = selection.holdout_split(df, valid_frac=0.1, seed=3)
    frac = out.where("split = 'valid'").count() / 2000
    assert 0.06 < frac < 0.14  # 2000 independent domains, binomial bound
    # edge fractions
    assert selection.holdout_split(df, valid_frac=0.0).where("split='valid'").count() == 0
    assert selection.holdout_split(df, valid_frac=1.0).where("split='train'").count() == 0


def test_holdout_split_oracle_parity(spark):
    import duckdb as _dd

    urls = (
        [f"https://site{i}.com/page" for i in range(40)]
        + [f"https://sub{i}.site{i % 7}.co.uk/x" for i in range(20)]
        + ["not a url", "", None, "ftp://deep.a.b.c.d.example.com/f"]
    )
    pdf = pd.DataFrame({"doc_id": np.arange(len(urls)), "url": urls})
    got = (
        selection.holdout_split(
            spark.createDataFrame(pdf), valid_frac=0.37, seed=9
        )
        .select("doc_id", "domain_key", "split")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = _dd.connect()
    con.register("documents", pdf)
    exp = (
        con.execute(selection.holdout_split_oracle_sql(valid_frac=0.37, seed=9))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["domain_key"]) == list(exp["domain_key"])
    assert list(got["split"]) == list(exp["split"])
    # sanity: both engines split into both sides on this corpus
    assert {"train", "valid"} == set(got["split"])
