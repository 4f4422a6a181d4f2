"""Dual-engine checks for benchmark decontamination and duplicate-span
detection: Spark vs the bit-exact DuckDB xxhash64-chain mirrors, on a
planted corpus — the same rows+schema+values methodology the driver
correctness gate uses."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from coastsat_spark.operators import dedup


def _words(rng, vocab, n):
    return " ".join(rng.choice(vocab, size=n))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(77)
    vocab = [f"tok{chr(97 + i)}{chr(97 + j)}" for i in range(26) for j in range(12)]
    bench_texts = [_words(rng, vocab, 16) for _ in range(8)]
    texts = [_words(rng, vocab, 50) for _ in range(40)]
    # planted contamination: doc 40 embeds benchmark sentence 0 verbatim,
    # doc 41 shares exactly one 8-gram with benchmark sentence 1, doc 42
    # shares a 7-gram only (below the n=8 bar -> clean)
    texts.append(_words(rng, vocab, 10) + " " + bench_texts[0] + " " + _words(rng, vocab, 10))
    b1 = bench_texts[1].split()
    texts.append(_words(rng, vocab, 12) + " " + " ".join(b1[:8]) + " " + _words(rng, vocab, 12))
    texts.append(_words(rng, vocab, 12) + " " + " ".join(b1[:7]) + " " + _words(rng, vocab, 12))
    # planted duplicate span: docs 43 and 44 share a 20-token run mid-doc
    shared = _words(rng, vocab, 20)
    texts.append(_words(rng, vocab, 15) + " " + shared + " " + _words(rng, vocab, 9))
    texts.append(_words(rng, vocab, 5) + " " + shared + " " + _words(rng, vocab, 25))
    # planted WITHIN-doc repetition only: must NOT appear in duplicate_spans
    rep = _words(rng, vocab, 12)
    texts.append(rep + " " + _words(rng, vocab, 6) + " " + rep)
    # degenerate docs: empty text and a doc shorter than the window
    texts.append("")
    texts.append("tokaa tokbb tokcc")
    docs_pdf = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    bench_pdf = pd.DataFrame({"bench_id": np.arange(len(bench_texts)), "text": bench_texts})
    con = duckdb.connect()
    con.register("documents", docs_pdf)
    con.register("benchmark", bench_pdf)
    return (
        docs_pdf,
        bench_pdf,
        spark.createDataFrame(docs_pdf),
        spark.createDataFrame(bench_pdf),
        con,
    )


def test_decontaminate_oracle_parity(corpus):
    docs_pdf, bench_pdf, docs, bench, con = corpus
    got = (
        dedup.decontaminate(docs, bench, n=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        con.execute(dedup.decontaminate_oracle_sql(n=8))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(docs_pdf)
    for c in ("doc_id", "n_ngrams", "n_hit"):
        np.testing.assert_array_equal(got[c].to_numpy(np.int64), exp[c].to_numpy(np.int64))
    np.testing.assert_allclose(got["hit_frac"], exp["hit_frac"], atol=1e-12)
    np.testing.assert_array_equal(got["contaminated"], exp["contaminated"])


def test_decontaminate_planted(corpus):
    _, _, docs, bench, _ = corpus
    got = dedup.decontaminate(docs, bench, n=8).toPandas().set_index("doc_id").sort_index()
    # verbatim embed: all 9 8-grams of the 16-token benchmark sentence hit,
    # plus the overlap windows at the stitch points cannot hit (random
    # neighbors) -> n_hit == 9
    assert bool(got.loc[40, "contaminated"]) and got.loc[40, "n_hit"] == 9
    # exactly one shared 8-gram
    assert bool(got.loc[41, "contaminated"]) and got.loc[41, "n_hit"] == 1
    # 7-gram overlap is below the n=8 bar
    assert not bool(got.loc[42, "contaminated"]) and got.loc[42, "n_hit"] == 0
    # bulk corpus is clean; short/empty docs report zero windows
    assert not got.loc[:39, "contaminated"].any()
    assert got.loc[46, "n_ngrams"] == 0 and got.loc[47, "n_ngrams"] == 0
    assert got.loc[46, "hit_frac"] == 0.0


def test_duplicate_spans_oracle_parity(corpus):
    _, _, docs, _, con = corpus
    got = (
        dedup.duplicate_spans(docs, k=8)
        .toPandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    exp = (
        con.execute(dedup.duplicate_spans_oracle_sql(k=8))
        .df()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    for c in ("doc_id", "span_start", "span_end", "span_tokens"):
        np.testing.assert_array_equal(got[c].to_numpy(np.int64), exp[c].to_numpy(np.int64))


def test_duplicate_spans_planted(corpus):
    _, _, docs, _, _ = corpus
    got = dedup.duplicate_spans(docs, k=8).toPandas()
    # the shared 20-token run: doc 43 has it at tokens [15, 35), doc 44 at
    # [5, 25) — every k=8 window inside merges to ONE maximal span each
    d43 = got[got.doc_id == 43]
    d44 = got[got.doc_id == 44]
    assert len(d43) == 1 and len(d44) == 1
    assert (
        d43.iloc[0]["span_start"],
        d43.iloc[0]["span_end"],
        d43.iloc[0]["span_tokens"],
    ) == (15, 35, 20)
    assert (d44.iloc[0]["span_start"], d44.iloc[0]["span_end"]) == (5, 25)
    # within-doc repetition (doc 45) must not flag; the clean bulk neither
    assert not set(got.doc_id) & ({45} | set(range(40)))


def test_ngram_digest_matches_manual(spark):
    """ngram_digest_expr equals explicit xxhash64(th_i..th_{i+n-1}) calls."""
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["alpha beta gamma delta epsilon"]})
    )
    row = (
        df.withColumn("_th", dedup.token_hashes_col("text"))
        .select(
            dedup.ngram_digest_expr("_th", 3).alias("d"),
            F.expr(
                "array(xxhash64(_th[0], _th[1], _th[2]),"
                " xxhash64(_th[1], _th[2], _th[3]),"
                " xxhash64(_th[2], _th[3], _th[4]))"
            ).alias("m"),
        )
        .first()
    )
    assert row["d"] == row["m"] and len(row["d"]) == 3
