"""Dual-engine checks for the Bloom-filter seen-key stage: Spark vs the
bit-exact DuckDB xxhash64 mirror, no-false-negative guarantee, false-
positive rate near theory, and plan shape."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from coastsat_spark.operators import bloom

M, K = 1 << 14, 5


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(3)
    seen = rng.choice(np.arange(10_000_000, dtype=np.int64), size=400, replace=False)
    # probe batch: 200 seen keys, 800 fresh keys, plus a NULL key
    fresh = np.arange(20_000_000, 20_000_800, dtype=np.int64)
    probe = pd.DataFrame(
        {
            "doc_id": np.arange(1001),
            "key": pd.array(
                list(seen[:200]) + list(fresh) + [None], dtype="Int64"
            ),
        }
    )
    keys = pd.DataFrame({"key": seen})
    con = duckdb.connect()
    con.register("keys", keys)
    con.register("probe_docs", probe)
    return keys, probe, spark.createDataFrame(keys), spark.createDataFrame(probe), con


def test_bloom_build_oracle_parity(data):
    keys, _, skeys, _, con = data
    got = (
        bloom.bloom_build(skeys, m_bits=M, k_hashes=K)
        .toPandas()
        .sort_values("word")
        .reset_index(drop=True)
    )
    exp = (
        con.execute(bloom.bloom_build_oracle_sql(m_bits=M, k_hashes=K))
        .df()
        .sort_values("word")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    np.testing.assert_array_equal(got.word.to_numpy(np.int64), exp.word.to_numpy(np.int64))
    np.testing.assert_array_equal(got.bits.to_numpy(np.int64), exp.bits.to_numpy(np.int64))


def test_bloom_probe_oracle_parity(data):
    _, probe, skeys, sprobe, con = data
    bm = bloom.bloom_build(skeys, m_bits=M, k_hashes=K)
    got = (
        bloom.bloom_probe(sprobe, bm, m_bits=M, k_hashes=K)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        con.execute(bloom.bloom_probe_oracle_sql(m_bits=M, k_hashes=K))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(probe)
    np.testing.assert_array_equal(
        got.doc_id.to_numpy(np.int64), exp.doc_id.to_numpy(np.int64)
    )
    np.testing.assert_array_equal(
        got.maybe_seen.to_numpy(bool), exp.maybe_seen.to_numpy(bool)
    )


def test_bloom_no_false_negatives_and_fpr(data):
    _, probe, skeys, sprobe, _ = data
    bm = bloom.bloom_build(skeys, m_bits=M, k_hashes=K)
    g = (
        bloom.bloom_probe(sprobe, bm, m_bits=M, k_hashes=K)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # every genuinely-seen key MUST report maybe_seen (no false negatives)
    assert g.loc[0:199, "maybe_seen"].all()
    # NULL key row: definitively unseen
    assert not g.loc[1000, "maybe_seen"]
    # false-positive rate on the 800 fresh keys near (1 - e^{-kn/m})^k
    fpr = g.loc[200:999, "maybe_seen"].mean()
    theory = (1 - math.exp(-K * 400 / M)) ** K
    assert fpr <= max(5 * theory, 0.02)


def test_bloom_probe_plan_shape(data):
    """The bitmap joins broadcast; nothing falls back to Python."""
    _, _, skeys, sprobe, _ = data
    bm = bloom.bloom_build(skeys, m_bits=M, k_hashes=K)
    df = bloom.bloom_probe(sprobe, bm, m_bits=M, k_hashes=K)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_bloom_validates_params(data):
    _, _, skeys, _, _ = data
    for bad_m, bad_k in ((63, 5), (0, 5), (128, 0)):
        with pytest.raises(ValueError):
            bloom.bloom_build(skeys, m_bits=bad_m, k_hashes=bad_k)


def test_bloom_empty_key_set(spark, data):
    """An empty key set yields an empty bitmap and all-false probes."""
    _, _, _, sprobe, _ = data
    empty = spark.createDataFrame([], "key long")
    bm = bloom.bloom_build(empty, m_bits=M, k_hashes=K)
    assert bm.count() == 0
    g = bloom.bloom_probe(sprobe, bm, m_bits=M, k_hashes=K).toPandas()
    assert not g.maybe_seen.any()
