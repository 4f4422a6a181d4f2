"""SQL XXH64 mirror vs Spark's xxhash64 — the foundation of the
DuckDB oracles for the hash-dependent dedup queries (minhash_assign,
neardup_pairs, fingerprints).

The emitters in coastsat_spark.hashing replay Spark's XXH64 (seed 42)
over HUGEINT split arithmetic; these tests pin them bit-for-bit against
the JVM on adversarial inputs (every tail length 0-31, every 8/4/1-byte
round combination, sign-bit-heavy longs), and the full-pipeline parity
is covered by tools/check_oracles.py (value-hash at sf0.01).
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from coastsat_spark import hashing as H


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_xxh64_string_sql_matches_spark_all_tail_lengths(spark, con):
    # every length 1..31 exercises a distinct (8-byte, 4-byte, 1-byte)
    # round combination; mixed alnum content breaks byte symmetry
    toks = ["abcdefghij0123456789klmnopqrstu"[:n] for n in range(1, 32)]
    toks += ["customer", "0", "9" * 19, "z" * 31]
    expected = {
        r["t"]: r["h"]
        for r in spark.createDataFrame([(t,) for t in toks], "t string")
        .select("t", F.xxhash64("t").alias("h"))
        .collect()
    }
    vals = ",".join(f"('{t}')" for t in toks)
    sql = H.staged_sql(
        f"SELECT tok FROM (VALUES {vals}) v(tok)",
        H.xxh64_string_steps("tok", "h", "x_"),
    )
    got = dict(con.execute(f"SELECT tok, {H.u64_to_i64_sql('h')} FROM ({sql})").fetchall())
    assert got == expected


def test_xxh64_string_sql_rejects_over_31_bytes(con):
    # >31 bytes would need the 4-lane stripe path the mirror does not
    # implement: the contract is NULL (loud oracle failure), never a
    # silently wrong hash
    sql = H.staged_sql(
        f"SELECT '{'a' * 32}' AS tok",
        H.xxh64_string_steps("tok", "h", "x_"),
    )
    assert con.execute(f"SELECT h FROM ({sql})").fetchone()[0] is None


def test_xxh64_longs_chain_sql_matches_spark(spark, con):
    rows = [
        (1, 2, 3, 4),
        (-1, -2, -3, -4),
        (2**63 - 1, -(2**63), 0, 42),
        (123456789123456789, -987654321987654321, 5, -5),
    ]
    expected = [
        r["h"]
        for r in spark.createDataFrame(rows, "a long, b long, c long, d long")
        .select(F.xxhash64("a", "b", "c", "d").alias("h"))
        .collect()
    ]
    u = lambda v: v % (1 << 64)
    vals = ",".join(
        f"({u(a)}::UBIGINT,{u(b)}::UBIGINT,{u(c)}::UBIGINT,{u(d)}::UBIGINT)"
        for a, b, c, d in rows
    )
    sql = H.staged_sql(
        f"SELECT * FROM (VALUES {vals}) v(c0,c1,c2,c3)",
        H.xxh64_longs_chain_steps(["c0", "c1", "c2", "c3"], "h", "L"),
    )
    got = [r[0] for r in con.execute(f"SELECT {H.u64_to_i64_sql('h')} FROM ({sql})").fetchall()]
    assert got == expected


def test_splitmix64_sql_matches_numpy(con):
    xs = [0, 1, 42, 2**64 - 1, 0xB00B5, 123456789123456789]
    vals = ",".join(f"({x}::UBIGINT)" for x in xs)
    sql = H.staged_sql(
        f"SELECT x FROM (VALUES {vals}) v(x)", H.splitmix64_steps("x", "h", "s_")
    )
    got = [int(r[0]) for r in con.execute(f"SELECT h FROM ({sql})").fetchall()]
    assert got == [int(v) for v in H.splitmix64(np.array(xs, dtype=np.uint64))]


def test_mulmod64_cols_sql_wraps(con):
    x, y = 0xDEADBEEFCAFEBABE, 0x9E3779B97F4A7C15
    got = con.execute(
        f"SELECT {H.mulmod64_cols_sql('x', 'y')} FROM (SELECT {x}::UBIGINT x, {y}::UBIGINT y)"
    ).fetchone()[0]
    assert int(got) == (x * y) % (1 << 64)
