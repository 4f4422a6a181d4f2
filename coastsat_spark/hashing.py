"""Deterministic vectorized hashing (splitmix64) used for data generation
and hash-ordered deterministic sampling.

The reference relies on unseeded ``np.random.choice`` for its class-balanced
subsample (``SDS_shoreline.py:498-500``) which is not reproducible; this
engine replaces every random draw with a pure function of (seed, index) so
any executor produces identical bytes for a given row id regardless of
partitioning (SURVEY.md §4.3).
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer. Input/output uint64 arrays."""
    z = (np.asarray(x, dtype=np.uint64) + _GOLDEN)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        z = z ^ (z >> np.uint64(31))
    return z


def hash_stream(index: np.ndarray, stream: int, seed: int = 42) -> np.ndarray:
    """Independent uint64 hash per (row index, named stream).

    Streams let one row draw many independent values (lat, lon, length, ...)
    without correlation.
    """
    idx = np.asarray(index, dtype=np.uint64)
    with np.errstate(over="ignore"):
        mixed = idx * np.uint64(SM_MUL) + np.uint64(stream) * _GOLDEN + np.uint64(seed)
    return splitmix64(mixed)


def uniform01(index: np.ndarray, stream: int, seed: int = 42) -> np.ndarray:
    """Deterministic uniform [0,1) doubles per (index, stream)."""
    return (hash_stream(index, stream, seed) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def normal(index: np.ndarray, stream: int, seed: int = 42) -> np.ndarray:
    """Deterministic standard-normal draws via Box-Muller on two streams."""
    u1 = uniform01(index, stream * 2 + 1, seed)
    u2 = uniform01(index, stream * 2 + 2, seed)
    u1 = np.clip(u1, 1e-12, 1.0)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


# ----------------------------------------------------------------------
# DuckDB SQL mirrors of the engine's 64-bit hash kernels.
#
# DuckDB UBIGINT arithmetic raises on overflow instead of wrapping, so
# every wrapping op routes through HUGEINT (signed 128-bit) split
# arithmetic — the same trick operators/multimodal.py introduced for the
# splitmix64 generator mirror (now imported from here). These emitters
# make the xxhash64-dependent operators (MinHash-LSH assignment /
# near-dup pairs, document fingerprints) relationally oracle-able: the
# oracle replays Spark's own XXH64 (spark XXH64.hashUnsafeBytes /
# hashLong, seed 42) bit-for-bit in SQL, then the numpy shingle/slot/band
# algebra on top of it.
#
# Emission style: a hash is a list of (column, expression) STEPS, nested
# one subselect per step by staged_sql() — a single flat expression would
# duplicate its argument ~4x per stage (rotl/xor reference their input
# twice) and blow up exponentially over a 40-stage chain.

U64 = 1 << 64
XXH_P1 = 0x9E3779B185EBCA87
XXH_P2 = 0xC2B2AE3D27D4EB4F
XXH_P3 = 0x165667B19E3779F9
XXH_P4 = 0x85EBCA77C2B2AE63
XXH_P5 = 0x27D4EB2F165667C5
SM_GOLDEN = 0x9E3779B97F4A7C15
SM_M1 = 0xBF58476D1CE4E5B9
SM_M2 = 0x94D049BB133111EB
# hash_stream's per-index multiplier (line ~38); exported so the SQL
# mirrors that hand-replicate hash_stream (multimodal payload generator,
# refined-crossings class stream) can't silently desynchronize from it
SM_MUL = 0x2545F4914F6CDD1D


def mulmod64_sql(expr: str, c: int) -> str:
    """``expr * c mod 2^64`` over UBIGINT, c a Python int constant:
    a*c = a*c_lo + ((a*c_hi mod 2^32) << 32)  (mod 2^64); every
    intermediate < 2^97 fits HUGEINT."""
    ch, cl = c >> 32, c & 0xFFFFFFFF
    return (
        f"CAST(((CAST({expr} AS HUGEINT) * {cl}) % {U64}"
        f" + ((CAST({expr} AS HUGEINT) * {ch}) % 4294967296) * 4294967296)"
        f" % {U64} AS UBIGINT)"
    )


def mulmod64_cols_sql(x: str, y: str) -> str:
    """``x * y mod 2^64`` where BOTH operands are UBIGINT expressions."""
    return (
        f"CAST(((CAST({x} AS HUGEINT) * ({y} & 4294967295)) % {U64}"
        f" + ((CAST({x} AS HUGEINT) * ({y} >> 32)) % 4294967296) * 4294967296)"
        f" % {U64} AS UBIGINT)"
    )


def addmod64_sql(expr: str, c: "int | str") -> str:
    """``expr + c mod 2^64`` (c: int constant or UBIGINT expression)."""
    return f"CAST((CAST({expr} AS HUGEINT) + {c}) % {U64} AS UBIGINT)"


def rotl64_sql(col: str, r: int) -> str:
    """Rotate-left on a UBIGINT COLUMN (referenced twice — pass a name)."""
    return f"({mulmod64_sql(col, 1 << r)} | ({col} >> {64 - r}))"


def u64_to_i64_sql(expr: str) -> str:
    """Reinterpret UBIGINT bits as signed BIGINT (two's complement)."""
    return (
        f"CAST(CASE WHEN {expr} >= 9223372036854775808 THEN"
        f" CAST({expr} AS HUGEINT) - {U64} ELSE CAST({expr} AS HUGEINT) END"
        f" AS BIGINT)"
    )


def staged_sql(inner: str, steps) -> str:
    """Nest one ``SELECT *, expr AS name`` layer per step over `inner`
    (a full SELECT statement). Later steps may reference earlier columns
    by name — linear text growth instead of exponential inlining."""
    sql = inner
    for name, expr in steps:
        sql = f"SELECT *, {expr} AS {name} FROM ({sql})"
    return sql


def splitmix64_steps(x_col: str, out: str, tag: str):
    """Steps computing splitmix64(x_col) (the hashing.splitmix64
    finalizer, +GOLDEN variant) into column `out`."""
    t = tag
    return [
        (f"{t}z0", addmod64_sql(x_col, SM_GOLDEN)),
        (f"{t}z1", mulmod64_sql(f"xor({t}z0, {t}z0 >> 30)", SM_M1)),
        (f"{t}z2", mulmod64_sql(f"xor({t}z1, {t}z1 >> 27)", SM_M2)),
        (out, f"xor({t}z2, {t}z2 >> 31)"),
    ]


def _xxh64_fmix_steps(h_col: str, out: str, tag: str):
    t = tag
    return [
        (f"{t}f1", f"xor({h_col}, {h_col} >> 33)"),
        (f"{t}f2", mulmod64_sql(f"{t}f1", XXH_P2)),
        (f"{t}f3", f"xor({t}f2, {t}f2 >> 29)"),
        (f"{t}f4", mulmod64_sql(f"{t}f3", XXH_P3)),
        (out, f"xor({t}f4, {t}f4 >> 32)"),
    ]


def xxh64_string_steps(tok_col: str, out: str, tag: str, seed: int = 42):
    """Steps computing Spark ``xxhash64(tok_col)`` (XXH64 seed 42 over
    UTF-8 bytes) for ASCII strings up to 31 bytes — the < one-stripe
    regime, fully unrolled: up to three 8-byte rounds, one optional
    4-byte round, up to three 1-byte rounds, avalanche. Longer or
    non-ASCII input yields NULL (visible oracle failure, never a wrong
    hash): the guard requires strlen == length (bytes == chars, i.e.
    pure ASCII — ascii()/substr() index by CHARACTER, so a multibyte
    string would otherwise hash code points instead of UTF-8 bytes and
    return a silently wrong value). The callers tokenize with
    '[a-z]+|[0-9]+' so the guard never fires in practice."""
    t = tag
    le_word = lambda off, nb: " + ".join(
        f"CAST(ascii(substr({tok_col}, {off + j + 1}, 1)) AS UBIGINT) * {1 << (8 * j)}"
        for j in range(nb)
    )
    steps = [
        (
            f"{t}ln",
            f"CASE WHEN length({tok_col}) <= 31"
            f" AND strlen({tok_col}) = length({tok_col})"
            f" THEN length({tok_col}) END",
        ),
        (f"{t}h0", addmod64_sql(f"{t}ln", (seed + XXH_P5) % U64)),
    ]
    h = f"{t}h0"
    for r in range(3):  # 8-byte rounds, active while ln >= 8*(r+1)
        steps += [
            (f"{t}w{r}", f"({le_word(8 * r, 8)})"),
            (f"{t}a{r}", mulmod64_sql(f"{t}w{r}", XXH_P2)),
            (f"{t}b{r}", rotl64_sql(f"{t}a{r}", 31)),
            (f"{t}c{r}", mulmod64_sql(f"{t}b{r}", XXH_P1)),
            (f"{t}d{r}", f"xor({h}, {t}c{r})"),
            (f"{t}e{r}", rotl64_sql(f"{t}d{r}", 27)),
            (f"{t}g{r}", addmod64_sql(mulmod64_sql(f"{t}e{r}", XXH_P1), XXH_P4)),
            (f"{t}h{r + 1}", f"CASE WHEN {t}ln >= {8 * (r + 1)} THEN {t}g{r} ELSE {h} END"),
        ]
        h = f"{t}h{r + 1}"
    # 4-byte round at offset 8*(ln//8), active when ln % 8 >= 4
    steps += [
        (f"{t}o4", f"(({t}ln // 8) * 8)"),
        (
            f"{t}w4",
            "(" + " + ".join(
                f"CAST(ascii(substr({tok_col}, {t}o4 + {j + 1}, 1)) AS UBIGINT) * {1 << (8 * j)}"
                for j in range(4)
            ) + ")",
        ),
        (f"{t}a4", f"xor({h}, {mulmod64_sql(f'{t}w4', XXH_P1)})"),
        (f"{t}b4", rotl64_sql(f"{t}a4", 23)),
        (f"{t}c4", addmod64_sql(mulmod64_sql(f"{t}b4", XXH_P2), XXH_P3)),
        (f"{t}h4", f"CASE WHEN {t}ln % 8 >= 4 THEN {t}c4 ELSE {h} END"),
        (f"{t}ob", f"({t}o4 + CASE WHEN {t}ln % 8 >= 4 THEN 4 ELSE 0 END)"),
    ]
    h = f"{t}h4"
    for b in range(3):  # 1-byte rounds, active while ln - ob > b
        steps += [
            (
                f"{t}p{b}",
                f"xor({h}, {mulmod64_sql(f'CAST(ascii(substr({tok_col}, {t}ob + {b + 1}, 1)) AS UBIGINT)', XXH_P5)})",
            ),
            (f"{t}q{b}", mulmod64_sql(rotl64_sql(f"{t}p{b}", 11), XXH_P1)),
            (f"{t}h{b + 5}", f"CASE WHEN {t}ln - {t}ob > {b} THEN {t}q{b} ELSE {h} END"),
        ]
        h = f"{t}h{b + 5}"
    return steps + _xxh64_fmix_steps(h, out, f"{t}x")


def xxh64_longs_chain_steps(cols, out: str, tag: str, seed: int = 42):
    """Steps computing Spark ``xxhash64(c0, c1, ...)`` over UBIGINT
    columns: h = hashLong(c_i, h) chained from the seed, exactly Spark's
    multi-argument XxHash64 (each value is one 8-byte block + avalanche,
    previous hash as the next seed)."""
    steps = [(f"{tag}s", f"CAST({seed} AS UBIGINT)")]
    h = f"{tag}s"
    for i, c in enumerate(cols):
        t = f"{tag}{i}"
        steps += [
            (f"{t}a", addmod64_sql(h, XXH_P5 + 8)),
            (f"{t}b", mulmod64_sql(c, XXH_P2)),
            (f"{t}c", rotl64_sql(f"{t}b", 31)),
            (f"{t}d", f"xor({t}a, {mulmod64_sql(f'{t}c', XXH_P1)})"),
            (f"{t}e", rotl64_sql(f"{t}d", 27)),
            (f"{t}g", addmod64_sql(mulmod64_sql(f"{t}e", XXH_P1), XXH_P4)),
        ]
        nxt = out if i == len(cols) - 1 else f"{t}h"
        steps += _xxh64_fmix_steps(f"{t}g", nxt, f"{t}x")
        h = nxt
    return steps
