"""Bloom-filter seen-key dedup: the incremental-crawl membership stage.

A 100 TB crawl pipeline rarely re-deduplicates from scratch — it keeps a
compact sketch of every key (URL hash, document digest) already ingested
and drops re-crawled items on arrival. `bloom_build` aggregates a key
DataFrame into a Bloom bitmap stored AS a DataFrame of 64-bit words
(only non-zero words materialize), and `bloom_probe` tests a new batch
against it: no false negatives ever, false positives at the standard
(1 - e^{-kn/m})^k rate.

Scale shape: the bitmap build is one explode to (word, mask) pairs — k
rows of 16 bytes per key, never the key payload — and one
map-side-combined `bit_or` groupBy bounded by m/64 output rows. The
probe side explodes to k (word, bit) probes, BROADCAST-joins the bitmap
(m = 2^30 bits is a 128 MB table — the practical broadcast ceiling;
shard the join on `word` beyond that) and AND-reduces per key. All
probe positions are Spark `xxhash64(key, j)` chains, so the DuckDB
mirror replays every bit exactly (`hashing.xxh64_longs_chain_steps`).

Keys are LONGs: hash whatever identifies a document (url, digest) with
`F.xxhash64(...)` upstream — that keeps this operator payload-agnostic
and the sketch 8 bytes/key wide on the wire.

No reference analog (CoastSat has no text/crawl layer); extends the
LLM-pipeline dedup family (`dedup.py`: exact, MinHash, SimHash,
paragraph, span).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _check_params(m_bits: int, k_hashes: int) -> None:
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k_hashes < 1:
        raise ValueError("k_hashes must be >= 1")


def _probe_words(key_col: str, m_bits: int, k_hashes: int):
    """k (word, bit) probe positions for a long key column: position_j =
    pmod(xxhash64(key, j), m) — one JVM hash per probe, no 64-bit
    multiply that ANSI overflow checking would reject."""
    # the probe index MUST hash as a LONG: Spark xxhash64 hashes an int
    # literal as a 4-byte block, which the 8-byte-block SQL mirror
    # (xxh64_longs_chain_steps) cannot replay
    pos = [
        F.pmod(
            F.xxhash64(F.col(key_col), F.lit(j).cast("long")),
            F.lit(int(m_bits)),
        )
        for j in range(k_hashes)
    ]
    return [
        F.struct(
            (p / 64).cast("long").alias("word"),
            F.pmod(p, F.lit(64)).alias("bit"),
        )
        for p in pos
    ]


def bloom_build(
    keys: DataFrame,
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
    key_col: str = "key",
) -> DataFrame:
    """Aggregate a long-key DataFrame into Bloom bitmap rows
    (word: long, bits: long), word = bit-position div 64. Words with no
    bits set are absent (probe treats missing word as all-zero), so an
    empty key set yields an empty bitmap."""
    _check_params(m_bits, k_hashes)
    probes = F.array(*_probe_words(key_col, m_bits, k_hashes))
    return (
        keys.where(F.col(key_col).isNotNull())
        .select(F.explode(probes).alias("p"))
        .select(
            F.col("p.word").alias("word"),
            F.expr("shiftleft(1L, cast(p.bit as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    docs: DataFrame,
    bloom: DataFrame,
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
    key_col: str = "key",
    id_col: str = "doc_id",
) -> DataFrame:
    """Test each row's key against a `bloom_build` bitmap (built with
    the SAME m_bits/k_hashes). Returns one row per input row:
    (id, key, maybe_seen) — maybe_seen False is definitive (never a
    false negative); True is probabilistic. NULL keys probe nothing and
    return maybe_seen = false."""
    _check_params(m_bits, k_hashes)
    d = docs.select(
        F.col(id_col).cast("long").alias("_bp_id"),
        F.col(key_col).cast("long").alias("_bp_key"),
    )
    # NULL-guard the whole array: Spark's xxhash64 SKIPS null inputs
    # (xxhash64(NULL, j) == xxhash64(j)), so an unguarded NULL key would
    # probe real positions instead of returning the documented false
    probes = F.when(
        F.col("_bp_key").isNotNull(),
        F.array(*_probe_words("_bp_key", m_bits, k_hashes)),
    )
    ex = d.select(
        "_bp_id", "_bp_key", F.explode_outer(probes).alias("p")
    ).select(
        "_bp_id",
        "_bp_key",
        F.col("p.word").alias("word"),
        F.col("p.bit").alias("bit"),
    )
    # & 1, not % 2: shift-by-0 keeps the sign bit, and Spark's % takes
    # the dividend's sign (odd negative -> -1, not 1)
    hit = F.when(
        F.col("bits").isNotNull(),
        F.expr("(shiftrightunsigned(bits, cast(bit as int)) & 1) = 1"),
    ).otherwise(F.lit(False))
    return (
        ex.join(F.broadcast(bloom), "word", "left")
        .groupBy(F.col("_bp_id").alias(id_col), F.col("_bp_key").alias(key_col))
        .agg(
            F.coalesce(F.min(hit), F.lit(False)).alias("maybe_seen"),
        )
    )


# ---------------------------------------------------- DuckDB mirrors

def _u64_sql(expr: str) -> str:
    """Reinterpret signed BIGINT bits as UBIGINT (two's complement)."""
    return (
        f"CAST(CASE WHEN {expr} < 0 THEN CAST({expr} AS HUGEINT) +"
        f" 18446744073709551616 ELSE CAST({expr} AS HUGEINT) END AS UBIGINT)"
    )


def _pos_cte_sql(
    src: str, m_bits: int, k_hashes: int, key_col: str, extra: str = ""
) -> str:
    """CTE text ending in ``probes(<extra,> key, j, word, bit)`` — the
    bit-exact replay of `_probe_words` over `src`."""
    from ..hashing import staged_sql, u64_to_i64_sql, xxh64_longs_chain_steps

    m = int(m_bits)
    legs = []
    for j in range(k_hashes):
        inner = (
            f"SELECT {extra + ', ' if extra else ''}{key_col} AS key,"
            f" {j} AS j, {_u64_sql(key_col)} AS ku,"
            f" CAST({j} AS UBIGINT) AS ju FROM {src}"
            f" WHERE {key_col} IS NOT NULL"
        )
        hashed = staged_sql(inner, xxh64_longs_chain_steps(["ku", "ju"], "h", f"bl{j}_"))
        pos = f"(({u64_to_i64_sql('h')} % {m}) + {m}) % {m}"
        legs.append(
            f"SELECT {extra + ', ' if extra else ''}key, j,"
            f" ({pos}) // 64 AS word, ({pos}) % 64 AS bit FROM ({hashed})"
        )
    return "probes AS (" + " UNION ALL ".join(legs) + ")"


def bloom_build_oracle_sql(
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
    keys_table: str = "keys",
    key_col: str = "key",
) -> str:
    """DuckDB mirror of `bloom_build`: identical xxhash64 probe chain,
    identical word/bit split and two's-complement mask OR."""
    from ..hashing import u64_to_i64_sql

    mask = u64_to_i64_sql("CAST(1 AS UBIGINT) << CAST(bit AS INTEGER)")
    return f"""
    WITH {_pos_cte_sql(keys_table, m_bits, k_hashes, key_col)}
    SELECT word, bit_or({mask}) AS bits
    FROM probes GROUP BY 1"""


def bloom_probe_oracle_sql(
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
    keys_table: str = "keys",
    docs_table: str = "probe_docs",
    key_col: str = "key",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of `bloom_probe` against a bitmap built from
    `keys_table` — the full build+probe path in one statement."""
    build = bloom_build_oracle_sql(m_bits, k_hashes, keys_table, key_col)
    # strip the WITH so the build becomes a CTE of this statement
    build_ctes = build.split("WITH", 1)[1].rsplit("SELECT", 1)
    probe_src = (
        f"(SELECT CAST({id_col} AS BIGINT) AS _id,"
        f" CAST({key_col} AS BIGINT) AS key FROM {docs_table})"
    )
    return f"""
    WITH {build_ctes[0].strip().rstrip(",")},
    bloom AS (SELECT{build_ctes[1]}),
    {_pos_cte_sql(probe_src, m_bits, k_hashes, "key", extra="_id").replace("probes AS", "dprobes AS", 1)},
    hits AS (
      SELECT dp._id, dp.key,
             CASE WHEN b.bits IS NOT NULL THEN
               ({_u64_sql('b.bits')} >> CAST(dp.bit AS INTEGER)) % 2 = 1
             ELSE FALSE END AS hit
      FROM dprobes dp LEFT JOIN bloom b ON b.word = dp.word)
    SELECT d._id AS {id_col}, d.key AS {key_col},
           coalesce(agg.maybe_seen, FALSE) AS maybe_seen
    FROM {probe_src} d
    LEFT JOIN (SELECT _id, min(hit) AS maybe_seen FROM hits GROUP BY 1) agg
      ON agg._id = d._id"""
