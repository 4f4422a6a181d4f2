"""Training-data assembly operators: sequence packing and domain mixing.

Two manifest-producing ops a 100 TB LLM-pretraining pipeline runs after
filtering/dedup and before tokenized-shard writing:

* `pack_sequences` — GPT-style sequence packing: lay the (deterministically
  shuffled) document stream end to end and cut fixed `ctx_len`-token
  training contexts, letting documents cross chunk boundaries (the
  standard pretraining concat-and-chunk, e.g. GPT-3 appendix B /
  T5 "packing"). Output is a PACKING MANIFEST — (shard, chunk_id,
  doc_id, token range, offset in chunk) — not the gathered tokens:
  at 100 TB the manifest is what you shuffle (ints only, text never
  moves); the token gather is a later doc_id-co-partitioned join that
  each shard writer runs locally.

* `mix_domains` — deterministic weighted up/down-sampling by a domain
  column (the "data mixing" step: epochs per source as in Llama /
  The Pile recipes). Weight w means floor(w) guaranteed copies plus one
  more with probability frac(w), decided by a doc_id-keyed hash — no
  RNG state, identical on every run/engine, and exact under retries.

Both are pure integer + xxhash64 algebra over JVM built-ins, so DuckDB
replays them bit-for-bit via `hashing.xxh64_longs_chain_steps` (the same
mirror the dedup oracle chain uses); no reference analog (CoastSat has
no text layer) — these extend the LLM-pipeline operator family
(`dedup.py`, `functions/text.py`).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# regexp_count, NOT size(regexp_extract_all(...)): the count is identical
# (same non-overlapping matches) but counting materializes no token-array
# — at 24M docs/32 threads the array allocation churn alone was the
# single biggest scaling drag on this op (measured: BENCH/scaling_pack*).
_TOKCOUNT = "regexp_count(lower({col}), '[a-z]+|[0-9]+')"


# ------------------------------------------------------ sequence packing

def pack_sequences(
    docs: DataFrame,
    ctx_len: int = 2048,
    n_shards: int = 8,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    len_col: str | None = None,
) -> DataFrame:
    """Pack documents into fixed `ctx_len`-token training contexts.

    Documents are hashed into `n_shards` independent streams, ordered
    within each stream by a doc_id-keyed hash (a deterministic shuffle —
    no RNG state, stable under retries), laid end to end, and cut every
    `ctx_len` tokens; a document may span consecutive chunks. Returns
    one row per (document × chunk it touches):

      shard, chunk_id, doc_id, n_tok, tok_from, tok_to, chunk_off

    with half-open in-document token range [tok_from, tok_to) landing at
    offset `chunk_off` of chunk `chunk_id` (chunk ids are global token
    offsets DIV ctx_len within the shard stream). Token-less / NULL-text
    docs are dropped. Pass `len_col` to pack by a precomputed token
    count (e.g. a real tokenizer's) instead of the regex word count.

    Scale shape: text never leaves the scan — only (doc_id, n_tok)
    pairs shuffle, once, on the shard key; the running offset is one
    window cumsum per shard (sorted by the 8-byte hash), and the
    chunk-range explode emits ceil(n_tok/ctx_len)+1 ≤ small rows per
    doc. `n_shards` bounds the per-task sort: size it so a shard's
    (doc_id, n_tok) pairs fit an executor (16 bytes/doc → even 10^9
    docs/shard is 16 GB; 10^12 docs at n_shards=4096 is ~4M docs/task).
    Chunks are independent across shards by construction, so downstream
    gather/write parallelism is exactly n_shards × local chunk order.
    """
    if ctx_len <= 0 or n_shards <= 0:
        raise ValueError("ctx_len and n_shards must be positive")
    n_tok = (
        F.col(len_col).cast("long")
        if len_col is not None
        else F.expr(_TOKCOUNT.format(col=text_col)).cast("long")
    )
    base = (
        docs.filter(F.col(text_col).isNotNull() if len_col is None else F.lit(True))
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            n_tok.alias("n_tok"),
        )
        .filter(F.col("n_tok") > 0)
        .withColumn(
            "_h", F.xxhash64(F.col("doc_id"), F.lit(int(seed)).cast("long"))
        )
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(int(n_shards))))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = base.withColumn(
        "off", F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    )
    L = int(ctx_len)
    ranged = offs.withColumn(
        "chunk_id",
        F.explode(F.expr(f"sequence(off DIV {L}, (off + n_tok - 1) DIV {L})")),
    )
    zero = F.lit(0).cast("long")
    return ranged.select(
        "shard",
        "chunk_id",
        "doc_id",
        "n_tok",
        F.greatest(zero, F.col("chunk_id") * L - F.col("off")).alias("tok_from"),
        F.least(
            F.col("n_tok"), (F.col("chunk_id") + 1) * L - F.col("off")
        ).alias("tok_to"),
        F.greatest(zero, F.col("off") - F.col("chunk_id") * L).alias("chunk_off"),
    )


def pack_sequences_oracle_sql(
    ctx_len: int = 2048,
    n_shards: int = 8,
    seed: int = 42,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of `pack_sequences`: identical tokenizer word count,
    bit-exact Spark xxhash64(doc_id, seed) via the longs-chain mirror
    (then reinterpreted as i64 so pmod and the ORDER BY sort the same
    way Spark sorts signed longs), same window cumsum and integer chunk
    algebra."""
    from ..hashing import staged_sql, u64_to_i64_sql, xxh64_longs_chain_steps

    L, N = int(ctx_len), int(n_shards)
    lens = f"""
      SELECT CAST({id_col} AS BIGINT) AS doc_id,
             CAST({id_col} AS UBIGINT) AS did,
             CAST({int(seed)} AS UBIGINT) AS sl,
             CAST(len(regexp_extract_all(lower({text_col}), '[a-z]+|[0-9]+')) AS BIGINT) AS n_tok
      FROM {table} WHERE {text_col} IS NOT NULL
    """
    hashed = staged_sql(lens, xxh64_longs_chain_steps(["did", "sl"], "hu", "pk"))
    return f"""
    WITH sharded AS (
      SELECT doc_id, n_tok,
             {u64_to_i64_sql('hu')} AS h,
             (({u64_to_i64_sql('hu')} % {N}) + {N}) % {N} AS shard
      FROM ({hashed}) WHERE n_tok > 0),
    offs AS (
      SELECT shard, doc_id, n_tok,
             CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
      FROM sharded)
    SELECT shard, g.chunk_id, doc_id, n_tok,
           greatest(0, g.chunk_id * {L} - off) AS tok_from,
           least(n_tok, (g.chunk_id + 1) * {L} - off) AS tok_to,
           greatest(0, off - g.chunk_id * {L}) AS chunk_off
    FROM offs, LATERAL (
      SELECT unnest(generate_series(off // {L}, (off + n_tok - 1) // {L})) AS chunk_id) g"""


# -------------------------------------------------------- domain mixing

_MIX_RESOLUTION = 1 << 20


def mix_domains(
    docs: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    seed: int = 9176,
    domain_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted up/down-sampling by domain (data mixing).

    `weights[domain] = w` asks for w epochs of that domain: every doc
    gets floor(w) guaranteed copies plus one more iff a doc_id-keyed
    hash fraction falls below frac(w) — so expected copies are exactly
    w, realized copies are reproducible across runs, engines, and
    task retries (no RNG state), and w=0 drops the domain. Domains
    absent from `weights` get `default_weight`. Returns one row per
    kept copy: (doc_id, domain, copy_idx) with copy_idx in [0,
    n_copies) — a sampling manifest; join back on doc_id (co-partitioned,
    text untouched here) to materialize.

    Scale shape: the weight table is a handful of rows — broadcast; the
    doc side projects (doc_id, domain) only, and the explode emits at
    most ceil(w) rows per doc with no shuffle at all (narrow plan:
    scan → broadcast-join → explode). The hash threshold is integer
    (frac scaled to 2^20), so the DuckDB mirror is bit-exact.
    """
    if default_weight < 0:
        raise ValueError("negative default_weight")
    rows = []
    for dom, wgt in weights.items():
        if wgt < 0:
            raise ValueError(f"negative weight for {dom!r}")
        rows.append((dom, int(math.floor(wgt)),
                     int(round((wgt - math.floor(wgt)) * _MIX_RESOLUTION))))
    dbase = int(math.floor(default_weight))
    dfrac = int(round((default_weight - dbase) * _MIX_RESOLUTION))
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        rows, "domain string, base long, frac_scaled long"
    ) if rows else None
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(domain_col).alias("domain"),
    )
    if wdf is not None:
        d = d.join(F.broadcast(wdf), "domain", "left")
    else:
        d = d.withColumn("base", F.lit(None).cast("long")).withColumn(
            "frac_scaled", F.lit(None).cast("long")
        )
    u = F.pmod(
        F.xxhash64(F.col("doc_id"), F.lit(int(seed)).cast("long")),
        F.lit(_MIX_RESOLUTION),
    )
    return (
        d.withColumn("_base", F.coalesce(F.col("base"), F.lit(dbase).cast("long")))
        .withColumn(
            "_frac", F.coalesce(F.col("frac_scaled"), F.lit(dfrac).cast("long"))
        )
        .withColumn(
            "n_copies",
            F.col("_base") + (u < F.col("_frac")).cast("long"),
        )
        .filter(F.col("n_copies") > 0)
        .withColumn("copy_idx", F.explode(F.expr("sequence(0, n_copies - 1)")))
        .select("doc_id", "domain", "copy_idx")
    )


def mix_domains_oracle_sql(
    weights: dict[str, float],
    default_weight: float = 1.0,
    seed: int = 9176,
    table: str = "documents",
    id_col: str = "doc_id",
    domain_col: str = "lang",
) -> str:
    """DuckDB mirror of `mix_domains`: the weight dict inlined as VALUES,
    the same bit-exact xxhash64(doc_id, seed) fraction, the same integer
    floor/frac algebra, generate_series for the copy explode."""
    from ..hashing import staged_sql, u64_to_i64_sql, xxh64_longs_chain_steps

    if default_weight < 0 or any(w < 0 for w in weights.values()):
        raise ValueError("negative weight")
    vals = ", ".join(
        f"('{dom}', {int(math.floor(w))}, "
        f"{int(round((w - math.floor(w)) * _MIX_RESOLUTION))})"
        for dom, w in weights.items()
    ) or "(NULL, NULL, NULL)"
    dbase = int(math.floor(default_weight))
    dfrac = int(round((default_weight - dbase) * _MIX_RESOLUTION))
    R = _MIX_RESOLUTION
    base = f"""
      SELECT CAST(d.{id_col} AS BIGINT) AS doc_id,
             CAST(d.{id_col} AS UBIGINT) AS did,
             CAST({int(seed)} AS UBIGINT) AS sl,
             d.{domain_col} AS domain,
             coalesce(w.base, {dbase}) AS base,
             coalesce(w.frac_scaled, {dfrac}) AS frac_scaled
      FROM {table} d
      LEFT JOIN (SELECT * FROM (VALUES {vals}) v(domain, base, frac_scaled)
                 WHERE domain IS NOT NULL) w ON w.domain = d.{domain_col}
    """
    hashed = staged_sql(base, xxh64_longs_chain_steps(["did", "sl"], "hu", "mx"))
    return f"""
    WITH copies AS (
      SELECT doc_id, domain,
             base + CASE WHEN (({u64_to_i64_sql('hu')} % {R}) + {R}) % {R}
                         < frac_scaled THEN 1 ELSE 0 END AS n_copies
      FROM ({hashed}))
    SELECT doc_id, domain, g.copy_idx
    FROM copies, LATERAL (
      SELECT unnest(generate_series(0, n_copies - 1)) AS copy_idx) g
    WHERE n_copies > 0"""
