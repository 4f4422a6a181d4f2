"""Deduplication operators for web-scale corpora (training-data pipeline).

These are additions beyond the reference's own surface (the driver brief
makes them first-class): exact, char-n-gram Jaccard, MinHash+LSH and
SimHash near-dup detection over a `documents(doc_id, text, ...)` table.

Scale design:
- exact dedup: one hash aggregate on the text digest (never shuffles the
  full text — group on sha2(text));
- n-gram Jaccard: explode distinct shingles -> self equi-join on shingle
  -> count agg. The shingle join is the classic inverted-index pattern;
  hot shingles are capped (document frequency cut) to bound skew, the
  same defense Common-Crawl dedup pipelines use;
- MinHash: K hash functions evaluated vectorized in one pandas UDF,
  banded into B buckets -> equi-join on (band, signature slice) so only
  bucket-colliding pairs are compared (LSH);
- SimHash: 64-bit fingerprint, near-dups = identical fingerprints per
  band table (hamming<=k via k-of-B band equality).

Every pair output is canonicalized doc_a < doc_b.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..hashing import splitmix64
from ..functions.text import tokenize

# ------------------------------------------------------------ exact dedup

def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: digest-groupBy, keep the smallest id as the
    canonical representative. Returns (doc_id, canonical_id, group_size).
    """
    d = docs.select(id_col, F.sha2(F.col(text_col), 256).alias("_digest"))
    g = d.groupBy("_digest").agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        d.join(g, "_digest")
        .select(id_col, "canonical_id", "group_size")
    )


# ----------------------------------------------------- char-n-gram Jaccard

def char_shingles(docs: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct character n-grams per doc, as a pure SQL expression
    (sequence + transform + explode) — DuckDB-oracle-expressible."""
    return docs.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)), "
                    f"i -> substring({text_col}, i, {n}))"
                )
            )
        ).alias("shingle"),
    ).filter(F.length("shingle") == n)


def jaccard_pairs(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.8,
    max_doc_freq: int | None = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by exact character-n-gram Jaccard >= threshold.

    Inverted-index self-join; `max_doc_freq` drops shingles appearing in
    more than that many docs (stop-shingles) — the standard skew guard;
    exactness note: dropping universal shingles can only *lower* measured
    similarity, so with max_doc_freq=None results are exact.
    """
    sh = char_shingles(docs, n, text_col, id_col).cache()
    if max_doc_freq is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_doc_freq)
        sh = sh.join(hot.select("shingle"), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )


# ------------------------------------------------------------ MinHash LSH

_MERSENNE = (1 << 61) - 1


def _stable_hash64(s: str) -> int:
    """Process-independent 64-bit string hash (Python's builtin hash() is
    salted per process — never use it executor-side)."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


def np_minhash(texts: "pd.Series", k: int, shingle_words: int = 3, seed: int = 42) -> np.ndarray:
    """(n_docs, k) uint64 MinHash signatures over word shingles.

    Universal-hash family h_i(x) = (a_i * x + b_i) mod p over stable
    shingle digests. Vectorized across the whole Arrow batch: digests are
    computed once per *unique* shingle, the (k x total_shingles) hash
    matrix is built in one shot, and per-doc minima come from
    np.minimum.reduceat over the flat shingle stream — no per-doc matmul.
    """
    rng_idx = np.arange(k, dtype=np.uint64)
    # per-slot salts; slot hash = splitmix64(digest ^ salt) — a full-avalanche
    # mixer with no integer modulo (numpy uint64 % is scalar-slow)
    salts = splitmix64(rng_idx + np.uint64(seed * 1000 + 1))
    n = len(texts)
    out = np.full((n, k), np.iinfo(np.uint64).max, dtype=np.uint64)

    # Shingle digests with NO per-doc numpy calls: one flat token-hash
    # stream for the whole batch, shingle digest = mix of `shingle_words`
    # shifted multiplies, cross-doc windows masked out. Tokens are hashed
    # once per unique token (cached blake2b). Per-doc np.unique is
    # skipped on purpose: min over a multiset equals min over its set,
    # so duplicate shingles cannot change a MinHash slot.
    token_cache: dict[str, int] = {}
    flat_tokens: list[int] = []
    lens = np.zeros(n, dtype=np.int64)
    for row, text in enumerate(texts):
        toks = [t.lower() for t in tokenize(text or "") if t.isalnum()]
        if not toks:
            continue
        if len(toks) < shingle_words:  # pad short docs to one full window
            toks = toks + [toks[-1]] * (shingle_words - len(toks))
        for t in toks:
            h = token_cache.get(t)
            if h is None:
                h = _stable_hash64(t)
                token_cache[t] = h
            flat_tokens.append(h)
        lens[row] = len(toks)
    if not flat_tokens:
        return out
    th = np.array(flat_tokens, dtype=np.uint64)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    w = shingle_words
    mix = splitmix64(np.arange(w, dtype=np.uint64) + np.uint64(seed * 77 + 5))
    with np.errstate(over="ignore"):
        dig_flat = sum(th[i : len(th) - w + 1 + i] * mix[i] for i in range(w))
    same_doc = doc_of[: len(th) - w + 1] == doc_of[w - 1 :]
    digests = splitmix64(dig_flat[same_doc])
    counts = np.maximum(lens - (w - 1), 0)
    nonempty = np.flatnonzero(counts)
    starts = np.concatenate(([0], np.cumsum(counts[nonempty])[:-1]))
    # one pass per slot keeps temporaries cache-resident (a (k, total)
    # matrix would churn hundreds of MB of temporaries per batch)
    for i in range(k):
        hv = splitmix64(digests ^ salts[i])
        out[nonempty, i] = np.minimum.reduceat(hv, starts)
    return out


def minhash_signatures(
    docs: DataFrame, k: int = 128, shingle_words: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per doc: (doc_id, sig array<long>) via a vectorized UDF."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def mh(texts: pd.Series) -> pd.Series:
        sig = np_minhash(texts, k, shingle_words).astype(np.int64)
        return pd.Series(list(sig))

    return docs.select(F.col(id_col), mh(F.col(text_col)).alias("sig"))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 32, id_col: str = "doc_id") -> DataFrame:
    """LSH banding: docs sharing any band slice become candidate pairs.

    Explode signatures into (band, slice-hash) keys, equi-join on the key.
    Returns distinct (id_a < id_b) candidates.
    """
    rows_per_band = (F.size("sig") / F.lit(bands)).cast("int")
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",", F.slice("sig", b * rows_per_band + 1, rows_per_band)
                        )
                    ).alias("bkey"),
                ),
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bkey")
    a = banded.toDF("id_a", "band", "bkey")
    b = banded.toDF("id_b", "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    k: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures -> banded candidates ->
    signature-estimated Jaccard >= threshold.

    Estimated Jaccard = fraction of equal signature slots (unbiased).
    """
    sigs = minhash_signatures(docs, k, text_col=text_col, id_col=id_col).cache()
    cand = lsh_candidate_pairs(sigs, bands, id_col=id_col)
    sa = sigs.toDF("id_a", "sig_a")
    sb = sigs.toDF("id_b", "sig_b")
    est = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / size(sig_a)"
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_dedup_assign(
    docs: DataFrame,
    k: int = 128,
    bands: int = 32,
    max_iters: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Scale path for MinHash dedup: canonical-id ASSIGNMENT instead of
    pair enumeration.

    Near-dup clusters make the pair set quadratic in cluster size (a
    600-doc template cluster is ~180k pairs); the assignment output is
    linear. Connected components over the bucket graph are computed by
    iterative min-label propagation (doc -> min over its buckets of the
    bucket's min label), converging in O(component diameter) rounds.

    Returns (doc_id, canonical_id) where canonical_id is the smallest
    doc id reachable through shared LSH buckets.
    """
    sigs = minhash_signatures(docs, k, text_col=text_col, id_col=id_col)
    rows_per_band = (F.size("sig") / F.lit(bands)).cast("int")
    buckets = sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice("sig", bnd * rows_per_band + 1, rows_per_band))
                    ).alias("bkey"),
                ),
            )
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bkey")

    # PRUNE: only buckets with >=2 docs carry dedup signal. In a web
    # corpus the vast majority of docs are unique, so this one aggregate
    # shrinks the iteration working set by an order of magnitude before
    # any label propagation happens.
    dup_buckets = (
        buckets.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .select("band", "bkey")
    )
    buckets = buckets.join(dup_buckets, ["band", "bkey"], "left_semi").persist()

    labels = buckets.select(id_col).distinct().withColumn("label", F.col(id_col)).persist()
    for it in range(max_iters):
        bucket_min = (
            buckets.join(labels, id_col)
            .groupBy("band", "bkey")
            .agg(F.min("label").alias("bmin"))
        )
        merged = (
            buckets.join(bucket_min, ["band", "bkey"])
            .groupBy(id_col)
            .agg(F.min("bmin").alias("label"))
            .persist()
        )
        changed = (
            merged.join(labels.withColumnRenamed("label", "old"), id_col)
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = merged
        if changed == 0:
            break
    buckets.unpersist()
    # docs never seen in a duplicate bucket are their own canonical
    all_ids = docs.select(F.col(id_col))
    out = all_ids.join(labels, id_col, "left").select(
        id_col, F.coalesce(F.col("label"), F.col(id_col)).alias("canonical_id")
    )
    return out


# ---------------------------------------------------------------- SimHash

def np_simhash(texts: "pd.Series", seed: int = 42) -> np.ndarray:
    """64-bit SimHash over token hashes (sign-aggregated bit votes)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    bitw = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for row, text in enumerate(texts):
        toks = [t.lower() for t in tokenize(text or "") if t.isalnum()]
        if not toks:
            continue
        hs = splitmix64(
            np.array([_stable_hash64(t) for t in toks], dtype=np.uint64) + np.uint64(seed)
        )
        bits = (hs[:, None] & bitw[None, :]) != 0
        votes = bits.sum(axis=0) * 2 - len(toks)
        out[row] = np.bitwise_or.reduce(bitw[votes > 0]) if (votes > 0).any() else np.uint64(0)
    return out


def simhash_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    @F.pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        return pd.Series(np_simhash(texts).astype(np.int64))

    return docs.select(F.col(id_col), sh(F.col(text_col)).alias("simhash"))


def simhash_dup_pairs(
    docs: DataFrame, max_hamming: int = 3, n_bands: int = 4, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole banding: split 64 bits into n_bands blocks; any pair within
    max_hamming (< n_bands) must share at least one exact block -> equi-join
    per block, then exact hamming refine via bit_count(xor).
    """
    fp = simhash_fingerprints(docs, text_col, id_col).cache()
    width = 64 // n_bands
    mask = (1 << width) - 1
    banded = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("block"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.block")
    a = banded.toDF("id_a", "sim_a", "band", "block")
    b = banded.toDF("id_b", "sim_b", "band", "block")
    return (
        a.join(b, ["band", "block"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
