"""Data-selection scoring: DSIR-style hashed n-gram importance weights.

`importance_weights` implements the scoring core of Data Selection via
Importance Resampling (DSIR, Xie et al. 2023): represent each document
by word n-grams (n = 1..`ngram`) hashed into `n_buckets` buckets, fit
two bag-of-buckets models — one on a TARGET corpus (the distribution
you want, e.g. curated text), one on the raw corpus itself as the
background — and score every document by its log importance ratio
sum_f [ ln p_target(bucket(f)) - ln p_background(bucket(f)) ], with
add-`alpha` smoothing on both models. Downstream selection (rank /
threshold / sample-proportional) composes with the existing top-k and
`mix_domains` machinery.

Scale shape: both models are bucket-count AGGREGATES — at most
`n_buckets` rows each (10^4 by default) regardless of corpus size — so
the merged weight table broadcasts; the scoring pass explodes documents
to 8-byte bucket ids (text never leaves the scan), broadcast-joins the
weight table, and map-side-combines the per-doc sum. Two scans of the
raw corpus total (one to fit the background, one to score); at 100 TB
fit the background on a hash-bounded sample instead (pass `background=`
explicitly — any DataFrame with the same text column, e.g.
`docs.filter(pmod(xxhash64(id), k) == 0)`), which is what DSIR itself
does. Everything is JVM built-ins; the DuckDB mirror replays the
xxhash64 chain digests bit-for-bit, so bucket assignment — and with it
every count — is engine-exact (the float log-sum matches to 1e-9).

No reference analog (CoastSat has no text layer); this extends the
LLM-pipeline family (`dedup.py`, `packing.py`, `functions/text.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _ngram_cte_sql, ngram_digest_expr, token_hashes_col, tokhash_cte_sql


def _doc_buckets(
    df: DataFrame, n_buckets: int, ngram: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, bucket) — one row per n-gram occurrence (n = 1..ngram),
    bucket = pmod(xxhash64-chain(window token hashes), n_buckets).
    Documents with zero tokens keep one NULL-bucket row (explode_outer)
    so scoring can return them with n_feat = 0."""
    th = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        token_hashes_col(text_col).alias("_th"),
    )
    allgrams = F.concat(
        *[ngram_digest_expr("_th", n) for n in range(1, ngram + 1)]
    )
    return th.select(
        "doc_id", F.explode_outer(allgrams).alias("_digest")
    ).select(
        "doc_id", F.pmod(F.col("_digest"), F.lit(int(n_buckets))).alias("bucket")
    )


def importance_weights(
    docs: DataFrame,
    target: DataFrame,
    background: DataFrame | None = None,
    n_buckets: int = 10_000,
    ngram: int = 2,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_text_col: str = "text",
) -> DataFrame:
    """Score every document in `docs` by its DSIR log importance ratio.

    Returns (doc_id, n_feat, logratio): feature count and
    sum over the doc's hashed n-grams of ln(p_t) - ln(p_b), where
    p_t(b) = (cnt_target(b) + alpha) / (T + alpha * n_buckets) and
    p_b likewise over `background` (default: `docs` itself). Token-less
    docs score (0, 0.0). Higher = more target-like.
    """
    if ngram < 1 or n_buckets < 1:
        raise ValueError("ngram and n_buckets must be >= 1")
    bg = background if background is not None else docs
    B = int(n_buckets)

    tgt = _doc_buckets(target, B, ngram, target_text_col, id_col)
    bgb = _doc_buckets(bg, B, ngram, text_col, id_col)
    tcnt = tgt.filter(F.col("bucket").isNotNull()).groupBy("bucket").agg(
        F.count("*").alias("cnt_t")
    )
    bcnt = bgb.filter(F.col("bucket").isNotNull()).groupBy("bucket").agg(
        F.count("*").alias("cnt_b")
    )
    totals = tcnt.agg(F.sum("cnt_t").alias("tot_t")).crossJoin(
        bcnt.agg(F.sum("cnt_b").alias("tot_b"))
    )
    # merged weight table: <= n_buckets rows however big the corpora are.
    # FULL outer so target-only buckets are scoreable too (a doc feature
    # always exists in the background when background=docs, but not when
    # the background is a sample).
    w = (
        bcnt.join(tcnt, "bucket", "full")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("cnt_t"), F.lit(0)) + F.lit(float(alpha)))
                    / (F.col("tot_t") + F.lit(float(alpha * B)))
                )
                - F.log(
                    (F.coalesce(F.col("cnt_b"), F.lit(0)) + F.lit(float(alpha)))
                    / (F.col("tot_b") + F.lit(float(alpha * B)))
                )
            ).alias("weight"),
        )
    )
    feats = _doc_buckets(docs, B, ngram, text_col, id_col)
    # a bucket absent from BOTH models (possible when `background` is a
    # sample rather than `docs` itself) still has the smoothed score
    # ln(a/(tot_t+aB)) - ln(a/(tot_b+aB)) = ln((tot_b+aB)/(tot_t+aB)),
    # not 0 — coalesce missing weights to that constant; NULL buckets
    # (token-less docs) contribute nothing
    aB = F.lit(float(alpha * B))
    unseen = F.log((F.col("tot_b") + aB) / (F.col("tot_t") + aB))
    contrib = F.when(F.col("bucket").isNull(), F.lit(0.0)).otherwise(
        F.coalesce(F.col("weight"), unseen)
    )
    return (
        feats.join(F.broadcast(w), "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("bucket").alias("n_feat"),
            F.coalesce(F.sum(contrib), F.lit(0.0)).alias("logratio"),
        )
    )


# ---------------------------------------------- Gopher-rules doc filter

# regexes shared verbatim by the Spark plan and the DuckDB mirror: both
# engines' regex dialects (java.util.regex / RE2) agree on these forms
_NWS_RE = r"[^ \t\n\r\f\v]+"          # a word = a non-whitespace run
_SYMBOL_RE = r"#|\.\.\.|…"       # Gopher's symbol set: '#' and ellipsis
_BULLET_RE = r"^[ \t]*[-*•‣▪]"
_ELLIPSIS_END_RE = r"(\.\.\.|…)[ \t]*$"
_GOPHER_STOPS = ("and", "be", "have", "of", "that", "the", "to", "with")


def gopher_rules(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-rule Gopher document-quality gate (Rae et al. 2021, App. A1.1)
    — the named rule-based web filter, distinct from the scalar
    `quality_score_col` composite. One row per doc:
    (doc_id, n_words, mean_word_len, r_word_count, r_mean_word_len,
    r_symbol_ratio, r_bullet_lines, r_ellipsis_lines, r_alpha_words,
    r_stopwords, keep) with keep = AND of all rule flags, so callers can
    either drop (`.filter("keep")`) or audit which rule fired.

    Rules (defaults = the published thresholds): word count in
    [min_words, max_words]; mean word length in [3, 10] (false for
    token-less docs); symbol-to-word ratio ('#' / '...' / U+2026)
    <= 0.1; <= 90% of lines start with a bullet; <= 30% of lines end in
    an ellipsis; >= 80% of words contain an alphabetic character;
    >= min_stopwords distinct Gopher stop words ({and, be, have, of,
    that, the, to, with}) present as whitespace words. Words are
    non-whitespace runs; ratio rules with a zero denominator hold
    vacuously (keep is still false via r_word_count). NULL text is
    scored like ''.

    Scale shape: ONE scan, zero shuffles, zero joins — every feature is
    a JVM regexp/array expression inside whole-stage codegen, so the
    filter runs at scan speed on 100 TB and composes with any
    downstream op. The DuckDB mirror shares the regex strings verbatim
    and replays counts exactly (rule flags are integer/double compares
    in the same operation order).
    """
    t = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col, F.lit("")
    )
    words = F.regexp_extract_all(t, F.lit(_NWS_RE), F.lit(0))
    lines = F.split(t, "\n", -1)
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(words).alias("n_words"),
        F.aggregate(
            words, F.lit(0), lambda a, w: a + F.length(w)
        ).alias("word_chars"),
        F.size(
            F.filter(words, lambda w: F.regexp_like(w, F.lit("[A-Za-z]")))
        ).alias("n_alpha_words"),
        F.size(F.regexp_extract_all(t, F.lit(_SYMBOL_RE), F.lit(0))).alias(
            "n_symbols"
        ),
        F.size(lines).alias("n_lines"),
        F.size(
            F.filter(lines, lambda l: F.regexp_like(l, F.lit(_BULLET_RE)))
        ).alias("n_bullet"),
        F.size(
            F.filter(
                lines, lambda l: F.regexp_like(l, F.lit(_ELLIPSIS_END_RE))
            )
        ).alias("n_ellipsis"),
        F.size(
            F.filter(
                F.array(*[F.lit(s) for s in _GOPHER_STOPS]),
                lambda s: F.array_contains(
                    F.transform(words, lambda w: F.lower(w)), s
                ),
            )
        ).alias("n_stop"),
    )
    nw = F.col("n_words").cast("double")
    rules = base.select(
        "doc_id",
        "n_words",
        F.round(
            F.col("word_chars") / F.greatest("n_words", F.lit(1)), 6
        ).alias("mean_word_len"),
        F.col("n_words").between(int(min_words), int(max_words)).alias(
            "r_word_count"
        ),
        (
            (F.col("n_words") > 0)
            & (F.col("word_chars") >= F.lit(float(min_mean_word_len)) * nw)
            & (F.col("word_chars") <= F.lit(float(max_mean_word_len)) * nw)
        ).alias("r_mean_word_len"),
        (F.col("n_symbols") <= F.lit(float(max_symbol_ratio)) * nw).alias(
            "r_symbol_ratio"
        ),
        (
            F.col("n_bullet")
            <= F.lit(float(max_bullet_frac)) * F.col("n_lines")
        ).alias("r_bullet_lines"),
        (
            F.col("n_ellipsis")
            <= F.lit(float(max_ellipsis_frac)) * F.col("n_lines")
        ).alias("r_ellipsis_lines"),
        (F.col("n_alpha_words") >= F.lit(float(min_alpha_frac)) * nw).alias(
            "r_alpha_words"
        ),
        (F.col("n_stop") >= int(min_stopwords)).alias("r_stopwords"),
    )
    flags = [c for c in rules.columns if c.startswith("r_")]
    keep_col = F.col(flags[0])
    for c in flags[1:]:
        keep_col = keep_col & F.col(c)
    return rules.withColumn("keep", keep_col)


def gopher_rules_oracle_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of `gopher_rules`: the identical regex strings,
    count algebra, and comparison operation order (integer counts vs
    threshold * denominator, so flags match exactly)."""
    stops = ", ".join(f"'{s}'" for s in _GOPHER_STOPS)
    return f"""
    WITH base AS (
      SELECT CAST({id_col} AS BIGINT) AS doc_id,
             len(words) AS n_words,
             coalesce(list_sum(list_transform(words, x -> length(x))), 0)
               AS word_chars,
             len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
               AS n_alpha_words,
             len(regexp_extract_all(t, '{_SYMBOL_RE}')) AS n_symbols,
             len(lines) AS n_lines,
             len(list_filter(lines, x -> regexp_matches(x, '{_BULLET_RE}')))
               AS n_bullet,
             len(list_filter(lines,
                 x -> regexp_matches(x, '{_ELLIPSIS_END_RE}'))) AS n_ellipsis,
             len(list_filter([{stops}],
                 s -> list_contains(list_transform(words, x -> lower(x)), s)))
               AS n_stop
      FROM (SELECT {id_col}, coalesce({text_col}, '') AS t,
                   regexp_extract_all(coalesce({text_col}, ''), '{_NWS_RE}')
                     AS words,
                   string_split(coalesce({text_col}, ''), chr(10)) AS lines
            FROM {table})),
    rules AS (
      SELECT doc_id, n_words,
             round(CAST(word_chars AS DOUBLE) / greatest(n_words, 1), 6)
               AS mean_word_len,
             n_words BETWEEN {int(min_words)} AND {int(max_words)}
               AS r_word_count,
             (n_words > 0
              AND word_chars >= {float(min_mean_word_len)!r} * CAST(n_words AS DOUBLE)
              AND word_chars <= {float(max_mean_word_len)!r} * CAST(n_words AS DOUBLE))
               AS r_mean_word_len,
             n_symbols <= {float(max_symbol_ratio)!r} * CAST(n_words AS DOUBLE)
               AS r_symbol_ratio,
             n_bullet <= {float(max_bullet_frac)!r} * n_lines AS r_bullet_lines,
             n_ellipsis <= {float(max_ellipsis_frac)!r} * n_lines
               AS r_ellipsis_lines,
             n_alpha_words >= {float(min_alpha_frac)!r} * CAST(n_words AS DOUBLE)
               AS r_alpha_words,
             n_stop >= {int(min_stopwords)} AS r_stopwords
      FROM base)
    SELECT *,
           (r_word_count AND r_mean_word_len AND r_symbol_ratio
            AND r_bullet_lines AND r_ellipsis_lines AND r_alpha_words
            AND r_stopwords) AS keep
    FROM rules"""


# ------------------------------------------------- URL blocklist filter

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^@/]*@)?([^/:?#]+)"


def filter_url_blocklist(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """Annotate documents against a domain blocklist with suffix
    semantics: a blocklist entry `b.com` blocks `b.com` and every
    subdomain (`a.b.com`), the standard URL-filter stage of
    Common-Crawl pipelines (C4/RefinedWeb-style blocklists). Returns
    one row per doc: (doc_id, host, blocked, matched_domain) with
    matched_domain the LONGEST (most specific) blocklist entry that
    matched, NULL when clean; compose with `.filter(~F.col("blocked"))`
    to drop. Malformed URLs (no scheme/host) yield host = '' and are
    never blocked — audit them separately.

    Scale shape: blocklists are 10^4-10^6 domains — broadcast; the doc
    side explodes each host into its <= label-count suffix chain
    (bounded, typically <= 5) of 8-byte-ish strings, broadcast-joins,
    and min-aggregates back to one row per doc. No shuffle of text or
    URLs beyond the per-doc aggregate; host parsing is one JVM regexp.
    """
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    d = docs.select(F.col(id_col).cast("long").alias("doc_id"), host.alias("host"))
    # suffix i (1-based) = labels i..n joined: i=1 is the full host, so
    # smaller i = longer match
    sufs = F.expr(
        "transform(sequence(1, size(split(host, '[.]'))),"
        " i -> struct(i AS rank, array_join(slice(split(host, '[.]'), i,"
        " size(split(host, '[.]')) - i + 1), '.') AS suffix))"
    )
    bl = blocklist.select(F.lower(F.col(domain_col)).alias("suffix")).distinct()
    hits = (
        d.select("doc_id", F.explode_outer(sufs).alias("s"))
        .select("doc_id", F.col("s.rank").alias("rank"), F.col("s.suffix").alias("suffix"))
        .join(F.broadcast(bl), "suffix", "inner")
        .groupBy("doc_id")
        .agg(F.min_by("suffix", "rank").alias("matched_domain"))
    )
    return (
        d.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "host",
            F.col("matched_domain").isNotNull().alias("blocked"),
            "matched_domain",
        )
    )


def filter_url_blocklist_oracle_sql(
    table: str = "documents",
    blocklist_table: str = "blocklist",
    url_col: str = "url",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> str:
    """DuckDB mirror of `filter_url_blocklist`: same host regexp, same
    1-based suffix chain (string_split + list slicing), same
    longest-match (min rank) semantics."""
    return f"""
    WITH d AS (
      SELECT CAST({id_col} AS BIGINT) AS doc_id,
             lower(coalesce(regexp_extract({url_col},
               '{_HOST_RE}', 1), '')) AS host
      FROM {table}),
    sufs AS (
      SELECT doc_id, g.i AS rank,
             array_to_string(list_slice(string_split(host, '.'), g.i,
               len(string_split(host, '.'))), '.') AS suffix
      FROM d, LATERAL (SELECT unnest(generate_series(1,
             len(string_split(host, '.')))) AS i) g),
    bl AS (SELECT DISTINCT lower({domain_col}) AS suffix FROM {blocklist_table}),
    hits AS (
      SELECT doc_id, min_by(suffix, rank) AS matched_domain
      FROM sufs JOIN bl USING (suffix) GROUP BY 1)
    SELECT d.doc_id, d.host,
           hits.matched_domain IS NOT NULL AS blocked,
           hits.matched_domain
    FROM d LEFT JOIN hits USING (doc_id)"""


def _feat_cte_sql(ngram: int, n_buckets: int, prefix: str) -> str:
    """CTE text from ``tokh`` to ``<prefix>feat(doc_id, bucket)`` — the
    union of the n = 1..ngram window-digest streams, bucketed with
    Spark's pmod semantics (digest reinterpreted as i64)."""
    from ..hashing import u64_to_i64_sql

    B = int(n_buckets)
    ctes, sels = [], []
    for n in range(1, ngram + 1):
        nm = f"{prefix}ng{n}"
        ctes.append(_ngram_cte_sql(n, name=nm))
        sels.append(
            f"SELECT doc_id, (({u64_to_i64_sql('digest')} % {B}) + {B}) % {B}"
            f" AS bucket FROM {nm}"
        )
    uni = " UNION ALL ".join(sels)
    return ",\n    ".join(ctes + [f"{prefix}feat AS ({uni})"])


# ----------------------------------------- hashed LM perplexity filter

def lm_perplexity(
    docs: DataFrame,
    model_docs: DataFrame,
    order: int = 3,
    n_buckets: int = 1 << 16,
    alpha: float = 0.1,
    backoff: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    model_text_col: str = "text",
) -> DataFrame:
    """Score documents by perplexity under a hashed n-gram LM with
    stupid backoff — the CCNet / RefinedWeb quality stage (KenLM role):
    train on a curated reference corpus, keep low-perplexity documents.

    Model: counts of order-1..`order` word-n-gram digests
    (Spark multi-arg xxhash64 chains, `ngram_digest_expr`) hashed into
    `n_buckets` buckets — at most order*n_buckets rows whatever the
    model-corpus size, so every lookup table broadcasts. Score of token
    i at order k (Brants et al. 2007 stupid backoff — scores, not
    normalized probabilities; bucket collisions can push a ratio above
    1, the standard hashed-LM artifact):

        S_k(i) = cnt_k(gram) / cnt_{k-1}(context)   if both buckets seen
               = backoff * S_{k-1}(i)               otherwise
        S_1(i) = (cnt_1(w_i) + alpha) / (N + alpha * n_buckets)

    Leading positions (i < order-1) score at order i+1 with no backoff
    penalty. Returns one row per input doc:
    (doc_id, n_tokens, logprob, ppl) with logprob = sum ln S,
    ppl = exp(-logprob / n_tokens); token-less docs -> (0, 0.0, NULL).

    Scale shape: ONE scan of the scored corpus (text never leaves the
    scan: positions explode to 8-byte bucket ids, 2*order-1 BROADCAST
    joins against <=n_buckets-row count tables, map-side-combined
    per-doc sum). The model fit is one scan + one (k, bucket) exchange
    of the MODEL corpus (the curated reference — small next to the
    corpus being filtered; its count branches share one exchange, which
    AQE reuse collapses). No reference analog (CoastSat has no text
    layer); composes with `importance_weights` / `mix_domains`.
    """
    if order < 1 or n_buckets < 1:
        raise ValueError("order and n_buckets must be >= 1")
    R, B = int(order), int(n_buckets)
    lam = F.lit(float(backoff))

    # -- model: every order's digest stream tagged (k, bucket), ONE pass
    th = model_docs.select(token_hashes_col(model_text_col).alias("_th"))

    # NB: the lambda must be unary — pyspark passes the array INDEX as a
    # second argument to any 2-parameter lambda, defaults included
    def _tag(kk):
        return lambda x: F.struct(
            F.lit(kk).alias("k"), F.pmod(x, F.lit(B)).alias("bucket")
        )

    tagged = F.concat(
        *[
            F.transform(ngram_digest_expr("_th", k), _tag(k))
            for k in range(1, R + 1)
        ]
    )
    cnt = (
        th.select(F.explode(tagged).alias("e"))
        .groupBy(F.col("e.k").alias("k"), F.col("e.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    tot1 = cnt.filter(F.col("k") == 1).agg(F.sum("cnt").alias("tot1"))

    # -- scored corpus: one scan, positions exploded to bucket ids only
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        token_hashes_col(text_col).alias("_th"),
    )
    d = d.select(
        "doc_id",
        *[ngram_digest_expr("_th", k).alias(f"_d{k}") for k in range(1, R + 1)],
    )
    pos = d.select(
        "doc_id",
        *[f"_d{k}" for k in range(1, R + 1)],
        F.posexplode_outer("_d1").alias("i", "g1"),
    )
    # gram of order k ending at token i starts at i-k+1 (0-based), i.e.
    # element_at index i-k+2 (1-based, guarded: only defined for
    # i >= k-1, and never past the array end); its context is the
    # (k-1)-gram ENDING at i-1 — the SAME index into _d{k-1}
    bucket_cols = [F.pmod(F.col("g1"), F.lit(B)).alias("b1")]
    for k in range(2, R + 1):
        at = f"CASE WHEN i >= {k - 1} THEN element_at(_d{k}, i - {k - 2}) END"
        ctx = f"CASE WHEN i >= {k - 1} THEN element_at(_d{k - 1}, i - {k - 2}) END"
        bucket_cols.append(F.pmod(F.expr(at), F.lit(B)).alias(f"b{k}"))
        bucket_cols.append(F.pmod(F.expr(ctx), F.lit(B)).alias(f"c{k}"))
    pos = pos.select("doc_id", "i", "g1", *bucket_cols)

    j = pos
    for k in range(1, R + 1):
        j = j.join(
            F.broadcast(
                cnt.filter(F.col("k") == k).select(
                    F.col("bucket").alias(f"b{k}"), F.col("cnt").alias(f"cnt_g{k}")
                )
            ),
            f"b{k}",
            "left",
        )
    for k in range(2, R + 1):
        j = j.join(
            F.broadcast(
                cnt.filter(F.col("k") == k - 1).select(
                    F.col("bucket").alias(f"c{k}"), F.col("cnt").alias(f"cnt_c{k}")
                )
            ),
            f"c{k}",
            "left",
        )
    j = j.crossJoin(F.broadcast(tot1))

    s = (F.coalesce(F.col("cnt_g1"), F.lit(0)) + F.lit(float(alpha))) / (
        F.col("tot1") + F.lit(float(alpha * B))
    )
    scores = [s]
    for k in range(2, R + 1):
        s = F.when(
            F.col(f"cnt_g{k}").isNotNull() & F.col(f"cnt_c{k}").isNotNull(),
            F.col(f"cnt_g{k}") / F.col(f"cnt_c{k}"),
        ).otherwise(lam * s)
        scores.append(s)
    score = scores[0]
    for k in range(2, R + 1):
        score = F.when(F.col("i") >= k - 1, scores[k - 1]).otherwise(score)

    res = (
        j.groupBy("doc_id")
        .agg(
            F.count("g1").alias("n_tokens"),
            F.coalesce(
                F.sum(F.when(F.col("g1").isNotNull(), F.log(score))), F.lit(0.0)
            ).alias("logprob"),
        )
        .withColumn(
            "ppl",
            F.when(
                F.col("n_tokens") > 0,
                F.exp(-F.col("logprob") / F.col("n_tokens")),
            ),
        )
    )
    return res


def lm_perplexity_oracle_sql(
    order: int = 3,
    n_buckets: int = 1 << 16,
    alpha: float = 0.1,
    backoff: float = 0.4,
    table: str = "documents",
    model_table: str = "model",
) -> str:
    """DuckDB mirror of `lm_perplexity`: identical tokenizer, bit-exact
    xxhash64 chain digests, the same pmod bucketing, backoff cascade,
    and log algebra (float sums match to ~1e-9)."""
    from ..hashing import u64_to_i64_sql

    R, B = int(order), int(n_buckets)
    a, lam = float(alpha), float(backoff)

    def bkt(expr: str) -> str:
        return f"(({u64_to_i64_sql(expr)} % {B}) + {B}) % {B}"

    ctes = [tokhash_cte_sql(model_table).replace("tokh AS", "mtokh AS", 1)]
    for k in range(1, R + 1):
        ctes.append(
            _ngram_cte_sql(k, name=f"mng{k}").replace(" FROM tokh ", " FROM mtokh ")
        )
        ctes.append(
            f"cnt{k} AS (SELECT {bkt('digest')} AS bucket, count(*) AS cnt"
            f" FROM mng{k} GROUP BY 1)"
        )
    ctes.append("tot AS (SELECT count(*) AS tot1 FROM mtokh)")
    ctes.append(tokhash_cte_sql(table))
    for k in range(1, R + 1):
        ctes.append(_ngram_cte_sql(k, name=f"dng{k}"))

    # one row per (doc, token position); gram/context digests of order k
    # come from the window STARTING at i-k+1, exactly the Spark indexing
    joins, sel = [], [f"p.doc_id, p.i, {bkt('p.digest')} AS b1"]
    for k in range(2, R + 1):
        joins.append(
            f"LEFT JOIN dng{k} g{k} ON g{k}.doc_id = p.doc_id"
            f" AND g{k}.pos0 = p.i - {k - 1}"
        )
        joins.append(
            f"LEFT JOIN dng{k - 1} x{k} ON x{k}.doc_id = p.doc_id"
            f" AND x{k}.pos0 = p.i - {k - 1}"
        )
        sel.append(f"{bkt(f'g{k}.digest')} AS b{k}")
        sel.append(f"{bkt(f'x{k}.digest')} AS c{k}")
    ctes.append(
        "pos AS (SELECT "
        + ",\n             ".join(sel)
        + "\n      FROM (SELECT doc_id, pos0 AS i, digest FROM dng1) p\n      "
        + "\n      ".join(joins)
        + ")"
    )

    cjoins = [f"LEFT JOIN cnt{k} cg{k} ON cg{k}.bucket = pos.b{k}" for k in range(1, R + 1)]
    cjoins += [
        f"LEFT JOIN cnt{k - 1} cc{k} ON cc{k}.bucket = pos.c{k}" for k in range(2, R + 1)
    ]
    s = f"(coalesce(cg1.cnt, 0) + {a}) / (tot1 + {a * B})"
    scores = [s]
    for k in range(2, R + 1):
        s = (
            f"CASE WHEN cg{k}.cnt IS NOT NULL AND cc{k}.cnt IS NOT NULL"
            f" THEN cg{k}.cnt * 1.0 / cc{k}.cnt ELSE {lam} * ({s}) END"
        )
        scores.append(s)
    score = scores[0]
    for k in range(2, R + 1):
        score = f"CASE WHEN pos.i >= {k - 1} THEN ({scores[k - 1]}) ELSE ({score}) END"

    ctes.append(
        f"scored AS (SELECT pos.doc_id, ln({score}) AS lp FROM pos\n      "
        + "\n      ".join(cjoins)
        + ", tot)"
    )
    ctes.append(
        "agg AS (SELECT doc_id, count(*) AS n_tokens, sum(lp) AS logprob"
        " FROM scored GROUP BY 1)"
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT d.doc_id,
           coalesce(agg.n_tokens, 0) AS n_tokens,
           coalesce(agg.logprob, 0.0) AS logprob,
           CASE WHEN agg.n_tokens > 0
                THEN exp(-agg.logprob / agg.n_tokens) END AS ppl
    FROM (SELECT CAST({table}.doc_id AS BIGINT) AS doc_id FROM {table}) d
    LEFT JOIN agg USING (doc_id)"""


def importance_weights_oracle_sql(
    n_buckets: int = 10_000,
    ngram: int = 2,
    alpha: float = 1.0,
    table: str = "documents",
    target_table: str = "target",
) -> str:
    """DuckDB mirror of `importance_weights` with background = `table`:
    identical tokenizer, bit-exact xxhash64 chain digests, the same
    pmod bucketing and add-alpha log-ratio algebra."""
    B = int(n_buckets)
    a = float(alpha)
    return f"""
    WITH {tokhash_cte_sql(table)},
    {_feat_cte_sql(ngram, B, "d")},
    {tokhash_cte_sql(target_table).replace("tokh AS", "ttokh AS", 1)},
    {_feat_cte_sql(ngram, B, "t").replace(" FROM tokh ", " FROM ttokh ")},
    tcnt AS (SELECT bucket, count(*) AS cnt_t FROM tfeat GROUP BY 1),
    bcnt AS (SELECT bucket, count(*) AS cnt_b FROM dfeat GROUP BY 1),
    tot AS (SELECT (SELECT sum(cnt_t) FROM tcnt) AS tot_t,
                   (SELECT sum(cnt_b) FROM bcnt) AS tot_b),
    w AS (
      SELECT coalesce(bcnt.bucket, tcnt.bucket) AS bucket,
             ln((coalesce(cnt_t, 0) + {a}) / (tot_t + {a * B}))
             - ln((coalesce(cnt_b, 0) + {a}) / (tot_b + {a * B})) AS weight
      FROM bcnt FULL JOIN tcnt ON bcnt.bucket = tcnt.bucket, tot)
    SELECT d.doc_id,
           count(w.bucket) AS n_feat,
           coalesce(sum(w.weight), 0.0) AS logratio
    FROM (SELECT CAST({table}.doc_id AS BIGINT) AS doc_id FROM {table}) d
    LEFT JOIN dfeat USING (doc_id)
    LEFT JOIN w ON w.bucket = dfeat.bucket
    GROUP BY 1"""


# ------------------------------------------------- holdout split

# common second-level public suffixes; hosts ending in one of these take
# three labels as the registrable domain (a pragmatic subset of the
# Public Suffix List — pass `two_level_suffixes` to extend)
_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "com.tr",
    "com.ar", "co.in", "co.za", "co.kr", "co.nz", "com.sg", "com.hk",
)


def holdout_split(
    docs: DataFrame,
    valid_frac: float = 0.01,
    seed: int = 42,
    url_col: str = "url",
    two_level_suffixes: tuple[str, ...] = _TWO_LEVEL_SUFFIXES,
) -> DataFrame:
    """Leakage-safe deterministic train/validation split: the split key
    is the REGISTRABLE DOMAIN (eTLD+1) of each document's URL, so every
    page of a site — including the near-duplicates and boilerplate
    shared across its pages — lands on the same side; a random per-doc
    split would leak templated content across the boundary and inflate
    validation scores.

    Appends (domain_key, split) to the input: split = 'valid' when
    pmod(xxhash64(domain_key, seed), 10^6) < valid_frac * 10^6, else
    'train' — stable under reruns, appends, and repartitioning (pure
    column arithmetic, no RNG state). Docs with unparseable URLs get
    domain_key = '' and split deterministically like any other key
    (audit them via domain_key = '').

    Registrable domain = last two host labels, or three when the host
    ends with a known second-level public suffix (`co.uk` etc.) —
    a pragmatic PSL subset; pass the full list for exact eTLD+1.

    Scale shape: one JVM regexp + label-slice per row, no shuffle, no
    Python — the split column is free at 100 TB and any downstream
    filter on it pushes into the scan. The bucket hash is
    xxhash64(domain_key || '#' || seed) — the seed folds into the
    hashed string so the DuckDB mirror replays it with the standard
    XXH64 string chain (`holdout_split_oracle_sql`).
    """
    if not 0.0 <= valid_frac <= 1.0:
        raise ValueError("valid_frac must be in [0, 1]")
    # NULL urls normalize to host '' exactly like malformed ones, so
    # domain_key is never NULL and the split is total
    host = F.lower(F.coalesce(F.regexp_extract(F.col(url_col), _HOST_RE, 1), F.lit("")))
    labels = F.split(host, r"[.]")
    n = F.size(labels)
    two = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    three = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    is_two_level = two.isin(*two_level_suffixes) & (n >= 3)
    domain_key = F.when(host == "", F.lit("")).otherwise(
        F.when(is_two_level, three).otherwise(two)
    )
    denom = 1_000_000
    bucket = F.pmod(
        F.xxhash64(F.concat(F.col("domain_key"), F.lit(f"#{int(seed)}"))),
        F.lit(denom),
    )
    return docs.withColumn("domain_key", domain_key).withColumn(
        "split",
        F.when(bucket < F.lit(int(round(valid_frac * denom))), F.lit("valid"))
        .otherwise(F.lit("train")),
    )


def holdout_split_oracle_sql(
    valid_frac: float = 0.01,
    seed: int = 42,
    table: str = "documents",
    url_col: str = "url",
    id_col: str = "doc_id",
    two_level_suffixes: tuple[str, ...] = _TWO_LEVEL_SUFFIXES,
) -> str:
    """DuckDB mirror of `holdout_split`: same host regexp, same
    label-slice registrable-domain rule, bit-exact Spark xxhash64 over
    the seed-folded string, same pmod bucket threshold. Returns
    (doc_id, domain_key, split)."""
    from ..hashing import staged_sql, u64_to_i64_sql, xxh64_string_steps

    sufs = ", ".join(f"'{s}'" for s in two_level_suffixes)
    denom = 1_000_000
    cut = int(round(float(valid_frac) * denom))
    inner = f"""
    SELECT doc_id, domain_key, domain_key || '#{int(seed)}' AS hs FROM (
      SELECT doc_id,
             CASE WHEN host = '' THEN ''
                  WHEN n >= 3 AND array_to_string(ls[greatest(n-1,1):n], '.')
                       IN ({sufs})
                  THEN array_to_string(ls[greatest(n-2,1):n], '.')
                  ELSE array_to_string(ls[greatest(n-1,1):n], '.')
             END AS domain_key
      FROM (
        SELECT doc_id, host, string_split(host, '.') AS ls,
               len(string_split(host, '.')) AS n
        FROM (
          SELECT CAST({id_col} AS BIGINT) AS doc_id,
                 lower(coalesce(regexp_extract({url_col},
                   '{_HOST_RE}', 1), '')) AS host
          FROM {table}))) """
    hashed = staged_sql(inner, xxh64_string_steps("hs", "h", "ho_"))
    hi = u64_to_i64_sql("h")
    return f"""
    SELECT doc_id, domain_key,
           CASE WHEN (({hi} % {denom}) + {denom}) % {denom} < {cut}
                THEN 'valid' ELSE 'train' END AS split
    FROM ({hashed})"""
