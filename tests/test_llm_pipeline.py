"""End-to-end curation chain (plans/llm_pipeline.py): planted junk /
duplicate / contaminated docs die at the right stage, survivors flow
through the real tokenizer into token-exact packed contexts."""

import pytest
from pyspark.sql import functions as F

from coastsat_spark.plans import llm_pipeline


_PARAS = {
    # five genuinely distinct ~60-word paragraphs (shared vocabulary is
    # essentially just stopwords, so pairwise shingle Jaccard stays far
    # below the LSH collision band) that each clear every Gopher
    # default: enough words, mean word length in band, >=2 stopwords,
    # >80% alpha words, no bullets
    "alpha": (
        "the tide gauge network records water level fluctuations and barometric "
        "pressure with submerged sensors that technicians calibrate quarterly "
        "to separate storm surge from astronomical forcing while archived "
        "telemetry streams feed regional warning centres whose forecasts guide "
        "harbour masters pilots and ferry operators through dangerous spring "
        "conditions when onshore winds coincide with perigean high water and "
        "estuarine discharge peaks threaten low lying districts"
    ),
    "beta": (
        "field botanists mapped dune vegetation succession across transect "
        "quadrats and noted pioneer grasses binding mobile sand before woody "
        "shrubs established deeper roots with nitrogen fixing symbionts that "
        "enrich nutrient poor substrate allowing climax woodland to shade out "
        "early colonisers a progression the monitoring programme documents "
        "through repeat photography species inventories and soil cores "
        "collected every autumn since the restoration project began"
    ),
    "gamma": (
        "the harbour dredging schedule balances navigation depth requirements "
        "against turbidity limits imposed to protect adjacent seagrass meadows "
        "and juvenile fish nurseries with contractors operating silt curtains "
        "acoustic deterrents and real time monitoring buoys that suspend "
        "operations whenever suspended sediment concentrations exceed agreed "
        "thresholds a regime negotiated between port authorities fisheries "
        "representatives and environmental regulators after lengthy consultation"
    ),
    "delta": (
        "volunteers walking the strandline after winter gales catalogue "
        "driftwood plastic fragments and tar residues into a shared database "
        "that statisticians normalise by effort and beach length to derive "
        "pollution trends feeding municipal cleanup budgets and packaging "
        "legislation while schools adopt stretches of coastline for citizen "
        "science projects that combine debris surveys with microplastic "
        "sieving and photographic documentation of entangled wildlife"
    ),
    "epsilon": (
        "cliff retreat measurements from terrestrial laser scanning reveal "
        "episodic block failures concentrated where jointed mudstone overlies "
        "permeable sandstone and groundwater seepage lubricates bedding planes "
        "with failure volumes correlating against antecedent rainfall records "
        "kept by the observatory so planners can zone setback distances for "
        "clifftop development and schedule footpath diversions before winter "
        "storm cycles accelerate the erosion of vulnerable sections"
    ),
}


def _quality_text(seed_word: str) -> str:
    return _PARAS[seed_word]


CTX = 32


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, _quality_text("alpha")),
        (2, _quality_text("beta")),
        (3, _quality_text("gamma")),
        (4, _quality_text("delta")),
        # planted exact duplicate of doc 2: Jaccard 1.0, every LSH band
        # collides, cluster canonical = min(doc_id) = 2
        (5, _quality_text("beta")),
        # junk: fails the word-count rule
        (6, "too short to survive"),
        # contaminated: quality-passing but carries the benchmark 8-gram
        (
            7,
            _quality_text("epsilon")
            + " the withheld benchmark answer string appears verbatim right here",
        ),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame(
        [(0, "the withheld benchmark answer string appears verbatim right here")],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def result(corpus, bench_set):
    return llm_pipeline.curate_corpus(
        corpus,
        bench_set,
        ctx_len=CTX,
        n_shards=2,
        n_merges=40,
        train_sample_mod=1,  # tiny corpus: fit on every kept doc
        max_train_words=1000,
    )


def test_audit_verdicts(result):
    a = {r["doc_id"]: r.asDict() for r in result["audit"].collect()}
    assert set(a) == {1, 2, 3, 4, 5, 6, 7}
    # junk died at the gate and never reached dedup
    assert a[6]["keep_quality"] is False and a[6]["kept"] is False
    assert a[6]["is_canonical"] is None
    # the duplicate lost to its lower-id canonical
    assert a[2]["is_canonical"] is True and a[2]["kept"] is True
    assert a[5]["is_canonical"] is False and a[5]["kept"] is False
    # the contaminated doc passed gate+dedup but died at decontamination
    assert a[7]["keep_quality"] is True and a[7]["is_canonical"] is True
    assert a[7]["contaminated"] is True and a[7]["kept"] is False
    # clean survivors
    for d in (1, 3, 4):
        assert a[d]["kept"] is True, d


def test_kept_and_tokens_cover_exactly_the_survivors(result):
    kept_ids = {r["doc_id"] for r in result["kept"].select("doc_id").collect()}
    assert kept_ids == {1, 2, 3, 4}
    tok = {r["doc_id"]: r["n_tokens"] for r in result["tokens"].collect()}
    assert set(tok) == kept_ids
    assert all(n > 0 for n in tok.values())


def test_contexts_pack_real_token_counts(result):
    tok = {r["doc_id"]: r["n_tokens"] for r in result["tokens"].collect()}
    ctx = result["contexts"].collect()
    # every packed row's range is within its doc and within one chunk
    by_doc: dict[int, int] = {}
    for r in ctx:
        assert 0 <= r["tok_from"] < r["tok_to"] <= r["n_tok"]
        assert r["tok_to"] - r["tok_from"] <= CTX
        assert 0 <= r["chunk_off"] < CTX
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + (
            r["tok_to"] - r["tok_from"]
        )
        assert r["n_tok"] == tok[r["doc_id"]]
    # token-exact: every kept doc's tokens are fully placed, none lost
    assert by_doc == tok
    # chunks fill to CTX except each shard's tail chunk
    fill: dict[tuple, int] = {}
    for r in ctx:
        fill[(r["shard"], r["chunk_id"])] = fill.get(
            (r["shard"], r["chunk_id"]), 0
        ) + (r["tok_to"] - r["tok_from"])
    for shard in {s for s, _ in fill}:
        chunks = sorted(c for s, c in fill if s == shard)
        for c in chunks[:-1]:
            assert fill[(shard, c)] == CTX, (shard, c)
        assert 0 < fill[(shard, chunks[-1])] <= CTX


def test_no_benchmark_skips_decontamination(corpus):
    res = llm_pipeline.curate_corpus(
        corpus, None, ctx_len=CTX, n_shards=2, n_merges=20,
        train_sample_mod=1, max_train_words=500,
    )
    a = {r["doc_id"]: r.asDict() for r in res["audit"].collect()}
    # doc 7 now survives (nothing to collide with)
    assert a[7]["kept"] is True and a[7]["contaminated"] is None
    kept_ids = {r["doc_id"] for r in res["kept"].select("doc_id").collect()}
    assert kept_ids == {1, 2, 3, 4, 7}


def test_staged_resume_and_param_scoped_recompute(corpus, bench_set, spark, tmp_path_factory):
    import glob
    import os

    root = str(tmp_path_factory.mktemp("curate_ckpt"))
    kwargs = dict(
        benchmark=bench_set, root=root, ctx_len=CTX, n_shards=2,
        n_merges=40, train_sample_mod=1, max_train_words=1000,
    )
    res1 = llm_pipeline.curate_corpus_staged(spark, corpus, "fp1", **kwargs)
    kept1 = sorted(r["doc_id"] for r in res1["kept"].select("doc_id").collect())
    assert kept1 == [1, 2, 3, 4]
    tok1 = {r["doc_id"]: r["n_tokens"] for r in res1["tokens"].collect()}
    ctx1 = res1["contexts"].count()
    # lineage rows exist for every stage
    stages = {r["stage"] for r in res1["lineage"].select("stage").distinct().collect()}
    assert stages == {
        "curate_gate", "curate_dedup", "curate_clean",
        "curate_tok_model", "curate_tokens", "curate_pack",
    }

    markers = sorted(glob.glob(os.path.join(root, "*", "_ENGINE_COMPLETE")))
    assert len(markers) == 12  # 6 stages + 6 lineage tables
    mtimes = {m: os.path.getmtime(m) for m in markers}

    # resume: same fingerprint recomputes NOTHING and returns the same data
    res2 = llm_pipeline.curate_corpus_staged(spark, corpus, "fp1", **kwargs)
    assert {m: os.path.getmtime(m) for m in markers} == mtimes
    assert {r["doc_id"]: r["n_tokens"] for r in res2["tokens"].collect()} == tok1
    assert res2["contexts"].count() == ctx1

    # changing ctx_len recomputes ONLY the pack stage
    res3 = llm_pipeline.curate_corpus_staged(
        spark, corpus, "fp1", **{**kwargs, "ctx_len": CTX * 2}
    )
    assert {m: os.path.getmtime(m) for m in markers} == mtimes  # old ones untouched
    new_markers = sorted(glob.glob(os.path.join(root, "*", "_ENGINE_COMPLETE")))
    assert len(new_markers) == 14  # + new pack stage + its lineage
    # token placement still exact under the new ctx_len
    placed = {}
    for r in res3["contexts"].collect():
        placed[r["doc_id"]] = placed.get(r["doc_id"], 0) + (r["tok_to"] - r["tok_from"])
    assert placed == tok1


def test_url_blocklist_stage_kills_before_the_gate(spark, bench_set):
    rows = [
        (1, "https://ok.example.org/a", _quality_text("alpha")),
        (2, "https://spamfarm.biz/b", _quality_text("beta")),       # blocked
        (3, "https://sub.spamfarm.biz/c", _quality_text("gamma")),  # subdomain blocked
        (4, "https://fine.net/d", _quality_text("delta")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    bl = spark.createDataFrame([("spamfarm.biz",)], "domain string")
    res = llm_pipeline.curate_corpus(
        docs, bench_set, blocklist=bl, ctx_len=CTX, n_shards=2,
        n_merges=20, train_sample_mod=1, max_train_words=500,
    )
    a = {r["doc_id"]: r.asDict() for r in res["audit"].collect()}
    assert set(a) == {1, 2, 3, 4}
    for d in (2, 3):
        assert a[d]["url_blocked"] is True and a[d]["kept"] is False
        # killed before any text stage ran
        assert a[d]["keep_quality"] is None and a[d]["is_canonical"] is None
    for d in (1, 4):
        assert a[d]["url_blocked"] is False and a[d]["kept"] is True
    kept_ids = {r["doc_id"] for r in res["kept"].select("doc_id").collect()}
    assert kept_ids == {1, 4}


def test_unigram_tokenizer_variant(corpus, bench_set):
    res = llm_pipeline.curate_corpus(
        corpus, bench_set, ctx_len=CTX, n_shards=2, n_merges=60,
        train_sample_mod=1, max_train_words=1000, tokenizer="unigram",
    )
    kept_ids = {r["doc_id"] for r in res["kept"].select("doc_id").collect()}
    assert kept_ids == {1, 2, 3, 4}
    tok = {r["doc_id"]: r["n_tokens"] for r in res["tokens"].collect()}
    assert set(tok) == kept_ids and all(n > 0 for n in tok.values())
    # packing is token-exact under the unigram counts too
    placed: dict[int, int] = {}
    for r in res["contexts"].collect():
        placed[r["doc_id"]] = placed.get(r["doc_id"], 0) + (r["tok_to"] - r["tok_from"])
    assert placed == tok
    # vocab surface is tokenizer-agnostic
    assert res["vocab"].columns == ["token", "token_id"]
