"""Text extraction and text-analysis kernels.

The HTML->text extractor is the engine's per-row invariant surface: for
every ``url`` the extracted ``text`` must be byte-identical to the table's
``text`` column (BASELINE.json input_hint). Everything is a vectorized
pandas UDF (Arrow-batched); the pure-Python/NumPy cores are importable so
the pytest oracle exercises the same code on collected data.

Analysis operators (language-ID, quality scoring, token counting, rolling
fingerprints) are the training-data-pipeline additions the engine provides
beyond the reference (which has no text layer at all).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.DOTALL)
_GEO_RE = re.compile(rb'<meta name="geo" content="(-?\d+\.\d+);(-?\d+\.\d+)"')
_TS_RE = re.compile(rb'<meta name="warc-ts" content="([^"]+)"')
_TAG_RE = re.compile(rb"<[^>]+>")

# BPE-ish tokenizer: words, numbers, or single non-space symbols
_TOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

_STOPWORDS = frozenset(
    "the and with from they have this that los las con por para pero este esta "
    "les des une dans pour avec cette sont der die das und mit von nicht sind "
    "uma nao mais como dos das che per una del non sono alla het een van voor "
    "niet zijn maar".split()
)


def extract_text_bytes(html: bytes) -> str:
    """Extract article body text from html bytes; byte-identical contract.

    Falls back to stripping all tags when no <article> container exists
    (robustness for foreign corpora); the synthetic corpus always has one.
    """
    if html is None:
        return None
    m = _ARTICLE_RE.search(html)
    if m:
        return m.group(1).decode("utf-8", errors="replace")
    return _TAG_RE.sub(b" ", html).decode("utf-8", errors="replace").strip()


def parse_geotag_bytes(html: bytes) -> tuple[float, float]:
    if html is None:
        return (None, None)
    m = _GEO_RE.search(html)
    if not m:
        return (None, None)
    return (float(m.group(1)), float(m.group(2)))


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(extract_text_bytes)


_GEO_SCHEMA = T.StructType(
    [T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]
)


@F.pandas_udf(_GEO_SCHEMA)
def parse_geotag(html: pd.Series) -> pd.DataFrame:
    vals = html.map(parse_geotag_bytes)
    return pd.DataFrame({"lat": [v[0] for v in vals], "lon": [v[1] for v in vals]})


# ---------------------------------------------------------------- tokens

def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text) if text else []


@F.pandas_udf(T.IntegerType())
def token_count(text: pd.Series) -> pd.Series:
    return text.map(lambda t: len(tokenize(t))).astype("int32")


# ------------------------------------------------------------ language-ID

# character-bigram profiles per language are derived from the marker-word
# inventory; scoring = fraction of text bigrams present in each profile.
_LANG_MARKERS = {
    "en": "the and with from they have this that",
    "es": "los las con por para pero este esta",
    "fr": "les des une dans pour avec cette sont",
    "de": "der die das und mit von nicht sind",
    "pt": "uma com nao por mais como dos das",
    "it": "che per una con del non sono alla",
    "nl": "het een van voor met niet zijn maar",
}


def _profile(words: str) -> frozenset:
    grams = set()
    for w in words.split():
        w = f" {w} "
        grams.update(w[i : i + 2] for i in range(len(w) - 1))
    return frozenset(grams)


_LANG_PROFILES = {lang: _profile(words) for lang, words in _LANG_MARKERS.items()}


def langid_score(text: str) -> str:
    """N-gram-overlap language guess. Deterministic tie-break by lang name."""
    if not text:
        return "und"
    grams = set()
    for w in text.lower().split():
        w = f" {w} "
        grams.update(w[i : i + 2] for i in range(len(w) - 1))
    best_lang, best = "und", -1.0
    for lang in sorted(_LANG_PROFILES):
        p = _LANG_PROFILES[lang]
        score = len(grams & p) / max(len(p), 1)
        if score > best:
            best_lang, best = lang, score
    return best_lang if best > 0 else "und"


@F.pandas_udf(T.StringType())
def langid(text: pd.Series) -> pd.Series:
    return text.map(langid_score)


# ---------------------------------------------------------- quality score

def quality_features(text: str) -> tuple[int, float, float, float]:
    """(n_chars, punct_ratio, stopword_ratio, mean_word_len)."""
    if not text:
        return (0, 0.0, 0.0, 0.0)
    n = len(text)
    toks = tokenize(text)
    words = [t for t in toks if t.isalpha()]
    punct = sum(1 for t in toks if not t.isalnum())
    stop = sum(1 for w in words if w.lower() in _STOPWORDS)
    return (
        n,
        punct / max(len(toks), 1),
        stop / max(len(words), 1),
        sum(map(len, words)) / max(len(words), 1),
    )


def quality_score_value(text: str) -> float:
    """Composite [0,1] quality: length band + stopword presence - punct noise.

    Heuristic in the Gopher/C4-rule family (public recipes), deterministic.
    """
    n, punct, stop, mwl = quality_features(text)
    length_ok = min(n / 200.0, 1.0) * (1.0 if n < 20000 else 0.5)
    stop_ok = min(stop / 0.2, 1.0)
    punct_pen = max(0.0, 1.0 - 4.0 * punct)
    word_ok = 1.0 if 2.0 <= mwl <= 12.0 else 0.3
    return round(0.4 * length_ok + 0.3 * stop_ok + 0.2 * punct_pen + 0.1 * word_ok, 6)


@F.pandas_udf(T.DoubleType())
def quality_score(text: pd.Series) -> pd.Series:
    return text.map(quality_score_value).astype("float64")


# ----------------------------------------------------- fingerprint / hashes

_FP_MOD = (1 << 61) - 1
_FP_BASE = 1000003


def fingerprint64(text: str) -> int:
    """Rolling polynomial hash of the token stream (document fingerprint).

    Stable across executors/runs; int64 range (signed) for Spark/DuckDB parity.
    """
    h = 0
    for tok in tokenize(text):
        for b in tok.encode("utf-8"):
            h = (h * _FP_BASE + b + 1) % _FP_MOD
        h = (h * _FP_BASE + 0x1F) % _FP_MOD
    return h - _FP_MOD if h > _FP_MOD // 2 else h


@F.pandas_udf(T.LongType())
def fingerprint(text: pd.Series) -> pd.Series:
    return text.map(fingerprint64).astype("int64")


def shingles(text: str, k: int = 3) -> set:
    """k-word shingle set (token n-grams) for MinHash/Jaccard dedup."""
    toks = [t.lower() for t in tokenize(text) if t.isalnum()]
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
