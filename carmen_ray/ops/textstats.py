"""Text-analysis operators over a documents table (doc_id, text, ...).

Large-scale training-data pipeline stages: token counting, quality
scoring, language ID, document fingerprinting. All are stateless
vectorized map_batches stages; language ID compiles its n-gram profiles
once per actor (callable class → actor pool).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WS_SPLIT = re.compile(r"\s+")
_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "for", "on", "with")


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace word count + BPE-ish subtoken count per row.

    Columns: doc_id, n_words, n_tokens. The n_words definition matches
    the SQL oracle exactly: non-empty splits on \\s+.
    """
    texts = batch[text_col].to_pylist()
    n_words = np.fromiter(
        (sum(1 for w in _WS_SPLIT.split(t) if w) if t else 0 for t in texts),
        dtype=np.int64, count=len(texts),
    )
    n_tokens = np.fromiter(
        (len(_BPEISH.findall(t)) if t else 0 for t in texts),
        dtype=np.int64, count=len(texts),
    )
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(n_words),
        "n_tokens": pa.array(n_tokens),
    })


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring features: n_chars, n_words, alpha_ratio,
    stop_ratio, mean_word_len, quality (0..1 composite).

    Float math ordered to match the SQL oracle; quality rounded to 6
    places on both sides.
    """
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_chars = np.zeros(n, dtype=np.int64)
    n_words = np.zeros(n, dtype=np.int64)
    n_alpha = np.zeros(n, dtype=np.int64)
    n_stop = np.zeros(n, dtype=np.int64)
    sum_word_len = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        n_chars[i] = len(t)
        words = [w for w in _WS_SPLIT.split(t) if w]
        n_words[i] = len(words)
        n_alpha[i] = sum(1 for c in t if ("a" <= c <= "z") or ("A" <= c <= "Z"))
        lowered = [w.lower() for w in words]
        n_stop[i] = sum(1 for w in lowered if w in STOPWORDS)
        sum_word_len[i] = sum(len(w) for w in words)

    with np.errstate(divide="ignore", invalid="ignore"):
        alpha_ratio = np.where(n_chars > 0, n_alpha / np.maximum(n_chars, 1), 0.0)
        stop_ratio = np.where(n_words > 0, n_stop / np.maximum(n_words, 1), 0.0)
        mean_word_len = np.where(n_words > 0, sum_word_len / np.maximum(n_words, 1), 0.0)
    # composite: favors prose-like docs (some stopwords, mostly alpha,
    # word lengths near 5); mirrors C4/Gopher-style heuristics
    quality = (
        0.4 * alpha_ratio
        + 0.3 * np.minimum(stop_ratio * 5.0, 1.0)
        + 0.3 * np.exp(-np.abs(mean_word_len - 5.0) / 5.0)
    )
    def round6(a):
        # half-up like DuckDB's round() (numpy rounds half-even)
        return np.floor(a * 1e6 + 0.5) / 1e6

    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pa.array(n_chars),
        "n_words": pa.array(n_words),
        "alpha_ratio": pa.array(round6(alpha_ratio)),
        "stop_ratio": pa.array(round6(stop_ratio)),
        "quality": pa.array(round6(quality)),
    })


class LangId:
    """Character n-gram language classifier (actor-pool stage).

    Profiles compile once per actor in __init__; __call__ scores a batch.
    Tiny trigram profiles for the language codes the synthetic corpus
    uses; unknown → 'und'. Heuristic by design (no external models in
    this environment); exactly mirrored in SQL (queries.SQL_LANG_ID is
    generated from PROFILES) so the driver hash-checks it.
    """

    PROFILES = {
        "en": ("the", "and", "ing", "ion", "ent", "her", "for", "tha", "nth", "int"),
        "de": ("der", "die", "und", "den", "ein", "sch", "ich", "cht", "ung", "gen"),
        "fr": ("les", "de ", "ent", "ion", "des", "que", "ait", "lle", "our", "ans"),
        "es": ("de ", "la ", "que", "el ", "en ", "ión", "los", "ado", "con", "est"),
        "it": ("di ", "che", "la ", "il ", "to ", "re ", "con", "ion", "del", "per"),
    }

    def __init__(self):
        self.profiles = {
            lang: {g: 10 - i for i, g in enumerate(grams)}
            for lang, grams in self.PROFILES.items()
        }

    def classify(self, text: str) -> str:
        if not text:
            return "und"
        t = text.lower()
        best_lang, best_score = "und", 0
        for lang, grams in self.profiles.items():
            score = sum(w * t.count(g) for g, w in grams.items())
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [self.classify(t) for t in batch["text"].to_pylist()]
        return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text", window: int = 64) -> pa.Table:
    """Rolling-hash document fingerprint: FNV-1a over the normalized text
    plus a winnowed min-hash of `window`-char rolling hashes (Rabin-Karp
    base 257 mod 2^61-1). Columns: doc_id, fp64, winnow_min."""
    from ..util.hashing import fnv1a_64

    MOD = (1 << 61) - 1
    BASE = 257
    texts = batch[text_col].to_pylist()
    fp = np.zeros(len(texts), dtype=np.uint64)
    winnow = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        norm = " ".join(_WS_SPLIT.split(t.lower())).strip() if t else ""
        fp[i] = fnv1a_64(norm)
        if len(norm) < window:
            winnow[i] = fp[i]
            continue
        h = 0
        pw = pow(BASE, window - 1, MOD)
        mn = MOD
        data = norm.encode("utf-8", "ignore")
        w = min(window, len(data))
        for j, b in enumerate(data):
            if j >= w:
                h = (h - data[j - w] * pw) % MOD
            h = (h * BASE + b) % MOD
            if j >= w - 1 and h < mn:
                mn = h
        winnow[i] = mn
    return pa.table({
        "doc_id": batch["doc_id"],
        "fp64": pa.array(fp, type=pa.uint64()),
        "winnow_min": pa.array(winnow, type=pa.uint64()),
    })
