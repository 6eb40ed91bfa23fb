"""Text analysis over the documents table: token counting, quality scoring,
language-ID, document fingerprinting (training-data pipeline operators).

All per-batch transforms are pandas/numpy-vectorized where the kernel allows
and pinned to SQL-expressible definitions so the DuckDB oracle can verify
them value-for-value (column names match __ray_entry__.oracle_sql):

  n_tokens       = count of whitespace-separated tokens
  bpe_tokens     = count of matches of BPE-ish regex ' ?[a-z]+| ?[0-9]+|...'
  n_nonspace     = count of non-whitespace characters
  stop_ratio     = fraction of tokens in a fixed stopword set
  quality_score  = LEAST(1, n_tokens/100) * (1 - ABS(stop_ratio - 0.4))
  pred_lang      = argmax of marker-word hits (en/es/de), ties/zero -> 'und'

The winnowing fingerprint (rolling k-gram hash, min over windows — the
standard MOSS scheme) is not SQL-expressible; it gets a pure-Python test
oracle instead.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

STOPWORDS = ("the", "a", "and", "of", "to")
LANG_MARKERS = {
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "de", "y", "en"),
    "de": ("der", "die", "und", "ist", "zu"),
}
# one pattern, valid for both Python re and DuckDB's RE2 (oracle parity)
BPE_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"
BPE_RE = re.compile(BPE_PATTERN)


class TextStats:
    """Actor-pool stage: stopword/marker sets + compiled regexes built once
    per actor (__init__), applied per batch (__call__)."""

    def __init__(self):
        self.stop = frozenset(STOPWORDS)
        self.markers = {k: frozenset(v) for k, v in LANG_MARKERS.items()}
        self.bpe = BPE_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        toks = text.str.split()
        n_tokens = toks.str.len().fillna(0).astype(np.int64)
        bpe_tokens = text.str.count(self.bpe).astype(np.int64)
        n_nonspace = text.str.replace(r"\s", "", regex=True).str.len().astype(np.int64)
        # one explode, then vectorized membership per word set (the round-1
        # version ran a Python lambda over every token of every doc)
        ex = toks.explode()  # empty docs keep one NaN row -> isin()==False
        grp = ex.index

        def _hits(words) -> pd.Series:
            return (
                ex.isin(words)
                .groupby(grp)
                .sum()
                .reindex(toks.index, fill_value=0)
                .astype(np.int64)
            )

        stop_hits = _hits(self.stop)
        denom = n_tokens.where(n_tokens > 0, 1)
        stop_ratio = (stop_hits / denom).astype(np.float64)
        quality = np.minimum(1.0, n_tokens / 100.0) * (
            1.0 - np.abs(stop_ratio - 0.4)
        )
        en, es, de = (
            _hits(self.markers["en"]),
            _hits(self.markers["es"]),
            _hits(self.markers["de"]),
        )
        pred = np.where(
            (en > es) & (en > de),
            "en",
            np.where((es > en) & (es > de), "es", np.where((de > en) & (de > es), "de", "und")),
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tokens,
                "bpe_tokens": bpe_tokens,
                "n_nonspace": n_nonspace,
                "stop_ratio": stop_ratio,
                "quality_score": quality,
                "pred_lang": pred,
            }
        )


def text_stats(docs_ds, concurrency: int = 4):
    """documents -> per-doc stats (stateful actor pool)."""
    return docs_ds.map_batches(
        TextStats, batch_format="pandas", concurrency=concurrency, num_cpus=0.5
    )


# ---- winnowing fingerprint ------------------------------------------------

FP_K = 5  # k-gram (in tokens)
FP_W = 4  # window size


_KG_C1 = np.uint64(0x9E3779B97F4A7C15)
_KG_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _kgram_hashes(tokens: list[str], k: int) -> np.ndarray:
    """Rolling k-gram hashes from vectorized per-token hashes (pandas
    siphash — deterministic across processes), masked to int63."""
    import pandas as pd

    if not tokens:
        return np.zeros(1, dtype=np.int64)
    th = pd.util.hash_array(np.asarray(tokens, dtype=object))
    n = len(th)
    if n < k:
        h = np.uint64(0)
        for i in range(n):
            h = h * _KG_C1 + th[i]
        return np.array([h >> np.uint64(1)], dtype=np.int64)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = acc * _KG_C1 + th[j : n - k + 1 + j] * _KG_C2
    return (acc >> np.uint64(1)).astype(np.int64)


def winnow_fingerprint(text: str, k: int = FP_K, w: int = FP_W) -> list[int]:
    """Winnowing (Schleimer/Wilkerson/Aiken): min hash per sliding window,
    deduplicated in order. Deterministic document fingerprint."""
    hs = _kgram_hashes((text or "").split(), k)
    if len(hs) <= w:
        return [int(hs.min())]
    mins = []
    last = -1
    for i in range(len(hs) - w + 1):
        m = int(hs[i : i + w].min())
        if m != last:
            mins.append(m)
            last = m
    return mins


class Fingerprint:
    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps = batch["text"].map(lambda t: winnow_fingerprint(t))
        digest = fps.map(
            lambda f: hashlib.blake2b(
                np.asarray(f, dtype=np.int64).tobytes(), digest_size=16
            ).hexdigest()
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": digest,
                "n_grams": fps.map(len).astype(np.int64),
            }
        )


def fingerprints(docs_ds, concurrency: int = 4):
    return docs_ds.map_batches(
        Fingerprint, batch_format="pandas", concurrency=concurrency, num_cpus=0.5
    )
