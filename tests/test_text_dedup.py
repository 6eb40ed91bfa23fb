"""Text-analysis + dedup operators over a small synthetic documents table,
with brute-force pure-Python oracles."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines import dedup as dd
from networkit_ray.pipelines import textstats as ts


def docs_table():
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over a lazy dog"),  # near dup of 0
        (3, "el gato y la casa de la playa en verano"),
        (4, "completely different content about graphs and rays"),
        (5, ""),
        (6, "the quick brown fox jumps over the lazy dog today"),  # near dup
        (7, "der hund und die katze ist zu haus"),
    ]
    ids, texts = zip(*rows)
    return pa.table(
        {
            "doc_id": np.array(ids, dtype=np.int64),
            "text": list(texts),
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def docs_ds():
    return ray.data.from_arrow(docs_table())


def test_exact_dedup(ray_session):
    out = dd.exact_dedup(docs_ds()).to_pandas()
    # docs 0 and 1 share a sha; min doc_id kept
    kept = set(out["doc_id"])
    assert 0 in kept and 1 not in kept
    assert len(out) == 7  # 8 docs, one exact dup collapsed
    sha0 = hashlib.sha256(b"the quick brown fox jumps over the lazy dog").hexdigest()
    assert out.set_index("sha").loc[sha0, "doc_id"] == 0


def test_text_stats_values(ray_session):
    out = ts.text_stats(docs_ds()).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_tokens"] == 9
    assert out.loc[5, "n_tokens"] == 0
    # 'the' x2, 'over' no, 'a' no -> stopwords in doc0: the,the,over? over not in set
    assert out.loc[0, "stop_ratio"] == pytest.approx(2 / 9)
    assert out.loc[0, "pred_lang"] == "en"
    assert out.loc[3, "pred_lang"] == "es"
    assert out.loc[7, "pred_lang"] == "de"
    assert out.loc[5, "pred_lang"] == "und"
    # bpe regex count matches python re directly
    import re

    for i, t in zip(docs_table()["doc_id"].to_pylist(), docs_table()["text"].to_pylist()):
        assert out.loc[i, "bpe_tokens"] == len(ts.BPE_RE.findall(t))


def test_fingerprints_deterministic(ray_session):
    a = ts.fingerprints(docs_ds()).to_pandas().set_index("doc_id").sort_index()
    b = ts.fingerprints(docs_ds()).to_pandas().set_index("doc_id").sort_index()
    assert a.equals(b)
    assert a.loc[0, "fingerprint"] == a.loc[1, "fingerprint"]  # identical docs
    assert a.loc[0, "fingerprint"] != a.loc[4, "fingerprint"]


def brute_jaccard_pairs(k=3, threshold=0.5):
    tbl = docs_table()
    out = set()
    ids = tbl["doc_id"].to_pylist()
    texts = tbl["text"].to_pylist()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            sa, sb = dd._shingles(texts[i], k), dd._shingles(texts[j], k)
            if dd._jaccard(sa, sb) >= threshold:
                out.add((ids[i], ids[j]))
    return out


def test_minhash_dedup_groups(ray_session):
    out = (
        dd.minhash_dedup_groups(docs_ds(), threshold=0.5, num_partitions=2)
        .to_pandas()
        .set_index("doc_id")["dup_group"]
        .sort_index()
    )
    # exact dups grouped; 2 and 6 are near-dups of 0 at tau=0.5 per the
    # brute-force oracle
    want_pairs = brute_jaccard_pairs(threshold=0.5)
    assert (0, 1) in want_pairs
    assert out[0] == out[1] == 0
    for a, b in want_pairs:
        assert out[a] == out[b], (a, b)
    # singletons map to themselves
    assert out[4] == 4 and out[5] == 5


def test_minhash_recall_on_brute_pairs(ray_session):
    """LSH candidates (16 bands x 4 rows) must recover all pairs with
    Jaccard >= 0.5 on this corpus (probability ~1 at these sizes)."""
    band_rows = dd.minhash_band_rows(docs_ds(), num_perm=64, bands=16)
    cands = dd.candidate_pairs(band_rows, num_partitions=2).to_pandas()
    cand_set = {(a, b) for a, b in zip(cands["a"], cands["b"])}
    assert brute_jaccard_pairs(threshold=0.5) <= cand_set


def test_simhash_near_dups(ray_session):
    out = dd.simhash_near_dups(docs_ds(), max_hamming=10, num_partitions=2).to_pandas()
    got = {(a, b) for a, b in zip(out["a"], out["b"])}
    assert (0, 1) in got  # identical docs at distance 0
    for _, row in out.iterrows():
        ha = dd.simhash64(docs_table()["text"].to_pylist()[int(row["a"])])
        hb = dd.simhash64(docs_table()["text"].to_pylist()[int(row["b"])])
        assert bin(ha ^ hb).count("1") == row["hamming"]


def test_jaccard_similar_pairs_exact(ray_session):
    out = dd.jaccard_similar_pairs(docs_ds(), threshold=0.5, num_partitions=2).to_pandas()
    got = {(a, b) for a, b in zip(out["a"], out["b"])}
    # brute force over word SETS (unigram)
    tbl = docs_table()
    ids, texts = tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            sa, sb = set(texts[i].split()), set(texts[j].split())
            if sa and sb:
                jac = len(sa & sb) / len(sa | sb)
                if jac >= 0.5:
                    want.add((ids[i], ids[j]))
    assert got == want
