"""Similarity search + multimodal plumbing tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines import multimodal as mm
from networkit_ray.pipelines import similarity as sim


def emb_table(n=60, d=16, seed=42):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d))
    # plant near-duplicates: 10,11 ~ 0; 12 ~ 1
    m[10] = m[0] + 1e-3 * rng.normal(size=d)
    m[11] = m[0] + 1e-3 * rng.normal(size=d)
    m[12] = m[1] + 1e-3 * rng.normal(size=d)
    return pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in m],
            "label": np.zeros(n, dtype=np.int32),
        }
    ), m


def brute_topk(m, q_idx, k):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn[q_idx]
    order = np.lexsort((np.arange(len(m)), -sims))
    return list(order[:k])


def test_knn_brute_matches_numpy(ray_session):
    tbl, m = emb_table()
    ds = ray.data.from_arrow(tbl).repartition(4)
    queries = ray.data.from_arrow(tbl.slice(0, 3))
    out = sim.knn_brute(ds, queries, k=5).to_pandas()
    for q in range(3):
        got = out[out["query_id"] == q].sort_values(
            ["sim", "vec_id"], ascending=[False, True]
        )["vec_id"].tolist()
        assert got == brute_topk(m.astype(np.float64), q, 5), q


def test_knn_ivf_recall(ray_session):
    tbl, m = emb_table(n=120)
    ds = ray.data.from_arrow(tbl).repartition(3)
    queries = ray.data.from_arrow(tbl.slice(0, 5))
    out = sim.knn_ivf(ds, queries, k=5, num_centroids=8, nprobe=4).to_pandas()
    hits = 0
    for q in range(5):
        got = set(out[out["query_id"] == q]["vec_id"].tolist())
        want = set(brute_topk(m.astype(np.float64), q, 5))
        hits += len(got & want)
    assert hits / 25 >= 0.6  # recall@5 with 4/8 probes


def test_cosine_near_dup_pairs(ray_session):
    tbl, m = emb_table()
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = sim.cosine_near_dup_pairs(ds, threshold=0.999).to_pandas()
    got = {(a, b) for a, b in zip(out["a"], out["b"])}
    assert {(0, 10), (0, 11), (1, 12), (10, 11)} <= got
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for a, b in got:
        assert mn[a] @ mn[b] >= 0.999 - 1e-9


def test_multimodal_decode_plumbing(ray_session):
    media = ray.data.from_arrow(mm.synthetic_media(32))
    feats = mm.decode_features(media, mode="fake").to_pandas()
    assert len(feats) == 32
    assert all(len(f) == mm.FEAT_DIM for f in feats["feat"])
    # deterministic: same payload -> same features
    feats2 = mm.decode_features(
        ray.data.from_arrow(mm.synthetic_media(32)), mode="fake"
    ).to_pandas()
    a = np.stack(feats.sort_values("media_id")["feat"].to_numpy())
    b = np.stack(feats2.sort_values("media_id")["feat"].to_numpy())
    np.testing.assert_array_equal(a, b)


def test_multimodal_real_mode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        mm.DecodeAndFeaturize(mode="real")._decode(b"x")


def test_frame_sampler(ray_session):
    media = ray.data.from_arrow(mm.synthetic_media(8))
    frames = mm.sample_frames(media, every=5).to_pandas()
    assert (frames["frame_idx"] % 5 == 0).all()
    assert set(frames["media_id"]) == set(range(8))


def test_knn_ivf_kmeans_recall(ray_session):
    """Real quantizer (distributed Lloyd rounds): recall@10 vs brute force
    must reach 0.9 at nprobe=4/16 on clustered data."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 16)) * 4
    m = np.vstack([c + rng.normal(size=(40, 16)) for c in centers])
    tbl = pa.table(
        {
            "vec_id": np.arange(len(m), dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in m],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    queries = ray.data.from_arrow(tbl.slice(0, 10))
    out = sim.knn_ivf(
        ds, queries, k=10, num_centroids=16, nprobe=4, centroids="kmeans"
    ).to_pandas()
    m64 = m.astype(np.float64)
    hits = total = 0
    for q in range(10):
        got = set(out[out["query_id"] == q]["vec_id"].tolist())
        want = set(brute_topk(m64, q, 10))
        hits += len(got & want)
        total += 10
    assert hits / total >= 0.9, hits / total


def test_kmeans_centroids_deterministic(ray_session):
    tbl, _ = emb_table(n=80)
    ds = ray.data.from_arrow(tbl).repartition(3)
    c1 = sim.kmeans_centroids(ds, num_centroids=8, iters=3)
    c2 = sim.kmeans_centroids(ds, num_centroids=8, iters=3)
    np.testing.assert_array_equal(c1, c2)


def test_cosine_pairs_no_driver_materialization(ray_session, monkeypatch):
    """Scale-guard: the exact all-pairs kernel must never pull the corpus
    matrix onto the driver (_load_embeddings is reserved for small sides)."""
    tbl, m = emb_table()
    ds = ray.data.from_arrow(tbl).repartition(4)
    calls = []
    orig = sim._load_embeddings

    def spy(*a, **kw):
        calls.append(a)
        return orig(*a, **kw)

    monkeypatch.setattr(sim, "_load_embeddings", spy)
    out = sim.cosine_near_dup_pairs(ds, threshold=0.999).to_pandas()
    assert not calls  # no driver-side embedding materialization at all
    got = {(a, b) for a, b in zip(out["a"], out["b"])}
    assert {(0, 10), (0, 11), (1, 12), (10, 11)} <= got
