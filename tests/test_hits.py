"""HITS hubs/authorities: numpy power-iteration conformance (fixed iters,
end-only L2 normalization — exactly the pipeline's contract)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines.centrality import hits


def _directed_fixture(n=60, m=400, seed=7):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedup parallel edges, weight = multiplicity
    key = src * n + dst
    uk, counts = np.unique(key, return_counts=True)
    return (uk // n).astype(np.int64), (uk % n).astype(np.int64), counts.astype(
        np.float64
    ), n


def ref_hits(src, dst, w, n, iters):
    A = np.zeros((n, n))
    A[src, dst] = w
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = A.T @ h
        h = A @ a
    na = np.linalg.norm(a) or 1.0
    nh = np.linalg.norm(h) or 1.0
    return a / na, h / nh


@pytest.mark.parametrize("iters", [1, 5])
def test_hits_matches_numpy(ray_session, iters):
    src, dst, w, n = _directed_fixture()
    edges = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst, "w": w})
    )
    got = (
        hits(edges, iters=iters, num_partitions=4)
        .to_pandas()
        .set_index("vid")
        .sort_index()
    )
    a, h = ref_hits(src, dst, w, n, iters)
    present = got.index.to_numpy()
    np.testing.assert_allclose(got["auth"].to_numpy(), a[present], atol=1e-10)
    np.testing.assert_allclose(got["hub"].to_numpy(), h[present], atol=1e-10)


def test_hits_star(ray_session):
    # directed star 0 -> 1..5: vertex 0 is the only hub, leaves split auth
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": np.zeros(5, dtype=np.int64),
                "dst": np.arange(1, 6, dtype=np.int64),
                "w": np.ones(5),
            }
        )
    )
    got = hits(edges, iters=3, num_partitions=2).to_pandas().set_index("vid")
    assert abs(got.loc[0, "hub"] - 1.0) < 1e-12
    assert abs(got.loc[0, "auth"]) < 1e-12
    for v in range(1, 6):
        assert abs(got.loc[v, "auth"] - 1.0 / np.sqrt(5)) < 1e-12
        assert abs(got.loc[v, "hub"]) < 1e-12
