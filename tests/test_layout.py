"""PivotMDS layout (viz/PivotMDS, SURVEY.md §2.3).  Oracle: an exact numpy
replication of the same deterministic pipeline — maxmin pivots (first =
smallest vid, ties -> smaller vid), BFS pivot distances with the
(max_depth + 1) unreached proxy, double centering, k x k eigensolve with
largest-|component|-positive sign fixing — must match coordinate-for-
coordinate; plus partition invariance and a closed-form sanity check on a
path graph (x must be monotone along the path)."""

import networkx as nx
import numpy as np
import pytest
import ray.data

from conftest import fixture_graph, nx_to_edges_table

from networkit_ray.pipelines.layout import pivot_mds


def _numpy_pivot_mds(G, k, dim):
    vids = sorted(G.nodes)
    n = len(vids)
    idx = {v: i for i, v in enumerate(vids)}
    # all-pairs BFS depths, -1 unreachable
    D = np.full((n, n), -1, dtype=np.int64)
    for v in vids:
        for u, d in nx.single_source_shortest_path_length(G, v).items():
            D[idx[v], idx[u]] = d
    # maxmin pivots
    pivots = [vids[0]]
    dist_to_set = np.full(n, np.inf)
    for _ in range(min(k, n) - 1):
        d = D[idx[pivots[-1]]].astype(np.float64)
        d[d < 0] = np.inf
        dist_to_set = np.minimum(dist_to_set, d)
        cand = [
            (-dist_to_set[i], vids[i])
            for i in range(n)
            if vids[i] not in pivots
        ]
        cand.sort()
        pivots.append(cand[0][1])
    # distances TO pivots; unreached -> 1 + max finite depth from any pivot
    Dp = D[[idx[p] for p in pivots], :].astype(np.float64).T.copy()  # (n, k)
    fill = float(Dp.max() + 1)
    Dp[Dp < 0] = fill
    D2 = Dp * Dp  # (n, k)
    C = -0.5 * (
        D2
        - D2.mean(axis=1, keepdims=True)
        - D2.mean(axis=0, keepdims=True)
        + D2.mean()
    )
    evals, evecs = np.linalg.eigh(C.T @ C)
    order = np.argsort(evals)[::-1][:dim]
    V = evecs[:, order]
    for j in range(V.shape[1]):
        i = int(np.argmax(np.abs(V[:, j])))
        if V[i, j] < 0:
            V[:, j] = -V[:, j]
    X = C @ V
    return {v: X[idx[v]] for v in vids}, pivots


@pytest.mark.parametrize("name,k", [("karate", 8), ("er200", 12)])
def test_pivot_mds_numpy_replication(ray_session, name, k):
    G = fixture_graph(name)
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    got = pivot_mds(eds, k=k, dim=2, num_partitions=3).to_pandas()
    want, _pivots = _numpy_pivot_mds(G, k, 2)
    gx = dict(zip(got["vid"].astype(int), zip(got["x"], got["y"])))
    for v in G.nodes:
        assert np.allclose(gx[v], want[v], atol=1e-8), (v, gx[v], want[v])


def test_pivot_mds_partition_invariance(ray_session):
    G = fixture_graph("karate")
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    a = pivot_mds(eds, k=6, dim=2, num_partitions=2).to_pandas()
    b = pivot_mds(eds, k=6, dim=2, num_partitions=4).to_pandas()
    da = dict(zip(a["vid"].astype(int), zip(a["x"], a["y"])))
    db = dict(zip(b["vid"].astype(int), zip(b["x"], b["y"])))
    assert set(da) == set(db)
    for v in da:
        assert np.allclose(da[v], db[v], atol=1e-8)


def test_pivot_mds_path_monotone(ray_session):
    # On a path graph the first MDS axis must order vertices along the
    # path (strictly monotone x), and the second axis carries far less
    # energy than the first.
    G = fixture_graph("path100")
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    got = (
        pivot_mds(eds, k=10, dim=2, num_partitions=3)
        .to_pandas()
        .sort_values("vid")
    )
    x = got["x"].to_numpy()
    dx = np.diff(x)
    assert (dx > 0).all() or (dx < 0).all()
    assert np.abs(got["y"]).max() < 0.25 * np.abs(x).max()
