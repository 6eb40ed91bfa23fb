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


# --- MaxentStress ---------------------------------------------------------

from networkit_ray.pipelines.layout import (
    _hash_init,
    _pool_hash,
    _rep_partners,
    maxent_attraction_stress,
    maxent_stress,
)


def _maxent_brute(G, dim, iterations, alpha, alpha_decay, alpha_min,
                  samples, pool_size, seed, eps=1e-9):
    """Dense numpy replication of the engine's iteration: same init, same
    counter-hash samples, same RHS math, pseudo-inverse Laplacian solve
    (CG with sum-zero b converges to the same pinv solution)."""
    nodes = sorted(int(x) for x in G.nodes())
    n = len(nodes)
    assert nodes == list(range(n))  # dense-vid contract
    emap = {}
    for u, v, data in G.edges(data=True):  # weight="min" collapse, like
        if u == v:                          # canonicalize_undirected
            continue
        key = (min(int(u), int(v)), max(int(u), int(v)))
        wv = float(data.get("weight", 1.0))
        emap[key] = min(emap.get(key, np.inf), wv)
    E = sorted(emap)
    eset = set(E)
    d = np.array([emap[e] for e in E])
    w = 1.0 / (d * d)
    L = np.zeros((n, n))
    for k, (u, v) in enumerate(E):
        L[u, u] += w[k]; L[v, v] += w[k]
        L[u, v] -= w[k]; L[v, u] -= w[k]
    Lp = np.linalg.pinv(L)
    x = _hash_init(np.arange(n, dtype=np.int64), dim, seed)
    cur_alpha = float(alpha)
    for it in range(iterations):
        b = np.zeros((n, dim))
        for k, (u, v) in enumerate(E):  # attraction, both directions
            diff = x[u] - x[v]
            r = max(np.sqrt((diff * diff).sum()), eps)
            b[u] += w[k] * d[k] * diff / r
            b[v] -= w[k] * d[k] * diff / r
        vids = np.arange(n, dtype=np.int64)
        h = _pool_hash(vids, it, seed)
        Q = min(pool_size, n)
        pool_vids = vids[np.argsort(h, kind="stable")[:Q]]
        idx = _rep_partners(vids, samples, Q, it, seed)
        scale = cur_alpha * (n - 1) / float(samples)
        for i in range(n):
            for a in idx[i]:
                j = int(pool_vids[int(a)])
                if j == i or (min(i, j), max(i, j)) in eset:
                    continue
                diff = x[i] - x[j]
                r2 = max((diff * diff).sum(), eps)
                f = scale * diff / r2
                b[i] += f
                b[j] -= f
        x = Lp @ b
        cur_alpha = max(cur_alpha * alpha_decay, alpha_min)
    return x


@pytest.mark.parametrize("name", ["karate", "er200"])
def test_maxent_stress_numpy_replication(ray_session, name):
    G = fixture_graph(name)
    ds = ray.data.from_arrow(nx_to_edges_table(G))
    out = maxent_stress(
        ds, dim=2, iterations=3, samples=6, pool_size=24, num_partitions=4,
        cg_tol=1e-10,
    ).to_pandas().sort_values("vid").reset_index(drop=True)
    ref = _maxent_brute(G, 2, 3, 1.0, 0.3, 0.008, 6, 24, 42)
    got = out[["x0", "x1"]].to_numpy()
    span = np.abs(ref).max()
    assert np.allclose(got, ref, atol=5e-5 * max(span, 1.0))


def test_maxent_stress_improves_and_partition_invariant(ray_session):
    G = fixture_graph("karate")
    tbl = nx_to_edges_table(G)
    ds = ray.data.from_arrow(tbl)
    init_coords = ray.data.from_arrow(
        __import__("pyarrow").table(
            {
                "vid": np.arange(G.number_of_nodes(), dtype=np.int64),
                "x0": _hash_init(
                    np.arange(G.number_of_nodes(), dtype=np.int64), 2, 42
                )[:, 0],
                "x1": _hash_init(
                    np.arange(G.number_of_nodes(), dtype=np.int64), 2, 42
                )[:, 1],
            }
        )
    )
    s0 = maxent_attraction_stress(ds, init_coords, num_partitions=4)
    out = maxent_stress(ds, iterations=6, num_partitions=4)
    s1 = maxent_attraction_stress(ds, out, num_partitions=4)
    assert s1 < s0  # annealed alpha -> the stress half dominates and drops
    rep = maxent_stress(
        ray.data.from_arrow(tbl).repartition(7), iterations=6,
        num_partitions=4,
    ).to_pandas().sort_values("vid")
    base = out.to_pandas().sort_values("vid")
    assert np.allclose(
        base[["x0", "x1"]].to_numpy(), rep[["x0", "x1"]].to_numpy(),
        atol=1e-6,
    )


def test_maxent_stress_nondense_vids(ray_session):
    # the engine's real pipelines use hashed (non-dense) int64 vids — the
    # anchor-pool sampling must not assume vid in [0, n)
    G = fixture_graph("karate")
    H = nx.relabel_nodes(G, {v: int(v) * 1000003 + 7 for v in G.nodes()})
    ds = ray.data.from_arrow(nx_to_edges_table(H))
    out = maxent_stress(ds, iterations=4, num_partitions=4)
    df = out.to_pandas()
    assert len(df) == G.number_of_nodes()
    s = maxent_attraction_stress(ds, out, num_partitions=4)
    assert np.isfinite(s) and s < 40.0  # converged layout, not blow-up


def test_maxent_stress_two_cliques_separate(ray_session):
    # two 8-cliques joined by one bridge: intra distances << inter
    G = nx.Graph()
    for base in (0, 8):
        for a in range(8):
            for b in range(a + 1, 8):
                G.add_edge(base + a, base + b)
    G.add_edge(0, 8)
    ds = ray.data.from_arrow(nx_to_edges_table(G))
    out = maxent_stress(ds, iterations=8, num_partitions=4).to_pandas()
    xy = out.sort_values("vid")[["x0", "x1"]].to_numpy()
    ca, cb = xy[:8].mean(axis=0), xy[8:].mean(axis=0)
    intra = max(
        np.linalg.norm(xy[:8] - ca, axis=1).mean(),
        np.linalg.norm(xy[8:] - cb, axis=1).mean(),
    )
    assert np.linalg.norm(ca - cb) > intra
