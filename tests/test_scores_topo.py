"""Conformance tests for the round-3 batch-1 operators: Laplacian
centrality, sfigality, SCAN structural similarity, LocalDegree
sparsification score, topological levels.  Oracles are brute-force
pure-Python/numpy recomputations (networkx.laplacian_centrality needs
scipy, absent from this container — the energy-difference oracle below is
library-free and definition-level)."""

import math

import networkx as nx
import numpy as np
import pytest

import ray.data

from networkit_ray.pipelines.centrality import laplacian_centrality, sfigality
from networkit_ray.pipelines.structure import (
    local_degree_scores,
    scan_similarity_scores,
)
from networkit_ray.pipelines.traversal import topological_levels

from tests.conftest import edges_dataset, fixture_graph


def _vertices_dataset(G):
    import pyarrow as pa

    return ray.data.from_arrow(
        pa.table({"vid": np.array(sorted(int(v) for v in G.nodes), dtype=np.int64)})
    )


def _lap_energy(G):
    return sum(d * d + d for _, d in G.degree())


def ref_laplacian_centrality(G):
    e = _lap_energy(G)
    out = {}
    for v in G.nodes:
        H = G.copy()
        H.remove_node(v)
        out[int(v)] = e - _lap_energy(H)
    return out


@pytest.mark.parametrize("name", ["karate", "ba300", "multicomp"])
def test_laplacian_centrality(ray_session, name):
    G = fixture_graph(name)
    got = (
        laplacian_centrality(
            edges_dataset(G), vertices_ds=_vertices_dataset(G), num_partitions=4
        )
        .to_pandas()
        .set_index("vid")["lc"]
    )
    want = ref_laplacian_centrality(G)
    assert len(got) == G.number_of_nodes()
    for v, w in want.items():
        assert got[v] == w, v


@pytest.mark.parametrize("name", ["karate", "star50", "multicomp"])
def test_sfigality(ray_session, name):
    G = fixture_graph(name)
    got = (
        sfigality(
            edges_dataset(G), vertices_ds=_vertices_dataset(G), num_partitions=4
        )
        .to_pandas()
        .set_index("vid")["sfigality"]
    )
    deg = dict(G.degree())
    for v in G.nodes:
        d = deg[v]
        want = (
            sum(1 for u in G[v] if deg[u] > d) / d if d > 0 else 0.0
        )
        assert abs(got[int(v)] - want) < 1e-12, v


def test_scan_similarity(ray_session):
    G = fixture_graph("karate")
    got = scan_similarity_scores(edges_dataset(G), num_partitions=4).to_pandas()
    deg = dict(G.degree())
    assert len(got) == G.number_of_edges()
    for row in got.itertuples():
        u, v = int(row.src), int(row.dst)
        cn = len(set(G[u]) & set(G[v]))
        want = (cn + 2) / math.sqrt((deg[u] + 1) * (deg[v] + 1))
        assert abs(row.score - want) < 1e-12, (u, v)


def ref_local_degree(G):
    """max over both directions of 1 - ln(rank)/ln(deg(u)), rank of v in
    N(u) by (deg desc, vid asc)."""
    deg = dict(G.degree())
    out = {}
    for u in G.nodes:
        nbrs = sorted(G[u], key=lambda w: (-deg[w], w))
        for rank0, v in enumerate(nbrs):
            rank = rank0 + 1
            if deg[u] <= 1 or rank == 1:
                s = 1.0
            else:
                s = 1.0 - math.log(rank) / math.log(deg[u])
            key = (min(u, v), max(u, v))
            out[key] = max(out.get(key, -1.0), s)
    return out


@pytest.mark.parametrize("name", ["karate", "ba300"])
def test_local_degree_scores(ray_session, name):
    G = fixture_graph(name)
    got = local_degree_scores(edges_dataset(G), num_partitions=4).to_pandas()
    want = ref_local_degree(G)
    assert len(got) == len(want)
    for row in got.itertuples():
        assert abs(row.score - want[(int(row.src), int(row.dst))]) < 1e-12


def _dag_dataset(edges):
    import pyarrow as pa

    src, dst = zip(*edges)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": np.array(src, dtype=np.int64),
                "dst": np.array(dst, dtype=np.int64),
                "w": np.ones(len(src), dtype=np.float64),
            }
        )
    )


def test_topological_levels_chain_and_diamond(ray_session):
    # two chains + a diamond: levels = longest path from a source
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (0, 12), (12, 3), (5, 3)]
    got, rounds = topological_levels(_dag_dataset(edges), num_partitions=4)
    lev = got.to_pandas().set_index("vid")["level"]
    G = nx.DiGraph(edges)
    want = {v: 0 for v in G.nodes}
    for v in nx.topological_sort(G):
        for u in G.predecessors(v):
            want[v] = max(want[v], want[u] + 1)
    for v, w in want.items():
        assert lev[v] == w, v
    # sorting by (level, vid) is a valid topological order
    order = {v: (lev[v], v) for v in want}
    for u, v in edges:
        assert order[u] < order[v]


def test_topological_levels_random_dag(ray_session):
    rng = np.random.default_rng(7)
    n = 120
    edges = []
    for _ in range(400):
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.append((min(a, b), max(a, b)))  # forward edges only -> DAG
    got, _ = topological_levels(_dag_dataset(edges), num_partitions=4)
    lev = got.to_pandas().set_index("vid")["level"]
    G = nx.DiGraph(edges)
    want = {v: 0 for v in G.nodes}
    for v in nx.topological_sort(G):
        for u in G.predecessors(v):
            want[v] = max(want[v], want[u] + 1)
    for v, w in want.items():
        assert lev[v] == w, v


def test_topological_levels_cycle_raises(ray_session):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    with pytest.raises(ValueError, match="cycle"):
        topological_levels(_dag_dataset(edges), num_partitions=2, max_rounds=20)


# --------------------------------------------------------------------------
# round-4 sparsifier scores + HavelHakimi
# --------------------------------------------------------------------------


def _brute_embeddedness(G):
    return {
        (min(u, v), max(u, v)): len(set(G[u]) & set(G[v])) for u, v in G.edges()
    }


@pytest.mark.parametrize("name", ["karate", "er200"])
def test_simmelian_overlap_vs_brute(ray_session, name):
    from networkit_ray.pipelines.structure import simmelian_overlap_scores

    G = fixture_graph(name)
    max_rank = 5
    out = simmelian_overlap_scores(
        edges_dataset(G), max_rank=max_rank, num_partitions=3
    ).to_pandas()
    emb = _brute_embeddedness(G)
    # brute top-k per vertex: neighbors by (embeddedness desc, vid asc)
    top = {}
    for u in G.nodes:
        nbrs = sorted(
            G[u], key=lambda v: (-emb[(min(u, v), max(u, v))], int(v))
        )
        top[u] = set(int(v) for v in nbrs[:max_rank])
    want = {
        (min(u, v), max(u, v)): len(top[u] & top[v]) for u, v in G.edges()
    }
    got = {
        (int(r.src), int(r.dst)): int(r.overlap) for r in out.itertuples()
    }
    assert got == want


@pytest.mark.parametrize("name", ["karate", "er200"])
def test_local_similarity_vs_brute(ray_session, name):
    from networkit_ray.pipelines.structure import local_similarity_scores

    G = fixture_graph(name)
    out = local_similarity_scores(edges_dataset(G), num_partitions=3).to_pandas()
    emb = _brute_embeddedness(G)

    def jac(u, v):
        cn = emb[(min(u, v), max(u, v))]
        return cn / max(G.degree(u) + G.degree(v) - cn, 1)

    want = {}
    for u in G.nodes:
        nbrs = sorted(G[u], key=lambda v: (-jac(u, v), int(v)))
        d = G.degree(u)
        for rank, v in enumerate(nbrs, start=1):
            s = 1.0 if (d <= 1 or rank == 1) else 1.0 - math.log(rank) / math.log(d)
            k = (min(u, v), max(u, v))
            want[k] = max(want.get(k, -1.0), s)
    got = {(int(r.src), int(r.dst)): r.score for r in out.itertuples()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_multiscale_vs_brute(ray_session):
    from networkit_ray.pipelines.structure import multiscale_scores

    G = fixture_graph("karate")
    # deterministic integer weights
    for i, (u, v) in enumerate(sorted(G.edges())):
        G[u][v]["weight"] = 1.0 + (i % 5)
    out = multiscale_scores(edges_dataset(G), num_partitions=3).to_pandas()
    want = {}
    for u in G.nodes:
        d = G.degree(u)
        s = sum(G[u][v]["weight"] for v in G[u])
        for v in G[u]:
            p = G[u][v]["weight"] / s
            sc = 1.0 if d <= 1 else 1.0 - (1.0 - p) ** (d - 1)
            k = (min(u, v), max(u, v))
            want[k] = max(want.get(k, -1.0), sc)
    got = {(int(r.src), int(r.dst)): r.score for r in out.itertuples()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_forest_fire_deterministic_and_sane(ray_session):
    from networkit_ray.pipelines.structure import forest_fire_scores

    G = fixture_graph("karate")
    a = forest_fire_scores(edges_dataset(G), rounds=2, num_partitions=2).to_pandas()
    b = forest_fire_scores(edges_dataset(G), rounds=2, num_partitions=4).to_pandas()
    ka = sorted(zip(a.src, a.dst, a.score.round(9)))
    kb = sorted(zip(b.src, b.dst, b.score.round(9)))
    assert ka == kb  # partition-invariant
    assert len(a) == G.number_of_edges()
    assert (a.score >= 0).all()
    assert a.score.sum() > 0  # something burned
    c = forest_fire_scores(
        edges_dataset(G), rounds=2, seed=7, num_partitions=2
    ).to_pandas()
    assert sorted(zip(c.src, c.dst, c.score.round(9))) != ka  # seed matters


def test_havel_hakimi(ray_session):
    from networkit_ray.sources.generators import havel_hakimi_edges

    G = fixture_graph("karate")
    seq = [d for _, d in sorted(G.degree())]
    out = havel_hakimi_edges(seq).to_pandas()
    assert (out.src < out.dst).all()
    assert not out.duplicated(["src", "dst"]).any()
    H = nx.Graph(list(zip(out.src.astype(int), out.dst.astype(int))))
    got = sorted(d for _, d in H.degree())
    assert got == sorted(d for d in seq if d > 0)
    with pytest.raises(ValueError):
        havel_hakimi_edges([3, 1])  # odd sum
    with pytest.raises(ValueError):
        havel_hakimi_edges([3, 3, 1, 1])  # not graphical
