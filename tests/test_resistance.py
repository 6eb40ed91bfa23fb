"""Laplacian CG solver family: effective resistance, SpanningEdgeCentrality,
CommuteTimeDistance.

Oracles: dense numpy pseudoinverse (er = L+_uu + L+_vv - 2 L+_uv), closed
forms (cycle/path), and Foster's theorem.
"""

import networkx as nx
import numpy as np
import pytest

from conftest import edges_dataset, fixture_graph

from networkit_ray.pipelines.resistance import (
    commute_time_distance,
    effective_resistance,
    spanning_edge_centrality,
)


def _dense_laplacian(G):
    """Weighted Laplacian without scipy (not installed here)."""
    nodes = sorted(G.nodes())
    pos = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    L = np.zeros((n, n))
    for u, v, data in G.edges(data=True):
        w = float(data.get("weight", 1.0))
        i, j = pos[u], pos[v]
        L[i, j] -= w
        L[j, i] -= w
        L[i, i] += w
        L[j, j] += w
    return L, pos


def _pinv_er(G):
    L, pos = _dense_laplacian(G)
    Lp = np.linalg.pinv(L)

    def er(u, v):
        i, j = pos[u], pos[v]
        return Lp[i, i] + Lp[j, j] - 2 * Lp[i, j]

    return er


def test_effective_resistance_matches_pinv_karate(ray_session):
    G = fixture_graph("karate")
    er_oracle = _pinv_er(G)
    for u, v in [(0, 33), (5, 11), (2, 8)]:
        got, iters = effective_resistance(
            edges_dataset(G), u, v, num_partitions=3
        )
        assert abs(got - er_oracle(u, v)) < 1e-6, (u, v)
        assert iters >= 1
    # second solve of the same pair reproduces bit-stably
    again, _ = effective_resistance(edges_dataset(G), 0, 33, num_partitions=2)
    assert abs(again - er_oracle(0, 33)) < 1e-6


def test_effective_resistance_weighted(ray_session):
    G = nx.Graph()
    G.add_edge(0, 1, weight=2.0)
    G.add_edge(1, 2, weight=4.0)
    G.add_edge(0, 2, weight=1.0)
    er_oracle = _pinv_er(G)
    got, _ = effective_resistance(edges_dataset(G), 0, 2, num_partitions=2)
    assert abs(got - er_oracle(0, 2)) < 1e-9


def test_effective_resistance_disconnected_is_inf(ray_session):
    G = nx.disjoint_union(nx.path_graph(4), nx.cycle_graph(4))
    got, _ = effective_resistance(edges_dataset(G), 0, 6, num_partitions=2)
    assert got == float("inf")


def test_sec_exact_closed_forms(ray_session):
    # cycle C_n: er = (n-1)/n per edge; path: every edge is a bridge, er=1
    out, _ = spanning_edge_centrality(
        edges_dataset(nx.cycle_graph(10)), exact=True, num_partitions=2
    )
    pdf = out.to_pandas()
    assert len(pdf) == 10
    assert np.allclose(pdf["er"], 0.9, atol=1e-8)
    out, _ = spanning_edge_centrality(
        edges_dataset(nx.path_graph(8)), exact=True, num_partitions=2
    )
    assert np.allclose(out.to_pandas()["er"], 1.0, atol=1e-8)


def test_sec_exact_matches_pinv_karate(ray_session):
    G = fixture_graph("karate")
    er_oracle = _pinv_er(G)
    out, _ = spanning_edge_centrality(
        edges_dataset(G), exact=True, num_partitions=3
    )
    pdf = out.to_pandas()
    assert len(pdf) == G.number_of_edges()
    for r in pdf.itertuples(index=False):
        assert abs(r.er - er_oracle(int(r.src), int(r.dst))) < 1e-6
    # sum of sec over edges == n - 1 (Foster's theorem / spanning tree size)
    assert abs(pdf["sec"].sum() - (G.number_of_nodes() - 1)) < 1e-6


def test_sec_jl_approximates_exact(ray_session):
    G = fixture_graph("karate")
    exact, _ = spanning_edge_centrality(
        edges_dataset(G), exact=True, num_partitions=3
    )
    approx, _ = spanning_edge_centrality(
        edges_dataset(G), k=512, seed=7, num_partitions=3
    )
    e = exact.to_pandas().set_index(["src", "dst"])["er"]
    a = approx.to_pandas().set_index(["src", "dst"])["er"]
    assert set(e.index) == set(a.index)
    rel = np.abs(a.loc[e.index] - e) / e
    assert rel.mean() < 0.12
    assert rel.max() < 0.4
    # determinism: hash-seeded projections, bit-identical re-run
    approx2, _ = spanning_edge_centrality(
        edges_dataset(G), k=512, seed=7, num_partitions=2
    )
    a2 = approx2.to_pandas().set_index(["src", "dst"])["er"]
    assert np.allclose(a.loc[e.index], a2.loc[e.index], atol=1e-9)


def test_commute_time_distance(ray_session):
    G = fixture_graph("karate")
    # karate carries edge weights; vol = 2 * total weight, matching the
    # engine's weighted-degree volume
    vol = 2.0 * sum(
        float(d.get("weight", 1.0)) for _, _, d in G.edges(data=True)
    )
    want = vol * _pinv_er(G)(0, 33)
    got, _ = commute_time_distance(edges_dataset(G), 0, 33,
                                   num_partitions=3)
    assert abs(got - want) < 1e-4


def test_forest_centrality_vs_dense_inverse(ray_session):
    from networkit_ray.pipelines.resistance import forest_centrality

    G = fixture_graph("karate")
    L, _pos = _dense_laplacian(G)
    n = L.shape[0]
    O = np.linalg.inv(np.eye(n) + L)
    denom = np.trace(O) + n * np.diag(O) - 2.0 * O.sum(axis=0)
    want = (n - 1) / denom
    got, iters = forest_centrality(
        edges_dataset(G), k=512, seed=11, num_partitions=3
    )
    pdf = got.to_pandas().sort_values("vid")
    rel = np.abs(pdf["fc"].to_numpy() - want) / want
    assert rel.mean() < 0.05
    assert rel.max() < 0.25
    # partition invariance of the hashed probes
    got2, _ = forest_centrality(
        edges_dataset(G), k=512, seed=11, num_partitions=2
    )
    pdf2 = got2.to_pandas().sort_values("vid")
    assert np.allclose(pdf["fc"].to_numpy(), pdf2["fc"].to_numpy(), atol=1e-9)


def test_forest_centrality_disconnected_well_defined(ray_session):
    from networkit_ray.pipelines.resistance import forest_centrality

    G = nx.disjoint_union(nx.path_graph(4), nx.cycle_graph(5))
    got, _ = forest_centrality(edges_dataset(G), k=256, num_partitions=2)
    pdf = got.to_pandas()
    assert len(pdf) == 9
    assert (pdf["fc"] > 0).all() and np.isfinite(pdf["fc"]).all()
