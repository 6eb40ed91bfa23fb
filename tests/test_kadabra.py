"""KADABRA adaptive-sampling betweenness (centrality/KadabraBetweenness,
SURVEY.md §2.3).  Oracles: (a) the estimate converges to exact normalized
betweenness within the requested eps (networkx exact, FIXTURES.md §2);
(b) fixed-seed determinism across partition counts; (c) the adaptive
stopping rule actually adapts — an easy graph (star) stops with fewer
samples than the max budget."""

import networkx as nx
import numpy as np
import pytest
import ray.data

from conftest import fixture_graph, nx_to_edges_table

from networkit_ray.pipelines.traversal import kadabra_betweenness


def _exact_normalized(G):
    """Ordered-pair normalized betweenness: nx unnormalized (unordered
    pairs) * 2 / (n(n-1)) — the scale KADABRA estimates."""
    n = G.number_of_nodes()
    raw = nx.betweenness_centrality(G, normalized=False)
    return {v: 2.0 * b / (n * (n - 1)) for v, b in raw.items()}


@pytest.mark.parametrize("name,eps", [("karate", 0.05), ("ba300", 0.06)])
def test_kadabra_within_eps_of_exact(ray_session, name, eps):
    G = fixture_graph(name)
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    stats = {}
    got = kadabra_betweenness(
        eds,
        eps=eps,
        delta=0.1,
        pairs_per_round=64,
        max_rounds=200,
        min_tau=512,
        seed=7,
        num_partitions=3,
        stats=stats,
    ).to_pandas()
    gd = dict(zip(got["vid"].astype(int), got["betweenness"]))
    want = _exact_normalized(G)
    err = max(abs(gd.get(v, 0.0) - want[v]) for v in G.nodes)
    # Bernstein guarantees <= eps whp; the fixed seed makes this stable.
    assert err <= eps, (err, stats)


def test_kadabra_deterministic_across_partitions(ray_session):
    G = fixture_graph("karate")
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    kw = dict(eps=0.08, pairs_per_round=32, max_rounds=40, min_tau=128, seed=3)
    a = kadabra_betweenness(eds, num_partitions=2, **kw).to_pandas()
    b = kadabra_betweenness(eds, num_partitions=4, **kw).to_pandas()
    da = dict(zip(a["vid"].astype(int), a["betweenness"]))
    db = dict(zip(b["vid"].astype(int), b["betweenness"]))
    assert set(da) == set(db)
    assert max(abs(da[v] - db[v]) for v in da) < 1e-12


def test_kadabra_adaptive_stopping(ray_session):
    # Star: every shortest path crosses the hub, variance is tiny, so the
    # Bernstein bound collapses quickly and the loop must stop well short
    # of the sample budget; the hub estimate must also be near-exact.
    G = fixture_graph("star50")
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    stats = {}
    got = kadabra_betweenness(
        eds,
        eps=0.1,
        pairs_per_round=32,
        max_rounds=500,
        min_tau=64,
        seed=1,
        num_partitions=2,
        stats=stats,
    ).to_pandas()
    assert stats["tau"] < 32 * 500
    assert stats["bound"] <= 0.1
    want = _exact_normalized(G)
    gd = dict(zip(got["vid"].astype(int), got["betweenness"]))
    assert abs(gd[0] - want[0]) <= 0.1


def test_kadabra_unreachable_pairs_count(ray_session):
    # multicomp has 5 components + isolates: cross-component pairs are
    # unreachable and must contribute zero mass but still count in tau —
    # estimates stay within eps of exact normalized betweenness.
    G = fixture_graph("multicomp")
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    got = kadabra_betweenness(
        eds,
        eps=0.05,
        pairs_per_round=64,
        max_rounds=200,
        min_tau=512,
        seed=11,
        num_partitions=3,
    ).to_pandas()
    gd = dict(zip(got["vid"].astype(int), got["betweenness"]))
    # The engine's vertex set is edge-derived, so pairs are sampled over
    # the 150 non-isolated vertices; normalize the oracle accordingly.
    H = G.subgraph([v for v in G.nodes if G.degree[v] > 0])
    want = _exact_normalized(H)
    err = max(abs(gd.get(v, 0.0) - want[v]) for v in H.nodes)
    assert err <= 0.05
