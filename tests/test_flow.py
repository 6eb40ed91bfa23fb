"""EdmondsKarp max-flow + Flake-Tarjan cut clustering (driver-side compat):
value parity with networkx, minimal-source-side cut uniqueness, flow
conservation, alpha-extreme degeneracies, determinism."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines.flow import cut_clustering, edmonds_karp

from tests.conftest import fixture_graph


def weighted_ds(G, wts):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([int(u) for u, _ in G.edges()], pa.int64()),
                "dst": pa.array([int(v) for _, v in G.edges()], pa.int64()),
                "w": pa.array([float(x) for x in wts]),
            }
        )
    )


def nx_capacitated(G, wts, directed):
    H = nx.DiGraph() if directed else nx.Graph()
    for i, (u, v) in enumerate(G.edges()):
        if u == v:
            continue
        w = float(wts[i])
        if not directed and H.has_edge(u, v):
            w += H[u][v]["capacity"]  # parallel collapse matches canonicalize sum
        H.add_edge(int(u), int(v), capacity=w)
    return H


@pytest.mark.parametrize("name", ["karate", "er200", "multicomp"])
def test_edmonds_karp_value_and_cut_vs_networkx(ray_session, name):
    G = fixture_graph(name)
    rng = np.random.default_rng(3)
    wts = rng.random(G.number_of_edges()) * 4 + 0.5
    nodes = sorted(int(x) for x in G.nodes())
    s, t = nodes[0], nodes[len(nodes) // 2]
    r = edmonds_karp(weighted_ds(G, wts), s, t)
    H = nx_capacitated(G, wts, directed=False)
    val, (nx_reach, _) = nx.minimum_cut(H, s, t)
    assert r.flow_value == pytest.approx(val, abs=1e-9)
    # source_set must BE a minimum cut: s inside, t outside, crossing
    # capacity exactly the max-flow value (any such cut is minimum)
    S = set(int(x) for x in r.source_set)
    assert s in S and t not in S
    crossing = sum(
        d["capacity"] for u, v, d in H.edges(data=True)
        if (u in S) != (v in S)
    )
    assert crossing == pytest.approx(val, abs=1e-9)
    # and it is the MINIMAL source side: contained in any other min cut's
    # source side, in particular networkx's (maximal-side) partition
    assert S <= set(int(x) for x in nx_reach)


def test_edmonds_karp_directed_and_conservation(ray_session):
    rng = np.random.default_rng(7)
    n = 40
    G = nx.gnp_random_graph(n, 0.15, seed=4, directed=True)
    wts = rng.random(G.number_of_edges()) * 3 + 0.5
    r = edmonds_karp(weighted_ds(G, wts), 0, n - 1, directed=True)
    H = nx_capacitated(G, wts, directed=True)
    val = nx.maximum_flow_value(H, 0, n - 1)
    assert r.flow_value == pytest.approx(val, abs=1e-9)
    f = r.flow_table.to_pandas()
    assert (f["flow"] <= np.asarray(
        [H[u][v]["capacity"] for u, v in zip(f["src"], f["dst"])]
    ) + 1e-9).all()
    net = {}
    for u, v, fl in zip(f["src"], f["dst"], f["flow"]):
        net[u] = net.get(u, 0.0) + fl
        net[v] = net.get(v, 0.0) - fl
    for x, bal in net.items():
        if x == 0:
            assert bal == pytest.approx(r.flow_value, abs=1e-9)
        elif x == n - 1:
            assert bal == pytest.approx(-r.flow_value, abs=1e-9)
        else:
            assert bal == pytest.approx(0.0, abs=1e-9)


def test_edmonds_karp_disconnected_and_guards(ray_session):
    G = fixture_graph("multicomp")
    comps = sorted(nx.connected_components(G), key=lambda c: min(c))
    s = min(int(x) for x in comps[0])
    t = min(int(x) for x in comps[1])
    ds = weighted_ds(G, np.ones(G.number_of_edges()))
    r = edmonds_karp(ds, s, t)
    assert r.flow_value == 0.0
    assert s in set(int(x) for x in r.source_set)
    assert t not in set(int(x) for x in r.source_set)
    with pytest.raises(ValueError, match="edge_limit"):
        edmonds_karp(ds, s, t, edge_limit=2)
    with pytest.raises(ValueError, match="source == sink"):
        edmonds_karp(ds, s, s)


def _cut_clustering_brute(G, wts, alpha):
    """Independent replication on networkx preflow-push min cuts: same
    ascending-vid loop, minimal source side (residual reachability) —
    unique across max-flow algorithms, so implementations must agree."""
    H = nx_capacitated(G, wts, directed=False)
    t = max(int(x) for x in G.nodes()) + 10**6
    for v in list(H.nodes()):
        H.add_edge(v, t, capacity=alpha)
    label = {}
    for u in sorted(int(x) for x in G.nodes()):
        if u in label:
            continue
        _, (reach, _) = nx.minimum_cut(H, u, t)
        for v in reach:
            if v != t and v not in label:
                label[v] = u
    return label


@pytest.mark.parametrize("alpha", [0.35, 1.0])
def test_cut_clustering_brute_replication(ray_session, alpha):
    G = fixture_graph("karate")
    rng = np.random.default_rng(9)
    wts = rng.random(G.number_of_edges()) + 0.5
    out = cut_clustering(weighted_ds(G, wts), alpha).to_pandas()
    got = dict(zip(out["vid"].astype(int), out["label"].astype(int)))
    assert got == _cut_clustering_brute(G, wts, alpha)


def test_cut_clustering_alpha_extremes(ray_session):
    G = fixture_graph("multicomp")
    wts = np.ones(G.number_of_edges())
    ds = weighted_ds(G, wts)
    # alpha below any internal connectivity: communities = components
    lo = cut_clustering(ds, 1e-4).to_pandas()
    covered = {int(u) for e in G.edges() for u in e}  # edge-table convention:
    comp_of = {}  # isolated vertices never reach the operator
    for c in nx.connected_components(G):
        m = min(int(x) for x in c)
        for v in c:
            if int(v) in covered:
                comp_of[int(v)] = m
    assert dict(zip(lo["vid"].astype(int), lo["label"].astype(int))) == comp_of
    # alpha above any vertex's weighted degree: singletons
    hi = cut_clustering(ds, 1e4).to_pandas()
    assert (hi["vid"] == hi["label"]).all()


def test_cut_clustering_partition_invariant_and_guard(ray_session):
    G = fixture_graph("karate")
    rng = np.random.default_rng(5)
    wts = rng.random(G.number_of_edges()) + 0.5
    a = cut_clustering(weighted_ds(G, wts), 0.8).to_pandas()
    b = cut_clustering(weighted_ds(G, wts).repartition(7), 0.8).to_pandas()
    key = lambda df: sorted(zip(df["vid"], df["label"]))  # noqa: E731
    assert key(a) == key(b)
    with pytest.raises(ValueError, match="alpha"):
        cut_clustering(weighted_ds(G, wts), 0.0)
