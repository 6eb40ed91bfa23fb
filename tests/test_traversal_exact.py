"""Exact all-sources traversal family: Brandes betweenness (batched source
waves), TopCloseness (degree-bound pruning), exact hop plot / effective
diameter.  Oracles: networkx exact values (FIXTURES.md §2)."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import fixture_graph, nx_to_edges_table

from networkit_ray.pipelines.traversal import (
    betweenness_exact,
    hop_plot,
    top_closeness,
)


def _closeness_raw(G):
    """(reached-1)/farness — the engine's (and NetworKit's) per-component
    closeness, NOT networkx's wf_improved default."""
    out = {}
    for v in G.nodes:
        dl = nx.single_source_shortest_path_length(G, v)
        sd = sum(dl.values())
        out[v] = (len(dl) - 1) / sd if sd > 0 else 0.0
    return out


@pytest.mark.parametrize("name", ["karate", "ba300", "multicomp"])
def test_betweenness_exact_networkx(ray_session, name):
    G = fixture_graph(name)
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    got = betweenness_exact(eds, num_partitions=3, batch=17).to_pandas()
    gd = dict(zip(got["vid"].astype(int), got["betweenness"]))
    want = nx.betweenness_centrality(G, normalized=False)
    assert max(abs(gd.get(v, 0.0) - want[v]) for v in G.nodes) < 1e-9


def test_betweenness_exact_batch_invariance(ray_session):
    G = fixture_graph("karate")
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    a = betweenness_exact(eds, num_partitions=2, batch=5).to_pandas()
    b = betweenness_exact(eds, num_partitions=4, batch=64).to_pandas()
    da = dict(zip(a["vid"].astype(int), a["betweenness"]))
    db = dict(zip(b["vid"].astype(int), b["betweenness"]))
    assert max(abs(da[v] - db[v]) for v in da) < 1e-9


@pytest.mark.parametrize("name,k", [("karate", 5), ("ba300", 10), ("multicomp", 8)])
def test_top_closeness_networkx(ray_session, name, k):
    G = fixture_graph(name)
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    got = top_closeness(eds, k=k, num_partitions=3, batch=13).to_pandas()
    want_c = _closeness_raw(G)
    want = sorted(want_c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    got_pairs = [
        (int(v), round(c, 10))
        for v, c in zip(got["vid"], got["closeness"])
    ]
    assert got_pairs == [(v, round(c, 10)) for v, c in want]


def test_top_closeness_prune_matches_exhaustive(ray_session):
    """The degree-bound pruning must never change the answer (connected
    fixture: pruning stays active end-to-end)."""
    G = fixture_graph("ba300")
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    a = top_closeness(eds, k=10, num_partitions=3, prune=True).to_pandas()
    b = top_closeness(eds, k=10, num_partitions=3, prune=False).to_pandas()
    assert list(a["vid"]) == list(b["vid"])
    assert np.allclose(a["closeness"], b["closeness"])


@pytest.mark.parametrize("name", ["karate", "path100", "multicomp"])
def test_hop_plot_exact(ray_session, name):
    G = fixture_graph(name)
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    ds, eff = hop_plot(eds, num_partitions=3, batch=29)
    hp = ds.to_pandas()
    hist: dict = {}
    for v in G.nodes:
        for _u, d in nx.single_source_shortest_path_length(G, v).items():
            if d > 0:
                hist[d] = hist.get(d, 0) + 1
    want = [hist.get(t, 0) for t in range(1, int(hp["t"].max()) + 1)]
    assert list(hp["pairs"]) == want
    total = sum(want)
    cum = np.cumsum(want)
    want_eff = int(np.argmax(cum >= 0.9 * total)) + 1
    assert eff == want_eff
    assert (hp["effective_diameter"] == eff).all()


@pytest.mark.parametrize("name", ["karate", "path100", "multicomp"])
def test_eccentricity_networkx(ray_session, name):
    from networkit_ray.pipelines.traversal import eccentricity

    G = fixture_graph(name)
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    verts = ray.data.from_arrow(
        pa.table({"vid": np.array(sorted(G.nodes), dtype=np.int64)})
    )
    got = eccentricity(
        eds, vertices_ds=verts, num_partitions=3, batch=17
    ).to_pandas()
    assert set(got["vid"].astype(int)) == {int(v) for v in G.nodes}
    ge = dict(zip(got["vid"].astype(int), got["ecc"].astype(int)))
    gr = dict(zip(got["vid"].astype(int), got["reached"].astype(int)))
    for comp in nx.connected_components(G):
        sub = G.subgraph(comp)
        want = nx.eccentricity(sub)
        for v in comp:
            assert ge[int(v)] == want[v]
            assert gr[int(v)] == len(comp)


def test_eccentricity_sources_subset(ray_session):
    from networkit_ray.pipelines.traversal import eccentricity

    G = fixture_graph("karate")
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    got = eccentricity(
        eds, sources=[0, 33, 5], num_partitions=2, batch=2
    ).to_pandas()
    assert sorted(got["vid"].astype(int)) == [0, 5, 33]
    want = nx.eccentricity(G)
    for _, r in got.iterrows():
        assert int(r["ecc"]) == want[int(r["vid"])]


@pytest.mark.parametrize("name", ["karate", "multicomp"])
def test_all_pairs_distances_networkx(ray_session, name):
    from networkit_ray.pipelines.traversal import all_pairs_distances

    G = fixture_graph(name)
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    verts = ray.data.from_arrow(
        pa.table({"vid": np.array(sorted(G.nodes), dtype=np.int64)})
    )
    got = all_pairs_distances(
        eds, vertices_ds=verts, num_partitions=3, batch=13
    ).to_pandas()
    want = {
        (int(s), int(v)): d
        for s in G.nodes
        for v, d in nx.single_source_shortest_path_length(G, s).items()
    }
    gd = {
        (int(r.source), int(r.vid)): int(r.depth)
        for r in got.itertuples()
    }
    assert gd == want


def test_all_pairs_subset_and_spsp(ray_session):
    from networkit_ray.pipelines.traversal import (
        all_pairs_distances,
        single_pair_distance,
    )

    G = fixture_graph("path100")
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    sub = all_pairs_distances(eds, sources=[0, 50], num_partitions=2).to_pandas()
    assert set(sub["source"]) == {0, 50}
    assert (
        sub[(sub["source"] == 0) & (sub["vid"] == 99)]["depth"].iloc[0] == 99
    )
    one = single_pair_distance(eds, 3, 97, num_partitions=2).to_pandas()
    assert int(one["depth"].iloc[0]) == 94
    # unreachable -> -1
    H = fixture_graph("multicomp")
    ed2 = ray.data.from_arrow(nx_to_edges_table(H))
    import networkx as _nx
    comps = list(_nx.connected_components(H))
    a = next(iter(comps[0])); b = next(iter(comps[1]))
    miss = single_pair_distance(ed2, int(a), int(b), num_partitions=2).to_pandas()
    assert int(miss["depth"].iloc[0]) == -1


def _greedy_group_closeness(G, k):
    """Pure-Python exhaustive greedy: min resulting group farness
    sum_v min(d(v, S)), ties -> smaller vid (the engine's contract)."""
    nodes = sorted(int(v) for v in G.nodes)
    dist = {
        v: nx.single_source_shortest_path_length(G, v) for v in nodes
    }
    INF = float("inf")
    d_s = {v: INF for v in nodes}
    picks = []
    for _ in range(k):
        best = None
        for u in nodes:
            if any(u == p[0] for p in picks):
                continue
            f = sum(
                min(d_s[v], dist[u].get(v, INF)) for v in nodes
            )
            pair = (f, u)
            if best is None or pair < best:
                best = pair
        picks.append((best[1], best[0]))
        for v in nodes:
            d_s[v] = min(d_s[v], dist[best[1]].get(v, INF))
    return picks


@pytest.mark.parametrize("name,k", [("karate", 4), ("ba300", 5), ("er200", 6)])
def test_group_closeness_brute_greedy(ray_session, name, k):
    """CELF-pruned distributed greedy replicates the exhaustive greedy
    exactly (members, order, per-pick farness)."""
    from networkit_ray.pipelines.traversal import group_closeness

    G = fixture_graph(name)
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    got = group_closeness(eds, k=k, num_partitions=3, batch=13).to_pandas()
    want = _greedy_group_closeness(G, k)
    assert list(got["vid"].astype(int)) == [p[0] for p in want]
    np.testing.assert_allclose(
        got["farness"].to_numpy(), [p[1] for p in want], atol=1e-9, rtol=0
    )
    assert list(got["rank"]) == list(range(k))


def test_group_closeness_batch_invariance(ray_session):
    from networkit_ray.pipelines.traversal import group_closeness

    G = fixture_graph("karate")
    eds = ray.data.from_arrow(nx_to_edges_table(G))
    a = group_closeness(eds, k=5, num_partitions=2, batch=4).to_pandas()
    b = group_closeness(eds, k=5, num_partitions=4, batch=64).to_pandas()
    assert list(a["vid"]) == list(b["vid"])
    np.testing.assert_allclose(a["farness"], b["farness"], atol=0, rtol=0)
