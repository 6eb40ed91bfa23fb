"""PageRankNibble: fixed-iteration PPR conformance + sweep-cut optimality
on planted two-community graphs."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines.scd import pagerank_nibble, personalized_pagerank

from tests.conftest import edges_dataset, fixture_graph


def ref_ppr(G, seed, alpha, iters):
    deg = dict(G.degree())
    x = {v: 1.0 if v == seed else 0.0 for v in G.nodes}
    for _ in range(iters):
        new = {v: alpha if v == seed else 0.0 for v in G.nodes}
        for u in G.nodes:
            if x[u] == 0.0:
                continue
            share = (1.0 - alpha) * x[u] / deg[u]
            for v in G[u]:
                new[v] += share
        x = new
    return x


@pytest.mark.parametrize("name,seed", [("karate", 0), ("er200", 5)])
def test_personalized_pagerank(ray_session, name, seed):
    G = fixture_graph(name)
    got = (
        personalized_pagerank(
            edges_dataset(G), seed, alpha=0.15, iters=8, num_partitions=4
        )
        .to_pandas()
        .set_index("vid")["ppr"]
    )
    want = ref_ppr(G, seed, 0.15, 8)
    for v, w in want.items():
        assert abs(got[int(v)] - w) < 1e-10, v


def _two_cliques(k=12):
    G = nx.Graph()
    G.update(nx.complete_graph(range(k)))
    G.update(nx.complete_graph(range(k, 2 * k)))
    G.add_edge(0, k)
    return G


def test_pagerank_nibble_finds_planted_community(ray_session):
    G = _two_cliques(12)
    out, phi = pagerank_nibble(
        edges_dataset(G), seed_vid=3, alpha=0.15, iters=20, max_size=20,
        num_partitions=4,
    )
    members = set(out.to_pandas()["vid"].astype(int))
    assert members == set(range(12))
    # conductance of a 12-clique with one external edge: 1 / (2*66 + 1)
    assert abs(phi - 1.0 / 133.0) < 1e-12


def test_pagerank_nibble_sweep_is_optimal(ray_session):
    """The returned prefix minimizes conductance over ALL prefixes of the
    ppr/deg ordering (brute-force recomputation)."""
    G = fixture_graph("karate")
    seed, max_size = 0, 25
    out, phi = pagerank_nibble(
        edges_dataset(G), seed_vid=seed, alpha=0.15, iters=20,
        max_size=max_size, num_partitions=4,
    )
    ppr = ref_ppr(G, seed, 0.15, 20)
    deg = dict(G.degree())
    order = sorted(
        (v for v in G.nodes if ppr[v] > 0),
        key=lambda v: (-ppr[v] / deg[v], v),
    )[:max_size]
    vol_total = 2 * G.number_of_edges()
    best_phi, best_k = None, None
    for k in range(1, len(order) + 1):
        S = set(order[:k])
        vol = sum(deg[v] for v in S)
        cut = sum(1 for u, v in G.edges() if (u in S) != (v in S))
        denom = min(vol, vol_total - vol)
        p = cut / denom if denom > 0 else 1.0
        if best_phi is None or p < best_phi:
            best_phi, best_k = p, k
    assert abs(phi - best_phi) < 1e-12
    assert set(out.to_pandas()["vid"].astype(int)) == set(order[:best_k])


def test_pagerank_nibble_isolated_seed(ray_session):
    G = fixture_graph("karate")
    # seed not in the graph's edge set -> singleton fallback
    out, phi = pagerank_nibble(
        edges_dataset(G), seed_vid=999, alpha=0.15, iters=5, max_size=10,
        num_partitions=2,
    )
    assert out.to_pandas()["vid"].tolist() == [999]
    assert phi == 1.0


@pytest.mark.parametrize("seed", [0, 33, 16])
def test_gce_matches_brute_greedy(ray_session, seed):
    """greedy_community_expansion must replicate the brute conductance
    greedy exactly (same formulas, same (phi asc, vid asc) tie-break)."""
    from networkit_ray.pipelines.scd import greedy_community_expansion

    G = fixture_graph("karate")
    got, got_phi = greedy_community_expansion(
        edges_dataset(G), seed_vid=seed, max_size=12, num_partitions=3
    )
    got = sorted(got.to_pandas()["vid"].astype(int))

    W2 = 2 * G.number_of_edges()
    C = {seed}
    vol = G.degree(seed)
    cut = G.degree(seed)

    def phi(c, v):
        den = min(v, W2 - v)
        return c / den if den > 0 else float("inf")

    cur = phi(cut, vol)
    while len(C) < 12:
        cands = {}
        for u in C:
            for x in G[u]:
                if x not in C:
                    cands[x] = cands.get(x, 0) + 1
        if not cands:
            break
        best = None
        for x in sorted(cands):
            nc = cut + G.degree(x) - 2 * cands[x]
            nv = vol + G.degree(x)
            p = phi(nc, nv)
            if best is None or p < best[1] - 1e-15:
                best = (x, p, nc, nv)
        if best[1] >= cur - 1e-15:
            break
        C.add(best[0])
        cut, vol, cur = best[2], best[3], best[1]
    assert got == sorted(C)
    assert abs(got_phi - cur) < 1e-12
    # the found community is denser than its boundary on karate
    assert cur < 1.0


@pytest.mark.parametrize("seed,alpha", [(0, 1.0), (33, 1.0), (5, 0.9)])
def test_lfm_local_matches_brute(ray_session, seed, alpha):
    """lfm_local must replicate the brute one-move-per-round fitness
    greedy exactly (same snapshot semantics and tie-breaks)."""
    from networkit_ray.pipelines.scd import lfm_local

    G = fixture_graph("karate")
    got, got_f = lfm_local(
        edges_dataset(G), seed_vid=seed, alpha=alpha, max_size=15,
        num_partitions=3,
    )
    got = sorted(got.to_pandas()["vid"].astype(int))

    def fit(ki, ko):
        den = (ki + ko) ** alpha
        return ki / den if den > 0 else 0.0

    C = {seed}
    ki, ko = 0.0, float(G.degree(seed))
    cur = fit(ki, ko)
    for _ in range(200):
        links = {}
        for u in C:
            for x in G[u]:
                links[x] = links.get(x, 0) + 1
        best = None
        if len(C) < 15:
            for x in sorted(set(links) - C):
                f = fit(ki + 2 * links[x], ko - 2 * links[x] + G.degree(x))
                if best is None or f > best[0] + 1e-15:
                    best = (f, x, True)
        if len(C) > 1:
            for x in sorted(C - {seed}):
                lx = links.get(x, 0)
                f = fit(ki - 2 * lx, ko + 2 * lx - G.degree(x))
                if best is None or f > best[0] + 1e-15:
                    best = (f, x, False)
        if best is None or best[0] <= cur + 1e-15:
            break
        f, x, add = best
        lx = links.get(x, 0)
        if add:
            C.add(x)
            ki += 2 * lx
            ko += G.degree(x) - 2 * lx
        else:
            C.discard(x)
            ki -= 2 * lx
            ko += 2 * lx - G.degree(x)
        cur = f
    assert got == sorted(C)
    assert abs(got_f - cur) < 1e-12


@pytest.mark.parametrize("seed", [0, 33, 25])
def test_clique_detect_vs_networkx(ray_session, seed):
    """Largest clique containing the seed == max over networkx
    find_cliques restricted to cliques containing the seed (ties ->
    lexicographically smallest set)."""
    import networkx as nx

    from networkit_ray.pipelines.scd import clique_detect

    G = fixture_graph("karate")
    got = sorted(
        clique_detect(edges_dataset(G), seed_vid=seed, num_partitions=2)
        .to_pandas()["vid"].astype(int)
    )
    best = None
    for c in nx.find_cliques(G):
        if seed in c:
            key = (-len(c), sorted(int(x) for x in c))
            if best is None or key < best:
                best = key
    assert got == best[1]


def test_clique_detect_isolated_seed(ray_session):
    import networkx as nx

    from networkit_ray.pipelines.scd import clique_detect

    G = nx.path_graph(5)
    G.add_node(99)
    got = clique_detect(edges_dataset(G), seed_vid=99).to_pandas()
    assert list(got["vid"]) == [99]


def _tce_brute(G, seed, max_size=100):
    """Pure-Python oracle of the engine's documented TCE scoring:
    score(v|C) = (links(v,C) + 2*tri(v,C)) / deg(v); after the
    bootstrap round only triangle-closing candidates qualify; ties ->
    smaller vid."""
    adj = {int(v): {int(u) for u in G.neighbors(v)} for v in G.nodes}
    C = {int(seed)}
    while len(C) < max_size:
        scored = []
        for v in sorted(adj):
            if v in C:
                continue
            nc = adj[v] & C
            if not nc:
                continue
            links = len(nc)
            tri = sum(
                1
                for a in nc
                for b in nc
                if a < b and b in adj[a]
            )
            if len(C) > 1 and tri < 1:
                continue
            deg = len(adj[v])
            scored.append((-(links + 2.0 * tri) / deg, v))
        if not scored:
            break
        C.add(min(scored)[1])
    return sorted(C)


@pytest.mark.parametrize("seed", [0, 33, 5])
def test_tce_brute_replication(ray_session, seed):
    from networkit_ray.pipelines.scd import tce

    G = fixture_graph("karate")
    got = sorted(
        tce(edges_dataset(G), seed_vid=seed, max_size=12, num_partitions=3)
        .to_pandas()["vid"].astype(int)
    )
    assert got == _tce_brute(G, seed, max_size=12)


def test_tce_triangle_requirement_stops(ray_session):
    """On a triangle-free graph TCE admits exactly one bootstrap vertex
    and stops (no candidate can close a triangle)."""
    import networkx as nx

    from networkit_ray.pipelines.scd import tce

    G = nx.path_graph(8)
    got = sorted(
        tce(edges_dataset(G), seed_vid=3, max_size=8, num_partitions=2)
        .to_pandas()["vid"].astype(int)
    )
    assert got == _tce_brute(G, 3, max_size=8)
    assert len(got) == 2
