"""edgescores/ family oracle tests: PrefixJaccardScore (brute top-k
prefix Jaccard over embeddedness rankings), EdgeScoreAsWeight, Blender,
Normalizer, Linearizer (closed-form column transforms)."""

import networkx as nx
import numpy as np
import pytest

import ray.data
import pyarrow as pa

from networkit_ray.pipelines.edgescores import (
    blend_edge_scores,
    edge_score_as_weight,
    linearize_edge_scores,
    normalize_edge_scores,
    prefix_jaccard_scores,
)
from tests.conftest import edges_dataset, fixture_graph


def _brute_prefix_jaccard(G, k):
    emb = {}
    for u, v in G.edges():
        c = len(set(G[u]) & set(G[v]))
        emb[(u, v)] = emb[(v, u)] = c

    def topk(u):
        nbrs = sorted(G[u], key=lambda x: (-emb[(u, x)], x))
        # rank = count of strictly-higher neighbors; keep rank < k
        # (same construction as the engine: ties share the min rank)
        out = set()
        for x in nbrs:
            rank = sum(
                1
                for y in G[u]
                if emb[(u, y)] > emb[(u, x)]
                or (emb[(u, y)] == emb[(u, x)] and y < x)
            )
            if rank < k:
                out.add(x)
        return out

    scores = {}
    for u, v in G.edges():
        a, b = topk(u), topk(v)
        un = len(a | b)
        scores[(min(u, v), max(u, v))] = len(a & b) / un if un else 0.0
    return scores


@pytest.mark.parametrize("name,k", [("karate", 5), ("er200", 8)])
def test_prefix_jaccard_brute(ray_session, name, k):
    G = fixture_graph(name)
    got = prefix_jaccard_scores(
        edges_dataset(G), k=k, num_partitions=3
    ).to_pandas()
    want = _brute_prefix_jaccard(G, k)
    assert len(got) == G.number_of_edges()
    for _, r in got.iterrows():
        key = (min(int(r["src"]), int(r["dst"])), max(int(r["src"]), int(r["dst"])))
        assert abs(r["score"] - want[key]) < 1e-12, key


def _scored(vals):
    n = len(vals)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": np.arange(n, dtype=np.int64),
                "dst": np.arange(n, dtype=np.int64) + 100,
                "score": np.asarray(vals, dtype=np.float64),
            }
        )
    )


def test_edge_score_as_weight(ray_session):
    got = edge_score_as_weight(
        _scored([1.0, 2.0, 3.0]), squared=True, offset=1.0, factor=2.0
    ).to_pandas().sort_values("src")
    assert np.allclose(got["w"], [3.0, 9.0, 19.0])


def test_blend_edge_scores(ray_session):
    a = _scored([0.0, 1.0, 2.0])
    b = _scored([4.0, 3.0, 2.0])
    got = blend_edge_scores(a, b, alpha=0.25).to_pandas().sort_values("src")
    assert np.allclose(got["score"], 0.25 * np.array([0, 1, 2]) + 0.75 * np.array([4, 3, 2]))


def test_normalize_edge_scores(ray_session):
    got = (
        normalize_edge_scores(_scored([2.0, 4.0, 10.0]), lower=1.0, upper=3.0)
        .to_pandas().sort_values("src")
    )
    assert np.allclose(got["score"], [1.0, 1.5, 3.0])
    inv = (
        normalize_edge_scores(_scored([2.0, 4.0, 10.0]), invert=True)
        .to_pandas().sort_values("src")
    )
    assert np.allclose(inv["score"], [1.0, 0.75, 0.0])
    const = normalize_edge_scores(_scored([5.0, 5.0]), lower=0.2).to_pandas()
    assert np.allclose(const["score"], [0.2, 0.2])


def test_linearize_edge_scores(ray_session):
    # values 10,10,20,30,30,30 -> positions 0..5, tie runs averaged
    got = (
        linearize_edge_scores(_scored([30.0, 10.0, 20.0, 30.0, 10.0, 30.0]))
        .to_pandas().sort_values("src")
    )
    want = {10.0: 0.5 / 5, 20.0: 2.0 / 5, 30.0: 4.0 / 5}
    s = np.array([30.0, 10.0, 20.0, 30.0, 10.0, 30.0])
    assert np.allclose(got["score"], [want[x] for x in s])
    inv = (
        linearize_edge_scores(_scored([1.0, 2.0]), inverse=True)
        .to_pandas().sort_values("src")
    )
    assert np.allclose(inv["score"], [1.0, 0.0])


@pytest.mark.parametrize("name", ["karate", "er200"])
def test_algebraic_distance_exact(ray_session, name):
    """Bit-level replication of the smoothing recursion in numpy (same
    hash init, same omega/iterations) — the engine must match exactly."""
    from networkit_ray.pipelines.structure import algebraic_distance_scores
    from networkit_ray.sources.generators import _uniform

    G = fixture_graph(name)
    K, T, om, seed = 4, 5, 0.5, 42
    got = algebraic_distance_scores(
        edges_dataset(G), systems=K, iterations=T, omega=om, seed=seed,
        num_partitions=3,
    ).to_pandas()
    vids = np.array(sorted(G.nodes), dtype=np.int64)
    idx = {int(v): i for i, v in enumerate(vids)}
    X = np.stack([_uniform(vids, 20 + k, seed) for k in range(K)], axis=1)
    A = [[idx[u] for u in G[v]] for v in vids]
    for _ in range(T):
        M = np.stack([X[nbrs].mean(axis=0) for nbrs in A])
        X = (1 - om) * X + om * M
    assert len(got) == G.number_of_edges()
    for _, r in got.iterrows():
        u, v = idx[int(r["src"])], idx[int(r["dst"])]
        want = np.sqrt(((X[u] - X[v]) ** 2).sum())
        assert abs(r["score"] - want) < 1e-12


def test_algebraic_distance_separates_cliques(ray_session):
    """Two cliques joined by a bridge: the bridge edge must carry the
    LARGEST algebraic distance."""
    import networkx as nx

    from networkit_ray.pipelines.structure import algebraic_distance_scores

    G = nx.disjoint_union(nx.complete_graph(10), nx.complete_graph(10))
    G.add_edge(0, 10)
    got = algebraic_distance_scores(
        edges_dataset(G), systems=6, iterations=10, num_partitions=2
    ).to_pandas()
    top = got.sort_values("score", ascending=False).iloc[0]
    assert {int(top["src"]), int(top["dst"])} == {0, 10}


@pytest.mark.parametrize("name", ["karate", "er200"])
def test_permanence_centrality_brute(ray_session, name):
    """Brute-force permanence (Chakraborty et al. 2014 formula, exactly
    the engine's pinned contract) per vertex over a greedy-modularity
    partition."""
    import networkx as nx
    from networkx.algorithms.community import greedy_modularity_communities

    from networkit_ray.pipelines.centrality import permanence_centrality

    G = fixture_graph(name)
    part = {
        int(v): i
        for i, c in enumerate(greedy_modularity_communities(G))
        for v in c
    }
    lab = ray.data.from_arrow(
        pa.table(
            {
                "vid": np.array(list(part.keys()), np.int64),
                "label": np.array(list(part.values()), np.int64),
            }
        )
    )
    got = permanence_centrality(
        edges_dataset(G), lab, num_partitions=3
    ).to_pandas()
    gd = dict(zip(got["vid"].astype(int), got["permanence"]))
    for v in G.nodes:
        nbrs = list(G[v])
        internal = [u for u in nbrs if part[u] == part[v]]
        ext = {}
        for u in nbrs:
            if part[u] != part[v]:
                ext[part[u]] = ext.get(part[u], 0) + 1
        emax = max(ext.values()) if ext else 1
        i = len(internal)
        tri = sum(
            1
            for a in internal
            for b in internal
            if a < b and G.has_edge(a, b)
        )
        cin = tri / (i * (i - 1) / 2) if i >= 2 else 0.0
        want = i / (emax * max(G.degree(v), 1)) - (1 - cin)
        assert abs(gd[int(v)] - want) < 1e-12, v


@pytest.mark.parametrize("name", ["karate", "er200"])
def test_group_degree_matches_brute_greedy(ray_session, name):
    """The distributed greedy must replicate the brute greedy exactly
    (same (gain desc, vid asc) tie-break) — members, gains, and the final
    group degree."""
    from networkit_ray.pipelines.centrality import group_degree

    G = fixture_graph(name)
    k = 4
    got, gd = group_degree(edges_dataset(G), k=k, num_partitions=3)
    got = got.to_pandas().sort_values("rank")

    S, covered = set(), set()
    want = []
    for _ in range(k):
        best = None
        for v in sorted(G.nodes):
            if v in S:
                continue
            gain = sum(1 for u in G[v] if u not in covered and u not in S)
            if v in covered and v not in S:
                gain -= 1
            # covered tracks S ∪ N(S); recompute respecting membership
            if best is None or gain > best[1]:
                best = (v, gain)
        S.add(best[0])
        want.append(best)
        covered = set(S) | {u for s in S for u in G[s]}
    assert list(got["vid"].astype(int)) == [v for v, _ in want]
    assert list(got["gain"].astype(int)) == [g for _, g in want]
    assert gd == len(covered - S)


def test_random_edge_scores(ray_session):
    from networkit_ray.pipelines.structure import (
        global_threshold_filter,
        random_edge_scores,
        random_node_edge_scores,
    )

    G = fixture_graph("er200")
    a = random_edge_scores(edges_dataset(G), seed=1).to_pandas()
    b = random_edge_scores(
        edges_dataset(G).repartition(7), seed=1
    ).to_pandas()
    a = a.sort_values(["src", "dst"]).reset_index(drop=True)
    b = b.sort_values(["src", "dst"]).reset_index(drop=True)
    assert np.allclose(a["score"], b["score"])
    assert len(a) == G.number_of_edges()
    assert a["score"].between(0, 1).all()
    # roughly uniform: thresholding at 0.5 keeps about half
    kept = global_threshold_filter(
        random_edge_scores(edges_dataset(G), seed=1), "score", 0.5
    ).count()
    assert 0.35 * len(a) < kept < 0.65 * len(a)
    # node variant: per-node draws shared across incident edges
    n = random_node_edge_scores(edges_dataset(G), seed=2).to_pandas()
    from networkit_ray.sources.generators import _uniform

    uv = _uniform(n["src"].to_numpy(np.int64), 41, 2)
    ud = _uniform(n["dst"].to_numpy(np.int64), 41, 2)
    assert np.allclose(n["score"], np.maximum(uv, ud))
