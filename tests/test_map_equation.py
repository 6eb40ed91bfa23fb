"""LouvainMapEquation oracle tests (SURVEY §2.3 community/
LouvainMapEquation; Rosvall & Bergstrom 2008 two-level map equation).

Oracle: brute-force codelength over the networkx graph; the engine's
`map_equation_codelength` must match to 1e-9, and the optimizer's result
must never code worse than the all-singletons or one-blob partitions
(the endgame pins this)."""

import networkx as nx
import numpy as np
import pytest

import ray.data
import pyarrow as pa

from networkit_ray.pipelines.community import (
    louvain_map_equation,
    map_equation_codelength,
)
from tests.conftest import edges_dataset, fixture_graph


def _plogp(x):
    x = np.asarray(x, float)
    out = np.zeros_like(x)
    p = x > 0
    out[p] = x[p] * np.log2(x[p])
    return out


def brute_codelength(G, labels: dict) -> float:
    """Two-level map-equation L(M) in bits, unit edge weights."""
    W = G.number_of_edges()
    deg = dict(G.degree())
    comms = {}
    for v, c in labels.items():
        comms.setdefault(c, []).append(v)
    pv = np.array([deg[v] / (2 * W) for v in G.nodes()])
    qc, pcv = [], []
    for mem in comms.values():
        ms = set(mem)
        cut = sum(1 for u in mem for nb in G.neighbors(u) if nb not in ms)
        qc.append(cut / (2 * W))
        pcv.append(sum(deg[v] for v in mem) / (2 * W))
    qc, pcv = np.array(qc), np.array(pcv)
    q = qc.sum()
    return float(
        _plogp(np.array([q]))[0]
        - 2 * _plogp(qc).sum()
        - _plogp(pv).sum()
        + _plogp(qc + pcv).sum()
    )


def _unit_edges(G):
    src = [int(u) for u, v in G.edges()]
    dst = [int(v) for u, v in G.edges()]
    return ray.data.from_arrow(
        pa.table(
            {
                "src": np.asarray(src, np.int64),
                "dst": np.asarray(dst, np.int64),
                "w": np.ones(len(src)),
            }
        )
    )


def _labels_ds(part: dict):
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": np.asarray(list(part.keys()), np.int64),
                "label": np.asarray(list(part.values()), np.int64),
            }
        )
    )


@pytest.mark.parametrize("name", ["karate", "er200"])
def test_codelength_matches_brute(ray_session, name):
    G = fixture_graph(name)
    from networkx.algorithms.community import greedy_modularity_communities

    part = {
        int(v): i
        for i, c in enumerate(greedy_modularity_communities(G))
        for v in c
    }
    edges = _unit_edges(G)
    L_engine = map_equation_codelength(edges, _labels_ds(part), num_partitions=4)
    L_brute = brute_codelength(G, part)
    assert abs(L_engine - L_brute) < 1e-9


def test_codelength_trivial_partitions(ray_session):
    G = fixture_graph("karate")
    edges = _unit_edges(G)
    sing = {int(v): int(v) for v in G.nodes()}
    one = {int(v): 0 for v in G.nodes()}
    for part in (sing, one):
        L_engine = map_equation_codelength(
            edges, _labels_ds(part), num_partitions=4
        )
        assert abs(L_engine - brute_codelength(G, part)) < 1e-9


@pytest.mark.parametrize("name", ["karate", "two_cliques"])
def test_optimizer_beats_trivial_baselines(ray_session, name):
    if name == "two_cliques":
        G = nx.disjoint_union(nx.complete_graph(8), nx.complete_graph(8))
        G.add_edge(0, 8)
    else:
        G = fixture_graph(name)
    edges = _unit_edges(G)
    found = louvain_map_equation(
        edges, num_partitions=2, max_levels=2, move_rounds=2, colors=2
    )
    df = found.to_pandas()
    assert set(df["vid"]) == {int(v) for v in G.nodes()}
    part = dict(zip(df["vid"].astype(int), df["label"].astype(int)))
    L_m = brute_codelength(G, part)
    L_s = brute_codelength(G, {int(v): int(v) for v in G.nodes()})
    L_1 = brute_codelength(G, {int(v): 0 for v in G.nodes()})
    assert L_m <= L_s + 1e-9
    assert L_m <= L_1 + 1e-9
    if name == "two_cliques":
        # clear two-module structure: must strictly beat one-blob
        assert L_m < L_1 - 1e-6
        assert part[0] != part[9]


def test_optimizer_deterministic_across_partitioning(ray_session):
    G = fixture_graph("karate")
    edges = _unit_edges(G)
    a = louvain_map_equation(
        edges, num_partitions=2, max_levels=2, move_rounds=2, colors=2
    ).to_pandas().sort_values("vid").reset_index(drop=True)
    b = louvain_map_equation(
        edges, num_partitions=4, max_levels=2, move_rounds=2, colors=2
    ).to_pandas().sort_values("vid").reset_index(drop=True)
    assert (a["label"].values == b["label"].values).all()


def test_clustering_generator(ray_session):
    """community/ClusteringGenerator baselines: shapes + determinism."""
    from networkit_ray.pipelines.community import (
        make_one_clustering,
        make_random_clustering,
        make_singleton_clustering,
    )

    verts = ray.data.from_arrow(
        pa.table({"vid": np.arange(5, 105, dtype=np.int64)})
    )
    s = make_singleton_clustering(verts).to_pandas()
    assert (s["label"] == s["vid"]).all()
    o = make_one_clustering(verts).to_pandas()
    assert (o["label"] == 5).all()
    r1 = make_random_clustering(verts, k=7, seed=3).to_pandas().sort_values("vid")
    r2 = make_random_clustering(
        verts.repartition(5), k=7, seed=3
    ).to_pandas().sort_values("vid")
    assert (r1["label"].values == r2["label"].values).all()
    assert set(r1["label"]).issubset(set(range(7)))
    assert r1["label"].nunique() >= 5  # spread over most of the 7
