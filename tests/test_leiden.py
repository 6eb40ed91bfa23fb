"""Leiden: community quality + the connectivity guarantee (every returned
community induces a connected subgraph — the property Louvain lacks) +
partition-invariance determinism."""

import networkx as nx
import numpy as np
import pytest

import ray.data

from networkit_ray.pipelines.community import leiden, modularity

from tests.conftest import edges_dataset, fixture_graph


def _communities(lab):
    out = {}
    for v, l in zip(lab["vid"], lab["label"]):
        out.setdefault(int(l), set()).add(int(v))
    return list(out.values())


@pytest.mark.parametrize("name", ["karate", "er200"])
def test_leiden_connected_and_quality(ray_session, name):
    G = fixture_graph(name)
    ds = edges_dataset(G)
    lab = leiden(ds, num_partitions=2, max_levels=2, move_rounds=3).to_pandas()
    assert set(lab["vid"].astype(int)) == set(int(v) for v in G.nodes)
    # canonical labels: every label is the min vid of its community
    grp = lab.groupby("label")["vid"].min()
    assert (grp.index == grp.values).all()
    # the Leiden guarantee: every community induces a connected subgraph
    for comm in _communities(lab):
        assert nx.is_connected(G.subgraph(comm)), (name, sorted(comm)[:5])
    # quality within reach of networkx louvain
    q = (
        modularity(ds, ray.data.from_pandas(lab), num_partitions=2)
        .to_pandas()["modularity"][0]
    )
    want = nx.algorithms.community.modularity(
        G, nx.algorithms.community.louvain_communities(G, seed=1)
    )
    assert q >= 0.7 * want, (q, want)


def test_leiden_deterministic_across_partitioning(ray_session):
    # determinism is independent of round counts — reduced sub-round
    # budget (colors=2, 2 move/refine rounds) keeps the property pinned
    # at a third of the wall of the full-budget quality tests above
    G = fixture_graph("karate")
    ds = edges_dataset(G)
    kw = dict(max_levels=2, move_rounds=2, refine_rounds=2, colors=2)
    a = leiden(ds, num_partitions=2, **kw).to_pandas().sort_values("vid")
    b = leiden(ds, num_partitions=4, **kw).to_pandas().sort_values("vid")
    assert (a["label"].to_numpy() == b["label"].to_numpy()).all()


def test_leiden_two_cliques(ray_session):
    # two 8-cliques joined by one edge: leiden must separate them exactly
    G = nx.Graph()
    G.update(nx.complete_graph(range(8)))
    G.update(nx.complete_graph(range(8, 16)))
    G.add_edge(0, 8)
    lab = leiden(
        edges_dataset(G), num_partitions=2, max_levels=2, move_rounds=3
    ).to_pandas()
    groups = {
        frozenset(g["vid"].astype(int)) for _, g in lab.groupby("label")
    }
    assert groups == {frozenset(range(8)), frozenset(range(8, 16))}
