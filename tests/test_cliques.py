"""Maximal clique enumeration vs networkx find_cliques (exact)."""

import networkx as nx
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines.cliques import maximal_cliques

from tests.conftest import fixture_graph


def ds_of(G):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([int(u) for u, _ in G.edges()], pa.int64()),
                "dst": pa.array([int(v) for _, v in G.edges()], pa.int64()),
                "w": pa.array([1.0] * G.number_of_edges()),
            }
        )
    )


def clique_set(df):
    return {frozenset(int(x) for x in c.split(",")) for c in df["clique"]}


@pytest.mark.parametrize("name", ["karate", "er200", "ba300", "star50", "multicomp"])
def test_cliques_vs_networkx(ray_session, name):
    G = fixture_graph(name)
    got = maximal_cliques(ds_of(G), num_partitions=3).to_pandas()
    want = {frozenset(c) for c in nx.find_cliques(G) if len(c) >= 2}
    assert clique_set(got) == want
    # size column is consistent
    for c, s in zip(got["clique"], got["size"]):
        assert len(c.split(",")) == s


def test_cliques_two_triangles(ray_session):
    G = nx.Graph([(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)])
    got = maximal_cliques(ds_of(G), num_partitions=2).to_pandas()
    assert clique_set(got) == {frozenset({0, 1, 2}), frozenset({0, 3, 4})}


def test_cliques_partition_invariant(ray_session):
    G = nx.gnp_random_graph(80, 0.15, seed=3)
    a = maximal_cliques(ds_of(G), num_partitions=2).to_pandas()
    b = maximal_cliques(ds_of(G).repartition(7), num_partitions=5).to_pandas()
    assert sorted(a["clique"]) == sorted(b["clique"])
