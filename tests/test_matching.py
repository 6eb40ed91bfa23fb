"""Local-max matching: validity, maximality, 1/2-approximation,
determinism."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines.matching import local_max_matching

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


@pytest.mark.parametrize("name", ["karate", "path100", "er200", "multicomp"])
def test_matching_valid_maximal_halfapprox(ray_session, name):
    G = fixture_graph(name)
    rng = np.random.default_rng(5)
    wts = rng.random(G.number_of_edges()) + 0.5
    m = local_max_matching(weighted_ds(G, wts), num_partitions=3).to_pandas()
    vs = np.concatenate([m["src"].to_numpy(), m["dst"].to_numpy()])
    assert len(vs) == len(set(vs))  # a vertex is matched at most once
    mset = set(vs)
    for u, v in G.edges():  # maximal: no edge with both endpoints free
        assert u in mset or v in mset
    Gw = nx.Graph()
    for i, (u, v) in enumerate(G.edges()):
        Gw.add_edge(u, v, weight=float(wts[i]))
    opt = sum(Gw[u][v]["weight"] for u, v in nx.max_weight_matching(Gw))
    assert m["w"].sum() >= 0.5 * opt - 1e-9


def test_matching_partition_invariant(ray_session):
    G = fixture_graph("ba300")
    rng = np.random.default_rng(9)
    wts = rng.random(G.number_of_edges()) + 0.5
    a = local_max_matching(weighted_ds(G, wts), num_partitions=2).to_pandas()
    b = local_max_matching(
        weighted_ds(G, wts).repartition(7), num_partitions=5
    ).to_pandas()
    key = lambda df: sorted(zip(df["src"], df["dst"]))  # noqa: E731
    assert key(a) == key(b)


def test_matching_unit_weights_is_maximal_matching(ray_session):
    G = fixture_graph("star50")
    m = local_max_matching(
        weighted_ds(G, np.ones(G.number_of_edges())), num_partitions=2
    ).to_pandas()
    assert len(m) == 1  # star: one edge saturates the hub
