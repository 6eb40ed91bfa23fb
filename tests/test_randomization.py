"""Edge-switching randomization: exact degree preservation, simplicity,
mixing, determinism."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines.randomization import edge_switching

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


@pytest.mark.parametrize("name", ["karate", "er200", "ba300"])
def test_edge_switching_invariants(ray_session, name):
    G = fixture_graph(name)
    out = edge_switching(ds_of(G), rounds=4, seed=7, num_partitions=3).to_pandas()
    assert len(out) == G.number_of_edges()
    assert len(set(zip(out["src"], out["dst"]))) == len(out)  # simple
    assert (out["src"] < out["dst"]).all()  # canonical, no loops
    got = nx.Graph(list(zip(out["src"].astype(int), out["dst"].astype(int))))
    for v in G.nodes:
        if v not in got:
            got.add_node(v)
    assert sorted(d for _, d in got.degree()) == sorted(
        d for _, d in G.degree()
    )


def test_edge_switching_mixes(ray_session):
    G = fixture_graph("er200")
    out = edge_switching(ds_of(G), rounds=5, seed=3, num_partitions=3).to_pandas()
    orig = {(min(u, v), max(u, v)) for u, v in G.edges()}
    moved = len(set(zip(out["src"].astype(int), out["dst"].astype(int))) - orig)
    assert moved > len(out) // 4  # a large fraction of edges rewired


def test_edge_switching_deterministic(ray_session):
    G = fixture_graph("karate")
    a = edge_switching(ds_of(G), rounds=3, seed=7, num_partitions=2).to_pandas()
    b = edge_switching(
        ds_of(G).repartition(5), rounds=3, seed=7, num_partitions=4
    ).to_pandas()
    assert sorted(zip(a["src"], a["dst"])) == sorted(zip(b["src"], b["dst"]))
    c = edge_switching(ds_of(G), rounds=3, seed=8, num_partitions=2).to_pandas()
    assert sorted(zip(a["src"], a["dst"])) != sorted(zip(c["src"], c["dst"]))
