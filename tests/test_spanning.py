"""Spanning forest (Boruvka) conformance vs networkx exact MSF."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines.spanning import (
    random_maximum_spanning_forest,
    spanning_forest,
)

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


def distinct_weights(G, seed=3):
    rng = np.random.default_rng(seed)
    wts = rng.permutation(G.number_of_edges()) + 1.0
    Gw = nx.Graph()
    for i, (u, v) in enumerate(G.edges()):
        Gw.add_edge(u, v, weight=float(wts[i]))
    for n in G.nodes:
        Gw.add_node(n)
    return wts, Gw


@pytest.mark.parametrize("name", ["karate", "multicomp", "path100", "ba300"])
def test_msf_exact_vs_networkx(ray_session, name):
    G = fixture_graph(name)
    wts, Gw = distinct_weights(G)
    f = spanning_forest(weighted_ds(G, wts), num_partitions=3).to_pandas()
    want = {
        (min(u, v), max(u, v))
        for u, v, _ in nx.minimum_spanning_edges(Gw, data=True)
    }
    assert set(zip(f["src"].astype(int), f["dst"].astype(int))) == want
    # returned weights are the original (positive) edge weights
    wmap = {(min(u, v), max(u, v)): d["weight"] for u, v, d in Gw.edges(data=True)}
    for s, d, w in zip(f["src"].astype(int), f["dst"].astype(int), f["w"]):
        assert w == wmap[(s, d)]


def test_max_mode_vs_networkx(ray_session):
    G = fixture_graph("er200")
    wts, Gw = distinct_weights(G, seed=9)
    f = spanning_forest(weighted_ds(G, wts), num_partitions=3, mode="max").to_pandas()
    want = {
        (min(u, v), max(u, v))
        for u, v, _ in nx.maximum_spanning_edges(Gw, data=True)
    }
    assert set(zip(f["src"].astype(int), f["dst"].astype(int))) == want


def test_msf_tied_weights_total_weight(ray_session):
    """With ties the edge set is tie-break-defined but the total weight is
    graph-unique — must equal networkx's."""
    G = fixture_graph("er200")
    rng = np.random.default_rng(5)
    wts = rng.integers(1, 4, G.number_of_edges()).astype(float)  # heavy ties
    Gw = nx.Graph()
    for i, (u, v) in enumerate(G.edges()):
        Gw.add_edge(u, v, weight=float(wts[i]))
    f = spanning_forest(weighted_ds(G, wts), num_partitions=3).to_pandas()
    want = sum(
        d["weight"] for _, _, d in nx.minimum_spanning_edges(Gw, data=True)
    )
    assert abs(f["w"].sum() - want) < 1e-9
    # forest shape: size-1 edges per component
    ncomp = nx.number_connected_components(G)
    assert len(f) == G.number_of_nodes() - ncomp


def test_msf_partition_invariant(ray_session):
    G = fixture_graph("ba300")
    wts, _ = distinct_weights(G)
    a = spanning_forest(weighted_ds(G, wts), num_partitions=2).to_pandas()
    b = spanning_forest(
        weighted_ds(G, wts).repartition(7), num_partitions=5
    ).to_pandas()
    key = lambda df: sorted(zip(df["src"], df["dst"]))  # noqa: E731
    assert key(a) == key(b)


def test_random_msf_forest_and_deterministic(ray_session):
    G = fixture_graph("multicomp")
    ds = weighted_ds(G, np.ones(G.number_of_edges()))
    r1 = random_maximum_spanning_forest(ds, seed=5, num_partitions=2).to_pandas()
    r2 = random_maximum_spanning_forest(
        ds.repartition(5), seed=5, num_partitions=4
    ).to_pandas()
    assert sorted(zip(r1["src"], r1["dst"])) == sorted(zip(r2["src"], r2["dst"]))
    nontrivial = [c for c in nx.connected_components(G) if len(c) > 1]
    assert len(r1) == sum(len(c) - 1 for c in nontrivial)
    # a different seed gives a different (but equally sized) forest
    r3 = random_maximum_spanning_forest(ds, seed=6, num_partitions=2).to_pandas()
    assert len(r3) == len(r1)
    # the picked edges are real edges
    eset = {(min(int(u), int(v)), max(int(u), int(v))) for u, v in G.edges()}
    for s, d in zip(r1["src"].astype(int), r1["dst"].astype(int)):
        assert (s, d) in eset


def test_empty_and_edgeless(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "w": pa.array([], pa.float64()),
            }
        )
    )
    assert spanning_forest(ds, num_partitions=2).count() == 0
