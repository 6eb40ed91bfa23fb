"""Tarjan–Vishkin biconnected components vs networkx exact."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines.biconnectivity import (
    articulation_points,
    biconnected_components,
)

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


def edge_partition(df):
    got = {}
    for s, d, b in zip(
        df["src"].astype(int), df["dst"].astype(int), df["bcc"].astype(int)
    ):
        got.setdefault(b, set()).add((min(s, d), max(s, d)))
    return sorted((frozenset(v) for v in got.values()), key=sorted)


def nx_partition(G):
    return sorted(
        (
            frozenset((min(u, v), max(u, v)) for u, v in c)
            for c in nx.biconnected_component_edges(G)
        ),
        key=sorted,
    )


def sparse_cyclic(n=150, extra=35, seed=7):
    """A tree plus a few chords: many articulation points + nested BCCs."""
    G = nx.random_labeled_tree(n, seed=seed)
    rng = np.random.default_rng(seed)
    for _ in range(extra):
        u, v = rng.integers(0, n, 2)
        if u != v:
            G.add_edge(int(u), int(v))
    return G


@pytest.mark.parametrize(
    "name",
    ["karate", "path100", "star50", "multicomp", "er200"],
)
def test_bcc_vs_networkx(ray_session, name):
    G = fixture_graph(name)
    bcc = biconnected_components(ds_of(G), num_partitions=3).to_pandas()
    assert edge_partition(bcc) == nx_partition(G)
    apdf = articulation_points(
        bcc_edges=ray.data.from_pandas(bcc), num_partitions=3
    ).to_pandas()
    # Ray 2.49 to_pandas drops columns on empty datasets
    ap = set(apdf["vid"].astype(int)) if len(apdf) else set()
    assert ap == set(nx.articulation_points(G))


def test_bcc_two_triangles(ray_session):
    G = nx.Graph([(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)])
    bcc = biconnected_components(ds_of(G), num_partitions=2).to_pandas()
    assert edge_partition(bcc) == nx_partition(G)


def test_bcc_tree_plus_chords(ray_session):
    G = sparse_cyclic()
    bcc = biconnected_components(ds_of(G), num_partitions=3).to_pandas()
    assert edge_partition(bcc) == nx_partition(G)
    apdf = articulation_points(
        bcc_edges=ray.data.from_pandas(bcc), num_partitions=3
    ).to_pandas()
    # Ray 2.49 to_pandas drops columns on empty datasets
    ap = set(apdf["vid"].astype(int)) if len(apdf) else set()
    assert ap == set(nx.articulation_points(G))


def test_bcc_partition_invariant(ray_session):
    G = sparse_cyclic(80, 20, seed=3)
    a = biconnected_components(ds_of(G), num_partitions=2).to_pandas()
    b = biconnected_components(
        ds_of(G).repartition(7), num_partitions=5
    ).to_pandas()
    key = lambda df: sorted(zip(df["src"], df["dst"], df["bcc"]))  # noqa: E731
    assert key(a) == key(b)
