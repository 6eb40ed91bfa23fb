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


# ---- degree-preserving shuffle ------------------------------------------


@pytest.mark.parametrize("name", ["karate", "ba300"])
def test_degree_preserving_permutation_bijection(ray_session, name):
    from networkit_ray.pipelines.randomization import (
        degree_preserving_permutation,
    )

    G = fixture_graph(name)
    m = degree_preserving_permutation(ds_of(G), seed=5, num_partitions=3).to_pandas()
    deg = dict(G.degree())
    # bijection on the non-isolated vertex set
    assert sorted(m["old"]) == sorted(m["new"])
    assert m["old"].is_unique and m["new"].is_unique
    # degree-preserving: image has the same degree as the preimage
    for row in m.itertuples():
        assert deg[int(row.old)] == deg[int(row.new)]


def test_degree_preserving_shuffle_is_isomorphic_image(ray_session):
    from networkit_ray.pipelines.randomization import (
        degree_preserving_permutation,
        degree_preserving_shuffle,
    )

    G = fixture_graph("ba300")
    m = (
        degree_preserving_permutation(ds_of(G), seed=5, num_partitions=3)
        .to_pandas()
        .set_index("old")["new"]
    )
    out = degree_preserving_shuffle(ds_of(G), seed=5, num_partitions=3).to_pandas()
    got = set(zip(out["src"].astype(int), out["dst"].astype(int)))
    want = set()
    for u, v in G.edges():
        a, b = int(m[int(u)]), int(m[int(v)])
        want.add((min(a, b), max(a, b)))
    assert got == want
    assert len(got) == G.number_of_edges()
    # per-vertex degrees of the shuffled graph equal the original's
    H = nx.Graph(got)
    for v in G.nodes:
        assert H.degree(v) if v in H else 0 == G.degree(v)
    # non-trivial: a BA graph has big equal-degree classes, so the
    # deterministic shuffle must actually move edges
    orig = {(min(int(u), int(v)), max(int(u), int(v))) for u, v in G.edges()}
    assert got != orig


def test_degree_preserving_shuffle_deterministic(ray_session):
    from networkit_ray.pipelines.randomization import degree_preserving_shuffle

    G = fixture_graph("karate")
    a = degree_preserving_shuffle(ds_of(G), seed=9, num_partitions=2).to_pandas()
    b = degree_preserving_shuffle(ds_of(G), seed=9, num_partitions=4).to_pandas()
    ka = sorted(zip(a["src"], a["dst"]))
    kb = sorted(zip(b["src"], b["dst"]))
    assert ka == kb


# --------------------------------------------------------------------------
# GlobalCurveball (Carstens/Hamann et al., ESA 2018)
# --------------------------------------------------------------------------

from networkit_ray.pipelines.randomization import global_curveball


@pytest.mark.parametrize("name", ["karate", "er200", "ba300"])
def test_global_curveball_invariants(ray_session, name):
    G = fixture_graph(name)
    out = global_curveball(ds_of(G), rounds=4, seed=7, num_partitions=3).to_pandas()
    assert len(out) == G.number_of_edges()
    assert len(set(zip(out["src"], out["dst"]))) == len(out)  # simple
    assert (out["src"] < out["dst"]).all()  # canonical, no loops
    got = nx.Graph(list(zip(out["src"].astype(int), out["dst"].astype(int))))
    for v in G.nodes:
        if v not in got:
            got.add_node(v)
    # curveball preserves EVERY vertex's degree exactly, not just the multiset
    assert dict(got.degree()) == dict(G.degree())


def test_global_curveball_mixes(ray_session):
    G = fixture_graph("er200")
    out = global_curveball(ds_of(G), rounds=5, seed=3, num_partitions=3).to_pandas()
    orig = {(min(u, v), max(u, v)) for u, v in G.edges()}
    moved = len(set(zip(out["src"].astype(int), out["dst"].astype(int))) - orig)
    assert moved > len(out) // 4  # a large fraction of edges rewired


def test_global_curveball_deterministic(ray_session):
    G = fixture_graph("karate")
    a = global_curveball(ds_of(G), rounds=3, seed=7, num_partitions=2).to_pandas()
    b = global_curveball(
        ds_of(G).repartition(5), rounds=3, seed=7, num_partitions=4
    ).to_pandas()
    assert sorted(zip(a["src"], a["dst"])) == sorted(zip(b["src"], b["dst"]))
    c = global_curveball(ds_of(G), rounds=3, seed=8, num_partitions=2).to_pandas()
    assert sorted(zip(a["src"], a["dst"])) != sorted(zip(c["src"], c["dst"]))
