"""Synchronous PLP: exact label equality vs the pure-Python reference
implementation of the pinned spec (FIXTURES.md §3)."""

import numpy as np
import pytest

from networkit_ray.pipelines.labelprop import label_propagation

from tests.conftest import edges_dataset, fixture_graph, scores_to_dict
from tests.ref_syncplp import ref_sync_plp


def _run(name, fixed_iters=None, num_partitions=4):
    import pyarrow as pa
    import ray.data

    G = fixture_graph(name)
    ds = edges_dataset(G)
    verts = ray.data.from_arrow(
        pa.table({"vid": np.array(sorted(int(v) for v in G.nodes), dtype=np.int64)})
    )
    got_ds, rounds = label_propagation(
        ds, verts, fixed_iters=fixed_iters, max_iter=30, num_partitions=num_partitions
    )
    got = {int(k): int(v) for k, v in scores_to_dict(got_ds).items()}
    edges = [(int(u), int(v), float(d.get("weight", 1.0))) for u, v, d in G.edges(data=True)]
    want, ref_rounds = ref_sync_plp(
        edges, set(int(v) for v in G.nodes), max_iter=30, fixed_iters=fixed_iters
    )
    return got, want, rounds, ref_rounds


# NOTE: sync PLP on e.g. bipartite-ish structures can 2-cycle and never hit a
# fixpoint; fixed_iters keeps engine and oracle in lockstep for exactness.
# (kept small: each Dataset-engine round costs ~2 Ray jobs; the actor engine
# runs the deeper sweeps in test_engine_actor.py)
@pytest.mark.parametrize(
    "name,fixed_iters",
    [
        ("karate", 1),
        ("karate", 3),
        ("karate", 7),
        ("multicomp", 3),
        ("star50", 2),
        ("er200", 3),
    ],
)
def test_sync_plp_exact_fixed_rounds(name, fixed_iters, ray_session):
    got, want, rounds, _ = _run(name, fixed_iters=fixed_iters)
    assert rounds == fixed_iters
    assert got == want


def test_sync_plp_weighted(ray_session):
    import networkx as nx

    rng = np.random.default_rng(7)
    G = nx.Graph()
    H = fixture_graph("karate")
    for u, v in H.edges():
        G.add_edge(u, v, weight=float(rng.integers(1, 6)))
    got_ds, _ = label_propagation(edges_dataset(G), fixed_iters=5, num_partitions=4)
    got = {int(k): int(v) for k, v in scores_to_dict(got_ds).items()}
    edges = [(int(u), int(v), float(d["weight"])) for u, v, d in G.edges(data=True)]
    want, _ = ref_sync_plp(edges, set(int(v) for v in G.nodes), fixed_iters=5)
    assert got == want


def test_sync_plp_partition_invariance(ray_session):
    base = None
    for p in (1, 2, 8):
        got, want, _, _ = _run("karate", fixed_iters=4, num_partitions=p)
        assert got == want
        if base is None:
            base = got
        else:
            assert got == base
