"""Connected components: exact equality vs canonicalized
networkx.connected_components, both modes (FIXTURES.md §3)."""

import networkx as nx
import pytest

from networkit_ray.pipelines.components import connected_components

from tests.conftest import (
    canonical_partition,
    edges_dataset,
    fixture_graph,
    scores_to_dict,
)


def nx_cc_labels(G):
    out = {}
    for comp in nx.connected_components(G):
        m = min(comp)
        for v in comp:
            out[int(v)] = int(m)
    return out


# hash-min needs O(diameter) Dataset rounds; keep the long-diameter fixture
# (path100) on the unionfind mode here — the actor engine covers hash-min on
# path100 in test_engine_actor.py at ~ms/round.
@pytest.mark.parametrize(
    "name,mode",
    [
        ("karate", "hashmin"),
        ("karate", "unionfind"),
        ("multicomp", "hashmin"),
        ("multicomp", "unionfind"),
        ("er200", "hashmin"),
        ("er200", "unionfind"),
        ("path100", "unionfind"),
    ],
)
def test_cc_exact(name, mode, ray_session):
    G = fixture_graph(name)
    got_ds, rounds = connected_components(edges_dataset(G), mode=mode)
    got = {int(k): int(v) for k, v in scores_to_dict(got_ds).items()}
    want = nx_cc_labels(G)
    # isolated vertices are only visible via an explicit vertex table;
    # edge-derived vertices must still match exactly
    got_edge_verts = {k: v for k, v in got.items() if k in want}
    want_edge_verts = {k: v for k, v in want.items() if k in got}
    assert got == want or canonical_partition(got_edge_verts) == canonical_partition(
        want_edge_verts
    )
    # min-vid canonical labels make this an equality, not just same partition
    assert got_edge_verts == want_edge_verts


def test_cc_with_isolated_vertices(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    G = fixture_graph("multicomp")
    verts = ray.data.from_arrow(
        pa.table({"vid": np.array(sorted(int(v) for v in G.nodes), dtype=np.int64)})
    )
    for mode in ("hashmin", "unionfind"):
        got_ds, _ = connected_components(edges_dataset(G), verts, mode=mode)
        got = {int(k): int(v) for k, v in scores_to_dict(got_ds).items()}
        assert got == nx_cc_labels(G)


def test_cc_modes_agree_and_partition_invariant(ray_session):
    G = fixture_graph("er200")
    ref = None
    for mode in ("hashmin", "unionfind"):
        for p in (1, 4):
            got_ds, _ = connected_components(edges_dataset(G), mode=mode, num_partitions=p)
            got = {int(k): int(v) for k, v in scores_to_dict(got_ds).items()}
            if ref is None:
                ref = got
            else:
                assert got == ref


def test_cc_unionfind_contraction_rounds(ray_session):
    """Force multi-round contraction with a tiny driver limit."""
    G = fixture_graph("path100")
    got_ds, rounds = connected_components(
        edges_dataset(G).repartition(8), mode="unionfind", driver_pair_limit=30
    )
    got = {int(k): int(v) for k, v in scores_to_dict(got_ds).items()}
    assert got == nx_cc_labels(G)
    assert rounds > 1
