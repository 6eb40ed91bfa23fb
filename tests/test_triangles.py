"""Per-vertex triangle counts: exact vs networkx.triangles (FIXTURES.md §3),
including hub graphs and dirty (multi-edge / self-loop) inputs."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines.triangles import triangle_counts

from tests.conftest import edges_dataset, fixture_graph, scores_to_dict


@pytest.mark.parametrize("name", ["karate", "er200", "ba300", "star50"])
def test_triangles_exact(name, ray_session):
    G = fixture_graph(name)
    got_ds = triangle_counts(edges_dataset(G), num_partitions=4)
    got = {int(k): int(v) for k, v in scores_to_dict(got_ds).items()}
    want = {int(k): int(v) for k, v in nx.triangles(G).items()}
    assert got == want


def test_triangles_dirty_input(ray_session):
    """Self-loops, duplicates and reversed duplicates must not change counts."""
    G = fixture_graph("karate")
    rows = [(int(u), int(v), 1.0) for u, v in G.edges()]
    dirty = rows + [(v, u, 1.0) for u, v in [r[:2] for r in rows[:30]]]
    dirty += [(u, u, 1.0) for u in range(10)] + rows[:15]
    src, dst, w = zip(*dirty)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": np.array(src, dtype=np.int64),
                "dst": np.array(dst, dtype=np.int64),
                "w": np.array(w, dtype=np.float64),
            }
        )
    )
    got = {int(k): int(v) for k, v in scores_to_dict(triangle_counts(ds)).items()}
    want = {int(k): int(v) for k, v in nx.triangles(G).items()}
    assert got == want


def test_triangles_partition_invariance(ray_session):
    G = fixture_graph("ba300")
    want = {int(k): int(v) for k, v in nx.triangles(G).items()}
    for p in (1, 8):
        got_ds = triangle_counts(edges_dataset(G), num_partitions=p)
        got = {int(k): int(v) for k, v in scores_to_dict(got_ds).items()}
        assert got == want


def test_triangles_triangle_free(ray_session):
    G = fixture_graph("path100")
    got = {
        int(k): int(v)
        for k, v in scores_to_dict(triangle_counts(edges_dataset(G))).items()
    }
    assert set(got.values()) == {0}
    assert len(got) == 100


def test_triangles_broadcast_matches_join_path(ray_session):
    """The adaptive broadcast attach and the co-partitioned join path must
    produce identical counts (and match networkx)."""
    import networkx as nx
    from tests.conftest import edges_dataset, fixture_graph
    from networkit_ray.pipelines.triangles import triangle_counts

    G = fixture_graph("ba300")
    a = (
        triangle_counts(edges_dataset(G), num_partitions=3)
        .to_pandas().set_index("vid")["triangles"].sort_index()
    )
    b = (
        triangle_counts(edges_dataset(G), num_partitions=3, broadcast_threshold=0)
        .to_pandas().set_index("vid")["triangles"].sort_index()
    )
    assert a.equals(b)
    want = nx.triangles(G)
    for v in a.index:
        assert a[v] == want[int(v)], v
