"""BSP CSR actor engine (state/csr.py): conformance vs oracles and equality
with the pure-Dataset engine (SURVEY.md §7.1.6: v1 vs v2 equality is itself
a test)."""

import numpy as np
import pytest

from networkit_ray.pipelines.components import connected_components
from networkit_ray.pipelines.labelprop import label_propagation
from networkit_ray.pipelines.pagerank import pagerank

from tests.conftest import edges_dataset, fixture_graph, scores_to_dict
from tests.ref_pagerank import ref_pagerank
from tests.ref_syncplp import ref_sync_plp


def _verts_ds(G):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(
        pa.table({"vid": np.array(sorted(int(v) for v in G.nodes), dtype=np.int64)})
    )


@pytest.mark.parametrize("name", ["karate", "er200", "multicomp", "ba300"])
def test_actor_pagerank_vs_oracle(name, ray_session):
    G = fixture_graph(name)
    got_ds, iters = pagerank(
        edges_dataset(G),
        _verts_ds(G),
        tol=1e-10,
        max_iter=300,
        num_partitions=3,
        engine="actor",
    )
    got = scores_to_dict(got_ds)
    edges = [
        (int(u), int(v), float(d.get("weight", 1.0))) for u, v, d in G.edges(data=True)
    ]
    want, _ = ref_pagerank(edges, set(int(v) for v in G.nodes), tol=1e-12)
    vids = sorted(want)
    np.testing.assert_allclose(
        [got[v] for v in vids], [want[v] for v in vids], atol=1e-6, rtol=0
    )
    assert abs(sum(got.values()) - 1.0) < 1e-8


def test_actor_vs_dataset_engine_equal(ray_session):
    G = fixture_graph("karate")
    a, it_a = pagerank(edges_dataset(G), fixed_iters=10, num_partitions=3, engine="actor")
    d, it_d = pagerank(edges_dataset(G), fixed_iters=10, num_partitions=4, engine="dataset")
    sa, sd = scores_to_dict(a), scores_to_dict(d)
    vids = sorted(sa)
    np.testing.assert_allclose(
        [sa[v] for v in vids], [sd[v] for v in vids], atol=1e-12, rtol=0
    )
    assert it_a == it_d == 10


@pytest.mark.parametrize("P", [1, 2, 7])
def test_actor_pagerank_partition_invariance(P, ray_session):
    G = fixture_graph("er200")
    got_ds, _ = pagerank(
        edges_dataset(G), tol=1e-12, max_iter=300, num_partitions=P, engine="actor"
    )
    got = scores_to_dict(got_ds)
    edges = [(int(u), int(v), 1.0) for u, v in G.edges()]
    want, _ = ref_pagerank(edges, set(int(v) for v in G.nodes), tol=1e-13, max_iter=300)
    vids = sorted(want)
    np.testing.assert_allclose(
        [got[v] for v in vids], [want[v] for v in vids], atol=1e-9, rtol=0
    )


def test_actor_cc_hashmin(ray_session):
    import networkx as nx

    for name in ("multicomp", "path100", "karate"):
        G = fixture_graph(name)
        got_ds, rounds = connected_components(
            edges_dataset(G), _verts_ds(G), num_partitions=3, engine="actor"
        )
        got = {int(k): int(v) for k, v in scores_to_dict(got_ds).items()}
        want = {}
        for comp in nx.connected_components(G):
            m = min(comp)
            for v in comp:
                want[int(v)] = int(m)
        assert got == want


@pytest.mark.parametrize("fixed_iters", [1, 4])
def test_actor_plp(fixed_iters, ray_session):
    G = fixture_graph("karate")
    got_ds, rounds = label_propagation(
        edges_dataset(G), fixed_iters=fixed_iters, num_partitions=3, engine="actor"
    )
    got = {int(k): int(v) for k, v in scores_to_dict(got_ds).items()}
    edges = [
        (int(u), int(v), float(d.get("weight", 1.0))) for u, v, d in G.edges(data=True)
    ]
    want, _ = ref_sync_plp(
        edges, set(int(v) for v in G.nodes), fixed_iters=fixed_iters
    )
    assert got == want


def test_from_replicated_matches_explicit_concat(ray_session):
    """The analytic replicated build (base routes + k*offset) must produce
    bit-identical PageRank scores to feeding the explicitly concatenated
    K-copy edge table through the regular ingest path."""
    import pyarrow as pa
    import ray.data

    from networkit_ray.state.csr import BSPGraph

    G = fixture_graph("karate")
    base = pa.table(
        {
            "src": pa.array([int(u) for u, v in G.edges()], pa.int64()),
            "dst": pa.array([int(v) for u, v in G.edges()], pa.int64()),
            "w": pa.array([1.0] * G.number_of_edges()),
        }
    )
    K, OFF, P = 3, 64, 2
    g1 = BSPGraph.from_replicated(base, K, OFF, P, actor_num_cpus=0.1)
    try:
        s1, it1 = g1.pagerank(fixed_iters=12)
        df1 = s1.to_pandas().sort_values("vid").reset_index(drop=True)
    finally:
        g1.shutdown()

    import numpy as np

    src = np.concatenate(
        [base["src"].to_numpy() + k * OFF for k in range(K)]
    )
    dst = np.concatenate(
        [base["dst"].to_numpy() + k * OFF for k in range(K)]
    )
    full = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "w": pa.array(np.ones(len(src))),
            }
        )
    )
    g2 = BSPGraph(full, num_partitions=P, actor_num_cpus=0.1)
    try:
        s2, it2 = g2.pagerank(fixed_iters=12)
        df2 = s2.to_pandas().sort_values("vid").reset_index(drop=True)
    finally:
        g2.shutdown()

    assert it1 == it2
    assert (df1["vid"].to_numpy() == df2["vid"].to_numpy()).all()
    np.testing.assert_array_equal(
        df1["score"].to_numpy(), df2["score"].to_numpy()
    )
