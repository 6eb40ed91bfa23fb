"""PageRank conformance vs the pinned reference oracle (FIXTURES.md §3):
allclose 1e-6 per vertex, cross-checked against networkx's pure-Python
_pagerank_python on karate."""

import numpy as np
import pytest

from networkit_ray.pipelines.pagerank import pagerank

from tests.conftest import edges_dataset, fixture_graph, scores_to_dict
from tests.ref_pagerank import nx_graph_to_weighted_edges, ref_pagerank


def _run_and_compare(name, num_partitions=4, engine="dataset"):
    import pyarrow as pa
    import ray.data

    G = fixture_graph(name)
    ds = edges_dataset(G)
    verts = set(int(v) for v in G.nodes)
    verts_ds = ray.data.from_arrow(
        pa.table({"vid": np.array(sorted(verts), dtype=np.int64)})
    )
    got_ds, iters = pagerank(
        ds,
        verts_ds,
        tol=1e-10,
        max_iter=200,
        num_partitions=num_partitions,
        engine=engine,
    )
    got = scores_to_dict(got_ds)
    # engine treats the undirected fixture's single-direction rows as a
    # directed graph; the oracle gets the same directed edge list
    edges = [(int(u), int(v), float(d.get("weight", 1.0))) for u, v, d in G.edges(data=True)]
    want, _ = ref_pagerank(edges, verts, tol=1e-12)
    assert set(got) == set(want)
    vids = sorted(want)
    np.testing.assert_allclose(
        [got[v] for v in vids], [want[v] for v in vids], atol=1e-6, rtol=0
    )
    assert iters > 1
    assert abs(sum(got.values()) - 1.0) < 1e-8


@pytest.mark.parametrize("name", ["karate", "er200", "multicomp", "star50"])
def test_pagerank_directed_semantics(name, ray_session):
    _run_and_compare(name)


def test_pagerank_undirected_vs_networkx(ray_session):
    """Symmetrized karate vs networkx's pure-Python pagerank."""
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python

    from networkit_ray.stages.graphops import symmetrize, canonicalize_undirected

    G = fixture_graph("karate")
    # weight="sum" keeps the karate edge weights, matching networkx's
    # default weight="weight" semantics
    ds = symmetrize(canonicalize_undirected(edges_dataset(G), weight="sum"))
    # actor engine: undirected karate needs ~200 iterations for 1e-12 and the
    # dataset engine pays Ray-job overhead per iteration; engine equivalence
    # is separately asserted in test_engine_actor.py
    got_ds, _ = pagerank(ds, tol=1e-12, max_iter=300, num_partitions=4, engine="actor")
    got = scores_to_dict(got_ds)
    want = _pagerank_python(G, alpha=0.85, tol=1e-12, max_iter=300)
    vids = sorted(want)
    np.testing.assert_allclose(
        [got[v] for v in vids], [want[v] for v in vids], atol=1e-6, rtol=0
    )


def test_pagerank_partition_invariance(ray_session):
    G = fixture_graph("er200")
    base = None
    for p in (1, 2, 8):
        got_ds, _ = pagerank(edges_dataset(G), fixed_iters=10, num_partitions=p)
        got = scores_to_dict(got_ds)
        if base is None:
            base = got
        else:
            vids = sorted(base)
            np.testing.assert_allclose(
                [got[v] for v in vids], [base[v] for v in vids], atol=1e-12, rtol=0
            )


def test_pagerank_fixed_iters_matches_oracle(ray_session):
    G = fixture_graph("karate")
    got_ds, iters = pagerank(edges_dataset(G), fixed_iters=7, num_partitions=4)
    assert iters == 7
    got = scores_to_dict(got_ds)
    edges = [(int(u), int(v), float(d.get("weight", 1.0))) for u, v, d in G.edges(data=True)]
    want, _ = ref_pagerank(edges, set(int(v) for v in G.nodes), fixed_iters=7)
    vids = sorted(want)
    np.testing.assert_allclose(
        [got[v] for v in vids], [want[v] for v in vids], atol=1e-12, rtol=0
    )


def test_pagerank_weighted(ray_session):
    import networkx as nx

    G = nx.Graph()
    rng = np.random.default_rng(42)
    H = fixture_graph("er200")
    for u, v in H.edges():
        G.add_edge(u, v, weight=float(rng.integers(1, 5)))
    ds = edges_dataset(G)
    got_ds, _ = pagerank(ds, tol=1e-10, num_partitions=4)
    got = scores_to_dict(got_ds)
    edges = [(int(u), int(v), float(d["weight"])) for u, v, d in G.edges(data=True)]
    want, _ = ref_pagerank(edges, set(int(v) for v in G.nodes), tol=1e-12)
    vids = sorted(want)
    np.testing.assert_allclose(
        [got[v] for v in vids], [want[v] for v in vids], atol=1e-6, rtol=0
    )


def test_pagerank_empty_graph(ray_session):
    import ray.data
    import pyarrow as pa

    empty = ray.data.from_arrow(
        pa.table({"src": pa.array([], type=pa.int64()),
                  "dst": pa.array([], type=pa.int64()),
                  "w": pa.array([], type=pa.float64())})
    )
    scores, iters = pagerank(empty)
    assert scores.count() == 0
