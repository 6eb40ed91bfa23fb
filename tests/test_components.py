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


def test_scc_vs_networkx(ray_session):
    import networkx as nx
    import numpy as np
    import pyarrow as pa
    import ray.data

    from networkit_ray.pipelines.components import strongly_connected_components

    D = nx.gnp_random_graph(60, 0.05, seed=7, directed=True)
    src = np.array([u for u, v in D.edges()], dtype=np.int64)
    dst = np.array([v for u, v in D.edges()], dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst, "w": np.ones(len(src))})
    )
    labels, stats = strongly_connected_components(ds, num_partitions=2)
    got = labels.to_pandas().set_index("vid")["label"]
    comps = list(nx.strongly_connected_components(D))
    seen = set()
    for comp in comps:
        comp = sorted(int(v) for v in comp)
        if not any(int(v) in got.index for v in comp):
            continue  # isolated vertex not in edge table
        for v in comp:
            assert got[v] == comp[0], (v, comp)
        seen.update(comp)
    assert stats["pivots"] <= 64


def test_scc_dag_trims_without_pivots(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from networkit_ray.pipelines.components import strongly_connected_components

    # bipartite DAG (the customer-supplier shape): all singleton SCCs,
    # resolved purely by trimming
    src = np.repeat(np.arange(10, dtype=np.int64), 3)
    dst = 100 + (src * 7 + np.tile(np.arange(3, dtype=np.int64), 10)) % 20
    ds = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst, "w": np.ones(len(src))})
    )
    labels, stats = strongly_connected_components(ds, num_partitions=2)
    out = labels.to_pandas()
    assert (out["vid"] == out["label"]).all()
    assert stats["pivots"] == 0


def test_scc_many_small_cycles_few_rounds(ray_session):
    """VERDICT r2 ask #2: a graph with 200+ small disjoint cycles must
    resolve in O(log) coloring rounds, not one pivot per SCC — every
    cycle's priority-min member is a color root in the same round."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from networkit_ray.pipelines.components import strongly_connected_components

    n_cyc, cyc_len = 220, 3
    base = np.repeat(np.arange(n_cyc, dtype=np.int64) * cyc_len, cyc_len)
    off = np.tile(np.arange(cyc_len, dtype=np.int64), n_cyc)
    src = base + off
    dst = base + (off + 1) % cyc_len
    ds = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst, "w": np.ones(len(src))})
    )
    labels, stats = strongly_connected_components(ds, num_partitions=2)
    out = labels.to_pandas()
    assert len(out) == n_cyc * cyc_len
    got = out.set_index("vid")["label"]
    for c in range(n_cyc):
        vs = [c * cyc_len + i for i in range(cyc_len)]
        assert all(got[v] == vs[0] for v in vs)
    # disjoint cycles: all roots fire in the FIRST coloring round
    assert stats["pivots"] <= 3, stats


def test_scc_chain_of_cycles(ray_session):
    """Chain of SCCs (cycle_i -> cycle_{i+1}): exercises repeated coloring
    rounds with removal + re-coloring; labels must still be exact."""
    import networkx as nx
    import numpy as np
    import pyarrow as pa
    import ray.data

    from networkit_ray.pipelines.components import strongly_connected_components

    D = nx.DiGraph()
    k = 12
    for c in range(k):
        b = c * 4
        D.add_edges_from([(b, b + 1), (b + 1, b + 2), (b + 2, b)])
        if c:
            D.add_edge(b - 4, b)  # DAG edge to the next cycle
    src = np.array([u for u, v in D.edges()], dtype=np.int64)
    dst = np.array([v for u, v in D.edges()], dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst, "w": np.ones(len(src))})
    )
    labels, stats = strongly_connected_components(ds, num_partitions=2)
    got = labels.to_pandas().set_index("vid")["label"]
    for comp in nx.strongly_connected_components(D):
        comp = sorted(int(v) for v in comp)
        for v in comp:
            assert got[v] == comp[0], (v, comp, stats)
