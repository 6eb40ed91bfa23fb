"""Incremental connected components: batch replay equals recompute."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines.dynamic import DynamicConnectedComponents

from tests.conftest import fixture_graph


def _batches_of(G, k, seed=3):
    edges = [(int(u), int(v)) for u, v in G.edges()]
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(edges))
    chunks = np.array_split(order, k)
    out = []
    for c in chunks:
        sel = [edges[i] for i in c]
        out.append(
            ray.data.from_arrow(
                pa.table(
                    {
                        "src": pa.array([u for u, _ in sel], pa.int64()),
                        "dst": pa.array([v for _, v in sel], pa.int64()),
                        "w": pa.array([1.0] * len(sel)),
                    }
                )
            )
        )
    return out


def _min_vid_labels(G):
    want = {}
    for comp in nx.connected_components(G):
        root = min(comp)
        for v in comp:
            want[int(v)] = int(root)
    return want


@pytest.mark.parametrize("name", ["multicomp", "er200"])
def test_dynamic_cc_replay_equals_recompute(ray_session, name):
    G = fixture_graph(name)
    Gn = nx.Graph(G)
    Gn.remove_nodes_from(list(nx.isolates(Gn)))  # batches carry only edges
    dyn = DynamicConnectedComponents(num_partitions=4)
    batches = _batches_of(Gn, 3)
    seen = nx.Graph()
    for b in batches:
        labels = dyn.update(b).to_pandas().set_index("vid")["label"]
        bt = b.to_pandas()
        seen.add_edges_from(zip(bt["src"], bt["dst"]))
        want = _min_vid_labels(seen)
        assert len(labels) == len(want)
        for v, r in want.items():
            assert labels[v] == r, (v, r)


def test_dynamic_cc_distributed_path(ray_session):
    """driver_pair_limit=0 forces star contraction — same labeling."""
    G = fixture_graph("multicomp")
    G.remove_nodes_from(list(nx.isolates(G)))
    dyn = DynamicConnectedComponents(num_partitions=4, driver_pair_limit=0)
    for b in _batches_of(G, 2):
        labels = dyn.update(b)
    got = labels.to_pandas().set_index("vid")["label"]
    want = _min_vid_labels(G)
    for v, r in want.items():
        assert got[v] == r, v


def test_dynamic_cc_labels_stay_flat(ray_session):
    """Every label in the table is itself a root (no chains survive)."""
    G = fixture_graph("er200")
    dyn = DynamicConnectedComponents(num_partitions=4)
    for b in _batches_of(G, 4, seed=11):
        t = dyn.update(b).to_pandas()
    roots = set(t.loc[t["vid"] == t["label"], "vid"])
    assert set(t["label"]).issubset(roots)


from networkit_ray.pipelines.dynamic import DynamicBFS


@pytest.mark.parametrize("name", ["multicomp", "karate"])
def test_dynamic_bfs_replay_equals_recompute(ray_session, name):
    """After each insertion batch the depth table equals a from-scratch
    BFS on the union of batches (unreached = -1)."""
    G = fixture_graph(name)
    Gn = nx.Graph(G)
    Gn.remove_nodes_from(list(nx.isolates(Gn)))
    src = min(int(v) for v in Gn.nodes)
    dyn = DynamicBFS([src], num_partitions=4)
    seen = nx.Graph()
    for batch in _batches_of(Gn, 3, seed=11):
        pdf = batch.to_pandas()
        seen.add_edges_from(zip(pdf["src"].astype(int), pdf["dst"].astype(int)))
        got, rounds = dyn.update(batch)
        gd = got.to_pandas().set_index("vid")["depth"].astype(int).to_dict()
        want = (
            nx.single_source_shortest_path_length(seen, src)
            if src in seen
            else {}
        )
        assert set(gd) == set(int(v) for v in seen.nodes)
        for v in seen.nodes:
            assert gd[int(v)] == want.get(int(v), -1), (int(v), rounds)


def test_dynamic_bfs_warm_start_rounds(ray_session):
    """A batch that shifts no depths costs zero relaxation rounds beyond
    the bridge check; one that shortens paths costs ~shift rounds."""
    # path 0-1-2-3-4-5 inserted whole, then a shortcut 0-5
    def eb(pairs):
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([u for u, _ in pairs], pa.int64()),
                    "dst": pa.array([v for _, v in pairs], pa.int64()),
                    "w": pa.array([1.0] * len(pairs)),
                }
            )
        )

    dyn = DynamicBFS([0], num_partitions=2)
    _, r1 = dyn.update(eb([(i, i + 1) for i in range(5)]))
    assert r1 >= 5  # cold BFS along the path
    got, r2 = dyn.update(eb([(0, 5)]))
    gd = got.to_pandas().set_index("vid")["depth"].astype(int).to_dict()
    assert gd == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: 1}
    assert r2 <= 3, r2  # only the shifted suffix relaxes
