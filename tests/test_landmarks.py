"""Pruned Landmark Labeling + A* point-to-point distance oracles.

PLL (Akiba/Iwata/Yoshida SIGMOD'13): build the 2-hop cover over the BSP
pool, then check EVERY pair's queried hop distance against networkx
shortest-path lengths (absence of a common hub == unreachable == -1).
A*: Johnson-potential reweighting + delta-stepping with target early-stop;
checked against networkx astar/dijkstra on weighted grids.
"""

import networkx as nx
import numpy as np
import pytest

from conftest import edges_dataset, fixture_graph

from networkit_ray.pipelines.traversal import (
    astar_distance,
    pll_distances,
    pruned_landmark_labels,
)


def _nx_all_pairs(G):
    return {int(s): {int(t): int(d) for t, d in dd.items()}
            for s, dd in nx.all_pairs_shortest_path_length(G)}


@pytest.mark.parametrize("name", ["karate", "er200"])
def test_pll_exact_all_pairs(ray_session, name):
    G = fixture_graph(name)
    labels, total = pruned_landmark_labels(edges_dataset(G), num_partitions=3)
    truth = _nx_all_pairs(G)
    nodes = sorted(int(v) for v in G.nodes())
    pairs = [(s, t) for s in nodes for t in nodes]
    got = pll_distances(labels, pairs).to_pandas()
    assert len(got) == len(pairs)
    for s, t, d in got.itertuples(index=False):
        want = truth.get(int(s), {}).get(int(t), -1)
        assert d == want, (s, t, d, want)
    # pruning must beat the trivial n^2 labeling on a connected graph
    assert total < len(nodes) ** 2


def test_pll_disconnected_unreachable(ray_session):
    G = nx.disjoint_union(nx.path_graph(5), nx.cycle_graph(4))
    labels, _ = pruned_landmark_labels(edges_dataset(G), num_partitions=2)
    got = pll_distances(labels, [(0, 4), (5, 8), (0, 5), (8, 2)]).to_pandas()
    by = {(int(r.source), int(r.target)): int(r.dist)
          for r in got.itertuples(index=False)}
    assert by[(0, 4)] == 4
    assert by[(5, 8)] == 1
    assert by[(0, 5)] == -1  # cross-component
    assert by[(8, 2)] == -1


def _weighted_grid(k: int):
    """k x k grid, weight = 1 + ((u+v) mod 3) deterministic; positions for
    a consistent Euclidean-over-max-weight heuristic."""
    G = nx.grid_2d_graph(k, k)
    G = nx.convert_node_labels_to_integers(G, ordering="sorted")
    for u, v in G.edges():
        G[u][v]["weight"] = 1.0 + ((u + v) % 3)
    pos = {i: (i // k, i % k) for i in G.nodes()}
    return G, pos


def test_astar_matches_networkx_on_weighted_grid(ray_session):
    k = 7
    G, pos = _weighted_grid(k)
    src, dst = 0, k * k - 1

    def h(v):
        # Euclidean distance * min edge weight (1.0) -> admissible+consistent
        return float(np.hypot(pos[v][0] - pos[dst][0], pos[v][1] - pos[dst][1]))

    heur = {v: h(v) for v in G.nodes()}
    want = nx.astar_path_length(
        G, src, dst, heuristic=lambda a, b: h(a), weight="weight"
    )
    out, rounds = astar_distance(
        edges_dataset(G), src, dst, heuristic=heur, num_partitions=3
    )
    got = out.take_all()[0]
    assert got["source"] == src and got["target"] == dst
    assert abs(got["dist"] - want) < 1e-9
    assert rounds >= 1


def test_astar_no_heuristic_is_dijkstra_and_early_stops(ray_session):
    G, _ = _weighted_grid(6)
    src, dst = 0, 7  # nearby target: early stop should cut rounds
    want = nx.dijkstra_path_length(G, src, dst, weight="weight")
    out, rounds_near = astar_distance(
        edges_dataset(G), src, dst, num_partitions=3
    )
    assert abs(out.take_all()[0]["dist"] - want) < 1e-9
    _, rounds_far = astar_distance(
        edges_dataset(G), src, 35, num_partitions=3
    )
    assert rounds_near <= rounds_far


def test_astar_unreachable_and_inconsistent_heuristic(ray_session):
    G = nx.disjoint_union(nx.path_graph(3), nx.path_graph(3))
    out, _ = astar_distance(edges_dataset(G), 0, 5, num_partitions=2)
    assert not np.isfinite(out.take_all()[0]["dist"])
    # Ray wraps the worker-side ValueError (RayTaskError/UserCodeException)
    with pytest.raises(Exception, match="consistent"):
        bad = {v: float(100 * v) for v in G.nodes()}
        astar_distance(edges_dataset(G), 0, 2, heuristic=bad,
                       num_partitions=2)
