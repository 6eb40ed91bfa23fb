"""Local-max matching: validity, maximality, 1/2-approximation,
determinism."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines.matching import local_max_matching

from tests.conftest import fixture_graph


def weighted_ds(G, wts):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([int(u) for u, _ in G.edges()], pa.int64()),
                "dst": pa.array([int(v) for _, v in G.edges()], pa.int64()),
                "w": pa.array([float(x) for x in wts]),
            }
        )
    )


@pytest.mark.parametrize("name", ["karate", "path100", "er200", "multicomp"])
def test_matching_valid_maximal_halfapprox(ray_session, name):
    G = fixture_graph(name)
    rng = np.random.default_rng(5)
    wts = rng.random(G.number_of_edges()) + 0.5
    m = local_max_matching(weighted_ds(G, wts), num_partitions=3).to_pandas()
    vs = np.concatenate([m["src"].to_numpy(), m["dst"].to_numpy()])
    assert len(vs) == len(set(vs))  # a vertex is matched at most once
    mset = set(vs)
    for u, v in G.edges():  # maximal: no edge with both endpoints free
        assert u in mset or v in mset
    Gw = nx.Graph()
    for i, (u, v) in enumerate(G.edges()):
        Gw.add_edge(u, v, weight=float(wts[i]))
    opt = sum(Gw[u][v]["weight"] for u, v in nx.max_weight_matching(Gw))
    assert m["w"].sum() >= 0.5 * opt - 1e-9


def test_matching_partition_invariant(ray_session):
    G = fixture_graph("ba300")
    rng = np.random.default_rng(9)
    wts = rng.random(G.number_of_edges()) + 0.5
    a = local_max_matching(weighted_ds(G, wts), num_partitions=2).to_pandas()
    b = local_max_matching(
        weighted_ds(G, wts).repartition(7), num_partitions=5
    ).to_pandas()
    key = lambda df: sorted(zip(df["src"], df["dst"]))  # noqa: E731
    assert key(a) == key(b)


def test_matching_unit_weights_is_maximal_matching(ray_session):
    G = fixture_graph("star50")
    m = local_max_matching(
        weighted_ds(G, np.ones(G.number_of_edges())), num_partitions=2
    ).to_pandas()
    assert len(m) == 1  # star: one edge saturates the hub


def _b_matching_brute(G, wts, b):
    """Pure-Python replication of the synchronous b-Suitor rounds the
    engine runs: top-remaining-capacity bilateral nominations by
    (w desc, lo asc, hi asc)."""
    edges = {}
    for i, (u, v) in enumerate(G.edges()):
        lo, hi = min(int(u), int(v)), max(int(u), int(v))
        edges[(lo, hi)] = max(edges.get((lo, hi), 0.0), float(wts[i]))
    pool = dict(edges)
    used = {}
    matched = []
    while pool:
        nom = {}
        for (lo, hi), w in pool.items():
            for v in (lo, hi):
                nom.setdefault(v, []).append((-w, lo, hi))
        votes = {}
        for v, lst in nom.items():
            cap = b - used.get(v, 0)
            for e in sorted(lst)[:cap]:
                votes[(e[1], e[2])] = votes.get((e[1], e[2]), 0) + 1
        new = [e for e, c in votes.items() if c == 2]
        if not new:
            break
        for lo, hi in new:
            matched.append((lo, hi, pool.pop((lo, hi))))
            used[lo] = used.get(lo, 0) + 1
            used[hi] = used.get(hi, 0) + 1
        sat = {v for v, c in used.items() if c >= b}
        pool = {
            (lo, hi): w
            for (lo, hi), w in pool.items()
            if lo not in sat and hi not in sat
        }
    return sorted(matched)


@pytest.mark.parametrize("name,b", [("karate", 2), ("ba300", 3), ("er200", 2)])
def test_b_matching_brute_replication(ray_session, name, b):
    """Distributed rounds replicate the pure-Python synchronous b-Suitor
    exactly; no vertex exceeds b matches (violations pinned 0)."""
    from networkit_ray.pipelines.matching import b_matching

    G = fixture_graph(name)
    rng = np.random.default_rng(11)
    wts = rng.random(G.number_of_edges()) + 0.5
    m = b_matching(weighted_ds(G, wts), b=b, num_partitions=3).to_pandas()
    got = sorted(zip(m["src"].astype(int), m["dst"].astype(int), m["w"]))
    want = _b_matching_brute(G, wts, b)
    assert [(s, d) for s, d, _ in got] == [(s, d) for s, d, _ in want]
    np.testing.assert_allclose(
        [w for _, _, w in got], [w for _, _, w in want], rtol=0, atol=1e-12
    )
    import collections

    cnt = collections.Counter(
        list(m["src"].astype(int)) + list(m["dst"].astype(int))
    )
    assert all(c <= b for c in cnt.values())  # 0 capacity violations


@pytest.mark.parametrize("b", [1, 2])
def test_b_matching_half_approx_vs_enumerated_opt(ray_session, b):
    """On a small graph, weight(b-matching) >= 1/2 * enumerated optimal
    b-matching weight (the greedy's guarantee)."""
    import itertools

    from networkit_ray.pipelines.matching import b_matching

    G = nx.cycle_graph(7)
    G.add_edge(0, 3)
    G.add_edge(1, 5)
    rng = np.random.default_rng(3)
    wts = rng.random(G.number_of_edges()) + 0.5
    m = b_matching(weighted_ds(G, wts), b=b, num_partitions=2).to_pandas()
    elist = [
        (min(int(u), int(v)), max(int(u), int(v)), float(w))
        for (u, v), w in zip(G.edges(), wts)
    ]
    opt = 0.0
    for r in range(len(elist) + 1):
        for sub in itertools.combinations(elist, r):
            deg = {}
            ok = True
            for lo, hi, _ in sub:
                deg[lo] = deg.get(lo, 0) + 1
                deg[hi] = deg.get(hi, 0) + 1
                if deg[lo] > b or deg[hi] > b:
                    ok = False
                    break
            if ok:
                opt = max(opt, sum(w for _, _, w in sub))
    assert m["w"].sum() >= 0.5 * opt - 1e-9


def test_b_matching_b1_equals_local_max(ray_session):
    from networkit_ray.pipelines.matching import b_matching

    G = fixture_graph("karate")
    rng = np.random.default_rng(7)
    wts = rng.random(G.number_of_edges()) + 0.5
    a = b_matching(weighted_ds(G, wts), b=1, num_partitions=3).to_pandas()
    c = local_max_matching(weighted_ds(G, wts), num_partitions=3).to_pandas()
    key = lambda df: sorted(zip(df["src"], df["dst"]))  # noqa: E731
    assert key(a) == key(c)


# --- PathGrowingMatcher (driver-side compat; Drake & Hougardy 2003) ---

from networkit_ray.pipelines.matching import path_growing_matching


def _pgm_brute(G, wts, variant):
    """Sequential pure-Python replication of the published algorithm with
    the engine's deterministic tie-breaks (ascending-vid starts, heaviest
    edge then lowest neighbor vid)."""
    adj = {}
    for i, (u, v) in enumerate(G.edges()):
        lo, hi = min(int(u), int(v)), max(int(u), int(v))
        if lo == hi:
            continue
        w = float(wts[i])
        prev = adj.setdefault(lo, {}).get(hi)
        if prev is None or w > prev:
            adj[lo][hi] = w
            adj.setdefault(hi, {})[lo] = w
    m1, m2, out, side = [], [], [], 0
    for start in sorted(adj):
        if start not in adj:
            continue
        x, path = start, []
        while x in adj and adj[x]:
            y, w = min(adj[x].items(), key=lambda kv: (-kv[1], kv[0]))
            path.append((x, y, w))
            (m1 if side == 0 else m2).append((x, y, w))
            side = 1 - side
            for z in list(adj[x]):
                del adj[z][x]
                if not adj[z]:
                    del adj[z]
            del adj[x]
            x = y
        if not path:
            continue
        if variant == "dp":
            k = len(path)
            dp, choice = [0.0] * k, [False] * k
            for i in range(k):
                take = path[i][2] + (dp[i - 2] if i >= 2 else 0.0)
                skip = dp[i - 1] if i >= 1 else 0.0
                dp[i] = max(take, skip)
                choice[i] = take >= skip
            i = k - 1
            while i >= 0:
                if choice[i]:
                    out.append(path[i])
                    i -= 2
                else:
                    i -= 1
    if variant == "alternate":
        out = m1 if sum(e[2] for e in m1) >= sum(e[2] for e in m2) else m2
    return {(min(a, b), max(a, b)) for a, b, _ in out}


@pytest.mark.parametrize("name", ["karate", "path100", "er200", "multicomp"])
@pytest.mark.parametrize("variant", ["dp", "alternate"])
def test_pgm_brute_replication_valid_halfapprox(ray_session, name, variant):
    G = fixture_graph(name)
    rng = np.random.default_rng(11)
    wts = rng.random(G.number_of_edges()) + 0.5
    m = path_growing_matching(weighted_ds(G, wts), variant=variant).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(m["src"], m["dst"])}
    assert got == _pgm_brute(G, wts, variant)  # exact replication
    vs = np.concatenate([m["src"].to_numpy(), m["dst"].to_numpy()])
    assert len(vs) == len(set(vs))  # a valid matching
    Gw = nx.Graph()
    for i, (u, v) in enumerate(G.edges()):
        Gw.add_edge(u, v, weight=float(wts[i]))
    opt = sum(Gw[u][v]["weight"] for u, v in nx.max_weight_matching(Gw))
    assert m["w"].sum() >= 0.5 * opt - 1e-9  # the Drake-Hougardy bound


def test_pgm_dp_dominates_alternate_and_partition_invariant(ray_session):
    G = fixture_graph("ba300")
    rng = np.random.default_rng(13)
    wts = rng.random(G.number_of_edges()) + 0.5
    dp = path_growing_matching(weighted_ds(G, wts), variant="dp").to_pandas()
    alt = path_growing_matching(
        weighted_ds(G, wts), variant="alternate"
    ).to_pandas()
    assert dp["w"].sum() >= alt["w"].sum() - 1e-12
    rep = path_growing_matching(
        weighted_ds(G, wts).repartition(7), variant="dp"
    ).to_pandas()
    key = lambda df: sorted(zip(df["src"], df["dst"]))  # noqa: E731
    assert key(dp) == key(rep)


def test_pgm_edge_limit_and_bad_variant(ray_session):
    G = fixture_graph("karate")
    ds = weighted_ds(G, np.ones(G.number_of_edges()))
    with pytest.raises(ValueError, match="edge_limit"):
        path_growing_matching(ds, edge_limit=3)
    with pytest.raises(ValueError, match="variant"):
        path_growing_matching(ds, variant="nope")
