"""Conformance tests for the traversal (BFS/closeness/ANF), structure
(k-core/assortativity/sparsification), eigenvector and generator operators
against networkx / pure-numpy oracles."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from tests.conftest import edges_dataset, fixture_graph

from networkit_ray.pipelines.centrality import eigenvector_centrality
from networkit_ray.pipelines.structure import (
    degree_assortativity,
    edge_triangle_scores,
    global_threshold_filter,
    kcore_membership,
)
from networkit_ray.pipelines.traversal import (
    bfs_depths,
    closeness_sampled,
    neighborhood_function,
)
from networkit_ray.sources.generators import erdos_renyi_edges, rmat_edges
from networkit_ray.stages.graphops import symmetrize, canonicalize_undirected


@pytest.mark.parametrize("name", ["er200", "multicomp"])
def test_bfs_depths_vs_networkx(name, ray_session):
    G = fixture_graph(name)
    src = min(G.nodes)
    got_ds, rounds = bfs_depths(
        edges_dataset(G), [src], num_partitions=3, undirected=True
    )
    got = dict(zip(*(got_ds.to_pandas()[c] for c in ("vid", "depth"))))
    want = nx.single_source_shortest_path_length(G, src)
    for v in got:
        if v in want:
            assert got[v] == want[v], v
        else:
            assert got[v] == -1, v
    assert rounds >= max(want.values())


def test_bfs_multi_source(ray_session):
    G = fixture_graph("er200")
    sources = [0, 50, 100]
    got_ds, _ = bfs_depths(edges_dataset(G), sources, num_partitions=3)
    got = dict(zip(*(got_ds.to_pandas()[c] for c in ("vid", "depth"))))
    want = {}
    for s in sources:
        for v, d in nx.single_source_shortest_path_length(G, s).items():
            want[v] = min(want.get(v, 10**9), d)
    for v, d in want.items():
        assert got[v] == d, v


def test_closeness_sampled_vs_networkx(ray_session):
    G = fixture_graph("karate")
    out = (
        closeness_sampled(edges_dataset(G), n_sources=6, num_partitions=2)
        .to_pandas()
        .set_index("vid")
    )
    for v in out.index:
        want = nx.closeness_centrality(G, u=int(v), wf_improved=False)
        assert out.loc[v, "closeness"] == pytest.approx(want, abs=1e-9), v
        want_h = nx.harmonic_centrality(G, nbunch=[int(v)])[int(v)]
        assert out.loc[v, "harmonic"] == pytest.approx(want_h, abs=1e-9), v


def test_eigenvector_vs_numpy_power(ray_session):
    G = fixture_graph("karate")
    iters = 12
    sym = symmetrize(canonicalize_undirected(edges_dataset(G), weight="one"))
    got = (
        eigenvector_centrality(sym, iters=iters, num_partitions=3)
        .to_pandas()
        .set_index("vid")["x"]
        .sort_index()
    )
    n = G.number_of_nodes()
    A = nx.to_numpy_array(G, nodelist=sorted(G.nodes), weight=None)
    x = np.ones(n)
    for _ in range(iters):
        x = A.T @ x
    x = x / np.linalg.norm(x)
    np.testing.assert_allclose(got.to_numpy(), x, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("k", [2, 3])
def test_kcore_vs_networkx(k, ray_session):
    G = fixture_graph("er200")
    got = set(
        kcore_membership(edges_dataset(G), k=k, max_rounds=30, num_partitions=3)
        .to_pandas()["vid"]
        .astype(int)
    )
    want = set(nx.k_core(G, k=k).nodes)
    assert got == want


def test_assortativity_vs_networkx(ray_session):
    G = fixture_graph("ba300")
    got = degree_assortativity(edges_dataset(G), num_partitions=3).to_pandas()[
        "assortativity"
    ][0]
    want = nx.degree_assortativity_coefficient(G)
    assert got == pytest.approx(want, abs=1e-9)


def test_edge_triangle_scores_vs_brute(ray_session):
    G = fixture_graph("karate")
    out = edge_triangle_scores(edges_dataset(G), num_partitions=3).to_pandas()
    got = {(int(r["src"]), int(r["dst"])): (int(r["cn"]), r["score"]) for _, r in out.iterrows()}
    for u, v in G.edges():
        a, b = min(u, v), max(u, v)
        cn = len(set(G[u]) & set(G[v]))
        du, dv = G.degree(u), G.degree(v)
        score = cn / max(du + dv - cn, 1)
        assert got[(a, b)][0] == cn, (a, b)
        assert got[(a, b)][1] == pytest.approx(score), (a, b)
    assert len(got) == G.number_of_edges()
    # threshold filter keeps exactly the rows above the cut
    thr = 0.2
    kept = global_threshold_filter(
        edge_triangle_scores(edges_dataset(G), num_partitions=3), "score", thr
    ).to_pandas()
    assert set(zip(kept["src"], kept["dst"])) == {
        p for p, (c, s) in got.items() if s >= thr
    }


def test_anf_neighborhood_function(ray_session):
    G = fixture_graph("er200")
    ds, eff = neighborhood_function(
        edges_dataset(G), max_dist=6, registers=128, num_partitions=3
    )
    est = ds.to_pandas().set_index("t")["est_pairs"]
    # exact neighborhood function: pairs within distance t (ordered pairs
    # incl. self at distance 0 counted once per vertex)
    spl = dict(nx.all_pairs_shortest_path_length(G))
    for t in est.index:
        exact = sum(1 for u in spl for v, d in spl[u].items() if d <= t)
        assert est[t] == pytest.approx(exact, rel=0.35), (t, est[t], exact)
    assert 1 <= eff <= 6


def test_generators_deterministic_and_sized(ray_session):
    a = erdos_renyi_edges(1000, 5000, seed=7, parallelism=2).to_pandas()
    b = erdos_renyi_edges(1000, 5000, seed=7, parallelism=8).to_pandas()
    assert len(a) == 5000
    assert a.sort_values(["src", "dst"]).reset_index(drop=True).equals(
        b.sort_values(["src", "dst"]).reset_index(drop=True)
    )
    assert a["src"].between(0, 999).all() and a["dst"].between(0, 999).all()

    r1 = rmat_edges(10, 8, seed=5, parallelism=2).to_pandas()
    r2 = rmat_edges(10, 8, seed=5, parallelism=6).to_pandas()
    assert len(r1) == 8 * 1024
    assert r1.sort_values(["src", "dst"]).reset_index(drop=True).equals(
        r2.sort_values(["src", "dst"]).reset_index(drop=True)
    )
    # R-MAT skew: top-1% sources should own far more than 1% of edges
    top = r1["src"].value_counts()
    n_top = max(1, int(0.01 * len(top)))
    assert top.iloc[:n_top].sum() > 0.05 * len(r1)


def test_approx_distinct_hll(ray_session):
    """HLL sketch aggregate: within ~3 sigma of exact distinct counts,
    both globally and per group (merge = elementwise register max)."""
    from networkit_ray.functions.aggregates import ApproxDistinct

    rng = np.random.default_rng(9)
    n, n_distinct = 50_000, 7_321
    vals = rng.integers(0, n_distinct, size=n).astype(np.int64)
    grp = (vals % 2).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"g": grp, "x": vals})).repartition(6)

    got = ds.aggregate(ApproxDistinct("x", p=12, alias_name="d"))["d"]
    exact = len(np.unique(vals))
    assert abs(got - exact) / exact < 0.05, (got, exact)

    per = ds.groupby("g").aggregate(ApproxDistinct("x", p=12, alias_name="d")).to_pandas()
    for g in (0, 1):
        e = len(np.unique(vals[grp == g]))
        a = int(per[per["g"] == g]["d"].iloc[0])
        assert abs(a - e) / e < 0.06, (g, a, e)


def test_approx_distinct_exact_small(ray_session):
    from networkit_ray.functions.aggregates import ApproxDistinct

    ds = ray.data.from_arrow(
        pa.table({"x": np.array([1, 1, 2, 3, 3, 3], dtype=np.int64)})
    )
    got = ds.aggregate(ApproxDistinct("x", p=12, alias_name="d"))["d"]
    assert got == 3  # linear-counting regime is exact-ish at tiny n


def _brandes_subset(G, sources):
    """Reference Brandes restricted to a source set (unnormalized sum)."""
    from collections import deque

    btw = {v: 0.0 for v in G}
    for s in sources:
        S, P = [], {v: [] for v in G}
        sigma = dict.fromkeys(G, 0.0)
        sigma[s] = 1.0
        dist = {s: 0}
        Q = deque([s])
        while Q:
            v = Q.popleft()
            S.append(v)
            for w in G[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    Q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    P[w].append(v)
        delta = dict.fromkeys(G, 0.0)
        while S:
            w = S.pop()
            for v in P[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                btw[w] += delta[w]
    return btw


@pytest.mark.parametrize("name", ["karate", "multicomp"])
def test_approx_betweenness_exact_vs_brandes(name, ray_session):
    from networkit_ray.pipelines.traversal import approx_betweenness

    G = fixture_graph(name)
    sources = sorted(G.nodes)[:5]
    got = (
        approx_betweenness(
            edges_dataset(G), sources=sources, num_partitions=3, normalize=False
        )
        .to_pandas()
        .set_index("vid")["betweenness"]
    )
    want = _brandes_subset(G, sources)
    for v in got.index:
        assert got[v] == pytest.approx(want[int(v)], abs=1e-9), v


def test_betweenness_all_sources_matches_networkx(ray_session):
    """With sources = ALL vertices, the unnormalized sum equals
    2x networkx betweenness_centrality(normalized=False) (each unordered
    pair counted from both endpoints)."""
    from networkit_ray.pipelines.traversal import approx_betweenness

    G = fixture_graph("karate")
    got = (
        approx_betweenness(
            edges_dataset(G), sources=sorted(G.nodes), num_partitions=3,
            normalize=False,
        )
        .to_pandas()
        .set_index("vid")["betweenness"]
    )
    want = nx.betweenness_centrality(G, normalized=False)
    for v in got.index:
        assert got[v] == pytest.approx(2.0 * want[int(v)], abs=1e-9), v


def test_edge_list_roundtrip(ray_session, tmp_path):
    from networkit_ray.sources.io import read_edge_list, write_edge_list

    G = fixture_graph("karate")
    ds = edges_dataset(G)
    out_dir = str(tmp_path / "el")
    write_edge_list(ds, out_dir, separator="\t")
    back = read_edge_list(out_dir + "/", separator=None, weighted=True).to_pandas()
    a = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = back.sort_values(["src", "dst"]).reset_index(drop=True)
    assert a[["src", "dst"]].equals(b[["src", "dst"]])
    np.testing.assert_allclose(a["w"], b["w"])


def test_edge_list_comments_offset(ray_session, tmp_path):
    from networkit_ray.sources.io import read_edge_list

    p = tmp_path / "g.txt"
    p.write_text("# header\n1 2 0.5\n2 3 1.5\n\n# trailing\n3 1 2.0\n")
    out = (
        read_edge_list(str(p), offset=1, weighted=True)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert out["src"].tolist() == [0, 1, 2]
    assert out["dst"].tolist() == [1, 2, 0]
    assert out["w"].tolist() == [0.5, 1.5, 2.0]


def test_read_metis(ray_session, tmp_path):
    from networkit_ray.sources.io import read_metis_file

    # path graph 0-1-2 in METIS (1-based)
    p = tmp_path / "g.metis"
    p.write_text("3 2\n2\n1 3\n2\n")
    out = read_metis_file(str(p)).to_pandas()
    got = set(zip(out["src"], out["dst"]))
    assert got == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_read_metis_fmt_flags(ray_session, tmp_path):
    """fmt is a 3-bit flag field: '10' = vertex weights only, '11' = vertex
    AND edge weights, '1' = edge weights only (ADVICE r2: '11' used to pair
    the vertex weight with the first neighbor)."""
    from networkit_ray.sources.io import read_metis_file

    # path 0-1-2, vertex weights 7/8/9, edge weights 0.5/1.5
    p11 = tmp_path / "g11.metis"
    p11.write_text("3 2 011\n7 2 0.5\n8 1 0.5 3 1.5\n9 2 1.5\n")
    out = read_metis_file(str(p11)).to_pandas()
    got = {(r.src, r.dst): r.w for r in out.itertuples()}
    assert got == {(0, 1): 0.5, (1, 0): 0.5, (1, 2): 1.5, (2, 1): 1.5}

    p10 = tmp_path / "g10.metis"
    p10.write_text("3 2 010\n7 2\n8 1 3\n9 2\n")
    out = read_metis_file(str(p10)).to_pandas()
    got = set(zip(out["src"], out["dst"]))
    assert got == {(0, 1), (1, 0), (1, 2), (2, 1)}
    assert (out["w"] == 1.0).all()

    p1 = tmp_path / "g1.metis"
    p1.write_text("3 2 1\n2 0.5\n1 0.5 3 1.5\n2 1.5\n")
    out = read_metis_file(str(p1)).to_pandas()
    got = {(r.src, r.dst): r.w for r in out.itertuples()}
    assert got == {(0, 1): 0.5, (1, 0): 0.5, (1, 2): 1.5, (2, 1): 1.5}

    bad = tmp_path / "bad.metis"
    bad.write_text("3 2 7\n2\n1 3\n2\n")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_metis_file(str(bad))


def test_random_walks_valid_and_deterministic(ray_session):
    from networkit_ray.pipelines.walks import random_walks
    from networkit_ray.stages.graphops import symmetrize, canonicalize_undirected

    G = fixture_graph("karate")
    sym = symmetrize(canonicalize_undirected(edges_dataset(G), weight="one"))
    w1 = random_walks(sym, walk_length=6, walks_per_node=2, num_partitions=2).to_pandas()
    # every walker does the full walk (karate is connected, no sinks)
    n = G.number_of_nodes()
    assert len(w1) == n * 2 * 7  # steps 0..6
    # consecutive steps are edges
    w1s = w1.sort_values(["walk_id", "step"])
    for wid, grp in w1s.groupby("walk_id"):
        vs = grp["vid"].tolist()
        assert grp["step"].tolist() == list(range(len(vs)))
        for a, b in zip(vs, vs[1:]):
            assert G.has_edge(int(a), int(b)), (wid, a, b)
    # deterministic across partitionings
    w2 = random_walks(sym, walk_length=6, walks_per_node=2, num_partitions=4).to_pandas()
    a = w1.sort_values(["walk_id", "step"]).reset_index(drop=True)
    b = w2.sort_values(["walk_id", "step"]).reset_index(drop=True)
    assert a.equals(b)


def test_random_walks_stop_at_sinks(ray_session):
    from networkit_ray.pipelines.walks import random_walks

    # directed path 0 -> 1 -> 2: walks must stop at the sink
    tbl = pa.table(
        {
            "src": np.array([0, 1], dtype=np.int64),
            "dst": np.array([1, 2], dtype=np.int64),
            "w": np.ones(2),
        }
    )
    out = random_walks(
        ray.data.from_arrow(tbl), walk_length=5, walks_per_node=1, num_partitions=2
    ).to_pandas()
    w0 = out[out["walk_id"] == 0].sort_values("step")["vid"].tolist()
    assert w0 == [0, 1, 2]
    w2 = out[out["walk_id"] == 2].sort_values("step")["vid"].tolist()
    assert w2 == [2]


def test_diameter_bounds_vs_networkx(ray_session):
    from networkit_ray.pipelines.traversal import diameter_bounds

    for name in ("karate", "er200"):
        G = fixture_graph(name)
        row = diameter_bounds(edges_dataset(G), num_partitions=2).take_all()[0]
        true_diam = nx.diameter(G)
        # two-sweep is a lower bound, and at least the start's eccentricity
        assert row["diameter_lb"] <= true_diam
        assert row["diameter_lb"] >= nx.eccentricity(G, v=row["sweep_far"]) - 0  # ecc of far vertex IS the bound
        assert row["diameter_lb"] == nx.eccentricity(G, v=int(row["sweep_far"]))
        assert row["diameter_lb"] >= true_diam / 2  # standard 2-sweep guarantee


def test_partition_quality_vs_manual(ray_session):
    import ray.data
    from networkit_ray.pipelines.community import partition_quality

    G = fixture_graph("karate")
    # labeling: two halves by vid parity
    lab = pa.table(
        {
            "vid": np.array(sorted(G.nodes), dtype=np.int64),
            "label": np.array([v % 2 for v in sorted(G.nodes)], dtype=np.int64),
        }
    )
    out = partition_quality(
        edges_dataset(G), ray.data.from_arrow(lab), num_partitions=2
    ).take_all()[0]
    w_in = sum(
        d.get("weight", 1.0) for u, v, d in G.edges(data=True) if u % 2 == v % 2
    )
    W = sum(d.get("weight", 1.0) for _, _, d in G.edges(data=True))
    assert out["coverage"] == pytest.approx(w_in / W, abs=1e-9)
    assert out["edge_cut"] == pytest.approx(W - w_in, abs=1e-9)


@pytest.mark.parametrize("name", ["karate", "er200", "multicomp"])
def test_luby_mis_properties(name, ray_session):
    """Independence + maximality (the defining properties) + determinism."""
    from networkit_ray.pipelines.independent import luby_mis

    G = fixture_graph(name)
    mis = set(
        luby_mis(edges_dataset(G), num_partitions=2).to_pandas()["vid"].astype(int)
    )
    edge_verts = {v for e in G.edges() for v in e}
    # independence
    for u, v in G.edges():
        assert not (u in mis and v in mis), (u, v)
    # maximality over edge-covered vertices (isolated vertices are only in
    # the result when a vertex table is supplied)
    for v in edge_verts:
        assert v in mis or any(n in mis for n in G[v]), v
    # determinism across partitionings
    mis2 = set(
        luby_mis(edges_dataset(G), num_partitions=4).to_pandas()["vid"].astype(int)
    )
    assert mis == mis2


# ---- weighted SSSP (delta-stepping) ---------------------------------------


def _nx_weighted(name="karate", seed=3):
    import networkx as nx

    G = fixture_graph(name)
    rng = np.random.default_rng(seed)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.integers(1, 8))
    return G


@pytest.mark.parametrize("delta", [None, 0.5, 4.0])
def test_sssp_vs_networkx_dijkstra(ray_session, delta):
    import networkx as nx

    from networkit_ray.pipelines.traversal import sssp_weighted

    G = _nx_weighted()
    ds = edges_dataset(G)
    out, rounds = sssp_weighted(
        ds, [0], num_partitions=3, undirected=True, delta=delta
    )
    got = out.to_pandas().set_index("vid")["dist"]
    want = nx.single_source_dijkstra_path_length(G, 0)
    assert len(got) == len(want)
    for v, d in want.items():
        assert abs(got[int(v)] - d) < 1e-9, (v, got[int(v)], d)
    assert rounds > 0


def test_sssp_directed_and_unreachable(ray_session):
    import networkx as nx
    import ray.data

    from networkit_ray.pipelines.traversal import sssp_weighted

    D = nx.DiGraph()
    D.add_weighted_edges_from(
        [(0, 1, 2.0), (1, 2, 2.0), (0, 2, 5.0), (3, 0, 1.0), (2, 4, 0.5)]
    )
    src = np.array([u for u, v in D.edges()], dtype=np.int64)
    dst = np.array([v for u, v in D.edges()], dtype=np.int64)
    w = np.array([D[u][v]["weight"] for u, v in D.edges()], dtype=np.float64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst, "w": w}))
    out, _ = sssp_weighted(ds, [0], num_partitions=2, undirected=False)
    got = dict(zip(out.to_pandas()["vid"], out.to_pandas()["dist"]))
    # vertex 3 unreachable from 0 in the directed graph
    assert got == {0: 0.0, 1: 2.0, 2: 4.0, 4: 4.5}


def test_sssp_parallel_edges_min_weight(ray_session):
    import ray.data

    from networkit_ray.pipelines.traversal import sssp_weighted

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": np.array([0, 0, 1], dtype=np.int64),
                "dst": np.array([1, 1, 2], dtype=np.int64),
                "w": np.array([9.0, 2.0, 1.0], dtype=np.float64),
            }
        )
    )
    out, _ = sssp_weighted(ds, [0], num_partitions=2, undirected=True)
    got = dict(zip(out.to_pandas()["vid"], out.to_pandas()["dist"]))
    assert got == {0: 0.0, 1: 2.0, 2: 3.0}


def test_node2vec_walks_valid_and_deterministic(ray_session):
    from networkit_ray.pipelines.walks import node2vec_walks
    from networkit_ray.stages.graphops import canonicalize_undirected, symmetrize

    G = fixture_graph("karate")
    sym = symmetrize(canonicalize_undirected(edges_dataset(G), weight="one"))
    w1 = node2vec_walks(
        sym, walk_length=6, walks_per_node=2, p=0.5, q=2.0, num_partitions=2
    ).to_pandas()
    n = G.number_of_nodes()
    assert len(w1) == n * 2 * 7
    w1s = w1.sort_values(["walk_id", "step"])
    for wid, grp in w1s.groupby("walk_id"):
        vs = grp["vid"].tolist()
        assert grp["step"].tolist() == list(range(len(vs)))
        for a, b in zip(vs, vs[1:]):
            assert G.has_edge(int(a), int(b)), (wid, a, b)
    # partition-invariant
    w2 = node2vec_walks(
        sym, walk_length=6, walks_per_node=2, p=0.5, q=2.0, num_partitions=4
    ).to_pandas()
    a = w1.sort_values(["walk_id", "step"]).reset_index(drop=True)
    b = w2.sort_values(["walk_id", "step"]).reset_index(drop=True)
    assert a.equals(b)
    # the bias parameters actually matter
    w3 = node2vec_walks(
        sym, walk_length=6, walks_per_node=2, p=100.0, q=0.01, num_partitions=2
    ).to_pandas()
    c = w3.sort_values(["walk_id", "step"]).reset_index(drop=True)
    assert not a.equals(c)


def test_node2vec_bias_distribution(ray_session):
    """Empirical second-order transition frequencies match the node2vec
    law w = 1/p (return), 1 (common neighbor), 1/q (distance 2) on a
    triangle-plus-pendant fixture, within 5 sigma."""
    from networkit_ray.pipelines.walks import node2vec_walks
    from networkit_ray.stages.graphops import symmetrize

    # triangle 0-1-2 with pendant 2-3
    tbl = pa.table(
        {
            "src": np.array([0, 0, 1, 2], dtype=np.int64),
            "dst": np.array([1, 2, 2, 3], dtype=np.int64),
            "w": np.ones(4),
        }
    )
    sym = symmetrize(ray.data.from_arrow(tbl))
    p_, q_ = 0.25, 4.0
    out = node2vec_walks(
        sym, walk_length=2, walks_per_node=4000, p=p_, q=q_, seed=5,
        num_partitions=3,
    ).to_pandas()
    piv = out.pivot_table(index="walk_id", columns="step", values="vid").astype(int)
    # condition on (prev=1, cur=2): candidates 0 (common nb), 1 (return),
    # 3 (distance 2) with weights 1, 1/p, 1/q
    sel = piv[(piv[0] == 1) & (piv[1] == 2)]
    cnt = sel[2].value_counts()
    tot = len(sel)
    assert tot > 300
    wts = {0: 1.0, 1: 1.0 / p_, 3: 1.0 / q_}
    z = sum(wts.values())
    for nxt, w in wts.items():
        want = w / z
        got = cnt.get(nxt, 0) / tot
        sig = (want * (1 - want) / tot) ** 0.5
        assert abs(got - want) < 5 * sig + 1e-9, (nxt, got, want, tot)


def test_snap_konect_gml_readers(ray_session, tmp_path):
    from networkit_ray.sources.io import (
        read_gml_file,
        read_konect,
        read_snap,
        write_snap,
    )

    p = tmp_path / "snap.txt"
    p.write_text("# Directed graph\n# FromNodeId\tToNodeId\n0\t1\n1\t2\n2\t0\n")
    out = read_snap(str(p)).to_pandas()
    assert sorted(zip(out["src"], out["dst"])) == [(0, 1), (1, 2), (2, 0)]
    assert (out["w"] == 1.0).all()

    k = tmp_path / "out.test"
    k.write_text("% sym unweighted\n1 2\n2 3 5.0 1234567\n")
    out = read_konect(str(k)).to_pandas()
    got = {(r.src, r.dst): r.w for r in out.itertuples()}
    assert got == {(0, 1): 1.0, (1, 2): 5.0}

    g = tmp_path / "g.gml"
    g.write_text(
        'graph [\n  node [ id 0 label "a" ]\n  node [ id 1 ]\n'
        "  edge [ source 0 target 1 value 2.5 ]\n"
        "  edge [ source 1 target 0 ]\n]\n"
    )
    out = read_gml_file(str(g)).to_pandas()
    got = {(r.src, r.dst): r.w for r in out.itertuples()}
    assert got == {(0, 1): 2.5, (1, 0): 1.0}

    # roundtrip: write_snap -> read_snap is the identity on (src, dst)
    import ray.data

    tbl = pa.table(
        {
            "src": np.array([5, 3, 9], dtype=np.int64),
            "dst": np.array([6, 4, 1], dtype=np.int64),
            "w": np.ones(3),
        }
    )
    d = tmp_path / "rt"
    write_snap(ray.data.from_arrow(tbl), str(d))
    back = read_snap(str(d)).to_pandas()
    assert sorted(zip(back["src"], back["dst"])) == [(3, 4), (5, 6), (9, 1)]
