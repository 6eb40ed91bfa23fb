"""Conformance tests for the extended operator families: centrality
(degree/Katz/LCC), link prediction, modularity, windowed event aggregates."""

import networkx as nx
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.pipelines.centrality import (
    degree_centrality,
    katz_centrality,
    local_clustering_coefficient,
)
from networkit_ray.pipelines.community import modularity
from networkit_ray.pipelines.linkpred import link_prediction_scores
from networkit_ray.pipelines.windows import session_windows, tumbling_window

from tests.conftest import edges_dataset, fixture_graph


def test_degree_centrality(ray_session):
    G = fixture_graph("karate")
    got = (
        degree_centrality(edges_dataset(G), num_partitions=4)
        .to_pandas()
        .set_index("vid")["degree"]
    )
    for v in G.nodes:
        assert got[int(v)] == G.degree(v)


def ref_katz(edges, verts, alpha, beta, iters):
    x = {v: beta for v in verts}
    for _ in range(iters):
        new = {v: beta for v in verts}
        for s, d, w in edges:
            new[d] += alpha * w * x[s]
        x = new
    return x


def test_katz_fixed_iters(ray_session):
    G = fixture_graph("er200")
    got_ds = katz_centrality(
        edges_dataset(G), alpha=0.01, beta=1.0, iters=8, num_partitions=4
    )
    got = got_ds.to_pandas().set_index("vid")["x"]
    edges = [(int(u), int(v), float(d.get("weight", 1.0))) for u, v, d in G.edges(data=True)]
    want = ref_katz(edges, set(int(v) for v in G.nodes), 0.01, 1.0, 8)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v


def test_local_clustering_vs_networkx(ray_session):
    G = fixture_graph("ba300")
    got = (
        local_clustering_coefficient(edges_dataset(G), num_partitions=4)
        .to_pandas()
        .set_index("vid")["lcc"]
    )
    want = nx.clustering(G)
    for v in G.nodes:
        assert abs(got[int(v)] - want[v]) < 1e-9, v


def test_link_prediction_vs_networkx(ray_session):
    G = fixture_graph("karate")
    got = link_prediction_scores(edges_dataset(G), num_partitions=4).to_pandas()
    got = got.set_index(["u", "v"])
    pairs = list(got.index)
    # networkx oracles (pure python)
    jac = {(u, v): p for u, v, p in nx.jaccard_coefficient(G, pairs)}
    aa = {(u, v): p for u, v, p in nx.adamic_adar_index(G, pairs)}
    cn = {
        (u, v): len(list(nx.common_neighbors(G, u, v)))
        for u, v in pairs
    }
    ra = {(u, v): p for u, v, p in nx.resource_allocation_index(G, pairs)}
    pa_idx = {(u, v): p for u, v, p in nx.preferential_attachment(G, pairs)}
    for uv in pairs:
        assert got.loc[uv, "cn"] == cn[uv], uv
        assert abs(got.loc[uv, "jaccard"] - jac[uv]) < 1e-9, uv
        assert abs(got.loc[uv, "adamic_adar"] - aa[uv]) < 1e-9, uv
        assert abs(got.loc[uv, "resource_alloc"] - ra[uv]) < 1e-9, uv
        assert got.loc[uv, "pref_attach"] == pa_idx[uv], uv
    # completeness: every pair with >=1 common neighbor is present
    n_expected = sum(
        1
        for u in G.nodes
        for v in G.nodes
        if u < v and len(list(nx.common_neighbors(G, u, v))) > 0
    )
    assert len(pairs) == n_expected


def test_modularity_vs_networkx(ray_session):
    G = fixture_graph("karate")
    # arbitrary but fixed 3-community split
    comms = [set(), set(), set()]
    labels_rows = []
    for v in G.nodes:
        c = int(v) % 3
        comms[c].add(v)
        labels_rows.append((int(v), c))
    labels_ds = ray.data.from_arrow(
        pa.table(
            {
                "vid": np.array([r[0] for r in labels_rows], dtype=np.int64),
                "label": np.array([r[1] for r in labels_rows], dtype=np.int64),
            }
        )
    )
    got = (
        modularity(edges_dataset(G), labels_ds, num_partitions=4)
        .to_pandas()["modularity"][0]
    )
    want = nx.algorithms.community.modularity(G, comms, weight="weight")
    assert abs(got - want) < 1e-9


def events_ds():
    rng = np.random.default_rng(42)
    n = 500
    ts = np.sort(rng.integers(0, 3_600_000_000 * 5, size=n)).astype("datetime64[us]")
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "ts": pa.array(ts),
                "user_id": rng.integers(0, 10, size=n).astype(np.int64),
                "event_type": ["x"] * n,
                "value": rng.uniform(0, 100, size=n),
                "props": ["{}"] * n,
            }
        )
    )


def test_tumbling_window_vs_pandas(ray_session):
    ds = events_ds()
    got = (
        tumbling_window(ds, window_s=3600, num_partitions=4)
        .to_pandas()
        .sort_values(["user_id", "window_start_us"])
        .reset_index(drop=True)
    )
    df = ds.to_pandas()
    df["window_start_us"] = (df["ts"].astype("int64") // 3_600_000_000) * 3_600_000_000
    want = (
        df.groupby(["user_id", "window_start_us"])
        .agg(n_events=("event_id", "size"), sum_value=("value", "sum"))
        .reset_index()
        .sort_values(["user_id", "window_start_us"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    np.testing.assert_allclose(got["sum_value"], want["sum_value"], atol=1e-9)


def test_session_windows_vs_pandas(ray_session):
    ds = events_ds()
    gap_us = 1800 * 1_000_000
    got = (
        session_windows(ds, gap_s=1800, num_partitions=4)
        .to_pandas()
        .sort_values(["user_id", "session_start_us"])
        .reset_index(drop=True)
    )
    df = ds.to_pandas().sort_values(["user_id", "ts"])
    rows = []
    for uid, g in df.groupby("user_id"):
        ts = g["ts"].astype("int64").to_numpy()
        vals = g["value"].to_numpy()
        start = 0
        for i in range(1, len(ts) + 1):
            if i == len(ts) or ts[i] - ts[i - 1] > gap_us:
                rows.append(
                    (uid, ts[start], ts[i - 1], i - start, vals[start:i].sum())
                )
                start = i
    want = pd.DataFrame(
        rows,
        columns=["user_id", "session_start_us", "session_end_us", "n_events", "sum_value"],
    ).sort_values(["user_id", "session_start_us"]).reset_index(drop=True)
    assert len(got) == len(want)
    for col in ["user_id", "session_start_us", "session_end_us", "n_events"]:
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col
    np.testing.assert_allclose(got["sum_value"], want["sum_value"], atol=1e-9)


def test_windows_ns_timestamp_parity(ray_session):
    """ns-resolution parquet writers must yield identical windows to us:
    the operators normalize ticks to microseconds before arithmetic."""
    base = events_ds().to_pandas()
    ns = base.copy()
    ns["ts"] = ns["ts"].dt.as_unit("ns")
    ds_us = ray.data.from_pandas(base)
    ds_ns = ray.data.from_pandas(ns)
    for fn, kw in (
        (tumbling_window, {"window_s": 3600}),
        (session_windows, {"gap_s": 1800}),
    ):
        a = fn(ds_us, num_partitions=4, **kw).to_pandas()
        b = fn(ds_ns, num_partitions=4, **kw).to_pandas()
        key = [c for c in a.columns if c.endswith("_us") or c == "user_id"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_louvain_quality_and_determinism(ray_session):
    """PLM/Louvain: valid canonical partition, modularity within reach of
    networkx louvain and no worse than PLP; deterministic across
    partitionings."""
    from networkit_ray.pipelines.community import louvain, modularity
    from networkit_ray.pipelines.labelprop import label_propagation

    G = fixture_graph("karate")
    ds = edges_dataset(G)
    kw = dict(max_levels=2, move_rounds=3, colors=4)
    lab = louvain(ds, num_partitions=2, **kw).to_pandas()
    assert set(lab["vid"].astype(int)) == set(int(v) for v in G.nodes)
    # canonical labels: every label is the min vid of its community
    grp = lab.groupby("label")["vid"].min()
    assert (grp.index == grp.values).all()

    q_louvain = (
        modularity(ds, ray.data.from_pandas(lab), num_partitions=2)
        .to_pandas()["modularity"][0]
    )
    plp_labels, _ = label_propagation(ds, fixed_iters=10, num_partitions=2)
    q_plp = (
        modularity(ds, plp_labels, num_partitions=2).to_pandas()["modularity"][0]
    )
    want = nx.algorithms.community.modularity(
        G, nx.algorithms.community.louvain_communities(G, seed=1)
    )
    assert q_louvain >= q_plp - 1e-9, (q_louvain, q_plp)
    assert q_louvain >= 0.7 * want, (q_louvain, want)

    lab2 = louvain(ds, num_partitions=4, **kw).to_pandas()
    a = lab.sort_values("vid").reset_index(drop=True)
    b = lab2.sort_values("vid").reset_index(drop=True)
    assert a.equals(b)  # deterministic across partitionings


# ---- partition comparison (NMI / ARI / Rand / Jaccard) --------------------


def ref_partition_measures(la: dict, lb: dict):
    """Pure-python reference for the pair-counting + information measures
    (reference community/NMIDistance, AdjustedRandMeasure, JaccardMeasure,
    RandMeasure — similarity form)."""
    import math
    from collections import Counter

    common = sorted(set(la) & set(lb))
    n = len(common)
    cont = Counter((la[v], lb[v]) for v in common)
    ai = Counter(la[v] for v in common)
    bj = Counter(lb[v] for v in common)
    h_a = -sum(c / n * math.log(c / n) for c in ai.values())
    h_b = -sum(c / n * math.log(c / n) for c in bj.values())
    mi = sum(
        c / n * math.log(n * c / (ai[x] * bj[y])) for (x, y), c in cont.items()
    )
    nmi = 1.0 if h_a + h_b == 0 else 2 * mi / (h_a + h_b)
    c2 = lambda x: x * (x - 1) / 2  # noqa: E731
    T = c2(n)
    P = sum(c2(c) for c in ai.values())
    Q = sum(c2(c) for c in bj.values())
    S = sum(c2(c) for c in cont.values())
    exp = P * Q / T if T else 0.0
    den = (P + Q) / 2 - exp
    ari = 1.0 if den == 0 else (S - exp) / den
    rand = 1.0 if T == 0 else (T + 2 * S - P - Q) / T
    jac = 1.0 if (P + Q - S) == 0 else S / (P + Q - S)
    return nmi, ari, rand, jac


def _labels_ds(d: dict):
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(list(d.keys()), type=pa.int64()),
                "label": pa.array(list(d.values()), type=pa.int64()),
            }
        )
    )


@pytest.mark.parametrize(
    "la,lb",
    [
        # identical partitions -> all measures 1
        ({v: v % 3 for v in range(30)}, {v: (v % 3) + 7 for v in range(30)}),
        # refinement: 6 blocks vs 3 blocks
        ({v: v % 6 for v in range(60)}, {v: v % 3 for v in range(60)}),
        # independent-ish partitions
        ({v: v % 4 for v in range(40)}, {v: v // 10 for v in range(40)}),
        # singletons vs one block
        ({v: v for v in range(20)}, {v: 0 for v in range(20)}),
    ],
)
def test_compare_partitions_vs_reference(ray_session, la, lb):
    from networkit_ray.pipelines.community import compare_partitions

    got = compare_partitions(_labels_ds(la), _labels_ds(lb), num_partitions=3)
    row = got.to_pandas().iloc[0]
    want = ref_partition_measures(la, lb)
    for col, w in zip(("nmi", "ari", "rand", "jaccard"), want):
        assert abs(row[col] - w) < 1e-9, (col, row[col], w)


def test_compare_partitions_identical_is_one(ray_session):
    from networkit_ray.pipelines.community import compare_partitions

    la = {v: v % 5 for v in range(50)}
    got = compare_partitions(_labels_ds(la), _labels_ds(la), num_partitions=2)
    row = got.to_pandas().iloc[0]
    assert all(abs(row[c] - 1.0) < 1e-12 for c in ("nmi", "ari", "rand", "jaccard"))


def test_compare_partitions_plp_vs_louvain(ray_session):
    """End-to-end: compare PLP and Louvain labelings of karate; measures in
    [0,1] and match the pure-python reference on the same labelings."""
    from networkit_ray.pipelines.community import compare_partitions, louvain
    from networkit_ray.pipelines.labelprop import label_propagation

    G = fixture_graph("karate")
    ds = edges_dataset(G)
    plp_ds, _ = label_propagation(ds, fixed_iters=5, num_partitions=2)
    lou = louvain(ds, num_partitions=2, max_levels=2, move_rounds=3, colors=4)
    plp = plp_ds.to_pandas()
    lou_pd = lou.to_pandas()
    la = dict(zip(plp["vid"].astype(int), plp["label"].astype(int)))
    lb = dict(zip(lou_pd["vid"].astype(int), lou_pd["label"].astype(int)))
    row = (
        compare_partitions(ray.data.from_pandas(plp), lou, num_partitions=2)
        .to_pandas()
        .iloc[0]
    )
    want = ref_partition_measures(la, lb)
    for col, w in zip(("nmi", "ari", "rand", "jaccard"), want):
        assert abs(row[col] - w) < 1e-9, (col, row[col], w)
        assert -1e-9 <= row[col] <= 1.0 + 1e-9


def test_plp_snapshot_matches_separate_runs(ray_session):
    """snapshot_at=k in one actor run == a separate fixed_iters=k run."""
    from networkit_ray.pipelines.labelprop import label_propagation

    G = fixture_graph("er200")
    ds = edges_dataset(G)
    final, _, snap = label_propagation(
        ds, fixed_iters=5, num_partitions=2, engine="actor", snapshot_at=2
    )
    sep, _ = label_propagation(ds, fixed_iters=2, num_partitions=2, engine="actor")
    a = snap.to_pandas().sort_values("vid").reset_index(drop=True)
    b = sep.to_pandas().sort_values("vid").reset_index(drop=True)
    assert a.equals(b)
    fin5, _ = label_propagation(ds, fixed_iters=5, num_partitions=2, engine="actor")
    c = final.to_pandas().sort_values("vid").reset_index(drop=True)
    d = fin5.to_pandas().sort_values("vid").reset_index(drop=True)
    assert c.equals(d)


# --------------------------------------------------------------------------
# Link-prediction evaluation harness (RandomLinkSampler + ROC/PR-AUC)
# --------------------------------------------------------------------------


def _ds_edges(G):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([int(u) for u, _ in G.edges()], pa.int64()),
                "dst": pa.array([int(v) for _, v in G.edges()], pa.int64()),
                "w": pa.array([1.0] * G.number_of_edges()),
            }
        )
    )


def test_random_link_sampler_partitions_edges(ray_session):
    from networkit_ray.pipelines.linkpred import random_link_sampler

    G = fixture_graph("er200")
    train, test = random_link_sampler(_ds_edges(G), holdout_mod=5, seed=0)
    tr = set(zip(*train.to_pandas()[["src", "dst"]].to_numpy().T))
    te = set(zip(*test.to_pandas()[["src", "dst"]].to_numpy().T))
    allp = {(min(u, v), max(u, v)) for u, v in G.edges()}
    assert tr | te == allp and not (tr & te)
    # roughly 1/5 held out
    assert 0.1 < len(te) / len(allp) < 0.35


@pytest.mark.parametrize("name", ["karate", "ba300"])
def test_link_prediction_auc_exact(ray_session, name):
    """ROC-AUC (tie-averaged Mann-Whitney) and counts match a pure-numpy
    reference computing the identical holdout/negative-sampling closed
    forms and common-neighbor scores."""
    import collections

    from networkit_ray.pipelines.linkpred import (
        link_prediction_auc,
        random_link_sampler,
    )
    from networkit_ray.stages.graphops import canonicalize_undirected

    G = fixture_graph(name)
    eds = _ds_edges(G)
    res = link_prediction_auc(
        eds, holdout_mod=5, neg_per_vertex=8, seed=0
    ).to_pandas()

    canon = canonicalize_undirected(eds, weight="one")
    train, test = random_link_sampler(canon, holdout_mod=5, seed=0)
    trd, ted = train.to_pandas(), test.to_pandas()
    allp = {(min(int(u), int(v)), max(int(u), int(v))) for u, v in G.edges()}
    vids = np.sort(np.array(sorted({v for p in allp for v in p}), np.int64))
    vset = set(int(v) for v in vids)
    nmod = int(vids.max()) + 1
    negs = sorted(
        {
            (min(int(u), d), max(int(u), d))
            for u in vids
            for i in range(8)
            for d in [(int(u) * 1000003 + i * 40503 + 0) % nmod]
            if d != int(u) and d in vset
        }
        - allp
    )
    adj = collections.defaultdict(set)
    for a, b in zip(trd["src"].astype(int), trd["dst"].astype(int)):
        adj[a].add(b)
        adj[b].add(a)
    pos = list(zip(ted["src"].astype(int), ted["dst"].astype(int)))
    y = np.array([1] * len(pos) + [0] * len(negs))
    s = np.array([len(adj[a] & adj[b]) for a, b in pos + negs], float)
    order = np.argsort(s, kind="stable")
    ss, yy = s[order], y[order]
    ranks = np.empty(len(ss))
    i = 0
    while i < len(ss):
        j = i
        while j < len(ss) and ss[j] == ss[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0
        i = j
    npos, nneg = int(y.sum()), int(len(y) - y.sum())
    want = (ranks[yy == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)
    assert int(res["n_pos"][0]) == npos and int(res["n_neg"][0]) == nneg
    assert abs(float(res["auc_roc"][0]) - want) < 1e-12
    assert 0.0 <= float(res["auc_pr"][0]) <= 1.0


@pytest.mark.parametrize("name", ["karate", "path100"])
def test_katz_index_vs_brute(ray_session, name):
    """KatzIndex = sum_l beta^l A^l[u,v] (truncated walk polynomial),
    exact vs numpy matrix powers."""
    from networkit_ray.pipelines.linkpred import katz_index_scores

    G = fixture_graph(name)
    beta, L = 0.005, 3
    out = katz_index_scores(
        _ds_edges(G), beta=beta, max_path=L, num_partitions=3
    ).to_pandas()
    nodes = sorted(int(v) for v in G.nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for u, v in G.edges():
        A[idx[int(u)], idx[int(v)]] = 1
        A[idx[int(v)], idx[int(u)]] = 1
    K = np.zeros_like(A)
    P_ = np.eye(len(nodes))
    b = 1.0
    for _ in range(L):
        P_ = P_ @ A
        b *= beta
        K += b * P_
    got = {(int(r.u), int(r.v)): r.katz_index for r in out.itertuples()}
    want = {
        (nodes[i], nodes[j]): K[i, j]
        for i in range(len(nodes))
        for j in range(i + 1, len(nodes))
        if K[i, j] > 0
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_kfold_cross_validation(ray_session):
    """k folds partition the edge set exactly; each fold row equals the
    single-fold harness run with the same fold selector."""
    from networkit_ray.pipelines.linkpred import (
        kfold_cross_validation,
        link_prediction_auc,
        random_link_sampler,
    )

    G = fixture_graph("karate")
    eds = _ds_edges(G)
    k = 3
    # exact partition of the edge set
    tests = []
    for f in range(k):
        _, te = random_link_sampler(eds, holdout_mod=k, seed=0, fold=f)
        tests.append(
            set(zip(*te.to_pandas()[["src", "dst"]].to_numpy().T))
        )
    allp = {(min(u, v), max(u, v)) for u, v in G.edges()}
    assert set().union(*tests) == allp
    assert sum(len(t) for t in tests) == len(allp)

    got = kfold_cross_validation(eds, k=k, seed=0, num_partitions=2).to_pandas()
    assert sorted(got["fold"]) == list(range(k))
    for _, row in got.iterrows():
        one = link_prediction_auc(
            eds, holdout_mod=k, seed=0, fold=int(row["fold"]), num_partitions=2
        ).to_pandas().iloc[0]
        assert abs(row["auc_roc"] - one["auc_roc"]) < 1e-12
        assert abs(row["auc_pr"] - one["auc_pr"]) < 1e-12
        assert row["n_pos"] == one["n_pos"] and row["n_neg"] == one["n_neg"]


def test_sliding_window_vs_pandas(ray_session):
    from networkit_ray.pipelines.windows import sliding_window

    ds = events_ds()
    W, S = 3600, 900
    got = (
        sliding_window(ds, window_s=W, step_s=S, num_partitions=4)
        .to_pandas()
        .sort_values(["user_id", "window_start_us"])
        .reset_index(drop=True)
    )
    df = ds.to_pandas()
    ts = df["ts"].astype("int64").to_numpy()
    rows = []
    for uid, t_us, val in zip(df["user_id"], ts, df["value"]):
        last = (t_us // (S * 1_000_000)) * (S * 1_000_000)
        for h in range(W // S):
            start = last - h * S * 1_000_000
            if start <= t_us < start + W * 1_000_000:
                rows.append((uid, start, val))
    import pandas as pd

    want = (
        pd.DataFrame(rows, columns=["user_id", "window_start_us", "value"])
        .groupby(["user_id", "window_start_us"])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
        .sort_values(["user_id", "window_start_us"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    assert (
        got["window_start_us"].to_numpy() == want["window_start_us"].to_numpy()
    ).all()
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    np.testing.assert_allclose(got["sum_value"], want["sum_value"], atol=1e-9)
    # each event lands in exactly W/S windows
    assert got["n_events"].sum() == ds.count() * (W // S)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sliding_window(ds, window_s=3600, step_s=1000)
