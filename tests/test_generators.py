"""New-generator conformance: Barabasi–Albert (Batagelj–Brandes),
Watts–Strogatz, Chung–Lu power-law, LFR-like clustered benchmark."""

import numpy as np

from networkit_ray.sources.generators import (
    barabasi_albert_edges,
    chung_lu_edges,
    lfr_like_communities,
    lfr_like_edges,
    watts_strogatz_edges,
)


def degs(df, n):
    return np.bincount(
        np.concatenate([df["src"].to_numpy(), df["dst"].to_numpy()]), minlength=n
    )


def test_ba_model_shape(ray_session):
    n, k = 2000, 4
    df = barabasi_albert_edges(n, k, seed=1, parallelism=4).to_pandas()
    assert len(df) == n * k
    # Batagelj-Brandes: edge i attaches vertex i//k to an already-present
    # position -> dst vertex id never exceeds src vertex id
    assert (df["dst"] <= df["src"]).all()
    # every vertex emits exactly k edges
    out = df.groupby("src").size()
    assert (out == k).all() and len(out) == n
    d = degs(df, n)
    # preferential attachment: heavy tail — the max degree far exceeds the
    # mean, and early vertices dominate
    assert d.max() > 8 * d.mean()
    assert d[:20].mean() > 4 * d[n // 2 : n // 2 + 20].mean()


def test_ba_partition_invariant(ray_session):
    a = barabasi_albert_edges(800, 3, seed=9, parallelism=2).to_pandas()
    b = barabasi_albert_edges(800, 3, seed=9, parallelism=7).to_pandas()
    assert sorted(zip(a["src"], a["dst"])) == sorted(zip(b["src"], b["dst"]))


def test_watts_strogatz(ray_session):
    n, k = 1000, 6
    ring = watts_strogatz_edges(n, k, 0.0, seed=2).to_pandas()
    d = degs(ring, n)
    assert (d == k).all()  # p=0: exact ring lattice
    # every lattice edge present
    got = set(zip(ring["src"], ring["dst"]))
    for v in range(n):
        for j in (1, 2, 3):
            assert (v, (v + j) % n) in got
    rew = watts_strogatz_edges(n, k, 0.3, seed=2).to_pandas()
    lattice = set()
    for v in range(n):
        for j in (1, 2, 3):
            lattice.add((v, (v + j) % n))
    frac = np.mean([(s, t) not in lattice for s, t in zip(rew["src"], rew["dst"])])
    assert 0.2 < frac < 0.4  # ~p rewired (a few rewires land on lattice)
    assert (rew["src"] != rew["dst"]).all()  # rewiring never makes loops
    r2 = watts_strogatz_edges(n, k, 0.3, seed=2, parallelism=6).to_pandas()
    assert sorted(zip(rew["src"], rew["dst"])) == sorted(zip(r2["src"], r2["dst"]))


def test_chung_lu_powerlaw(ray_session):
    n, m = 5000, 40000
    df = chung_lu_edges(n, m, gamma=2.5, seed=3).to_pandas()
    assert len(df) == m
    d = degs(df, n)
    # expected degree decays with rank
    assert d[:10].mean() > 3 * d[2500:2510].mean()
    assert d[:10].mean() > 10 * max(1.0, d[4900:4990].mean())
    b = chung_lu_edges(n, m, gamma=2.5, seed=3, parallelism=5).to_pandas()
    assert sorted(zip(df["src"], df["dst"])) == sorted(zip(b["src"], b["dst"]))


def test_lfr_like(ray_session):
    n, m, nc, mu = 3000, 30000, 40, 0.2
    df = lfr_like_edges(n, m, nc, mu=mu, seed=4).to_pandas()
    com = lfr_like_communities(n, nc).to_pandas()
    assert len(com) == n and com["vid"].nunique() == n
    lab = com.set_index("vid")["label"]
    intra = (
        lab.loc[df["src"]].to_numpy() == lab.loc[df["dst"]].to_numpy()
    ).mean()
    # 1-mu intra by construction plus accidental intra from the global draw
    assert intra > 1 - mu - 0.05
    sizes = com.groupby("label").size().sort_values(ascending=False).to_numpy()
    assert len(sizes) == nc and sizes[0] > 4 * sizes[-1]  # power-law-ish
    b = lfr_like_edges(n, m, nc, mu=mu, seed=4, parallelism=6).to_pandas()
    assert sorted(zip(df["src"], df["dst"])) == sorted(zip(b["src"], b["dst"]))
    # vertex ids in range
    assert df[["src", "dst"]].to_numpy().min() >= 0
    assert df[["src", "dst"]].to_numpy().max() < n


def test_powerlaw_degree_sequence():
    from networkit_ray.sources.generators import powerlaw_degree_sequence

    deg = powerlaw_degree_sequence(5000, gamma=2.5, min_deg=1, max_deg=70, seed=3)
    assert len(deg) == 5000
    assert deg.min() >= 1 and deg.max() <= 70
    assert deg.sum() % 2 == 0
    # heavy tail: the 99th percentile dwarfs the median
    assert np.percentile(deg, 99) > 4 * np.median(deg)
    # deterministic
    again = powerlaw_degree_sequence(5000, gamma=2.5, min_deg=1, max_deg=70, seed=3)
    assert (deg == again).all()


def test_powerlaw_sequence_realizes_via_havel_hakimi(ray_session):
    from networkit_ray.sources.generators import (
        havel_hakimi_edges,
        powerlaw_degree_sequence,
    )

    deg = powerlaw_degree_sequence(300, gamma=2.3, min_deg=1, max_deg=16, seed=5)
    df = havel_hakimi_edges(deg, parallelism=2).to_pandas()
    got = degs(df, 300)
    assert (got == deg).all()


def test_dorogovtsev_mendes_model(ray_session):
    import networkx as nx

    from networkit_ray.sources.generators import dorogovtsev_mendes_edges

    n = 500
    df = dorogovtsev_mendes_edges(n, seed=7, parallelism=4).to_pandas()
    assert len(df) == 2 * n - 3
    G = nx.from_pandas_edgelist(df, "src", "dst")
    # simple by construction: no dup edges, no self loops
    assert G.number_of_edges() == 2 * n - 3
    assert (df["src"] != df["dst"]).all()
    assert nx.is_connected(G)
    # every vertex t >= 3 closed a triangle on arrival
    assert sum(nx.triangles(G).values()) // 3 >= n - 2
    # growing-network heavy tail
    d = degs(df, n)
    assert d.max() > 5 * d.mean()


def test_dorogovtsev_mendes_partition_invariant(ray_session):
    from networkit_ray.sources.generators import dorogovtsev_mendes_edges

    a = dorogovtsev_mendes_edges(400, seed=11, parallelism=2).to_pandas()
    b = dorogovtsev_mendes_edges(400, seed=11, parallelism=7).to_pandas()
    a = a.sort_values(["src", "dst"]).reset_index(drop=True)
    b = b.sort_values(["src", "dst"]).reset_index(drop=True)
    assert (a[["src", "dst"]].values == b[["src", "dst"]].values).all()


def test_clustered_random_graph(ray_session):
    from networkit_ray.sources.generators import (
        clustered_random_edges,
        clustered_random_labels,
    )

    n, k = 600, 4
    df = clustered_random_edges(n, k, p_in=0.2, p_out=0.005, seed=2,
                                parallelism=4).to_pandas()
    lab = clustered_random_labels(n, k).to_pandas()
    lv = lab.set_index("vid")["label"]
    assert set(lab["label"]) == set(range(k))
    c_src = (df["src"].to_numpy() * k) // n
    c_dst = (df["dst"].to_numpy() * k) // n
    frac_intra = float((c_src == c_dst).mean())
    # planted structure: most edges intra despite 3x more inter pairs
    assert frac_intra > 0.85
    assert (lv.loc[df["src"]].values == c_src).all()
    # determinism across parallelism
    again = clustered_random_edges(n, k, p_in=0.2, p_out=0.005, seed=2,
                                   parallelism=9).to_pandas()
    a = df.sort_values(["src", "dst"]).reset_index(drop=True)
    b = again.sort_values(["src", "dst"]).reset_index(drop=True)
    assert (a[["src", "dst"]].values == b[["src", "dst"]].values).all()


def test_hyperbolic_exact_vs_brute(ray_session):
    """The band/sector candidate structure must reproduce the EXACT
    threshold-RHG edge set (brute-force all-pairs oracle on the same
    deterministic points)."""
    from networkit_ray.sources.generators import _uniform, hyperbolic_edges

    n, gamma, k = 1500, 3.0, 8.0
    alpha = (gamma - 1) / 2
    xi = alpha / (alpha - 0.5)
    R = 2.0 * np.log(2.0 * n * xi * xi / (np.pi * k))
    ids = np.arange(n, dtype=np.int64)
    th = _uniform(ids, 30, 42) * 2 * np.pi
    r = np.arccosh(1.0 + _uniform(ids, 31, 42) * (np.cosh(alpha * R) - 1.0)) / alpha
    dth = np.abs(th[:, None] - th[None, :])
    dth = np.minimum(dth, 2 * np.pi - dth)
    coshd = (
        np.cosh(r)[:, None] * np.cosh(r)[None, :]
        - np.sinh(r)[:, None] * np.sinh(r)[None, :] * np.cos(dth)
    )
    iu, ju = np.triu_indices(n, k=1)
    mask = coshd[iu, ju] <= np.cosh(R)
    want = set(zip(iu[mask].tolist(), ju[mask].tolist()))

    df = hyperbolic_edges(n, avg_deg=k, gamma=gamma, seed=42,
                          parallelism=4).to_pandas()
    got = set(zip(df["src"].astype(int), df["dst"].astype(int)))
    assert got == want
    # sane degree scale (asymptotic target, loose factor at n=1500)
    mean_deg = 2 * len(got) / n
    assert 0.3 * k < mean_deg < 3 * k


def test_hyperbolic_partition_invariant(ray_session):
    from networkit_ray.sources.generators import hyperbolic_edges

    a = hyperbolic_edges(800, avg_deg=6, seed=5, parallelism=2).to_pandas()
    b = hyperbolic_edges(800, avg_deg=6, seed=5, parallelism=7).to_pandas()
    a = a.sort_values(["src", "dst"]).reset_index(drop=True)
    b = b.sort_values(["src", "dst"]).reset_index(drop=True)
    assert (a[["src", "dst"]].values == b[["src", "dst"]].values).all()
