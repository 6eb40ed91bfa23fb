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
