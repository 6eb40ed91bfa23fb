"""Distributed deterministic graph generators (reference catalog:
generators/{ErdosRenyiGenerator, RmatGenerator} — SURVEY.md §2.3; the
reference tree is empty, so semantics are pinned to the published models:
G(n, m) uniform edge sampling and the Chakrabarti/Zhan/Faloutsos R-MAT
recursive quadrant model).

Ray-Data-native shape: ``ray.data.range(num_edges)`` streams edge *ids*;
every edge derives its randomness counter-style from a keyed hash of its id
(pd.util.hash_array — siphash with a fixed key), so output is bit-identical
across partitionings, cluster sizes and re-runs — no sequential RNG state,
no driver-side generation.  Generating 10^12 edges is embarrassingly
parallel and restartable at block granularity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _uniform(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Deterministic U[0,1) per id for a given stream index."""
    key = ids.astype(np.uint64) * _MIX + np.uint64(stream * 2654435761 + seed)
    h = pd.util.hash_array(key.view(np.int64))
    # 53-bit mantissa path: h/2**64 rounds to exactly 1.0 for h within
    # ~2^10 of 2^64, which lets floor(u*n) emit the out-of-range vid n
    return (h >> np.uint64(11)) * np.float64(2.0**-53)


def erdos_renyi_edges(n: int, m: int, seed: int = 42, parallelism: int = 8):
    """G(n, m)-style: m directed edges sampled uniformly (self-loops and
    duplicates possible, as in one-shot uniform sampling; pipe through
    canonicalize_undirected/dedup_edges for a simple graph).
    -> Dataset(src, dst, w)."""
    import ray.data

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        src = np.floor(_uniform(ids, 0, seed) * n).astype(np.int64)
        dst = np.floor(_uniform(ids, 1, seed) * n).astype(np.int64)
        return pa.table(
            {"src": src, "dst": dst, "w": np.ones(len(ids), dtype=np.float64)}
        )

    return ray.data.range(m, override_num_blocks=parallelism).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )


def rmat_edges(
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    parallelism: int = 8,
):
    """R-MAT: 2^scale vertices, edge_factor * 2^scale edges; each edge
    descends ``scale`` quadrant levels with probabilities (a, b, c, d).
    Power-law degree skew by construction — the benchable synthetic graph
    for sizes beyond the TPC-H projections.  -> Dataset(src, dst, w)."""
    import ray.data

    n_edges = edge_factor << scale
    d = 1.0 - a - b - c
    assert d >= -1e-12, "a+b+c must be <= 1"
    # cumulative quadrant thresholds
    t1, t2, t3 = a, a + b, a + b + c

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        src = np.zeros(len(ids), dtype=np.int64)
        dst = np.zeros(len(ids), dtype=np.int64)
        for level in range(scale):  # scale ~ 20-40 vectorized passes
            u = _uniform(ids, level + 2, seed)
            right = (u >= t1) & (u < t2) | (u >= t3)  # quadrants b, d
            down = u >= t2  # quadrants c, d
            src = (src << 1) | down.astype(np.int64)
            dst = (dst << 1) | right.astype(np.int64)
        return pa.table(
            {"src": src, "dst": dst, "w": np.ones(len(ids), dtype=np.float64)}
        )

    return ray.data.range(n_edges, override_num_blocks=parallelism).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )


def barabasi_albert_edges(n: int, k: int, seed: int = 42, parallelism: int = 8,
                          max_rounds: int = 64):
    """Barabasi–Albert preferential attachment via the Batagelj–Brandes
    linear method (reference generators/BarabasiAlbertGenerator; Batagelj &
    Brandes, "Efficient generation of large random networks", PRE 2005),
    resolved DISTRIBUTEDLY: the B-B array M has M[2i] = i//k and
    M[2i+1] = M[r_i] with r_i ~ U[0, 2i+1); the value of an odd position
    is a pointer chase to a uniformly earlier position, so expected chain
    length is O(log nk) and every chain resolves by iterated hash joins —
    one join per hop round, all edges in parallel, no sequential state.
    Self-loops / parallel edges possible per the model; canonicalize to
    taste.  -> Dataset(src, dst, w), bit-identical across partitionings."""
    import ray.data

    import pyarrow.compute as pc

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        r = np.floor(_uniform(ids, 0, seed) * (2 * ids + 1)).astype(np.int64)
        return pa.table({"i": ids, "src": ids // k, "cur": r})

    cur = ray.data.range(n * k, override_num_blocks=parallelism).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    refs = _t = cur.map_batches(
        lambda t: pa.table({"j": t["i"], "rj": t["cur"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    for _ in range(max_rounds):
        odd = cur.map_batches(
            lambda t: pa.table(
                {"o": pc.cast(
                    pc.equal(pc.bit_wise_and(t["cur"], pa.scalar(1)), pa.scalar(1)),
                    pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("o")
        if not odd:
            break

        def key(t: pa.Table) -> pa.Table:
            c = t["cur"].combine_chunks().to_numpy(zero_copy_only=False)
            is_odd = (c & 1) == 1
            # odd position 2j+1 -> chase row j; even stays put (join miss)
            kk = np.where(is_odd, (c - 1) // 2, np.int64(-1))
            return pa.table({"i": t["i"], "src": t["src"], "cur": t["cur"],
                             "kk": kk})

        j = cur.map_batches(key, batch_format="pyarrow", zero_copy_batch=True).join(
            refs, join_type="left_outer", num_partitions=parallelism,
            on=("kk",), right_on=("j",),
        )
        cur = j.map_batches(
            lambda t: pa.table(
                {
                    "i": t["i"],
                    "src": t["src"],
                    "cur": pc.if_else(
                        pc.is_valid(t["rj"]), pc.fill_null(t["rj"], 0), t["cur"]
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
    return cur.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": pc.divide(pc.divide(t["cur"], pa.scalar(2)), pa.scalar(k)),
                "w": pa.array(np.ones(t.num_rows, np.float64)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def watts_strogatz_edges(n: int, k: int, p: float, seed: int = 42,
                         parallelism: int = 8):
    """Watts–Strogatz small world (reference generators/
    WattsStrogatzGenerator): ring lattice of n vertices each joined to its
    k/2 clockwise neighbors; every edge independently rewires its far
    endpoint with probability p to a uniform non-self vertex.  Counter-based
    per edge id -> embarrassingly parallel, deterministic.
    -> Dataset(src, dst, w)."""
    import ray.data

    half = k // 2
    assert half >= 1

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        v = ids // half
        j = ids % half + 1
        dst = (v + j) % n
        rew = _uniform(ids, 0, seed) < p
        alt = (v + 1 + np.floor(_uniform(ids, 1, seed) * (n - 1)).astype(np.int64)) % n
        dst = np.where(rew, alt, dst)
        return pa.table(
            {"src": v, "dst": dst, "w": np.ones(len(ids), dtype=np.float64)}
        )

    return ray.data.range(n * half, override_num_blocks=parallelism).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )


def _powerlaw_pick(u: np.ndarray, n: int, theta: float) -> np.ndarray:
    """Inverse-CDF pick of i in [0, n) with P(i) ~ (i+1)^-theta."""
    if abs(theta - 1.0) < 1e-9:
        top = np.log(n + 1.0)
        return np.minimum((np.exp(u * top) - 1.0).astype(np.int64), n - 1)
    e = 1.0 - theta
    top = (n + 1.0) ** e - 1.0
    x = (u * top + 1.0) ** (1.0 / e) - 1.0
    return np.minimum(x.astype(np.int64), n - 1)


def chung_lu_edges(n: int, m: int, gamma: float = 2.5, seed: int = 42,
                   parallelism: int = 8):
    """Chung–Lu expected-degree power-law graph (reference generators/
    ChungLuGenerator): m edges, each endpoint drawn independently with
    P(vertex i) ~ (i+1)^-theta, theta = 1/(gamma-1), giving expected degree
    ~ rank^-theta and a degree tail P(deg > d) ~ d^-(gamma-1).  Closed-form
    inverse-CDF sampling per edge id — no alias tables, no broadcast state.
    -> Dataset(src, dst, w)."""
    import ray.data

    theta = 1.0 / (gamma - 1.0)

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        src = _powerlaw_pick(_uniform(ids, 0, seed), n, theta)
        dst = _powerlaw_pick(_uniform(ids, 1, seed), n, theta)
        return pa.table(
            {"src": src, "dst": dst, "w": np.ones(len(ids), dtype=np.float64)}
        )

    return ray.data.range(m, override_num_blocks=parallelism).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )


def lfr_like_edges(n: int, m: int, n_comms: int, gamma: float = 2.5,
                   beta: float = 1.5, mu: float = 0.2, seed: int = 42,
                   parallelism: int = 8):
    """LFR-flavored community benchmark (reference generators/LFRGenerator,
    soft variant): power-law community sizes (~ (j+1)^-beta, communities are
    contiguous vid ranges with closed-form boundaries), power-law degree
    ranks WITHIN each community (theta = 1/(gamma-1)), and mixing mu: each
    edge is intra-community with probability 1-mu (both endpoints local
    power-law picks in a size-proportionally chosen community) and global
    otherwise.  This reproduces LFR's three knobs (degree exponent,
    community-size exponent, mixing fraction) with counter-based
    determinism; it does NOT enforce LFR's exact per-vertex degree/mixing
    constraint rounds — documented deviation, the reference's rewiring
    phase is inherently sequential.  -> Dataset(src, dst, w) plus ground
    truth via ``lfr_like_communities``."""
    import ray.data

    theta = 1.0 / (gamma - 1.0)
    bounds = _lfr_bounds(n, n_comms, beta)
    sizes = np.diff(bounds)
    csum = np.cumsum(sizes).astype(np.float64)
    csum /= csum[-1]

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        intra = _uniform(ids, 0, seed) < (1.0 - mu)
        # intra: community chosen proportional to its size
        cj = np.searchsorted(csum, _uniform(ids, 1, seed), side="right")
        cj = np.minimum(cj, len(sizes) - 1)
        lo, sz = bounds[cj], sizes[cj]
        s_loc = lo + _pick_local(_uniform(ids, 2, seed), sz, theta)
        d_loc = lo + _pick_local(_uniform(ids, 3, seed), sz, theta)
        # inter: global power-law picks
        s_glo = _powerlaw_pick(_uniform(ids, 4, seed), n, theta)
        d_glo = _powerlaw_pick(_uniform(ids, 5, seed), n, theta)
        src = np.where(intra, s_loc, s_glo)
        dst = np.where(intra, d_loc, d_glo)
        return pa.table(
            {"src": src, "dst": dst, "w": np.ones(len(ids), dtype=np.float64)}
        )

    return ray.data.range(m, override_num_blocks=parallelism).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )


def _lfr_bounds(n: int, n_comms: int, beta: float) -> np.ndarray:
    """Community boundary vids: sizes ~ (j+1)^-beta, every community >= 1
    vertex, boundaries exact (sum == n).  n_comms scalars — driver-cheap."""
    raw = (np.arange(1, n_comms + 1, dtype=np.float64)) ** (-beta)
    sizes = np.maximum(1, np.floor(raw / raw.sum() * n).astype(np.int64))
    # distribute the rounding remainder over the largest communities
    rem = n - sizes.sum()
    order = np.argsort(-raw)
    i = 0
    while rem != 0:
        j = order[i % n_comms]
        step = 1 if rem > 0 else -1
        if sizes[j] + step >= 1:
            sizes[j] += step
            rem -= step
        i += 1
    return np.concatenate([[0], np.cumsum(sizes)])


def _pick_local(u: np.ndarray, sz: np.ndarray, theta: float) -> np.ndarray:
    """Vectorized power-law pick with PER-ROW domain size sz."""
    e = 1.0 - theta
    top = (sz + 1.0) ** e - 1.0
    x = (u * top + 1.0) ** (1.0 / e) - 1.0
    return np.minimum(x.astype(np.int64), sz - 1)


def lfr_like_communities(n: int, n_comms: int, beta: float = 1.5,
                         parallelism: int = 8):
    """Ground-truth (vid, label) for lfr_like_edges: label = community min
    vid (communities are contiguous ranges)."""
    import ray.data

    bounds = _lfr_bounds(n, n_comms, beta)

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        j = np.searchsorted(bounds, ids, side="right") - 1
        return pa.table({"vid": ids, "label": bounds[j]})

    return ray.data.range(n, override_num_blocks=parallelism).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )


def havel_hakimi_edges(degree_sequence, parallelism: int = 8):
    """HavelHakimiGenerator (reference generators/HavelHakimiGenerator):
    realize an exact simple graph for the given degree sequence via the
    Havel–Hakimi construction (highest-degree vertex connects to the next
    d highest; deterministic vid tie-break), or raise ValueError if the
    sequence is not graphical.  The construction is inherently sequential
    (like the reference's), so it runs DRIVER-SIDE over the degree
    sequence — n counters, not edges — and emits the edge table as a
    distributed Dataset; heapq gives O(m log n).
    -> Dataset(src, dst, w=1) with src < dst."""
    import heapq

    import ray.data

    deg = np.asarray(degree_sequence, dtype=np.int64)
    n = len(deg)
    if (deg < 0).any() or (deg >= n).any() or deg.sum() % 2:
        raise ValueError("degree sequence is not graphical")
    heap = [(-int(d), v) for v, d in enumerate(deg) if d > 0]
    heapq.heapify(heap)
    srcs: list[int] = []
    dsts: list[int] = []
    while heap:
        d, v = heapq.heappop(heap)
        d = -d
        if d > len(heap):
            raise ValueError("degree sequence is not graphical")
        taken = [heapq.heappop(heap) for _ in range(d)]
        for du, u in taken:
            srcs.append(min(v, u))
            dsts.append(max(v, u))
            if du + 1 < 0:  # du is negative: du+1 == -(deg-1)
                heapq.heappush(heap, (du + 1, u))
    tbl = pa.table(
        {
            "src": np.asarray(srcs, dtype=np.int64),
            "dst": np.asarray(dsts, dtype=np.int64),
            "w": np.ones(len(srcs), dtype=np.float64),
        }
    )
    return ray.data.from_arrow(tbl).repartition(max(1, parallelism))


def powerlaw_degree_sequence(
    n: int, gamma: float = 2.5, min_deg: int = 1, max_deg: int | None = None,
    seed: int = 42,
) -> np.ndarray:
    """PowerlawDegreeSequence (reference generators/PowerlawDegreeSequence):
    deterministic power-law degree draws P(d) ~ d^-gamma on
    [min_deg, max_deg], parity-fixed so the sum is even (bump the first
    non-max entry), i.e. realizable by ``havel_hakimi_edges`` whenever the
    Erdos-Gallai condition holds.  n counters -> driver-side numpy (the
    sequence itself is the small side; the GRAPH realization is what
    scales).  -> int64 array of length n."""
    if max_deg is None:
        max_deg = max(min_deg, int(np.sqrt(n)))
    ids = np.arange(n, dtype=np.int64)
    u = _uniform(ids, 7, seed)
    # inverse-CDF of the truncated continuous power law, floored
    a, b = float(min_deg), float(max_deg) + 1.0
    if gamma == 1.0:
        d = a * np.power(b / a, u)
    else:
        e = 1.0 - gamma
        d = np.power(a**e + u * (b**e - a**e), 1.0 / e)
    deg = np.clip(np.floor(d).astype(np.int64), min_deg, max_deg)
    if deg.sum() % 2:
        i = int(np.argmin(deg))  # deterministic parity fix
        deg[i] += 1 if deg[i] < max_deg else -1
    return deg


def dorogovtsev_mendes_edges(n: int, seed: int = 42, parallelism: int = 8):
    """DorogovtsevMendes growing network (reference generators/
    DorogovtsevMendesGenerator; Dorogovtsev/Mendes/Samukhin 2001): start
    from a triangle; each new vertex t attaches to BOTH endpoints of a
    uniformly random existing edge.  Edge j >= 3 belongs to vertex
    t(j) = (j+3)//2 (odd j, first copy) or (j+2)//2 (even j, second copy)
    and inherits one endpoint from edge r(t) = floor(U_t * (2t-3)); the
    inherited endpoint resolves by a strictly-decreasing POINTER CHASE
    whose targets are all closed-form hash counters, so every edge
    resolves independently inside its batch — vectorized, join-free,
    bit-identical across partitionings (expected O(log n) chase length).
    -> Dataset(src, dst, w), 2n-3 edges, simple by construction."""
    import ray.data

    if n < 3:
        raise ValueError("DorogovtsevMendes needs n >= 3")
    base_a = np.array([0, 0, 1], dtype=np.int64)
    base_b = np.array([1, 2, 2], dtype=np.int64)

    def _t_of(j):  # owning (new) vertex of edge j >= 3
        return np.where(j % 2 == 1, (j + 3) // 2, (j + 2) // 2)

    def _r_of(t):  # referenced earlier edge of vertex t >= 3
        return np.floor(_uniform(t.astype(np.int64), 3, seed) * (2 * t - 3)).astype(
            np.int64
        )

    def mk(batch: pa.Table) -> pa.Table:
        j = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        src = np.where(j < 3, base_a[np.minimum(j, 2)], _t_of(j))
        # resolve the inherited endpoint b(j)
        out = np.where(j < 3, base_b[np.minimum(j, 2)], np.int64(-1))
        cur = j.copy()
        field_a = np.zeros(len(j), dtype=bool)  # False: need b, True: need a
        todo = j >= 3
        # b(odd j) = a(r(t)), b(even j) = b(r(t)); a(j>=3) = t(j) closed form
        while todo.any():
            c = cur[todo]
            fa = field_a[todo]
            res = np.full(len(c), -1, dtype=np.int64)
            done_base = c < 3
            res[done_base & ~fa] = base_b[np.minimum(c[done_base & ~fa], 2)]
            res[done_base & fa] = base_a[np.minimum(c[done_base & fa], 2)]
            done_a = fa & ~done_base
            res[done_a] = _t_of(c[done_a])
            chase = ~done_base & ~fa
            nxt_field = c % 2 == 1  # odd -> need a of target, even -> need b
            c2 = np.where(chase, _r_of(_t_of(c)), c)
            # write back
            idx = np.flatnonzero(todo)
            resolved = done_base | done_a
            out[idx[resolved]] = res[resolved]
            cur[idx] = c2
            field_a[idx[chase]] = nxt_field[chase]
            still = np.zeros(len(j), dtype=bool)
            still[idx[chase]] = True
            todo = still
        return pa.table(
            {
                "src": np.minimum(src, out),
                "dst": np.maximum(src, out),
                "w": np.ones(len(j), dtype=np.float64),
            }
        )

    return ray.data.range(2 * n - 3, override_num_blocks=parallelism).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )


def clustered_random_edges(
    n: int, n_clusters: int, p_in: float, p_out: float,
    seed: int = 42, parallelism: int = 8,
):
    """ClusteredRandomGraphGenerator (reference generators/
    ClusteredRandomGraphGenerator): planted-partition G(n, k, p_in, p_out)
    in one-shot expected-count form — vertices map to k contiguous
    equal-size clusters (vid * k // n, closed form), m_in = p_in * (total
    intra pairs) edges sampled uniformly within a random cluster and
    m_out = p_out * (total inter pairs) across two distinct clusters;
    counter-hash randomness, so bit-identical across partitionings.
    Self-loops/duplicates possible per one-shot sampling (canonicalize to
    taste).  Ground truth: ``clustered_random_labels``.
    -> Dataset(src, dst, w)."""
    import ray.data

    if not 1 <= n_clusters <= n:
        raise ValueError("need 1 <= n_clusters <= n")
    bounds = (np.arange(n_clusters + 1, dtype=np.int64) * n) // n_clusters
    sizes = np.diff(bounds)
    intra_pairs = float((sizes * (sizes - 1) // 2).sum())
    inter_pairs = float(n * (n - 1) // 2 - intra_pairs)
    m_in = int(round(p_in * intra_pairs))
    m_out = int(round(p_out * inter_pairs))

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        is_in = ids < m_in
        # cluster draw weighted by size (intra) / uniform vertex (inter)
        c1 = np.floor(_uniform(ids, 10, seed) * n_clusters).astype(np.int64)
        lo, sz = bounds[c1], sizes[c1]
        u_src = np.floor(_uniform(ids, 11, seed) * np.maximum(sz, 1)).astype(
            np.int64
        )
        u_dst = np.floor(_uniform(ids, 12, seed) * np.maximum(sz, 1)).astype(
            np.int64
        )
        src_in, dst_in = lo + u_src, lo + u_dst
        # inter: uniform vertex, then a vertex from a DIFFERENT cluster
        v1 = np.floor(_uniform(ids, 13, seed) * n).astype(np.int64)
        cv1 = (v1 * n_clusters) // n
        c2 = (
            cv1
            + 1
            + np.floor(
                _uniform(ids, 14, seed) * max(n_clusters - 1, 1)
            ).astype(np.int64)
        ) % n_clusters
        lo2, sz2 = bounds[c2], sizes[c2]
        v2 = lo2 + np.floor(_uniform(ids, 15, seed) * np.maximum(sz2, 1)).astype(
            np.int64
        )
        src = np.where(is_in, src_in, v1)
        dst = np.where(is_in, dst_in, v2)
        return pa.table(
            {
                "src": np.minimum(src, dst),
                "dst": np.maximum(src, dst),
                "w": np.ones(len(ids), dtype=np.float64),
            }
        )

    return ray.data.range(
        m_in + m_out, override_num_blocks=parallelism
    ).map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)


def clustered_random_labels(n: int, n_clusters: int, parallelism: int = 8):
    """Planted ground-truth labeling for ``clustered_random_edges``:
    label(vid) = vid * k // n (closed form).  -> Dataset(vid, label)."""
    import ray.data

    def mk(batch: pa.Table) -> pa.Table:
        v = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {"vid": v, "label": (v * n_clusters) // n}
        )

    return ray.data.range(n, override_num_blocks=parallelism).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )


def hyperbolic_edges(
    n: int,
    avg_deg: float = 6.0,
    gamma: float = 3.0,
    seed: int = 42,
    radius: float | None = None,
    parallelism: int = 8,
    num_bands: int | None = None,
    num_sectors: int | None = None,
):
    """Threshold random hyperbolic graph (reference generators/
    HyperbolicGenerator, T=0; Krioukov et al. 2010, band-structured
    candidate search after von Looz/Meyerhenke/Prutkin 2015): n points at
    (r, theta) in the hyperbolic disk of radius R — theta uniform, r with
    density ~ alpha*sinh(alpha*r), alpha=(gamma-1)/2 — connected iff
    hyperbolic distance <= R.  radius=None uses the Krioukov asymptotic
    R = 2*ln(2*n*xi^2 / (pi*avg_deg)), xi = alpha/(alpha-1/2) (requires
    gamma > 2; the realized mean degree tracks the target asymptotically,
    not exactly at small n).

    Distributed shape: points bucket into (radial band, angular sector)
    cells; every point EXPLODES to the cells it can possibly reach — the
    per-band angular window is computed against the band's INNER radius,
    which upper-bounds the window for every point in the band (the
    candidate set provably covers all edges; the exact cosh check then
    filters).  Outer bands hold almost all points but get near-zero
    windows, inner bands have wide windows but exponentially few points,
    so candidate volume stays near-linear.  All randomness is counter-hash
    -> bit-identical across partitionings.  -> Dataset(src, dst, w),
    src < dst, exact threshold-RHG edge set."""
    import ray
    import ray.data

    if gamma <= 2:
        raise ValueError("hyperbolic_edges needs gamma > 2 (alpha > 1/2)")
    alpha = (gamma - 1.0) / 2.0
    if radius is None:
        xi = alpha / (alpha - 0.5)
        radius = 2.0 * np.log(2.0 * n * xi * xi / (np.pi * avg_deg))
    R = float(radius)
    nb = num_bands or max(4, int(np.ceil(np.log2(max(n, 2)))))
    ns = num_sectors or max(8, int(np.sqrt(n)))
    band_edges = np.linspace(0.0, R, nb + 1)
    cosh_R = np.cosh(R)

    def point_coords(vids: np.ndarray):
        th = _uniform(vids, 30, seed) * (2.0 * np.pi)
        # inverse CDF of alpha*sinh(alpha r)/(cosh(alpha R)-1) on [0, R]
        u = _uniform(vids, 31, seed)
        r = np.arccosh(1.0 + u * (np.cosh(alpha * R) - 1.0)) / alpha
        return r, th

    def window(r1: np.ndarray, r2: float) -> np.ndarray:
        """Max angular difference at which d(p, q) <= R given partner
        radius exactly r2; monotone non-increasing in r2, so evaluating
        at a band's inner edge bounds the whole band."""
        with np.errstate(divide="ignore", invalid="ignore"):
            x = (np.cosh(r1) * np.cosh(r2) - cosh_R) / (
                np.sinh(r1) * np.sinh(r2)
            )
        out = np.full(len(r1), np.pi)
        ok = np.isfinite(x)
        out[ok & (x >= 1.0)] = 0.0
        mid = ok & (x > -1.0) & (x < 1.0)
        out[mid] = np.arccos(x[mid])
        return out

    pts = ray.data.range(n, override_num_blocks=parallelism).map_batches(
        lambda t: (
            lambda v, rt: pa.table(
                {
                    "vid": v,
                    "r": rt[0],
                    "theta": rt[1],
                    "cell": np.minimum(
                        np.digitize(rt[0], band_edges) - 1, nb - 1
                    )
                    * ns
                    + np.floor(rt[1] / (2 * np.pi) * ns).astype(np.int64),
                }
            )
        )(
            t["id"].combine_chunks().to_numpy(zero_copy_only=False),
            point_coords(
                t["id"].combine_chunks().to_numpy(zero_copy_only=False)
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    sector_w = 2.0 * np.pi / ns

    def explode(t: pa.Table) -> pa.Table:
        v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
        r = t["r"].combine_chunks().to_numpy(zero_copy_only=False)
        th = t["theta"].combine_chunks().to_numpy(zero_copy_only=False)
        outs = []
        my_sec = np.floor(th / (2 * np.pi) * ns).astype(np.int64)
        for b in range(nb):
            lo = max(band_edges[b], 1e-12)
            w = window(r, lo)
            # sectors within +-w of theta (half-open wrap arithmetic)
            kmax = np.minimum(
                np.ceil(w / sector_w).astype(np.int64), ns // 2
            )
            # emit rows (cell, vid, r, theta) for offsets -kmax..kmax
            reach = kmax * 2 + 1
            tot = int(reach.sum())
            if tot == 0:
                continue
            rep = np.repeat(np.arange(len(v)), reach)
            starts = np.cumsum(reach) - reach
            offs = np.arange(tot) - starts[rep] - kmax[rep]
            sec = (my_sec[rep] + offs) % ns
            outs.append(
                pa.table(
                    {
                        "cell": np.int64(b * ns) + sec,
                        "qvid": v[rep],
                        "qr": r[rep],
                        "qth": th[rep],
                    }
                )
            )
        return (
            pa.concat_tables(outs)
            if outs
            else pa.table(
                {
                    "cell": np.empty(0, np.int64),
                    "qvid": np.empty(0, np.int64),
                    "qr": np.empty(0, np.float64),
                    "qth": np.empty(0, np.float64),
                }
            )
        )

    queries = pts.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    cand = queries.join(
        pts,
        join_type="inner",
        num_partitions=parallelism,
        on=("cell",),
    )

    def check(t: pa.Table) -> pa.Table:
        qv = t["qvid"].combine_chunks().to_numpy(zero_copy_only=False)
        pv = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
        qr = t["qr"].combine_chunks().to_numpy(zero_copy_only=False)
        pr = t["r"].combine_chunks().to_numpy(zero_copy_only=False)
        qt = t["qth"].combine_chunks().to_numpy(zero_copy_only=False)
        pt_ = t["theta"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = qv < pv
        dth = np.abs(qt - pt_)
        dth = np.minimum(dth, 2 * np.pi - dth)
        coshd = np.cosh(qr) * np.cosh(pr) - np.sinh(qr) * np.sinh(pr) * np.cos(
            dth
        )
        keep &= coshd <= cosh_R
        out = pa.table({"src": qv[keep], "dst": pv[keep]})
        # in-batch dedup (the same pair can meet in several cells)
        return out.group_by(["src", "dst"]).aggregate([]).rename_columns(
            ["src", "dst"]
        )

    from ray.data.aggregate import Count

    edges = (
        cand.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"], num_partitions=parallelism)
        .aggregate(Count(alias_name="dup"))
    )
    return edges.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "w": np.ones(t.num_rows, np.float64),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
