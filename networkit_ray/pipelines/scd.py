"""Seeded local community detection (SURVEY.md §2.3 `scd/` module):
personalized PageRank + conductance sweep — the reference's PageRankNibble
(Andersen–Chung–Lang approximate PPR with a sweep cut; the fixed-iteration
power-iteration PPR here is deterministic and SQL-mirrorable, unlike ACL's
push algorithm, while the sweep optimizes the identical objective).

Scale shapes:
- personalized_pagerank: the Katz/eigenvector SpMV-iteration skeleton with
  a seed-restart teleport — per iteration one co-partitioned join + one
  pre-combined groupby(dst) sum; V-sized score table, never driver-held.
- pagerank_nibble: the sweep only ever examines the TOP max_size vertices
  by ppr/deg (PageRankNibble's community-size budget) — a distributed
  top-k; the driver then holds O(max_size) rows plus the in-candidate-set
  edge ranks (≤ max_size²) and computes all prefix conductances in one
  vectorized pass.  Nothing graph-sized reaches the driver; the global
  volume is one scalar aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from networkit_ray.stages.graphops import (
    canonicalize_undirected,
    out_degrees,
    symmetrize,
)


def _proj(ds, fn):
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _deg_fetch(sym, want: np.ndarray, num_partitions: int) -> dict:
    """Degrees for an EXPLICIT vid set only (the r4 verdict's semi-join
    shape): broadcast the sorted wanted vids, count matching src rows per
    batch (pre-combined), one boundary-sized groupby — never a
    full-vertex pull.  -> {vid: degree} for wanted vids present in sym."""
    import ray

    if len(want) == 0:
        return {}
    ref = ray.put(np.sort(np.asarray(want, dtype=np.int64)))

    def f(t: pa.Table) -> pa.Table:
        w = ray.get(ref)
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        i = np.minimum(np.searchsorted(w, s), len(w) - 1)
        m = w[i] == s
        out = pa.table(
            {"vid": s[m], "deg": pa.array(np.ones(int(m.sum()), np.int64))}
        )
        return (
            out.group_by("vid").aggregate([("deg", "sum")])
            .rename_columns(["vid", "deg"])
        )

    df = (
        sym.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vid", num_partitions=num_partitions)
        .aggregate(Sum("deg", alias_name="deg"))
        .to_pandas()
    )
    if "vid" not in df.columns:  # empty result can be schema-less
        return {}
    return dict(
        zip(df["vid"].to_numpy(np.int64), df["deg"].to_numpy(np.int64))
    )


def personalized_pagerank(
    edges_ds,
    seed_vid: int,
    alpha: float = 0.15,
    iters: int = 20,
    num_partitions: int = 8,
):
    """x_{k+1} = α·e_seed + (1−α)·Σ_{u→v} x_k[u]/deg(u), x_0 = e_seed,
    over the undirected simple graph; fixed iterations (deterministic, the
    SQL oracle mirrors the recursion).  -> Dataset(vid, ppr)."""
    canon = canonicalize_undirected(edges_ds, weight="one")
    sym = symmetrize(canon).materialize()
    deg = (
        out_degrees(sym, weighted=False)
        .select_columns(["vid", "out_deg"])
        .materialize()
    )
    rate_edges = _proj(
        sym.join(
            deg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        ),
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "inv_deg": pc.divide(
                    pa.scalar(1.0), pc.cast(t["out_deg"], pa.float64())
                ),
            }
        ),
    ).materialize()

    seed = int(seed_vid)
    scores = _proj(
        deg,
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "x": pc.if_else(
                    pc.equal(t["vid"], pa.scalar(seed, pa.int64())),
                    pa.scalar(1.0),
                    pa.scalar(0.0),
                ),
            }
        ),
    ).materialize()

    def _contrib(t: pa.Table) -> pa.Table:
        out = pa.table(
            {"vid": t["dst"], "c": pc.multiply(t["inv_deg"], t["x"])}
        )
        return (
            out.group_by("vid").aggregate([("c", "sum")]).rename_columns(["vid", "c"])
        )

    for _ in range(iters):
        contribs = (
            _proj(
                rate_edges.join(
                    scores,
                    join_type="inner",
                    num_partitions=num_partitions,
                    on=("src",),
                    right_on=("vid",),
                ),
                _contrib,
            )
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Sum("c", alias_name="c"))
        )
        scores = _proj(
            scores.select_columns(["vid"]).join(
                contribs,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("vid",),
            ),
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "x": pc.add(
                        pc.multiply(
                            pc.fill_null(pc.cast(t["c"], pa.float64()), 0.0),
                            1.0 - alpha,
                        ),
                        pc.if_else(
                            pc.equal(t["vid"], pa.scalar(seed, pa.int64())),
                            pa.scalar(float(alpha)),
                            pa.scalar(0.0),
                        ),
                    ),
                }
            ),
        ).materialize()
    return _proj(
        scores, lambda t: pa.table({"vid": t["vid"], "ppr": t["x"]})
    )


def pagerank_nibble(
    edges_ds,
    seed_vid: int,
    alpha: float = 0.15,
    iters: int = 20,
    max_size: int = 100,
    num_partitions: int = 8,
):
    """-> (Dataset(vid), conductance): the best sweep-cut community around
    ``seed_vid`` — the prefix of the ppr/deg ordering (ties by vid) with
    minimum conductance φ(S) = cut(S)/min(vol(S), vol(G)−vol(S)) among
    prefixes of size ≤ max_size that contain the seed."""
    import ray.data

    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    sym = symmetrize(canon).materialize()
    deg = (
        out_degrees(sym, weighted=False)
        .select_columns(["vid", "out_deg"])
        .materialize()
    )
    vol_total = float(deg.sum("out_deg") or 0)

    ppr = personalized_pagerank(
        canon, seed_vid, alpha=alpha, iters=iters, num_partitions=num_partitions
    )
    ranked = _proj(
        ppr.join(
            deg, join_type="inner", num_partitions=num_partitions, on=("vid",)
        ),
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "d": pc.cast(t["out_deg"], pa.int64()),
                "ratio": pc.divide(
                    t["ppr"], pc.cast(t["out_deg"], pa.float64())
                ),
            }
        ),
    )
    # distributed top-k, then the O(max_size) candidate set on the driver
    cand = (
        ranked.sort(["ratio", "vid"], descending=[True, False])
        .limit(max_size)
        .to_pandas()
    )
    # drop zero-ppr tail (unreached vertices are never community members)
    cand = cand[cand["ratio"] > 0.0].reset_index(drop=True)
    if len(cand) == 0 or int(cand["vid"].iat[0]) != int(seed_vid):
        # degenerate: the seed itself must lead the sweep (it always has
        # the maximum ppr/deg after a restart-dominated iteration count —
        # anything else means the seed has no edges)
        out = ray.data.from_arrow(
            pa.table({"vid": pa.array([int(seed_vid)], pa.int64())})
        )
        return out, 1.0

    vids = cand["vid"].to_numpy(np.int64)
    degs = cand["d"].to_numpy(np.int64)
    rank_of = {int(v): i for i, v in enumerate(vids)}
    K = len(vids)

    # in-candidate-set edges as (min_rank, max_rank) pairs — broadcast the
    # K-sized set, one filtered pass over the canonical edges
    import ray as _ray

    vref = _ray.put(np.sort(vids))

    def inset(t: pa.Table, _ref=vref) -> pa.Table:
        sset = _ray.get(_ref)
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        pos_s = np.searchsorted(sset, s)
        pos_d = np.searchsorted(sset, d)
        np.clip(pos_s, 0, len(sset) - 1, out=pos_s)
        np.clip(pos_d, 0, len(sset) - 1, out=pos_d)
        keep = (sset[pos_s] == s) & (sset[pos_d] == d)
        return pa.table({"a": s[keep], "b": d[keep]})

    inset_edges = _proj(canon.select_columns(["src", "dst"]), inset).to_pandas()
    ra = np.array([rank_of[int(x)] for x in inset_edges["a"]], dtype=np.int64)
    rb = np.array([rank_of[int(x)] for x in inset_edges["b"]], dtype=np.int64)
    hi_rank = np.maximum(ra, rb)

    # prefix k (size k+1): internal(k) = #in-set edges with hi_rank <= k
    internal = np.cumsum(np.bincount(hi_rank, minlength=K))
    vol = np.cumsum(degs).astype(np.float64)
    cut = vol - 2.0 * internal
    other = vol_total - vol
    denom = np.minimum(vol, other)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.where(denom > 0, cut / denom, 1.0)
    best = int(np.argmin(phi))  # first minimum -> deterministic
    members = np.sort(vids[: best + 1])
    out = ray.data.from_arrow(pa.table({"vid": pa.array(members, pa.int64())}))
    return out, float(phi[best])


def greedy_community_expansion(
    edges_ds,
    seed_vid: int,
    max_size: int = 100,
    num_partitions: int = 8,
):
    """GreedyCommunityExpansion (reference scd/GCE, conductance variant):
    grow a community C from the seed one vertex at a time, each round
    admitting the boundary candidate that MINIMIZES the resulting
    conductance phi(C) = cut(C) / min(vol(C), 2W - vol(C)) (ties ->
    smaller vid); stop when no candidate improves phi or |C| = max_size.

    Distributed shape (same machinery as GroupDegree): C broadcasts per
    round as a sorted array; one vectorized pass over the symmetrized
    edge table yields every candidate's links-into-C count, from which
    cut' = cut + deg(v) - 2*links(v, C) and vol' = vol + deg(v) follow in
    closed form — only (candidate, links) pairs reach the driver, and
    only for boundary candidates.  Local communities are small, so the
    O(|C|) rounds are the algorithm's inherent cost (the reference's loop
    is identical); each round is fully distributed.
    -> Dataset(vid) of the community, plus the final conductance as a
    one-row attached table: (Dataset(vid), phi)."""
    import ray
    import ray.data

    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    sym = symmetrize(canon).select_columns(["src", "dst"]).materialize()
    W2 = 2.0 * canon.count()  # total volume (unit weights)
    # degrees fetched per round for NEW boundary vids only (semi-join
    # shape) and cached across rounds — the working set stays
    # O(C ∪ seen boundary), never the full vertex set
    deg_cache: dict[int, int] = {}

    def deg_of(v: np.ndarray) -> np.ndarray:
        unknown = np.array(
            [int(x) for x in v if int(x) not in deg_cache], dtype=np.int64
        )
        if len(unknown):
            deg_cache.update(_deg_fetch(sym, unknown, num_partitions))
        return np.fromiter(
            (deg_cache.get(int(x), 0) for x in v), np.int64, len(v)
        )

    C = {int(seed_vid)}
    seed_deg = int(deg_of(np.array([seed_vid], np.int64))[0])
    vol = float(seed_deg)
    cut = float(seed_deg)

    def phi(c: float, v: float) -> float:
        den = min(v, W2 - v)
        return c / den if den > 0 else np.inf

    cur_phi = phi(cut, vol)
    while len(C) < max_size:
        cref = ray.put(np.array(sorted(C), dtype=np.int64))

        def links_into_c(t: pa.Table) -> pa.Table:
            cs = ray.get(cref)
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            # candidate s outside C with neighbor d inside C
            i1 = np.minimum(np.searchsorted(cs, d), len(cs) - 1)
            d_in = cs[i1] == d
            i2 = np.minimum(np.searchsorted(cs, s), len(cs) - 1)
            s_out = cs[i2] != s
            m = d_in & s_out
            out = pa.table(
                {"vid": s[m], "l": pa.array(np.ones(int(m.sum()), np.int64))}
            )
            return (
                out.group_by("vid").aggregate([("l", "sum")])
                .rename_columns(["vid", "l"])
            )

        cand = (
            sym.map_batches(
                links_into_c, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Sum("l", alias_name="l"))
            .to_pandas()
        )
        if len(cand) == 0:
            break
        v = cand["vid"].to_numpy(np.int64)
        l = cand["l"].to_numpy(np.int64)
        dv = deg_of(v)
        new_cut = cut + dv - 2.0 * l
        new_vol = vol + dv
        den = np.minimum(new_vol, W2 - new_vol)
        with np.errstate(divide="ignore", invalid="ignore"):
            new_phi = np.where(den > 0, new_cut / den, np.inf)
        order = np.lexsort((v, new_phi))
        best = order[0]
        if new_phi[best] >= cur_phi - 1e-15:
            break
        C.add(int(v[best]))
        cut, vol, cur_phi = (
            float(new_cut[best]),
            float(new_vol[best]),
            float(new_phi[best]),
        )
    out = ray.data.from_arrow(
        pa.table({"vid": np.array(sorted(C), dtype=np.int64)})
    )
    return out, cur_phi


def lfm_local(
    edges_ds,
    seed_vid: int,
    alpha: float = 1.0,
    max_size: int = 100,
    max_rounds: int = 200,
    num_partitions: int = 8,
):
    """LFMLocal (reference scd/LFMLocal; Lancichinetti/Fortunato/Kertesz
    2009 local fitness method): greedily grow C from the seed by the
    fitness f(C) = k_in / (k_in + k_out)^alpha — each round admit the
    boundary candidate with the highest resulting fitness (ties ->
    smaller vid), then PRUNE any member (except the seed) whose removal
    raises fitness, until no addition improves or |C| = max_size.

    Same distributed shape as greedy_community_expansion: C broadcasts
    per round; ONE vectorized edge pass yields links-into-C for both the
    boundary candidates and the members (s in C rows), so the add step
    and the prune check share a single scan.  k_in/k_out deltas are
    closed-form from (links, degree).  -> (Dataset(vid), fitness)."""
    import ray
    import ray.data

    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    sym = symmetrize(canon).select_columns(["src", "dst"]).materialize()
    # same bounded degree shape as greedy_community_expansion: semi-join
    # fetch for new boundary/member vids, cached across rounds
    deg_cache: dict[int, int] = {}

    def deg_of(v: np.ndarray) -> np.ndarray:
        unknown = np.array(
            [int(x) for x in v if int(x) not in deg_cache], dtype=np.int64
        )
        if len(unknown):
            deg_cache.update(_deg_fetch(sym, unknown, num_partitions))
        return np.fromiter(
            (deg_cache.get(int(x), 0) for x in v), np.int64, len(v)
        )

    def fitness(k_in: float, k_out: float) -> float:
        den = (k_in + k_out) ** alpha
        return k_in / den if den > 0 else 0.0

    C = {int(seed_vid)}
    sd = float(deg_of(np.array([seed_vid], np.int64))[0])
    k_in, k_out = 0.0, sd
    cur = fitness(k_in, k_out)
    for _ in range(max_rounds):
        cref = ray.put(np.array(sorted(C), dtype=np.int64))

        def links_scan(t: pa.Table) -> pa.Table:
            cs = ray.get(cref)
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            i1 = np.minimum(np.searchsorted(cs, d), len(cs) - 1)
            d_in = cs[i1] == d
            m = d_in  # rows whose NEIGHBOR is in C; src may be in or out
            out = pa.table(
                {
                    "vid": s[m],
                    "l": pa.array(np.ones(int(m.sum()), np.int64)),
                }
            )
            return (
                out.group_by("vid").aggregate([("l", "sum")])
                .rename_columns(["vid", "l"])
            )

        links = (
            sym.map_batches(
                links_scan, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Sum("l", alias_name="l"))
            .to_pandas()
        )
        v = links["vid"].to_numpy(np.int64)
        l = links["l"].to_numpy(np.float64)
        dv = deg_of(v).astype(np.float64)
        cs = np.array(sorted(C), dtype=np.int64)
        i1 = np.minimum(np.searchsorted(cs, v), len(cs) - 1)
        in_c = cs[i1] == v

        # ONE move per round from this consistent snapshot: the best
        # addition (boundary candidate) or the best removal (non-seed
        # member), whichever raises fitness more; stop when neither does
        best = None  # (fitness, vid, is_add, l, d)
        if len(C) < max_size and (~in_c).any():
            vo, lo, do = v[~in_c], l[~in_c].astype(float), dv[~in_c]
            nf = np.array(
                [
                    fitness(k_in + 2.0 * l_, k_out - 2.0 * l_ + d_)
                    for l_, d_ in zip(lo, do)
                ]
            )
            order = np.lexsort((vo, -nf))
            b = order[0]
            best = (float(nf[b]), int(vo[b]), True, float(lo[b]), float(do[b]))
        if in_c.any() and len(C) > 1:
            vi, li, di = v[in_c], l[in_c].astype(float), dv[in_c]
            keep = vi != int(seed_vid)
            if keep.any():
                vi, li, di = vi[keep], li[keep], di[keep]
                rf = np.array(
                    [
                        fitness(k_in - 2.0 * l_, k_out + 2.0 * l_ - d_)
                        for l_, d_ in zip(li, di)
                    ]
                )
                order = np.lexsort((vi, -rf))
                b = order[0]
                if best is None or rf[b] > best[0] + 1e-15:
                    best = (
                        float(rf[b]), int(vi[b]), False,
                        float(li[b]), float(di[b]),
                    )
        if best is None or best[0] <= cur + 1e-15:
            break
        f_new, bv, is_add, bl, bd = best
        if is_add:
            C.add(bv)
            k_in += 2.0 * bl
            k_out += bd - 2.0 * bl
        else:
            C.discard(bv)
            k_in -= 2.0 * bl
            k_out += 2.0 * bl - bd
        cur = f_new
    out = ray.data.from_arrow(
        pa.table({"vid": np.array(sorted(C), dtype=np.int64)})
    )
    return out, cur


def clique_detect(edges_ds, seed_vid: int, num_partitions: int = 8):
    """CliqueDetect (reference scd/CliqueDetect): the largest clique
    CONTAINING the seed, i.e. {seed} ∪ (maximum clique of the subgraph
    induced by N(seed)); ties -> lexicographically smallest vertex set.

    Distributed shape: one broadcast filter extracts the seed's ego-net
    edge set (both endpoints in N(seed)) — ego nets are degree-bounded,
    the ONLY part of the graph this seeded query ever materializes — and
    the exact max-clique search runs driver-side on that small induced
    subgraph (branch and bound over adjacency bitsets, the same oriented
    search maximal_cliques uses per pivot).  -> Dataset(vid)."""
    import ray
    import ray.data

    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    sym = symmetrize(canon).select_columns(["src", "dst"]).materialize()
    sv = int(seed_vid)
    nbr_df = sym.filter(expr=f"src == {sv}").to_pandas()
    if "dst" not in nbr_df.columns:  # isolated seed: empty, schema-less
        nbr_df = None
    nbrs = (
        np.empty(0, np.int64)
        if nbr_df is None
        else nbr_df["dst"].to_numpy(np.int64)
    )
    nbrs = np.unique(nbrs[nbrs != sv])
    if len(nbrs) == 0:
        return ray.data.from_arrow(
            pa.table({"vid": np.array([sv], dtype=np.int64)})
        )
    nref = ray.put(np.sort(nbrs))

    def ego(t: pa.Table) -> pa.Table:
        ns = ray.get(nref)
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        i1 = np.minimum(np.searchsorted(ns, s), len(ns) - 1)
        i2 = np.minimum(np.searchsorted(ns, d), len(ns) - 1)
        m = (ns[i1] == s) & (ns[i2] == d)
        return pa.table({"src": s[m], "dst": d[m]})

    ego_df = canon.map_batches(
        ego, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    # exact max clique over the ego net (adjacency bitsets, greedy-order
    # branch and bound; |N(seed)| vertices)
    idx = {int(v): i for i, v in enumerate(nbrs)}
    n = len(nbrs)
    adj = [0] * n
    for s, d in zip(ego_df["src"], ego_df["dst"]):
        a, b = idx[int(s)], idx[int(d)]
        if a != b:
            adj[a] |= 1 << b
            adj[b] |= 1 << a
    best = 0  # bitmask of the best clique among neighbors

    def bits(x: int):
        while x:
            b = x & -x
            yield b.bit_length() - 1
            x ^= b

    def bb(cur: int, cand: int, size: int):
        nonlocal best
        if size + bin(cand).count("1") <= bin(best).count("1"):
            return
        if cand == 0:
            if size > bin(best).count("1") or (
                size == bin(best).count("1") and cur < best
            ):
                best = cur
            return
        # branch on the lowest candidate (deterministic, lexicographic)
        v = (cand & -cand).bit_length() - 1
        bb(cur | (1 << v), cand & adj[v], size + 1)
        bb(cur, cand & ~(1 << v), size)

    bb(0, (1 << n) - 1, 0)
    members = sorted([sv] + [int(nbrs[i]) for i in bits(best)])
    return ray.data.from_arrow(
        pa.table({"vid": np.array(members, dtype=np.int64)})
    )


def tce(
    edges_ds,
    seed_vid: int,
    max_size: int = 100,
    num_partitions: int = 8,
):
    """TCE — Triangle-based Community Expansion (reference scd/TCE;
    Hamann, Röhrs, Wagner 2017 "Local Community Detection Based on Small
    Cliques").  /root/reference is empty (SURVEY.md §0), so the scoring
    is a documented reconstruction pinned exactly by the pure-Python
    oracle in tests/test_scd.py: grow C from the seed by admitting the
    boundary candidate maximizing

        score(v | C) = (links(v, C) + 2 * tri(v, C)) / deg(v)

    where links = edges from v into C and tri = triangles whose other
    two vertices are BOTH already in C (the triadic-closure signal).
    After the bootstrap round (|C| = 1, where no triangle can exist)
    only candidates closing >= 1 triangle qualify; ties -> smaller vid;
    stop when no candidate qualifies or |C| = max_size.

    Distributed shape (the GCE broadcast-scan + the wedge-join triangle
    machinery): C broadcasts per round; ONE edge scan yields the
    candidate->C adjacency rows; links is a groupby count; tri is a
    boundary-sized SELF-JOIN of that adjacency on the candidate, pair-
    filtered against the (<= |C|^2, driver-held) intra-C edge set; deg
    comes from the cached semi-join fetch.  Only boundary-sized tables
    reach the driver.  -> Dataset(vid) of the community."""
    import ray
    import ray.data

    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    sym = symmetrize(canon).select_columns(["src", "dst"]).materialize()
    deg_cache: dict[int, int] = {}

    def deg_of(v: np.ndarray) -> np.ndarray:
        unknown = np.array(
            [int(x) for x in v if int(x) not in deg_cache], dtype=np.int64
        )
        if len(unknown):
            deg_cache.update(_deg_fetch(sym, unknown, num_partitions))
        return np.fromiter(
            (deg_cache.get(int(x), 0) for x in v), np.int64, len(v)
        )

    BIG = np.int64(1) << np.int64(32)
    C = {int(seed_vid)}
    while len(C) < max_size:
        cs = np.array(sorted(C), dtype=np.int64)
        cref = ray.put(cs)

        def cand_rows(t: pa.Table) -> pa.Table:
            cc = ray.get(cref)
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            i1 = np.minimum(np.searchsorted(cc, d), len(cc) - 1)
            d_in = cc[i1] == d
            i2 = np.minimum(np.searchsorted(cc, s), len(cc) - 1)
            s_out = cc[i2] != s
            m = d_in & s_out
            return pa.table({"vid": s[m], "a": d[m]})

        cand_adj = sym.map_batches(
            cand_rows, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        links_df = (
            cand_adj.groupby("vid", num_partitions=num_partitions)
            .count()
            .to_pandas()
        )
        if "vid" not in links_df.columns or len(links_df) == 0:
            break

        # intra-C edge set (canonical pairs, <= |C|^2 — driver-held)
        def ec_rows(t: pa.Table) -> pa.Table:
            cc = ray.get(cref)
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            i1 = np.minimum(np.searchsorted(cc, s), len(cc) - 1)
            i2 = np.minimum(np.searchsorted(cc, d), len(cc) - 1)
            m = (cc[i1] == s) & (cc[i2] == d)
            return pa.table({"src": s[m], "dst": d[m]})

        ec = canon.map_batches(
            ec_rows, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        if len(ec):
            ec_keys = np.sort(
                np.minimum(ec["src"].to_numpy(np.int64), ec["dst"].to_numpy(np.int64))
                * BIG
                + np.maximum(ec["src"].to_numpy(np.int64), ec["dst"].to_numpy(np.int64))
            )
        else:
            ec_keys = np.empty(0, dtype=np.int64)
        eref = ray.put(ec_keys)

        tri_df = None
        if len(ec_keys):
            other = _proj(
                cand_adj,
                lambda t: pa.table({"vid": t["vid"], "b": t["a"]}),
            ).materialize()
            pairs = _proj(
                cand_adj.join(
                    other,
                    join_type="inner",
                    num_partitions=num_partitions,
                    on=("vid",),
                ),
                lambda t: pa.table(
                    {"vid": t["vid"], "a": t["a"], "b": t["b"]}
                ),
            )

            def tri_count(t: pa.Table) -> pa.Table:
                ek = ray.get(eref)
                v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
                a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
                b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
                m = a < b
                v, a, b = v[m], a[m], b[m]
                key = a * BIG + b
                if len(ek):
                    i = np.minimum(np.searchsorted(ek, key), len(ek) - 1)
                    hit = ek[i] == key
                else:
                    hit = np.zeros(len(key), dtype=bool)
                out = pa.table(
                    {
                        "vid": v[hit],
                        "t": pa.array(np.ones(int(hit.sum()), np.int64)),
                    }
                )
                return (
                    out.group_by("vid").aggregate([("t", "sum")])
                    .rename_columns(["vid", "t"])
                )

            tri_df = (
                pairs.map_batches(
                    tri_count, batch_format="pyarrow", zero_copy_batch=True
                )
                .groupby("vid", num_partitions=num_partitions)
                .aggregate(Sum("t", alias_name="t"))
                .to_pandas()
            )

        v = links_df["vid"].to_numpy(np.int64)
        links = links_df["count()"].to_numpy(np.int64)
        t_v = np.zeros(len(v), dtype=np.int64)
        if tri_df is not None and "vid" in tri_df.columns and len(tri_df):
            tv = tri_df["vid"].to_numpy(np.int64)
            tt = tri_df["t"].to_numpy(np.int64)
            to = np.argsort(tv, kind="stable")
            tv, tt = tv[to], tt[to]
            pos = np.minimum(np.searchsorted(tv, v), len(tv) - 1)
            hit = tv[pos] == v
            t_v[hit] = tt[pos[hit]]
        if len(C) > 1:
            qual = t_v >= 1
            if not qual.any():
                break
            v, links, t_v = v[qual], links[qual], t_v[qual]
        dv = deg_of(v).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = np.where(dv > 0, (links + 2.0 * t_v) / dv, 0.0)
        order = np.lexsort((v, -score))
        C.add(int(v[order[0]]))
    return ray.data.from_arrow(
        pa.table({"vid": np.array(sorted(C), dtype=np.int64)})
    )
