"""Degree-preserving graph randomization — parallel edge switching and
degree-preserving node shuffle.

Reference counterpart: randomization/{EdgeSwitchingMarkovChainGenerator,
EdgeSwitching, DegreePreservingShuffle} (SURVEY.md §2.3): the null-model
generators for significance
testing of community / centrality results.  The sequential MCMC picks two
random edges and crosses their endpoints; the distributed round re-expressed
Ray-Data-first:

  per round:
    1. every edge hashes (counter-style, seed+round keyed) into a random
       bucket of expected size 2; buckets pair their edges (odd edge out
       rests this round);
    2. each pair ((a,b),(c,d)) proposes the cross ((a,d),(c,b)) or
       ((a,c),(b,d)) — direction picked by the pair's hash bit;
    3. a swap COMMITS only if both proposals are loop-free, distinct from
       every CURRENT edge (hash join against the edge set), and distinct
       from every other proposal this round (pre-combined groupby) —
       otherwise the pair keeps its original edges.  Conservative
       rejection (a proposal colliding with its own pair counts as a
       reject) never changes the result, only the mixing rate.

Every round preserves the degree multiset EXACTLY and keeps the graph
simple; the edge set mixes toward the uniform distribution over graphs
with that degree sequence.  All state is the edge Dataset itself — no
driver-side adjacency, deterministic given (seed, rounds), and each round
is two bucket exchanges plus one existence join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from networkit_ray.stages.graphops import canonicalize_undirected

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hash2(a: np.ndarray, b: np.ndarray, salt: int) -> np.ndarray:
    key = (
        a.astype(np.uint64) * _MIX
        + b.astype(np.uint64) * np.uint64(2654435761)
        + np.uint64(salt)
    )
    return pd.util.hash_array(key.view(np.int64)).astype(np.uint64)


def _pair_group(df: pd.DataFrame) -> pd.DataFrame:
    """One bucket -> proposal rows: [swap_id, src, dst, osrc, odst]."""
    df = df.sort_values(["src", "dst"]).reset_index(drop=True)
    n = len(df) - (len(df) % 2)
    rows = {"sid": [], "src": [], "dst": [], "osrc": [], "odst": []}
    for i in range(0, n, 2):
        a, b = int(df["src"].iat[i]), int(df["dst"].iat[i])
        c, d = int(df["src"].iat[i + 1]), int(df["dst"].iat[i + 1])
        sid = int(df["h"].iat[i])
        if sid & 1:
            p1, p2 = (a, d), (c, b)
        else:
            p1, p2 = (a, c), (b, d)
        for (x, y) in (p1, p2):
            rows["sid"].append(sid)
            rows["src"].append(min(x, y))
            rows["dst"].append(max(x, y))
        rows["osrc"].extend([a, c])
        rows["odst"].extend([b, d])
    # odd edge out: passes through unchanged (sid = -1)
    for i in range(n, len(df)):
        rows["sid"].append(-1)
        rows["src"].append(int(df["src"].iat[i]))
        rows["dst"].append(int(df["dst"].iat[i]))
        rows["osrc"].append(int(df["src"].iat[i]))
        rows["odst"].append(int(df["dst"].iat[i]))
    return pd.DataFrame(rows)


def edge_switching(
    edges_ds,
    rounds: int = 10,
    seed: int = 42,
    num_partitions: int = 8,
):
    """edges(src,dst[,w]) -> Dataset(src, dst, w=1): a degree-preserving
    randomization of the simple undirected graph (same degree multiset,
    same edge count, still simple).  Deterministic given (seed, rounds)."""
    cur = (
        canonicalize_undirected(edges_ds, weight="one")
        .select_columns(["src", "dst"])
        .materialize()
    )
    m = cur.count()
    if m < 2:
        return cur.map_batches(
            lambda t: t.append_column(
                "w", pa.array(np.ones(t.num_rows, np.float64))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    n_buckets = max(1, m // 2)
    for r in range(rounds):
        salt = seed * 1_000_003 + r

        def bucketize(t: pa.Table, _salt=salt) -> pa.Table:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            h = _hash2(s, d, _salt)
            return pa.table(
                {
                    "bucket": (h % np.uint64(n_buckets)).view(np.int64),
                    "src": s,
                    "dst": d,
                    "h": h.view(np.int64),
                }
            )

        props = (
            cur.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket", num_partitions=num_partitions)
            .map_groups(_pair_group, batch_format="pandas")
            .materialize()
        )

        # invalid proposals: loops, duplicates among this round's
        # proposals, or collisions with any current edge
        def mark_loops(t: pa.Table) -> pa.Table:
            return t.append_column(
                "bad",
                pc.cast(pc.equal(t["src"], t["dst"]), pa.int64()),
            )

        marked = props.map_batches(
            mark_loops, batch_format="pyarrow", zero_copy_batch=True
        )
        exist = cur.map_batches(
            lambda t: pa.table(
                {
                    "es": t["src"],
                    "ed": t["dst"],
                    "ex": pa.array(np.ones(t.num_rows, np.int8)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        j = marked.join(
            exist,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("src", "dst"),
            right_on=("es", "ed"),
        )
        def mark_exist(t: pa.Table) -> pa.Table:
            if "ex" in t.schema.names:
                hit = pc.cast(pc.is_valid(t["ex"]), pa.int64())
            else:  # Ray 2.49: unmatched left_outer blocks may lack right cols
                hit = pa.array(np.zeros(t.num_rows, np.int64))
            return pa.table(
                {
                    "sid": t["sid"],
                    "src": t["src"],
                    "dst": t["dst"],
                    "osrc": t["osrc"],
                    "odst": t["odst"],
                    "bad": pc.max_element_wise(t["bad"], hit),
                }
            )

        j = j.map_batches(mark_exist, batch_format="pyarrow", zero_copy_batch=True)

        # per-proposal duplicate detection + per-swap commit decision in one
        # grouped pass: group by proposed edge to count collisions, then by
        # swap id to AND the two proposals' validity
        def dup_pre(t: pa.Table) -> pa.Table:
            g = (
                pa.table({"src": t["src"], "dst": t["dst"]})
                .group_by(["src", "dst"])
                .aggregate([([], "count_all")])
            )
            return g.rename_columns(["src", "dst", "cnt"])

        from ray.data.aggregate import Sum

        dup = (
            j.map_batches(dup_pre, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["src", "dst"], num_partitions=num_partitions)
            .aggregate(Sum("cnt", alias_name="cnt"))
            .map_batches(
                lambda t: pa.table(
                    {"ds2": t["src"], "dd2": t["dst"]}
                ).filter(pc.greater(t["cnt"], pa.scalar(1))),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
        if dup.count() > 0:
            # mark colliding proposals via a BROADCAST sorted-hash set, not
            # a join: Ray 2.49's left_outer against a tiny aggregated right
            # side silently drops matches in some blocks (same bug family
            # as compat.py).  The collision set is output-bound-small (it
            # only holds this round's duplicated proposal keys); a 2^-64
            # hash false positive merely rejects one extra swap, which is
            # always a legal (conservative) outcome.
            import ray as _ray

            ddf = dup.to_pandas()
            dkeys = np.sort(
                _hash2(
                    ddf["ds2"].to_numpy(np.int64),
                    ddf["dd2"].to_numpy(np.int64),
                    salt ^ 0x5BD1E995,
                ).view(np.int64)
            )
            dref = _ray.put(dkeys)

            def mark_dup(t: pa.Table, _ref=dref, _salt=salt) -> pa.Table:
                keys = _ray.get(_ref)
                s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
                d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
                h = _hash2(s, d, _salt ^ 0x5BD1E995).view(np.int64)
                pos = np.minimum(np.searchsorted(keys, h), len(keys) - 1)
                hit = (keys[pos] == h).astype(np.int64)
                return pa.table(
                    {
                        "sid": t["sid"],
                        "src": t["src"],
                        "dst": t["dst"],
                        "osrc": t["osrc"],
                        "odst": t["odst"],
                        "bad": pc.max_element_wise(t["bad"], pa.array(hit)),
                    }
                )

            j = j.map_batches(mark_dup, batch_format="pyarrow", zero_copy_batch=True)

        j = j.materialize()
        # odd-edge-out pass-throughs bypass the commit groupby entirely
        # (they would otherwise pile into one giant sid=-1 group)
        passthru = j.map_batches(
            lambda t: pa.table({"src": t["osrc"], "dst": t["odst"]}).filter(
                pc.equal(t["sid"], pa.scalar(-1))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        swaps = j.map_batches(
            lambda t: t.filter(pc.not_equal(t["sid"], pa.scalar(-1))),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def commit_group(df: pd.DataFrame) -> pd.DataFrame:
            if df["bad"].to_numpy().max() > 0:
                return pd.DataFrame(
                    {"src": df["osrc"].astype(np.int64),
                     "dst": df["odst"].astype(np.int64)}
                ).drop_duplicates()
            return pd.DataFrame(
                {"src": df["src"].astype(np.int64),
                 "dst": df["dst"].astype(np.int64)}
            )

        cur = (
            swaps.groupby("sid", num_partitions=num_partitions)
            .map_groups(commit_group, batch_format="pandas")
            .union(passthru)
            .materialize()
        )
    return cur.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "w": pa.array(np.ones(t.num_rows, np.float64)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def global_curveball(
    edges_ds,
    rounds: int = 10,
    seed: int = 42,
    num_partitions: int = 8,
):
    """Degree-preserving randomization by GLOBAL CURVEBALL TRADES
    (reference randomization/GlobalCurveball; Carstens/Hamann et al., ESA
    2018: "Parallel and I/O-efficient Randomisation of Massive Networks
    using Global Curveball Trades").  Per round:

      1. vertices hash-pair into n/2 trades (odd vertex rests);
      2. every edge is owned by the LOWER-trade-id endpoint's trade (ties
         = same trade -> the edge is between the two traded vertices and
         is fixed; edges between rested vertices are fixed) — each edge
         belongs to exactly ONE trade, so all trades commute within a
         round (the parallel variant of the paper's trade independence);
      3. each trade (u, v) keeps the common neighbors of u and v and
         hash-redistributes the disjoint neighbors: |D_u| of the pooled
         symmetric difference stay at u, the rest go to v.

    Every round preserves the degree multiset EXACTLY and keeps the graph
    simple (a moved edge can never collide with an existing or concurrent
    edge: any (v, x) edge is, by the ownership rule, collected into the
    same trade and therefore classed common).  Deterministic given
    (seed, rounds).  Trades are processed in vectorized MULTI-trade
    blocks (trade_id hash-bucketed to ~4*num_partitions groups), never
    one pandas group per trade.  -> Dataset(src, dst, w=1)."""
    import pandas as _pd

    cur = (
        canonicalize_undirected(edges_ds, weight="one")
        .select_columns(["src", "dst"])
        .materialize()
    )
    from networkit_ray.stages.graphops import vertices_from_edges

    verts = vertices_from_edges(cur).materialize()
    n = verts.count()
    if n < 4 or cur.count() < 2:
        return cur.map_batches(
            lambda t: t.append_column(
                "w", pa.array(np.ones(t.num_rows, np.float64))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    # pairing buckets derive from n ONLY (never num_partitions) so the
    # result is partition-invariant; ~4k vertices per pairing group keeps
    # the per-group sort bounded at any scale
    PAIR_BUCKETS = max(1, (n + 4095) // 4096)
    TRADE_BUCKETS = max(1, num_partitions * 4)
    IDX = np.int64(1) << np.int64(32)

    def pair_block(df: _pd.DataFrame) -> _pd.DataFrame:
        """One hash bucket of vertices -> trade membership rows
        (vid, tid, u, v): consecutive (h, vid)-sorted vertices pair up;
        tid = bucket * 2^32 + pair index (unique, hash-placed)."""
        df = df.sort_values(["h", "vid"]).reset_index(drop=True)
        m = len(df) - (len(df) % 2)
        if m == 0:
            return _pd.DataFrame(
                {"vid": [], "tid": [], "tu": [], "tv": []}
            ).astype(np.int64)
        vid = df["vid"].to_numpy(np.int64)[:m]
        b = int(df["bucket"].iat[0])
        tid = np.repeat(
            b * IDX + np.arange(m // 2, dtype=np.int64), 2
        )
        tu = np.repeat(vid[0::2], 2)
        tv = np.repeat(vid[1::2], 2)
        return _pd.DataFrame({"vid": vid, "tid": tid, "tu": tu, "tv": tv})

    for r in range(rounds):
        salt = seed * 7_368_787 + r

        def hash_verts(t: pa.Table, _salt=salt) -> pa.Table:
            v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
            h = _hash2(v, v, _salt)
            return pa.table(
                {
                    "vid": v,
                    "h": h.view(np.int64),
                    "bucket": (h % np.uint64(PAIR_BUCKETS)).view(np.int64),
                }
            )

        trades = (
            verts.map_batches(hash_verts, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket", num_partitions=num_partitions)
            .map_groups(pair_block, batch_format="pandas")
            .materialize()
        )

        # ownership: join trade info to both endpoints; owner = smaller tid
        j1 = cur.join(
            trades, join_type="left_outer", num_partitions=num_partitions,
            on=("src",), right_on=("vid",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "tid_s": t["tid"],
                    "tu_s": t["tu"],
                    "tv_s": t["tv"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        j2 = j1.join(
            trades, join_type="left_outer", num_partitions=num_partitions,
            on=("dst",), right_on=("vid",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "tid_s": t["tid_s"],
                    "tu_s": t["tu_s"],
                    "tv_s": t["tv_s"],
                    "tid_d": t["tid"],
                    "tu_d": t["tu"],
                    "tv_d": t["tv"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

        BIG = np.int64(2**62)

        def classify(t: pa.Table, _salt=salt) -> pa.Table:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)

            def col(name):
                a = t[name].combine_chunks()
                return np.where(
                    pc.is_valid(a).to_numpy(zero_copy_only=False),
                    a.fill_null(0).to_numpy(zero_copy_only=False),
                    BIG,
                ).astype(np.int64)

            ts, tus, tvs = col("tid_s"), col("tu_s"), col("tv_s")
            td, tud, tvd = col("tid_d"), col("tu_d"), col("tv_d")
            fixed = (ts == td) | ((ts == BIG) & (td == BIG))
            own_s = (~fixed) & (ts < td)
            tid = np.where(own_s, ts, td)
            tu = np.where(own_s, tus, tud)
            tv = np.where(own_s, tvs, tvd)
            active_is_src = own_s
            active = np.where(active_is_src, s, d)
            passive = np.where(active_is_src, d, s)
            side = np.where(active == tu, 0, 1).astype(np.int64)
            ph = _hash2(passive, tid, _salt ^ 0x27D4EB2F).view(np.int64)
            coll = pa.table(
                {
                    "tkey": tid % TRADE_BUCKETS,
                    "tid": tid,
                    "tu": tu,
                    "tv": tv,
                    "side": side,
                    "passive": passive,
                    "ph": ph,
                }
            ).filter(pa.array(~fixed))
            fix = pa.table(
                {
                    "tkey": np.full(int(fixed.sum()), -1, np.int64),
                    "tid": np.full(int(fixed.sum()), -1, np.int64),
                    "tu": s[fixed],
                    "tv": d[fixed],
                    "side": np.full(int(fixed.sum()), -1, np.int64),
                    "passive": np.full(int(fixed.sum()), -1, np.int64),
                    "ph": np.zeros(int(fixed.sum()), np.int64),
                }
            )
            return pa.concat_tables([coll, fix])

        rows = j2.map_batches(
            classify, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

        fixed_edges = rows.map_batches(
            lambda t: pa.table({"src": t["tu"], "dst": t["tv"]}).filter(
                pc.equal(t["side"], pa.scalar(-1)).combine_chunks()
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        collected = rows.map_batches(
            lambda t: t.filter(
                pc.not_equal(t["side"], pa.scalar(-1)).combine_chunks()
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def trade_block(df: _pd.DataFrame) -> _pd.DataFrame:
            """Vectorized over ALL trades of the block: common neighbors
            stay put; disjoint neighbors pool per trade and the first
            |D_u| (by passive-hash order) stay at u, the rest go to v."""
            tid = df["tid"].to_numpy(np.int64)
            side = df["side"].to_numpy(np.int64)
            tu = df["tu"].to_numpy(np.int64)
            tv = df["tv"].to_numpy(np.int64)
            passive = df["passive"].to_numpy(np.int64)
            ph = df["ph"].to_numpy(np.int64)
            # common = same (tid, passive) appearing on both sides
            o = np.lexsort((side, passive, tid))
            tid_o, pas_o = tid[o], passive[o]
            same_next = np.r_[
                (tid_o[1:] == tid_o[:-1]) & (pas_o[1:] == pas_o[:-1]), False
            ]
            common = same_next | np.r_[False, same_next[:-1]]
            inv = np.empty_like(o)
            inv[o] = np.arange(len(o))
            common = common[inv]
            src_c = np.where(side[common] == 0, tu[common], tv[common])
            out_common = {"src": src_c, "dst": passive[common]}
            # disjoint pool: per tid, hash-order; first du rows stay at u
            dmask = ~common
            dt, ds_, dp, dh = tid[dmask], side[dmask], passive[dmask], ph[dmask]
            du_t, dv_t = tu[dmask], tv[dmask]
            if len(dt) == 0:
                new_active = dp  # both empty: block had only common edges
            else:
                o2 = np.lexsort((dp, dh, dt))
                dt, ds_, dp = dt[o2], ds_[o2], dp[o2]
                du_t, dv_t = du_t[o2], dv_t[o2]
                newg = np.r_[True, dt[1:] != dt[:-1]]
                gstart = np.flatnonzero(newg)
                gid = np.cumsum(newg) - 1
                rank = np.arange(len(dt)) - gstart[gid]
                du_count = np.bincount(gid, weights=(ds_ == 0)).astype(np.int64)
                keep_u = rank < du_count[gid]
                new_active = np.where(keep_u, du_t, dv_t)
            return _pd.DataFrame(
                {
                    "src": np.concatenate([out_common["src"], new_active]),
                    "dst": np.concatenate([out_common["dst"], dp]),
                }
            )

        traded = collected.groupby("tkey", num_partitions=num_partitions).map_groups(
            trade_block, batch_format="pandas"
        )
        cur = (
            traded.union(fixed_edges)
            .map_batches(
                lambda t: pa.table(
                    {
                        "src": pc.min_element_wise(t["src"], t["dst"]),
                        "dst": pc.max_element_wise(t["src"], t["dst"]),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
    return cur.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "w": pa.array(np.ones(t.num_rows, np.float64)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def degree_preserving_permutation(
    edges_ds,
    seed: int = 42,
    num_partitions: int = 8,
    target_class: int = 65536,
):
    """-> Dataset(old, new): a deterministic bijection on the graph's
    vertices that maps every vertex to a vertex of the SAME degree — the
    reference's randomization/DegreePreservingShuffle (it shuffles node
    identities, leaving the degree sequence bit-identical).

    Scale shape: degree classes are salted into hash sub-buckets of
    expected size <= target_class before the permute (permuting within any
    subset of an equal-degree class is still degree-preserving), so no
    map_groups group ever approaches the size of the deg-1 class of a
    power-law graph; inside a group the permute is one lexsort."""
    from networkit_ray.stages.graphops import out_degrees, symmetrize

    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    deg = (
        out_degrees(symmetrize(canon), weighted=False)
        .select_columns(["vid", "out_deg"])
        .materialize()
    )
    n = deg.count()
    n_buckets = max(1, n // max(target_class, 1))

    def cls(t: pa.Table) -> pa.Table:
        vid = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
        h = _hash2(vid, vid, seed)
        return pa.table(
            {
                "vid": vid,
                "deg": t["out_deg"],
                "bucket": (h % np.uint64(n_buckets)).view(np.int64),
            }
        )

    def perm(df: pd.DataFrame) -> pd.DataFrame:
        vids = df["vid"].to_numpy(np.int64)
        a = np.sort(vids)
        h = _hash2(vids, vids, seed ^ 0x5851F42D)
        b = vids[np.lexsort((vids, h))]
        return pd.DataFrame({"old": a, "new": b})

    return (
        deg.map_batches(cls, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["deg", "bucket"], num_partitions=num_partitions)
        .map_groups(perm, batch_format="pandas")
    )


def degree_preserving_shuffle(
    edges_ds,
    seed: int = 42,
    num_partitions: int = 8,
    target_class: int = 65536,
):
    """edges(src,dst[,w]) -> Dataset(src, dst, w=1): the graph with node
    identities shuffled within equal-degree classes (an isomorphic image
    whose per-vertex degree table is IDENTICAL to the input's — the
    property the driver oracle value-checks).  Two relabel joins."""
    canon = (
        canonicalize_undirected(edges_ds, weight="one")
        .select_columns(["src", "dst"])
        .materialize()
    )
    mapping = degree_preserving_permutation(
        edges_ds, seed=seed, num_partitions=num_partitions, target_class=target_class
    ).materialize()
    j1 = canon.join(
        mapping,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("old",),
    ).map_batches(
        lambda t: pa.table({"s2": t["new"], "dst": t["dst"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        j1.join(
            mapping,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("old",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "src": pc.min_element_wise(t["s2"], t["new"]),
                    "dst": pc.max_element_wise(t["s2"], t["new"]),
                    "w": pa.array(np.ones(t.num_rows, np.float64)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
