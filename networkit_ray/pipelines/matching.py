"""Graph matching — distributed local-max (reference matching/
{Matcher, LocalMaxMatcher, SuitorMatcher}; Preis / Hoepman local-dominant
edge matching, the standard parallel 1/2-approximation for maximum weight
matching).

Round shape (mirrors spanning.py's Boruvka pick):

  1. every vertex nominates its best incident edge by (w desc, then
     (lo, hi) asc) — pre-combined per batch, finished by a vertex-keyed
     groupby over <= num_blocks partials;
  2. an edge joins the matching iff BOTH endpoints nominated it
     (locally dominant edge — no neighbor edge beats it at either end);
  3. all edges touching newly matched vertices drop (two hash semi-joins);
     repeat.  Every round removes at least the locally-dominant edge set,
     which is non-empty on any non-empty graph -> termination; O(log m)
     rounds w.h.p. on random weight orders.

Deterministic: the (w, lo, hi) priority is a total order, so the matching
is a unique edge set regardless of partitioning.  Nothing vertex- or
edge-sized reaches the driver."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from networkit_ray.stages.graphops import canonicalize_undirected


def _best_local(t: pa.Table) -> pa.Table:
    """Per vertex in this batch keep its best (w desc, lo, hi asc) edge."""
    if t.num_rows == 0:
        return t
    v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
    w = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
    lo = t["lo"].combine_chunks().to_numpy(zero_copy_only=False)
    hi = t["hi"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((hi, lo, -w, v))
    sv = v[order]
    first = np.zeros(len(order), dtype=bool)
    first[0] = True
    first[1:] = sv[1:] != sv[:-1]
    return t.take(pa.array(order[first]))


def _best_group(df: pd.DataFrame) -> pd.DataFrame:
    i = df.sort_values(["w", "lo", "hi"], ascending=[False, True, True]).index[0]
    return df.loc[[i]]


def local_max_matching(
    edges_ds,
    num_partitions: int = 8,
    max_rounds: int = 64,
    broadcast_limit: int = 4_000_000,
):
    """edges(src,dst,w) -> Dataset(src, dst, w): a maximal matching whose
    weight is >= 1/2 of the maximum weight matching (locally-dominant
    greedy).  Parallel edges collapse to max weight first."""
    import ray.data

    canon = canonicalize_undirected(edges_ds, weight="max")
    cur = canon.materialize()
    matched_parts = []
    for _ in range(max_rounds):
        if cur.count() == 0:
            break

        def nominate(t: pa.Table) -> pa.Table:
            base = {"lo": t["src"], "hi": t["dst"], "w": t["w"]}
            a = pa.table({"vid": t["src"], **base})
            b = pa.table({"vid": t["dst"], **base})
            return pa.concat_tables([a, b])

        best = (
            cur.map_batches(nominate, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(_best_local, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("vid", num_partitions=num_partitions)
            .map_groups(_best_group, batch_format="pandas")
        )
        # locally dominant <=> nominated by both endpoints; w rides the
        # aggregate (identical in both nomination rows), so no join back
        from ray.data.aggregate import Count, Min

        mrows = (
            best.groupby(["lo", "hi"], num_partitions=num_partitions)
            .aggregate(Count(alias_name="nvotes"), Min("w", alias_name="w"))
            .map_batches(
                lambda t: pa.table(
                    {"lo": t["lo"], "hi": t["hi"], "w": t["w"]}
                ).filter(pc.equal(t["nvotes"], pa.scalar(2))),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
        n_matched = mrows.count()
        if n_matched == 0:
            break
        matched_parts.append(mrows)
        # drop every edge incident to a matched vertex.  The per-round
        # matched set is usually far smaller than the edge set: broadcast
        # it (ray.put once, searchsorted per batch) below the limit, and
        # fall back to hash semi-joins for huge rounds.
        if 2 * n_matched <= broadcast_limit:
            import ray as _ray

            mdf = mrows.to_pandas()
            mv_arr = np.sort(
                np.concatenate(
                    [mdf["lo"].to_numpy(np.int64), mdf["hi"].to_numpy(np.int64)]
                )
            )
            ref = _ray.put(mv_arr)

            def drop(t: pa.Table, _ref=ref) -> pa.Table:
                mv = _ray.get(_ref)
                s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
                d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
                ps = np.searchsorted(mv, s)
                pd_ = np.searchsorted(mv, d)
                hit_s = (ps < len(mv)) & (mv[np.minimum(ps, len(mv) - 1)] == s)
                hit_d = (pd_ < len(mv)) & (mv[np.minimum(pd_, len(mv) - 1)] == d)
                return t.filter(pa.array(~(hit_s | hit_d)))

            cur = cur.map_batches(
                drop, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
        else:
            mv = mrows.map_batches(
                lambda t: pa.table(
                    {
                        "mv": pa.concat_arrays(
                            [t["lo"].combine_chunks(), t["hi"].combine_chunks()]
                        ),
                        "hit": pa.array(np.ones(2 * t.num_rows, np.int8)),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()
            j = cur.join(
                mv, join_type="left_outer", num_partitions=num_partitions,
                on=("src",), right_on=("mv",),
            )
            j = j.map_batches(
                lambda t: pa.table(
                    {"src": t["src"], "dst": t["dst"], "w": t["w"]}
                ).filter(pc.is_null(t["hit"])),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            j = j.join(
                mv, join_type="left_outer", num_partitions=num_partitions,
                on=("dst",), right_on=("mv",),
            )
            cur = j.map_batches(
                lambda t: pa.table(
                    {"src": t["src"], "dst": t["dst"], "w": t["w"]}
                ).filter(pc.is_null(t["hit"])),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()

    if not matched_parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "w": pa.array([], pa.float64()),
                }
            )
        )
    out = matched_parts[0]
    for p in matched_parts[1:]:
        out = out.union(p)
    return out.map_batches(
        lambda t: pa.table({"src": t["lo"], "dst": t["hi"], "w": t["w"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def b_matching(
    edges_ds,
    b: int = 2,
    num_partitions: int = 8,
    max_rounds: int = 64,
    broadcast_limit: int = 4_000_000,
):
    """b-matching — every vertex matched to at most ``b`` edges
    (reference matching/BMatcher; Khan et al. b-Suitor, the parallel
    locally-dominant generalization of Preis/Hoepman).  Synchronous
    nomination rounds on the local_max_matching skeleton:

      1. every UNSATURATED vertex nominates its top-(b - matched(v))
         remaining incident edges by the (w desc, lo asc, hi asc) total
         order (pre-combined per batch: at most b rows per vertex leave
         a batch);
      2. an edge joins the b-matching iff BOTH endpoints nominated it
         (the heaviest remaining edge is always bilaterally nominated
         -> every round matches a non-empty locally-dominant set ->
         termination);
      3. matched edges leave the pool, saturated vertices drop all their
         remaining edges; repeat.

    The greedy is the standard 1/2-approximation for maximum-weight
    b-matching; with b=1 it degenerates to local_max_matching exactly
    (a pytest pins both).  Per-vertex matched counts are held sparsely
    (only matched vertices) and broadcast per round below
    ``broadcast_limit``, mirroring the local_max drop path.
    -> Dataset(src, dst, w)."""
    import ray as _ray
    import ray.data

    canon = canonicalize_undirected(edges_ds, weight="max")
    cur = canon.materialize()
    used: dict[int, int] = {}  # matched-count per vertex (sparse)
    matched_parts = []
    for _ in range(max_rounds):
        if cur.count() == 0:
            break
        uv = np.array(sorted(used), dtype=np.int64)
        uc = np.array([used[int(x)] for x in uv], dtype=np.int64)
        uref = _ray.put((uv, uc))

        def nominate_topb(t: pa.Table, _uref=uref) -> pa.Table:
            """Both-endpoint nomination rows, pre-combined to the top-b
            rows per vertex in this batch (a per-vertex superset of the
            global top-remaining-capacity set)."""
            base = {"lo": t["src"], "hi": t["dst"], "w": t["w"]}
            rows = pa.concat_tables(
                [
                    pa.table({"vid": t["src"], **base}),
                    pa.table({"vid": t["dst"], **base}),
                ]
            )
            if rows.num_rows == 0:
                return rows
            v = rows["vid"].combine_chunks().to_numpy(zero_copy_only=False)
            w = rows["w"].combine_chunks().to_numpy(zero_copy_only=False)
            lo = rows["lo"].combine_chunks().to_numpy(zero_copy_only=False)
            hi = rows["hi"].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.lexsort((hi, lo, -w, v))
            sv = v[order]
            newv = np.r_[True, sv[1:] != sv[:-1]]
            # rank within vertex run = position - start of run
            starts = np.maximum.accumulate(np.where(newv, np.arange(len(sv)), 0))
            rank = np.arange(len(sv)) - starts
            return rows.take(pa.array(order[rank < b]))

        def topcap_group(df: pd.DataFrame, _uref=uref) -> pd.DataFrame:
            uvv, ucc = _ray.get(_uref)
            vid = int(df["vid"].iloc[0])
            i = np.searchsorted(uvv, vid)
            got = int(ucc[i]) if i < len(uvv) and uvv[i] == vid else 0
            cap = b - got
            if cap <= 0:
                return df.head(0)
            return df.sort_values(
                ["w", "lo", "hi"], ascending=[False, True, True]
            ).head(cap)

        best = (
            cur.map_batches(
                nominate_topb, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("vid", num_partitions=num_partitions)
            .map_groups(topcap_group, batch_format="pandas")
        )
        from ray.data.aggregate import Count, Min

        mrows = (
            best.groupby(["lo", "hi"], num_partitions=num_partitions)
            .aggregate(Count(alias_name="nvotes"), Min("w", alias_name="w"))
            .map_batches(
                lambda t: pa.table(
                    {"lo": t["lo"], "hi": t["hi"], "w": t["w"]}
                ).filter(pc.equal(t["nvotes"], pa.scalar(2))),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
        n_matched = mrows.count()
        if n_matched == 0:
            break
        matched_parts.append(mrows)
        mdf = mrows.to_pandas()
        for a_, b_ in zip(mdf["lo"].astype(int), mdf["hi"].astype(int)):
            used[a_] = used.get(a_, 0) + 1
            used[b_] = used.get(b_, 0) + 1
        sat = np.array(
            sorted(v for v, c in used.items() if c >= b), dtype=np.int64
        )
        mkeys = np.sort(
            mdf["lo"].to_numpy(np.int64) * (np.int64(1) << np.int64(32))
            + mdf["hi"].to_numpy(np.int64)
        )
        if 2 * n_matched + len(sat) <= broadcast_limit:
            dref = _ray.put((sat, mkeys))

            def drop(t: pa.Table, _dref=dref) -> pa.Table:
                sv, mk = _ray.get(_dref)
                s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
                d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
                kill = np.zeros(len(s), dtype=bool)
                if len(sv):
                    i1 = np.minimum(np.searchsorted(sv, s), len(sv) - 1)
                    i2 = np.minimum(np.searchsorted(sv, d), len(sv) - 1)
                    kill |= (sv[i1] == s) | (sv[i2] == d)
                if len(mk):
                    key = s * (np.int64(1) << np.int64(32)) + d
                    i3 = np.minimum(np.searchsorted(mk, key), len(mk) - 1)
                    kill |= mk[i3] == key
                return t.filter(pa.array(~kill))

            cur = cur.map_batches(
                drop, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
        else:
            # hash fallback for huge rounds: anti-join matched pairs, then
            # anti-join each endpoint against the saturated vertex set
            flag = mrows.map_batches(
                lambda t: pa.table(
                    {"src": t["lo"], "dst": t["hi"],
                     "hit": pa.array(np.ones(t.num_rows, np.int8))}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()
            j = cur.join(
                flag, join_type="left_outer", num_partitions=num_partitions,
                on=("src", "dst"),
            ).map_batches(
                lambda t: pa.table(
                    {"src": t["src"], "dst": t["dst"], "w": t["w"]}
                ).filter(pc.is_null(t["hit"])),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            satds = ray.data.from_arrow(
                pa.table(
                    {"mv": sat, "hit": np.ones(len(sat), np.int8)}
                )
            ).materialize()
            for col in ("src", "dst"):
                j = j.join(
                    satds, join_type="left_outer",
                    num_partitions=num_partitions,
                    on=(col,), right_on=("mv",),
                ).map_batches(
                    lambda t: pa.table(
                        {"src": t["src"], "dst": t["dst"], "w": t["w"]}
                    ).filter(pc.is_null(t["hit"])),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            cur = j.materialize()

    if not matched_parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "w": pa.array([], pa.float64()),
                }
            )
        )
    out = matched_parts[0]
    for p in matched_parts[1:]:
        out = out.union(p)
    return out.map_batches(
        lambda t: pa.table({"src": t["lo"], "dst": t["hi"], "w": t["w"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def path_growing_matching(
    edges_ds,
    variant: str = "dp",
    edge_limit: int = 5_000_000,
):
    """PathGrowingMatcher (reference matching/PathGrowingMatcher; Drake &
    Hougardy 2003, "A simple approximation algorithm for the weighted
    matching problem") — documented DRIVER-SIDE compat path, like
    HavelHakimi/CliqueDetect: the algorithm is a single sequential chain
    (grow a path from x by the heaviest surviving incident edge, delete x,
    hop to the other endpoint), so it has no faithful dataflow expression;
    ``local_max_matching`` / ``b_matching`` are this engine's distributed
    1/2-approx scale path.  Raises past ``edge_limit`` canonical edges.

    ``variant="alternate"`` is the published base algorithm: edges
    alternate into M1/M2 as they are chosen and the heavier set wins —
    max(w(M1), w(M2)) >= (w(M1)+w(M2))/2 >= w(M*)/2.  ``variant="dp"``
    (default) instead solves each grown path exactly by dynamic
    programming; paths are vertex-disjoint, so the union is a matching,
    and per path the DP optimum >= either alternating subset, so the 1/2
    guarantee is preserved and the weight dominates the base variant.

    Deterministic: start vertices in ascending vid order, heaviest-edge
    ties broken by lowest neighbor vid — input partitioning never matters
    (the canonical edge table is collected before the chase).

    edges(src,dst,w) -> pa.Table(src, dst, w), src < dst canonical.
    """
    if variant not in ("dp", "alternate"):
        raise ValueError(f"unknown variant {variant!r}")
    canon = canonicalize_undirected(edges_ds, weight="max").to_pandas()
    m = len(canon)
    if m > edge_limit:
        raise ValueError(
            f"path_growing_matching is a driver-side compat algorithm "
            f"({m} canonical edges > edge_limit={edge_limit}); use "
            f"local_max_matching / b_matching at scale"
        )
    empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "w": pa.array([], pa.float64()),
        }
    )
    if m == 0:
        return empty
    lo = canon["src"].to_numpy().astype(np.int64)
    hi = canon["dst"].to_numpy().astype(np.int64)
    w = canon["w"].to_numpy().astype(np.float64)
    vids, inv = np.unique(np.concatenate([lo, hi]), return_inverse=True)
    n = len(vids)
    u, v = inv[:m], inv[m:]
    # symmetric CSR; each vertex's neighbors sorted by (w desc, nbr vid asc)
    s = np.concatenate([u, v])
    d = np.concatenate([v, u])
    ww = np.concatenate([w, w])
    order = np.lexsort((vids[d], -ww, s))
    s, d, ww = s[order], d[order], ww[order]
    indptr = np.searchsorted(s, np.arange(n + 1))
    alive = np.ones(n, dtype=bool)
    ptr = indptr[:-1].copy()
    m1: list = []
    m2: list = []
    out: list = []
    side = 0
    for start in range(n):
        if not alive[start]:
            continue
        x = int(start)
        path: list = []
        while True:
            p = ptr[x]
            end = indptr[x + 1]
            while p < end and not alive[d[p]]:
                p += 1
            ptr[x] = p
            if p == end:
                break
            y = int(d[p])
            e = (x, y, float(ww[p]))
            path.append(e)
            (m1 if side == 0 else m2).append(e)
            side = 1 - side
            alive[x] = False
            x = y
        if not path:
            continue
        if variant == "dp":
            # exact max-weight matching on this path's edge chain by DP
            k = len(path)
            dp = np.zeros(k)
            choice = np.zeros(k, dtype=bool)
            for i in range(k):
                take = path[i][2] + (dp[i - 2] if i >= 2 else 0.0)
                skip = dp[i - 1] if i >= 1 else 0.0
                dp[i] = take if take >= skip else skip
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
    if not out:
        return empty
    a = np.array([e[0] for e in out], dtype=np.int64)
    b = np.array([e[1] for e in out], dtype=np.int64)
    ew = np.array([e[2] for e in out], dtype=np.float64)
    ga, gb = vids[a], vids[b]
    return pa.table(
        {
            "src": np.minimum(ga, gb),
            "dst": np.maximum(ga, gb),
            "w": ew,
        }
    )
