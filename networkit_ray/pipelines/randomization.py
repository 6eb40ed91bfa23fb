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
