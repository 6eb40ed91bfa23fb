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
