"""Spanning forests — distributed Boruvka.

Reference counterparts: graph/SpanningForest (arbitrary spanning forest),
graph/RandomMaximumSpanningForest (max-weight forest under random edge
weights; SURVEY.md §2.3).  The reference computes both with sequential
DFS/Kruskal passes; the Ray-Data-first shape is Boruvka, whose rounds are
exactly this engine's primitives:

  per round (components at least HALVE -> O(log V) rounds):
    1. every component picks its minimum-priority incident cross edge
       (priority = (w, osrc, odst) — a total order, so the picked edge set
       is acyclic by the classic distinct-weights argument);
       pre-combined per batch, finished by a groupby(label).map_groups
       over <= num_blocks-sized partial groups;
    2. picked (component_a, component_b) pairs — at most one per
       component, NEVER corpus-sized — contract via the distributed
       large-star/small-star resolver (equivalence.py);
    3. edge endpoints relabel through two co-partitioned left joins; edges
       inside one component drop; surviving edges locally re-combine to
       one minimum-priority candidate per (component pair, batch).

Nothing vertex- or edge-sized reaches the driver; per-round shuffles move
the (shrinking) candidate edge set and a component-count-sized pair set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from networkit_ray.stages.graphops import canonicalize_undirected


def _pick_min_local(t: pa.Table) -> pa.Table:
    """Per (label) in this batch, keep the minimum (w, osrc, odst) row."""
    if t.num_rows == 0:
        return t
    lab = t["label"].combine_chunks().to_numpy(zero_copy_only=False)
    w = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
    osrc = t["osrc"].combine_chunks().to_numpy(zero_copy_only=False)
    odst = t["odst"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((odst, osrc, w, lab))
    first = np.zeros(len(order), dtype=bool)
    sl = lab[order]
    first[0] = True
    first[1:] = sl[1:] != sl[:-1]
    keep = order[first]
    return t.take(pa.array(keep))


def _pick_min_group(df: pd.DataFrame) -> pd.DataFrame:
    i = df.sort_values(["w", "osrc", "odst"]).index[0]
    return df.loc[[i]]


def _combine_pairs_local(t: pa.Table) -> pa.Table:
    """Per (csrc, cdst) component pair in this batch, keep the minimum
    (w, osrc, odst) candidate; orients pairs lo<hi and drops loops."""
    if t.num_rows == 0:
        return t
    a = t["csrc"].combine_chunks().to_numpy(zero_copy_only=False)
    b = t["cdst"].combine_chunks().to_numpy(zero_copy_only=False)
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    w = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
    osrc = t["osrc"].combine_chunks().to_numpy(zero_copy_only=False)
    odst = t["odst"].combine_chunks().to_numpy(zero_copy_only=False)
    keep = lo != hi
    lo, hi, w, osrc, odst = lo[keep], hi[keep], w[keep], osrc[keep], odst[keep]
    if len(lo) == 0:
        return pa.table(
            {
                "csrc": pa.array([], pa.int64()),
                "cdst": pa.array([], pa.int64()),
                "w": pa.array([], pa.float64()),
                "osrc": pa.array([], pa.int64()),
                "odst": pa.array([], pa.int64()),
            }
        )
    order = np.lexsort((odst, osrc, w, hi, lo))
    slo, shi = lo[order], hi[order]
    first = np.zeros(len(order), dtype=bool)
    first[0] = True
    first[1:] = (slo[1:] != slo[:-1]) | (shi[1:] != shi[:-1])
    k = order[first]
    return pa.table(
        {"csrc": lo[k], "cdst": hi[k], "w": w[k], "osrc": osrc[k], "odst": odst[k]}
    )


def _relabel(cur, roots_ds, col, num_partitions):
    """cur[col] := root(cur[col]) (identity where unmapped)."""
    out = cur.join(
        roots_ds,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(col,),
        right_on=("vid",),
    )

    def fix(t: pa.Table) -> pa.Table:
        cols = {}
        for n in ("csrc", "cdst", "w", "osrc", "odst"):
            cols[n] = t[n] if n != col else pc.coalesce(t["rlabel"], t[col])
        return pa.table(cols)

    return out.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)


def spanning_forest(
    edges_ds,
    num_partitions: int = 8,
    mode: str = "min",
    max_rounds: int = 48,
    driver_pair_limit: int = 2_000_000,
):
    """edges(src,dst,w) -> Dataset(src, dst, w) of forest edges (original
    endpoints; one row per tree edge, src<dst canonical).

    ``mode="min"`` -> minimum spanning forest; ``mode="max"`` -> maximum
    (priority on -w).  Parallel edges collapse to the best weight first.
    Deterministic: ties break on (osrc, odst), so the output is a unique
    edge SET regardless of partitioning.
    """
    import ray.data

    from networkit_ray.pipelines.equivalence import resolve_equivalence_pairs

    canon = canonicalize_undirected(
        edges_ds, weight="min" if mode == "min" else "max"
    )

    def init(t: pa.Table) -> pa.Table:
        w = t["w"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        if mode == "max":
            w = -w
        return pa.table(
            {
                "csrc": t["src"],
                "cdst": t["dst"],
                "w": pa.array(w),
                "osrc": t["src"],
                "odst": t["dst"],
            }
        )

    cur = (
        canon.map_batches(init, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            _combine_pairs_local, batch_format="pyarrow", zero_copy_batch=True
        )
        .materialize()
    )
    forest_parts = []
    for _ in range(max_rounds):
        if cur.count() == 0:
            break
        # 1. per-component minimum-priority incident edge
        def emit(t: pa.Table) -> pa.Table:
            base = {
                "w": t["w"],
                "osrc": t["osrc"],
                "odst": t["odst"],
                "csrc": t["csrc"],
                "cdst": t["cdst"],
            }
            a = pa.table({"label": t["csrc"], **base})
            b = pa.table({"label": t["cdst"], **base})
            return pa.concat_tables([a, b])

        picked = (
            cur.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(_pick_min_local, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("label", num_partitions=num_partitions)
            .map_groups(_pick_min_group, batch_format="pandas")
            .materialize()
        )
        # dedupe edges picked by both endpoints' components
        uniq = (
            picked.select_columns(["osrc", "odst", "w", "csrc", "cdst"])
            .groupby(["osrc", "odst"], num_partitions=num_partitions)
            .map_groups(lambda df: df.iloc[:1], batch_format="pandas")
            .materialize()
        )
        forest_parts.append(uniq.select_columns(["osrc", "odst", "w"]))
        # 2. contract the picked component pairs (component-count-sized)
        pairs = uniq.map_batches(
            lambda t: pa.table({"src": t["csrc"], "dst": t["cdst"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        roots = resolve_equivalence_pairs(
            pairs, num_partitions=num_partitions, driver_pair_limit=driver_pair_limit
        )
        roots = roots.map_batches(
            lambda t: pa.table({"vid": t["vid"], "rlabel": t["label"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        if roots.count() == 0:
            break
        # 3. relabel endpoints, drop intra-component edges, re-combine
        cur = _relabel(cur, roots, "csrc", num_partitions)
        cur = _relabel(cur, roots, "cdst", num_partitions)
        cur = cur.map_batches(
            _combine_pairs_local, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    def finish(t: pa.Table) -> pa.Table:
        w = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
        if mode == "max":
            w = -w
        return pa.table({"src": t["osrc"], "dst": t["odst"], "w": pa.array(w)})

    if not forest_parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "w": pa.array([], pa.float64()),
                }
            )
        )
    out = forest_parts[0]
    for p in forest_parts[1:]:
        out = out.union(p)
    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def random_maximum_spanning_forest(edges_ds, seed: int = 1, num_partitions: int = 8):
    """Reference graph/RandomMaximumSpanningForest: maximum spanning forest
    under deterministic pseudo-random edge weights (counter-based hash of
    the canonical endpoint pair + seed — partition-invariant)."""
    def rw(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t["src"], t["dst"])
        hi = pc.max_element_wise(t["src"], t["dst"])
        a = lo.combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        b = hi.combine_chunks().to_numpy(zero_copy_only=False).astype(np.uint64)
        key = a * np.uint64(0x9E3779B97F4A7C15) + b * np.uint64(2654435761) + np.uint64(
            seed
        )
        h = pd.util.hash_array(key.view(np.int64)).astype(np.uint64)
        w = (h >> np.uint64(11)) * 2.0**-53
        return pa.table({"src": lo, "dst": hi, "w": pa.array(w)})

    weighted = edges_ds.map_batches(rw, batch_format="pyarrow", zero_copy_batch=True)
    return spanning_forest(weighted, num_partitions=num_partitions, mode="max")
