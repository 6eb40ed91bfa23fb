"""Connected components — both north-rule strategies (SURVEY.md §2.1.2).

Pinned spec: undirected graph; output label = minimum vid in the component
(canonical, order-independent), making "exact component equality" vs the
reference (networkit.components.ConnectedComponents, BASELINE.json:6 —
operationalized by canonicalized networkx.connected_components, SURVEY.md §0)
well defined.

- ``mode="hashmin"``: O(diameter) rounds; each round is one pre-combined
  groupby(vid).min(label) shuffle of neighbor labels.  Fully streaming —
  nothing ever leaves the cluster but two scalars per round.
- ``mode="unionfind"``: the filtering/contraction CC — every edge block runs
  a local in-memory union-find and emits only its spanning-forest
  equivalence pairs (≤ distinct vids in the block); rounds of local
  contraction shrink the pair set geometrically; the final (small)
  contracted equivalence set is solved by one union-find reducer.  1.5
  shuffles typical vs O(diameter).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Min

from networkit_ray.stages.graphops import (
    canonicalize_undirected,
    symmetrize,
    vertices_from_edges,
)
from networkit_ray.state.unionfind import UnionFind


def connected_components(
    edges_ds,
    vertices_ds=None,
    mode: str = "unionfind",
    num_partitions: int = 8,
    max_iter: int = 200,
    driver_pair_limit: int = 2_000_000,
    engine: str = "dataset",
):
    """edges(src,dst,w) [+ vertices(vid)] -> (Dataset(vid, label), rounds).

    ``engine="actor"`` runs hash-min on the BSP CSR actor pool
    (state/csr.py); ``mode`` selects the Dataset-engine strategy.
    """
    canon = canonicalize_undirected(edges_ds, weight="one", dedupe=False)
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    vertices_ds = vertices_ds.select_columns(["vid"])
    if engine == "actor":
        from networkit_ray.state.csr import BSPGraph

        g = BSPGraph(symmetrize(canon), vertices_ds, num_partitions)
        try:
            return g.cc_hashmin(max_iter=max_iter)
        finally:
            g.shutdown()
    if mode == "hashmin":
        return _cc_hashmin(canon, vertices_ds, num_partitions, max_iter)
    return _cc_unionfind(canon, vertices_ds, num_partitions, driver_pair_limit)


def _cc_hashmin(canon, vertices_ds, num_partitions, max_iter):
    sym = symmetrize(canon).select_columns(["src", "dst"]).materialize()

    labels = vertices_ds.map_batches(
        lambda t: pa.table({"vid": t["vid"], "label": t["vid"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    if sym.count() == 0:
        return labels, 1

    def _msg(t: pa.Table) -> pa.Table:
        out = pa.table({"vid": t["dst"], "m": t["label"]})
        return out.group_by("vid").aggregate([("m", "min")]).rename_columns(
            ["vid", "m"]
        )

    rounds = 0
    for rounds in range(1, max_iter + 1):
        msgs = (
            sym.join(
                labels,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("vid",),
            )
            .map_batches(_msg, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Min("m", alias_name="m"))
        )
        joined = labels.join(
            msgs, join_type="left_outer", num_partitions=num_partitions, on=("vid",)
        )
        new_labels = joined.map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "label": pc.min_element_wise(
                        t["label"], pc.fill_null(t["m"], np.iinfo(np.int64).max)
                    ),
                    "chg": pc.cast(
                        pc.less(
                            pc.min_element_wise(
                                t["label"],
                                pc.fill_null(t["m"], np.iinfo(np.int64).max),
                            ),
                            t["label"],
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        changed = new_labels.sum("chg") or 0
        labels = new_labels.select_columns(["vid", "label"]).materialize()
        if changed == 0:
            break
    return labels, rounds


def _local_forest(t: pa.Table) -> pa.Table:
    """One edge block -> (vid, local-min-root) equivalence pairs.

    Fully vectorized local contraction: compact vids with np.unique, then
    hash-min rounds with pointer jumping (new = min(new, new[new])) until
    stable — O(log n) numpy passes, no per-edge Python (the round-1
    union-find loop crossed the interpreter once per edge)."""
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    if len(src) == 0:
        return pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    vids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[: len(src)], inv[len(src) :]
    lab = np.arange(len(vids), dtype=np.int64)
    while True:
        # hook: roots of both endpoints point to the min of the two roots
        lu, lv = lab[si], lab[di]
        m = np.minimum(lu, lv)
        new = lab.copy()
        np.minimum.at(new, lu, m)
        np.minimum.at(new, lv, m)
        # full shortcut (path compression): O(log n) O(n)-passes
        while True:
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, lab):
            break
        lab = new
    roots = vids[lab]  # min index == min vid (vids sorted)
    keep = vids != roots  # self pairs carry no information
    return pa.table({"src": vids[keep], "dst": roots[keep]})


def _cc_unionfind(canon, vertices_ds, num_partitions, driver_pair_limit):
    pairs = canon.select_columns(["src", "dst"]).map_batches(
        _local_forest, batch_format="pyarrow", zero_copy_batch=True
    )
    rounds = 1
    count = pairs.count()
    # contraction rounds: co-locate pairs, re-run local UF.  Stop when the
    # pair set stops shrinking — a fully contracted forest has ~(n - #comp)
    # pairs and cannot shrink further; driver_pair_limit is the threshold
    # for triggering extra rounds, not a hard cap (the contracted set is
    # the per-vertex root map and must reach the reducer regardless).
    while count > driver_pair_limit and rounds < 6:
        new_pairs = pairs.repartition(num_partitions, shuffle=True).map_batches(
            _local_forest, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        rounds += 1
        new_count = new_pairs.count()
        if new_count >= count:
            break
        pairs, count = new_pairs, new_count

    # final reducer: one union-find over the contracted equivalence set
    uf = UnionFind()
    for batch in pairs.iter_batches(batch_format="pyarrow", batch_size=None):
        uf.union_arrays(
            batch["src"].to_numpy(zero_copy_only=False),
            batch["dst"].to_numpy(zero_copy_only=False),
        )
    vids, roots = uf.roots()
    import ray.data

    root_tbl = pa.table({"vid": vids, "label": roots})
    root_ds = ray.data.from_arrow(root_tbl)

    # vertices not touched by any edge are their own component
    labels = (
        vertices_ds.join(
            root_ds, join_type="left_outer", num_partitions=num_partitions, on=("vid",)
        )
        .map_batches(
            lambda t: pa.table(
                {"vid": t["vid"], "label": pc.coalesce(t["label"], t["vid"])}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return labels, rounds
