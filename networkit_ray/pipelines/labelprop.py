"""Synchronous label propagation — PLP (pinned spec: SURVEY.md §2.1.3).

The reference's PLP (networkit.community.PLP; Raghavan et al. label
propagation) is asynchronous and thread-schedule-dependent; the north star
pins the *synchronous* variant (BASELINE.json:6), which this implements
deterministically:

- init label = vid;
- Jacobi rounds: every vertex simultaneously adopts the label with maximum
  summed incident edge weight among its neighbors' *previous-round* labels,
  ties broken toward the smallest label id;
- isolated vertices keep their label; run to fixpoint (or ``fixed_iters``).

Each round: join labels onto the symmetrized edge table (shuffle on src),
emit (dst, label, w) tallies with a per-batch pre-combine, then
groupby(dst, label).sum(w) and a combiner-based argmax aggregate
(functions/aggregates.ArgMaxWMinLabel) — no per-group Python sorting.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from networkit_ray.functions.aggregates import ArgMaxWMinLabel
from networkit_ray.stages.graphops import (
    canonicalize_undirected,
    symmetrize,
    vertices_from_edges,
)


def label_propagation(
    edges_ds,
    vertices_ds=None,
    max_iter: int = 100,
    fixed_iters: int | None = None,
    num_partitions: int = 8,
    engine: str = "dataset",
    snapshot_at: int | None = None,
):
    """edges(src,dst,w) [+ vertices(vid)] -> (Dataset(vid, label), rounds).

    ``engine="actor"`` runs the rounds on the BSP CSR actor pool.
    ``snapshot_at=k`` (actor engine only) additionally captures the
    labeling after round k in the SAME run — one graph build serves both
    labelings — and returns ``(labels, rounds, labels_at_k)``.
    """
    # dedupe=False: PLP tallies sum w per (vid, label) — partial-sum
    # duplicates total identically, and skipping the global dedup removes
    # a full all-to-all exchange from the build
    canon = canonicalize_undirected(edges_ds, weight="sum", dedupe=False)
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    if engine == "actor":
        from networkit_ray.state.csr import BSPGraph

        g = BSPGraph(
            symmetrize(canon), vertices_ds.select_columns(["vid"]), num_partitions
        )
        try:
            return g.plp(
                max_iter=max_iter, fixed_iters=fixed_iters, snapshot_at=snapshot_at
            )
        finally:
            g.shutdown()
    if snapshot_at is not None:
        raise ValueError("snapshot_at requires engine='actor'")
    sym = symmetrize(canon).materialize()

    labels = (
        vertices_ds.select_columns(["vid"])
        .map_batches(
            lambda t: pa.table({"vid": t["vid"], "label": t["vid"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    if sym.count() == 0:
        # edgeless graph: every vertex keeps its own label (fixpoint)
        return labels, (fixed_iters or 1)

    def _tally(t: pa.Table) -> pa.Table:
        out = pa.table({"vid": t["dst"], "label": t["label"], "w": t["w"]})
        return (
            out.group_by(["vid", "label"])
            .aggregate([("w", "sum")])
            .rename_columns(["vid", "label", "w"])
        )

    iters_target = fixed_iters if fixed_iters is not None else max_iter
    rounds = 0
    for rounds in range(1, iters_target + 1):
        tallies = (
            sym.join(
                labels,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("vid",),
            )
            .map_batches(_tally, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["vid", "label"], num_partitions=num_partitions)
            .aggregate(Sum("w", alias_name="w"))
        )
        winners = tallies.groupby("vid", num_partitions=num_partitions).aggregate(
            ArgMaxWMinLabel(w_col="w", label_col="label", alias_name="new_label")
        )
        joined = labels.join(
            winners, join_type="left_outer", num_partitions=num_partitions, on=("vid",)
        )
        new_labels = joined.map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "label": pc.coalesce(
                        pc.cast(t["new_label"], pa.int64()), t["label"]
                    ),
                    "chg": pc.cast(
                        pc.not_equal(
                            pc.coalesce(pc.cast(t["new_label"], pa.int64()), t["label"]),
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
        if fixed_iters is None and changed == 0:
            break
    return labels, rounds
