"""Community quality metrics (SURVEY.md §2.3 `community/` module):
modularity of a labeling — label-joins onto edges + grouped sums.

Newman modularity for an undirected weighted graph:

    Q = Σ_c [ W_c / W  −  (S_c / 2W)² ]

where W = total undirected edge weight, W_c = weight inside community c,
S_c = summed weighted degree of c's vertices.  All three are tiny grouped
aggregates; the only real work is joining labels onto the edge endpoints.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from networkit_ray.stages.graphops import (
    canonicalize_undirected,
    out_degrees,
    symmetrize,
)


def modularity(edges_ds, labels_ds, num_partitions: int = 8):
    """-> 1-row Dataset(modularity: float64)."""
    canon = canonicalize_undirected(edges_ds, weight="sum").materialize()
    labels = labels_ds.select_columns(["vid", "label"]).materialize()

    W = canon.sum("w") or 0.0
    if W == 0.0:
        import ray.data

        return ray.data.from_arrow(pa.table({"modularity": pa.array([0.0])}))

    # W_c: edges whose two endpoints share a label
    lab_edges = (
        canon.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        )
        .map_batches(
            lambda t: pa.table(
                {"dst": t["dst"], "w": t["w"], "label_src": t["label"]}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vid",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "label": t["label_src"],
                    "w_in": pc.if_else(
                        pc.equal(t["label_src"], t["label"]), t["w"], 0.0
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    w_in = (
        lab_edges.groupby("label", num_partitions=num_partitions)
        .aggregate(Sum("w_in", alias_name="w_c"))
        .materialize()
    )

    # S_c: weighted degree mass per community
    deg = out_degrees(symmetrize(canon)).select_columns(["vid", "w_out_deg"])
    s_c = (
        deg.join(
            labels, join_type="inner", num_partitions=num_partitions, on=("vid",)
        )
        .map_batches(
            lambda t: pa.table({"label": t["label"], "s": t["w_out_deg"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("label", num_partitions=num_partitions)
        .aggregate(Sum("s", alias_name="s_c"))
        .materialize()
    )

    joined = s_c.join(
        w_in, join_type="left_outer", num_partitions=num_partitions, on=("label",)
    ).map_batches(
        lambda t, W=W: pa.table(
            {
                "q": pc.subtract(
                    pc.divide(pc.fill_null(pc.cast(t["w_c"], pa.float64()), 0.0), W),
                    pc.multiply(
                        pc.divide(pc.cast(t["s_c"], pa.float64()), 2.0 * W),
                        pc.divide(pc.cast(t["s_c"], pa.float64()), 2.0 * W),
                    ),
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    q = joined.sum("q") or 0.0
    import ray.data

    return ray.data.from_arrow(pa.table({"modularity": pa.array([float(q)])}))
