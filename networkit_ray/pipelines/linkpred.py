"""Link prediction indices (SURVEY.md §2.3 `linkprediction/` module):
common neighbors, Jaccard, Adamic-Adar, Resource Allocation, Preferential
Attachment — neighbor-intersection self-joins, the same wedge-join skeleton
as triangle counting.

For every unordered vertex pair (u, v), u < v, with at least one common
neighbor:
    cn(u,v)  = |N(u) ∩ N(v)|
    jac(u,v) = cn / |N(u) ∪ N(v)|
    aa(u,v)  = Σ_{z ∈ N(u)∩N(v)} 1 / ln(deg(z))
    ra(u,v)  = Σ_{z ∈ N(u)∩N(v)} 1 / deg(z)      (ResourceAllocationIndex)
    pa(u,v)  = deg(u) · deg(v)                   (PreferentialAttachmentIndex)

Plan: symmetrized adjacency self-joined on the PIVOT (the common neighbor)
emits one row per wedge (u, z, v); groupby (u, v) counts wedges (= cn) and
sums 1/ln(deg(pivot)) (= aa); degrees joined back for the Jaccard
denominator.  Wedge volume is Σ deg(z)² — cap hub pivots upstream if the
degree distribution is extreme (same hub bound as triangles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum

from networkit_ray.stages.graphops import (
    canonicalize_undirected,
    out_degrees,
    symmetrize,
)


def link_prediction_scores(edges_ds, num_partitions: int = 8):
    """-> Dataset(u, v, cn, jaccard, adamic_adar, resource_alloc, pref_attach)
    for pairs with cn >= 1."""
    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    sym = symmetrize(canon).materialize()  # keeps w (out_degrees needs it)
    deg = (
        out_degrees(sym, weighted=False)
        .select_columns(["vid", "out_deg"])
        .materialize()
    )

    # adjacency annotated with pivot degree: (pivot=src, nbr=dst, inv_ln_deg)
    adj = (
        sym.join(
            deg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "pivot": t["src"],
                    "nbr": t["dst"],
                    "inv_ln_deg": 1.0
                    / np.log(
                        np.maximum(
                            t["out_deg"].combine_chunks().to_numpy(zero_copy_only=False),
                            2,
                        ).astype(np.float64)
                    ),
                    # wedge pivots always have deg >= 2, no clamp needed for 1/d
                    "inv_deg": 1.0
                    / t["out_deg"]
                    .combine_chunks()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    wedges = adj.join(
        adj,
        join_type="inner",
        num_partitions=num_partitions,
        on=("pivot",),
        left_suffix="_l",
        right_suffix="_r",
    )

    def mk(t: pa.Table) -> pa.Table:
        u = t["nbr_l"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["nbr_r"].combine_chunks().to_numpy(zero_copy_only=False)
        ild = t["inv_ln_deg_l"].combine_chunks().to_numpy(zero_copy_only=False)
        idg = t["inv_deg_l"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = u < v
        out = pa.table(
            {"u": u[keep], "v": v[keep], "aa": ild[keep], "ra": idg[keep]}
        )
        # local pre-combine
        g = out.group_by(["u", "v"]).aggregate(
            [("aa", "sum"), ("ra", "sum"), ("aa", "count")]
        )
        return g.rename_columns(["u", "v", "aa", "ra", "cn"])

    pairs = (
        wedges.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"], num_partitions=num_partitions)
        .aggregate(
            Sum("aa", alias_name="adamic_adar"),
            Sum("ra", alias_name="resource_alloc"),
            Sum("cn", alias_name="cn"),
        )
    )

    # Jaccard denominator: deg(u) + deg(v) - cn
    j1 = pairs.join(
        deg, join_type="inner", num_partitions=num_partitions, on=("u",), right_on=("vid",)
    ).map_batches(
        lambda t: pa.table(
            {
                "u": t["u"],
                "v": t["v"],
                "cn": t["cn"],
                "adamic_adar": t["adamic_adar"],
                "resource_alloc": t["resource_alloc"],
                "deg_u": t["out_deg"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        j1.join(
            deg, join_type="inner", num_partitions=num_partitions, on=("v",), right_on=("vid",)
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "u": t["u"],
                    "v": t["v"],
                    "cn": pc.cast(t["cn"], pa.int64()),
                    "jaccard": pc.divide(
                        pc.cast(t["cn"], pa.float64()),
                        pc.cast(
                            pc.subtract(
                                pc.add(t["deg_u"], t["out_deg"]), t["cn"]
                            ),
                            pa.float64(),
                        ),
                    ),
                    "adamic_adar": t["adamic_adar"],
                    "resource_alloc": t["resource_alloc"],
                    "pref_attach": pc.cast(
                        pc.multiply(t["deg_u"], t["out_deg"]), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
