"""Dynamic-graph operators (SURVEY.md §2.3 `dynamics/` +
components/DynConnectedComponents): incremental maintenance under streaming
edge insertions, replayed batch-at-a-time — the reference's GraphEvent
stream is an offline event replay, which maps to a Dataset-per-batch update
loop here.

DynamicConnectedComponents maintains a min-vid labeling across insertion
batches.  Each ``update(batch)`` costs:
  - two co-partitioned joins of the BATCH against the label table (map the
    new edges' endpoints to their current component roots),
  - one equivalence resolution over the ROOT-pair set — bounded by the
    batch size, never by the graph (pipelines/equivalence.py: driver-solved
    below the pair limit, large/small-star contraction above),
  - one join to rewrite the affected labels.
No full edge re-scan ever happens — the edge history is not even retained —
which is the asymptotic win over recompute; the final labeling equals the
batch-oblivious connected_components of the union of all batches (the
driver's `dynamic_cc_replay` query value-checks exactly that via the CC SQL
oracle).

Deletions are out of scope (the reference's DynConnectedComponents also
treats them as the hard case); a deletion-capable variant would re-run CC
inside the affected components only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from networkit_ray.pipelines.equivalence import resolve_equivalence_pairs
from networkit_ray.stages.graphops import vertices_from_edges


def _proj(ds, fn):
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class DynamicConnectedComponents:
    """Incremental min-vid component labeling under edge-insertion batches.

    >>> dyn = DynamicConnectedComponents(num_partitions=8)
    >>> labels = dyn.update(batch1)   # Dataset(vid, label)
    >>> labels = dyn.update(batch2)   # labels now cover batch1 ∪ batch2
    """

    def __init__(self, num_partitions: int = 8, driver_pair_limit: int = 2_000_000):
        self.P = num_partitions
        self.driver_pair_limit = driver_pair_limit
        self.labels = None  # Dataset(vid, label), materialized

    def update(self, edges_ds):
        P = self.P
        e = edges_ds.select_columns(["src", "dst"]).materialize()
        verts_new = vertices_from_edges(e).materialize()

        # 1. extend the label table with unseen endpoints (label = vid)
        if self.labels is None:
            base = _proj(
                verts_new, lambda t: pa.table({"vid": t["vid"], "label": t["vid"]})
            ).materialize()
        else:
            unseen = _proj(
                verts_new.join(
                    self.labels,
                    join_type="left_outer",
                    num_partitions=P,
                    on=("vid",),
                ),
                lambda t: pa.table(
                    {
                        "vid": t["vid"].filter(pc.is_null(t["label"])),
                        "label": t["vid"].filter(pc.is_null(t["label"])),
                    }
                )
                if "label" in t.schema.names
                else pa.table({"vid": t["vid"], "label": t["vid"]}),
            )
            base = self.labels.union(unseen).materialize()

        # 2. map batch endpoints to their current roots
        l1 = _proj(
            e.join(base, join_type="inner", num_partitions=P, on=("src",), right_on=("vid",)),
            lambda t: pa.table({"lsrc": t["label"], "dst": t["dst"]}),
        )
        root_pairs = _proj(
            l1.join(base, join_type="inner", num_partitions=P, on=("dst",), right_on=("vid",)),
            lambda t: pa.table({"src": t["lsrc"], "dst": t["label"]}).filter(
                pc.not_equal(t["lsrc"], t["label"])
            ),
        )

        # 3. resolve the root-pair equivalences (batch-bounded set)
        res = resolve_equivalence_pairs(
            root_pairs,
            num_partitions=P,
            driver_pair_limit=self.driver_pair_limit,
        ).materialize()

        # 4. rewrite affected labels (old root -> merged root)
        if res.count() == 0:
            self.labels = base
            return self.labels

        remap = _proj(
            res, lambda t: pa.table({"label": t["vid"], "new": t["label"]})
        )
        self.labels = _proj(
            base.join(remap, join_type="left_outer", num_partitions=P, on=("label",)),
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "label": pc.coalesce(t["new"], t["label"])
                    if "new" in t.schema.names
                    else t["label"],
                }
            ),
        ).materialize()
        return self.labels
