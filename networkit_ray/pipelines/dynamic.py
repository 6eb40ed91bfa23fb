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


class DynamicBFS:
    """Incremental multi-source BFS depths under edge-insertion batches
    (reference dynamics/DynBFS): under insertions depths only DECREASE, so
    each update warm-starts relaxation from the current depth table instead
    of re-running BFS from scratch.

    Per ``update(batch)``:
      - the batch is canonicalized/symmetrized and appended to the retained
        distributed edge table (the adjacency is needed to propagate
        improvements — unlike DynamicConnectedComponents, depths are not
        contractible state),
      - seed improvements = newly-seen source vertices (depth 0) plus batch
        edges that bridge a reached endpoint to a cheaper depth,
      - relaxation rounds run only until no depth improves: each round is
        one frontier×edges co-partitioned join + a pre-combined min — the
        number of rounds is bounded by the depth SHIFT the batch causes,
        not by the graph eccentricity, which is the asymptotic win over
        recompute.  (Each round still shuffles the frontier against the
        retained edge table; on a real cluster the static side stays
        hash-partitioned and only the frontier moves.)

    ``labels()`` returns Dataset(vid, depth) over ALL seen vertices with
    the bfs_depths convention depth = -1 for unreached.  The final table
    equals the batch-oblivious ``bfs_depths`` of the union of all batches
    (the driver's `dynamic_bfs_replay` query value-checks exactly that via
    the recursive-CTE BFS SQL oracle).  Duplicate cross-batch edges are
    retained (min-propagation is idempotent); deletions are out of scope,
    as in the reference.
    """

    def __init__(self, sources, num_partitions: int = 8, max_rounds: int = 200):
        from ray.data.aggregate import Min  # noqa: F401  (used below)

        self.P = num_partitions
        self.max_rounds = max_rounds
        self.sources = np.unique(np.asarray(list(sources), dtype=np.int64))
        self.sym = None     # retained symmetric edge table (src, dst)
        self.depths = None  # (vid, depth) REACHED vertices only
        self.verts = None   # (vid) all seen vertices

    def _min_depth(self, ds):
        from ray.data.aggregate import Min

        return (
            ds.groupby("vid", num_partitions=self.P)
            .aggregate(Min("depth", alias_name="depth"))
        )

    def update(self, edges_ds):
        import ray.data

        from networkit_ray.stages.graphops import (
            canonicalize_undirected,
            symmetrize,
        )

        P = self.P
        batch_sym = (
            symmetrize(canonicalize_undirected(edges_ds, weight="one"))
            .select_columns(["src", "dst"])
            .materialize()
        )
        verts_new = vertices_from_edges(batch_sym).materialize()
        self.verts = (
            verts_new
            if self.verts is None
            else self.verts.union(verts_new)
            .groupby("vid", num_partitions=P)
            .count()
            .select_columns(["vid"])
            .materialize()
        )
        self.sym = (
            batch_sym
            if self.sym is None
            else self.sym.union(batch_sym).materialize()
        )

        # seed improvements: sources among seen vertices at depth 0
        srcs = self.sources

        def seed(t: pa.Table) -> pa.Table:
            v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
            hit = v[np.isin(v, srcs)]
            return pa.table(
                {
                    "vid": hit,
                    "depth": np.zeros(len(hit), dtype=np.int64),
                }
            )

        frontier = _proj(self.verts, seed)
        # bridge improvements: batch edges with a reached endpoint
        if self.depths is not None:
            bridged = _proj(
                batch_sym.join(
                    self.depths,
                    join_type="inner",
                    num_partitions=P,
                    on=("src",),
                    right_on=("vid",),
                ),
                lambda t: pa.table(
                    {
                        "vid": t["dst"],
                        "depth": pc.add(t["depth"], pa.scalar(1, pa.int64())),
                    }
                ),
            )
            frontier = frontier.union(bridged)
        frontier = self._improvements(self._min_depth(frontier)).materialize()

        rounds = 0
        while frontier.count() > 0 and rounds < self.max_rounds:
            self.depths = (
                frontier
                if self.depths is None
                else self._min_depth(self.depths.union(frontier)).materialize()
            )
            cand = _proj(
                self.sym.join(
                    frontier,
                    join_type="inner",
                    num_partitions=P,
                    on=("src",),
                    right_on=("vid",),
                ),
                lambda t: pa.table(
                    {
                        "vid": t["dst"],
                        "depth": pc.add(t["depth"], pa.scalar(1, pa.int64())),
                    }
                ),
            )
            frontier = self._improvements(self._min_depth(cand)).materialize()
            rounds += 1
        if frontier.count() > 0:
            raise RuntimeError(
                f"DynamicBFS did not reach the relaxation fixpoint within "
                f"max_rounds={self.max_rounds}; raise max_rounds (depths "
                f"would be stale, not approximate)"
            )
        return self.labels(), rounds

    def _improvements(self, cand):
        """Rows of cand (vid, depth) strictly better than the current depth
        table (or for unreached vids)."""
        if self.depths is None:
            return cand

        cur = _proj(
            self.depths, lambda t: pa.table({"vid": t["vid"], "cur": t["depth"]})
        )
        return _proj(
            cand.join(cur, join_type="left_outer", num_partitions=self.P, on=("vid",)),
            lambda t: pa.table({"vid": t["vid"], "depth": t["depth"]}).filter(
                pc.or_kleene(
                    pc.is_null(t["cur"]),
                    pc.less(t["depth"], t["cur"]),
                ).combine_chunks()
            )
            if "cur" in t.schema.names
            else pa.table({"vid": t["vid"], "depth": t["depth"]}),
        )

    def labels(self):
        """-> Dataset(vid, depth) over all seen vertices; unreached = -1."""
        if self.depths is None:
            return _proj(
                self.verts,
                lambda t: pa.table(
                    {
                        "vid": t["vid"],
                        "depth": np.full(t.num_rows, -1, dtype=np.int64),
                    }
                ),
            )
        dr = _proj(
            self.depths, lambda t: pa.table({"vid": t["vid"], "d": t["depth"]})
        )
        return _proj(
            self.verts.join(
                dr, join_type="left_outer", num_partitions=self.P, on=("vid",)
            ),
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "depth": pc.coalesce(
                        pc.cast(t["d"], pa.int64()), pa.scalar(-1, pa.int64())
                    )
                    if "d" in t.schema.names
                    else pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                }
            ),
        )
