"""Graph layout: PivotMDS (reference viz/PivotMDS; Brandes & Pich GD'06,
SURVEY.md §2.3 dynamics/simulation/viz row).

Ray-Data shape: pivot selection and the pivot-distance matrix ride the
batched multi-source BFS kernel (`state/csr.py ms_*`); double centering and
the k x k Gram reduce partition-locally; only the k x k eigenproblem and two
k-vectors touch the driver; coordinates are emitted per-partition as Arrow
tables.  At 100 TB the per-vertex (n, k) state stays sharded with the CSR
partitions and the driver cost is O(k^2) independent of n.
"""

from __future__ import annotations

from networkit_ray.pipelines.traversal import _graph
from networkit_ray.stages.graphops import vertices_from_edges


def pivot_mds(
    edges_ds,
    k: int = 16,
    dim: int = 2,
    vertices_ds=None,
    num_partitions: int = 8,
    undirected: bool = True,
    stats=None,
):
    """PivotMDS layout: maxmin pivots, one k-wide batched BFS distance
    wave, partition-local double centering + Gram, driver-side k x k
    eigensolve, partition-emitted coordinates (deterministic signs).
    -> Dataset(vid, x, y[, ...])."""
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    verts = vertices_ds.select_columns(["vid"]).materialize()
    g = _graph(edges_ds, verts, num_partitions, undirected)
    try:
        out, _pivots, _evals = g.pivot_mds(k=k, dim=dim, stats=stats)
    finally:
        g.shutdown()
    return out
