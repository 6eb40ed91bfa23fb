"""networkit_ray — a Ray-Data-native link-graph analytics engine.

Built from scratch against the spec in /root/repo/SURVEY.md and
/root/repo/BASELINE.json (the reference clone at /root/reference is empty;
see SURVEY.md §0).  NOT a port of NetworKit's C++ core: every operator is
expressed as Ray Data Dataset transforms (map_batches over zero-copy Arrow,
groupby-aggregate shuffles) or, for the iterative kernels, as a BSP engine of
hash-partitioned CSR block partitions held in stateful Ray actors
(BASELINE.json:6).

Data model (SURVEY.md §1.2):
    corpus(repo, path, commit, lang, content [, sha256])  -- the input hint
    edges(src: int64, dst: int64, w: float64)             -- one graph
    vertices(vid: int64 [, key: string])
    scores(vid: int64, score: float64)
    labels(vid: int64, label: int64)

Nothing in this package calls ray.init()/ray.shutdown(); the caller owns the
Ray session (driver contract in __ray_entry__.py).
"""

from networkit_ray import compat as _compat

_compat.apply_patches()

from networkit_ray.stages.graphops import (  # noqa: F401
    canonicalize_undirected,
    dedup_edges,
    out_degrees,
    symmetrize,
    vertices_from_edges,
)
from networkit_ray.pipelines.pagerank import pagerank  # noqa: F401
from networkit_ray.pipelines.components import connected_components  # noqa: F401
from networkit_ray.pipelines.labelprop import label_propagation  # noqa: F401
from networkit_ray.pipelines.triangles import triangle_counts  # noqa: F401

__version__ = "0.1.0"
