"""Random-walk corpus generation — the reference's embedding family
(embedding/Node2Vec's walk phase; SURVEY.md §2.3 "random-walk flat_map").

Uniform walks (deepwalk-style), fully distributed and deterministic: at
step t, walker w standing on vertex v moves to
argmin over out-neighbors u of hash(w, t, u) — an iid min-hash draw, i.e.
a uniform choice among neighbors, reproducible across partitionings and
cluster sizes with NO per-walker RNG state.  Each step is one
co-partitioned join (walkers x edges on the current vertex) plus one
argmin groupby; walkers whose vertex has no out-edge stop early.
Pass a symmetrized edge table for undirected walks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from networkit_ray.functions.aggregates import ArgMaxWMinLabel
from networkit_ray.stages.graphops import vertices_from_edges

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _step_hash(walk_ids: np.ndarray, step: int, cand: np.ndarray, seed: int):
    key = (
        walk_ids.astype(np.uint64) * _MIX
        + cand.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
        + np.uint64(step * 2654435761 + seed)
    )
    return pd.util.hash_array(key.view(np.int64))


def random_walks(
    edges_ds,
    walk_length: int = 10,
    walks_per_node: int = 1,
    seed: int = 42,
    num_partitions: int = 8,
    vertices_ds=None,
):
    """-> Dataset(walk_id, step, vid): ``walks_per_node`` uniform random
    walks of up to ``walk_length`` steps from every vertex."""
    import ray.data

    edges = edges_ds.select_columns(["src", "dst"]).materialize()
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges)
    verts = vertices_ds.select_columns(["vid"]).materialize()

    # walker state: walk_id = vid * walks_per_node + r
    def init(t: pa.Table) -> pa.Table:
        vids = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
        wid = (
            vids[:, None] * np.int64(walks_per_node)
            + np.arange(walks_per_node, dtype=np.int64)[None, :]
        ).reshape(-1)
        return pa.table(
            {
                "walk_id": wid,
                "step": np.zeros(len(wid), dtype=np.int64),
                "vid": np.repeat(vids, walks_per_node),
            }
        )

    state = verts.map_batches(
        init, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    out_parts = [state]

    if edges.count() == 0:  # empty join side crashes Ray 2.49 (compat.py)
        return state

    for step in range(1, walk_length + 1):
        if state.count() == 0:
            break
        cand = state.join(
            edges,
            join_type="inner",
            num_partitions=num_partitions,
            on=("vid",),
            right_on=("src",),
        ).map_batches(
            # explicit projection after join (Ray 2.49 — compat.py), plus
            # the deterministic per-(walker, step, neighbor) draw; ArgMax of
            # NEGATED hash = argmin (ties -> smaller dst, deterministic)
            lambda t, step=step: pa.table(
                {
                    "walk_id": t["walk_id"],
                    "label": t["dst"],
                    "w": -_step_hash(
                        t["walk_id"].combine_chunks().to_numpy(zero_copy_only=False),
                        step,
                        t["dst"].combine_chunks().to_numpy(zero_copy_only=False),
                        seed,
                    ).astype(np.float64),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        nxt = cand.groupby("walk_id", num_partitions=num_partitions).aggregate(
            ArgMaxWMinLabel(w_col="w", label_col="label", alias_name="vid")
        )
        state = nxt.map_batches(
            lambda t, step=step: pa.table(
                {
                    "walk_id": pa.compute.cast(t["walk_id"], pa.int64()),
                    "step": pa.array(np.full(t.num_rows, step, dtype=np.int64)),
                    "vid": pa.compute.cast(t["vid"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        out_parts.append(state)

    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.union(p)
    return out
