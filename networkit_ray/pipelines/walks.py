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


def _uniform01(walk_ids: np.ndarray, step: int, cand: np.ndarray, seed: int):
    """Deterministic per-(walker, step, candidate) uniform in (0, 1)."""
    h = _step_hash(walk_ids, step, cand, seed).astype(np.uint64)
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53) + 1e-18


def node2vec_walks(
    edges_ds,
    walk_length: int = 10,
    walks_per_node: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    num_partitions: int = 8,
    vertices_ds=None,
):
    """Second-order BIASED random walks (reference embedding/Node2Vec,
    Grover & Leskovec KDD'16): from (prev -> cur), candidate x is weighted
    1/p if x == prev (return), 1 if x is a neighbor of prev (BFS-ish), and
    1/q otherwise (DFS-ish).  The weighted draw is the deterministic
    EXPONENTIAL RACE: x* = argmin_x Exp_hash(walker, step, x) / w(x) —
    exact categorical sampling by the per-candidate hash draw, so walks
    are reproducible across partitionings and cluster sizes with no RNG
    state.  Each step is the first-order candidate join plus ONE extra
    co-partitioned join flagging prev-neighbors ((prev, cand) against the
    edge table) and one argmin groupby.  Pass a symmetrized edge table for
    undirected walks.  -> Dataset(walk_id, step, vid)."""
    import ray.data

    edges = edges_ds.select_columns(["src", "dst"]).materialize()
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges)
    verts = vertices_ds.select_columns(["vid"]).materialize()

    def init(t: pa.Table) -> pa.Table:
        vids = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
        wid = (
            vids[:, None] * np.int64(walks_per_node)
            + np.arange(walks_per_node, dtype=np.int64)[None, :]
        ).reshape(-1)
        v = np.repeat(vids, walks_per_node)
        return pa.table(
            {
                "walk_id": wid,
                "step": np.zeros(len(wid), dtype=np.int64),
                "vid": v,
                "prev": np.full(len(wid), -1, dtype=np.int64),
            }
        )

    state = verts.map_batches(
        init, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    out_parts = [state.select_columns(["walk_id", "step", "vid"])]
    if edges.count() == 0:
        return out_parts[0]

    # prev-neighbor flag side: (psrc, pdst, is_nb)
    nb = edges.map_batches(
        lambda t: pa.table(
            {
                "psrc": t["src"],
                "pdst": t["dst"],
                "is_nb": pa.array(np.ones(t.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    inv_p, inv_q = 1.0 / p, 1.0 / q

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
            lambda t: pa.table(
                {
                    "walk_id": t["walk_id"],
                    "cur": t["vid"],
                    "prev": t["prev"],
                    "cand": t["dst"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        flagged = cand.join(
            nb,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("prev", "cand"),
            right_on=("psrc", "pdst"),
        )

        def draw(t: pa.Table, step=step) -> pa.Table:
            import pyarrow.compute as pc

            wid = t["walk_id"].combine_chunks().to_numpy(zero_copy_only=False)
            cur = t["cur"].combine_chunks().to_numpy(zero_copy_only=False)
            prev = t["prev"].combine_chunks().to_numpy(zero_copy_only=False)
            cd = t["cand"].combine_chunks().to_numpy(zero_copy_only=False)
            isnb = pc.is_valid(t["is_nb"].combine_chunks()).to_numpy(
                zero_copy_only=False
            )
            w = np.where(cd == prev, inv_p, np.where(isnb, 1.0, inv_q))
            u = _uniform01(wid, step, cd, seed)
            key = -np.log(u) / w  # exponential race: smaller wins
            # cur rides along as a second group key (functionally dependent
            # on walk_id), so the winner's prev needs no packing; ArgMax of
            # negated key = argmin (ties -> smaller cand, deterministic)
            return pa.table(
                {"walk_id": wid, "cur": cur, "label": cd, "w": -key}
            )

        nxt = flagged.map_batches(
            draw, batch_format="pyarrow", zero_copy_batch=True
        ).groupby(["walk_id", "cur"], num_partitions=num_partitions).aggregate(
            ArgMaxWMinLabel(w_col="w", label_col="label", alias_name="vid")
        )
        state = nxt.map_batches(
            lambda t, step=step: pa.table(
                {
                    "walk_id": pa.compute.cast(t["walk_id"], pa.int64()),
                    "step": pa.array(np.full(t.num_rows, step, dtype=np.int64)),
                    "vid": pa.compute.cast(t["vid"], pa.int64()),
                    "prev": pa.compute.cast(t["cur"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        out_parts.append(state.select_columns(["walk_id", "step", "vid"]))

    out = out_parts[0]
    for pt in out_parts[1:]:
        out = out.union(pt)
    return out


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
