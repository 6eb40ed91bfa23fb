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

from networkit_ray.pipelines.structure import _project
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


# --- MaxentStress (reference viz/MaxentStress; Gansner, Hu & North 2012,
# "A Maxent-Stress Model for Graph Layout") -------------------------------

_MIX = 0x9E3779B97F4A7C15


def _pool_hash(vid, iteration, seed):
    """Per-iteration salted vertex hash for anchor-pool selection."""
    import numpy as np
    import pandas as pd

    return pd.util.hash_array(
        vid.astype(np.uint64) * np.uint64(_MIX)
        + np.uint64(iteration) * np.uint64(2654435761)
        + np.uint64(seed) * np.uint64(1000003)
    )


def _rep_partners(vid, samples, pool_size, iteration, seed):
    """Deterministic (len(vid), samples) ANCHOR-POOL indices by counter
    hash — bit-identical across partitionings, replayable by the pytest
    brute.  Works on arbitrary (hashed, non-dense) vids: partners come
    from the iteration's Q-anchor pool, so no dense-id contract and no
    vertex-sized driver state."""
    import numpy as np
    import pandas as pd

    base = (
        vid.astype(np.uint64) * np.uint64(_MIX)
        + np.uint64(seed) * np.uint64(2654435761)
        + np.uint64(iteration) * np.uint64(1000003)
    )
    s = np.arange(samples, dtype=np.uint64)
    h = pd.util.hash_array((base[:, None] + s[None, :] * np.uint64(_MIX)).ravel())
    return (h % np.uint64(pool_size)).astype(np.int64).reshape(len(vid), samples)


def _hash_init(vid, dim, seed):
    """Deterministic uniform [0,1)^dim start coordinates."""
    import numpy as np

    from networkit_ray.sources.generators import _uniform

    return np.stack([_uniform(vid, 77 + k, seed) for k in range(dim)], axis=1)


def maxent_stress(
    edges_ds,
    dim: int = 2,
    iterations: int = 12,
    alpha: float = 1.0,
    alpha_decay: float = 0.3,
    alpha_min: float = 0.008,
    samples: int = 8,
    pool_size: int = 64,
    seed: int = 42,
    num_partitions: int = 8,
    cg_tol: float = 1e-8,
    cg_maxiter: int = 300,
    eps: float = 1e-9,
    stats=None,
):
    """MaxentStress layout: minimize sum_E w_ij (||x_i-x_j|| - d_ij)^2
    minus the maxent entropy of non-edge distances, by the paper's
    fixed-point scheme — each iteration solves  L_w x = b(x_prev)  with
    b = attraction (L_{w,d}(x) x, the per-edge unit-vector term) plus the
    entropy force alpha * sum (x_i-x_j)/r^2 over sampled non-neighbor
    pairs; alpha anneals by ``alpha_decay`` down to ``alpha_min``
    (the published schedule).

    Ray-Data shape: d_ij = the edge's weight (1 for unweighted graphs),
    w_ij = 1/d_ij^2; the weighted-Laplacian solves ride the batched
    distributed CG kernel (state/csr.py cg_*, one BSP exchange per CG
    step, driver moves (dim,)-dots); the attraction RHS is two
    co-partitioned coordinate joins onto the symmetrized edge table with
    per-batch pre-combined grouped sums; the repulsion RHS draws
    ``samples`` partners per vertex by counter hash from a per-iteration
    ANCHOR POOL (the ``pool_size`` smallest salted vertex hashes — a
    uniform vertex sample that works on the engine's hashed, NON-dense
    vids; only Q*(dim+1) scalars touch the driver — the published
    random-subset approximation of the entropy term), drops real edges
    via a left-outer-join null filter, and applies every pair
    SYMMETRICALLY (+f to i, -f to the anchor) so b stays
    component-sum-zero — the condition the singular-Laplacian CG needs
    (connected input assumed, the standard contract of the reference
    implementation; resistance.py documents the same).  Unbiased scale
    (n-1)/samples on the sampled entropy force.  Disconnected inputs
    degrade gracefully: the CG kernel's pap>0 guard zeroes steps along
    the nullspace, so each component converges to its own layout with
    arbitrary relative placement (CG may report maxiter; sf0.01
    supplier-star drive verified finite, near-zero-stress output).

    -> Dataset(vid, x0..x{dim-1}).  Deterministic for a fixed
    num_partitions; coordinates are solver-exact to cg_tol.
    """
    import numpy as np
    import pyarrow as pa

    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from networkit_ray.stages.graphops import (
        canonicalize_undirected,
        symmetrize,
        vertices_from_edges,
    )
    from networkit_ray.state.csr import BSPGraph

    K = int(dim)
    xcols = [f"x{k}" for k in range(K)]
    canon = canonicalize_undirected(edges_ds, weight="min").materialize()

    def attach_w(t: pa.Table) -> pa.Table:
        d = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
        d = np.maximum(d, eps)
        return pa.table(
            {"src": t["src"], "dst": t["dst"], "d": d, "w": 1.0 / (d * d)}
        )

    lap_edges = symmetrize(canon).map_batches(
        attach_w, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    verts = vertices_from_edges(canon).materialize()
    n = verts.count()

    g = BSPGraph(
        lap_edges.select_columns(["src", "dst", "w"]), verts, num_partitions
    )
    try:
        coords = verts.map_batches(
            lambda t, _K=K: pa.table(
                {
                    "vid": t["vid"],
                    **{
                        xcols[k]: col
                        for k, col in enumerate(
                            _hash_init(
                                t["vid"].combine_chunks().to_numpy(
                                    zero_copy_only=False
                                ),
                                _K,
                                seed,
                            ).T
                        )
                    },
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

        cur_alpha = float(alpha)
        P, actors = g.P, g.actors
        for it in range(int(iterations)):
            # ---- attraction RHS: edges with both endpoint coordinates
            ej = _project(
                lap_edges.join(
                    coords, join_type="inner", num_partitions=num_partitions,
                    on=("dst",), right_on=("vid",),
                ),
                {"src": "src", "d": "d", "w": "w",
                 **{f"j_{c}": c for c in xcols}},
            )
            both = _project(
                ej.join(
                    coords, join_type="inner", num_partitions=num_partitions,
                    on=("src",), right_on=("vid",),
                ),
                {"src": "src", "d": "d", "w": "w",
                 **{f"j_{c}": f"j_{c}" for c in xcols},
                 **{f"i_{c}": c for c in xcols}},
            )

            def attraction(t: pa.Table) -> pa.Table:
                vi = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
                d = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
                w = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
                xi = np.stack(
                    [t[f"i_{c}"].combine_chunks().to_numpy(zero_copy_only=False)
                     for c in xcols], axis=1)
                xj = np.stack(
                    [t[f"j_{c}"].combine_chunks().to_numpy(zero_copy_only=False)
                     for c in xcols], axis=1)
                diff = xi - xj
                r = np.sqrt((diff * diff).sum(axis=1))
                f = (w * d / np.maximum(r, eps))[:, None] * diff
                uniq, inv = np.unique(vi, return_inverse=True)
                comb = np.zeros((len(uniq), K))
                np.add.at(comb, inv, f)
                return pa.table(
                    {"vid": uniq, **{f"b{k}": comb[:, k] for k in range(K)}}
                )

            # ---- repulsion RHS: symmetric non-edge pairs against a
            # hash-selected anchor pool (vids are hashed/non-dense, so a
            # uniform anchor sample = the Q smallest salted vertex hashes;
            # only Q*(dim+1) scalars touch the driver)
            Q = min(int(pool_size), n)

            def local_topq(t: pa.Table, _it=it) -> pa.Table:
                v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
                h = _pool_hash(v, _it, seed)
                keep = np.argsort(h, kind="stable")[:Q]
                out = {"vid": v[keep], "h": h[keep]}
                for c in xcols:
                    out[c] = t[c].combine_chunks().to_numpy(
                        zero_copy_only=False
                    )[keep]
                return pa.table(out)

            pool_rows = (
                coords.map_batches(
                    local_topq, batch_format="pyarrow", zero_copy_batch=True
                )
                .sort("h")
                .limit(Q)
                .take_all()
            )
            pool_vids = np.array([r["vid"] for r in pool_rows], np.int64)
            pool_x = np.array(
                [[r[c] for c in xcols] for r in pool_rows], np.float64
            )

            def rep_pairs(t: pa.Table, _it=it) -> pa.Table:
                v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
                idx = _rep_partners(v, int(samples), len(pool_vids), _it, seed)
                i = np.repeat(v, int(samples))
                a = idx.ravel()
                j = pool_vids[a]
                keep = i != j
                return pa.table({"p_lo": np.minimum(i[keep], j[keep]),
                                 "p_hi": np.maximum(i[keep], j[keep]),
                                 "i": i[keep], "a": a[keep]})

            pairs = verts.map_batches(
                rep_pairs, batch_format="pyarrow", zero_copy_batch=True
            )
            # drop sampled pairs that are real edges (left-outer + null)
            marked = pairs.join(
                canon.map_batches(
                    lambda t: pa.table(
                        {"e_lo": t["src"], "e_hi": t["dst"],
                         "hit": np.ones(t.num_rows, np.int8)}
                    ),
                    batch_format="pyarrow", zero_copy_batch=True,
                ).materialize(),
                join_type="left_outer", num_partitions=num_partitions,
                on=("p_lo", "p_hi"), right_on=("e_lo", "e_hi"),
            )
            import pyarrow.compute as pc

            nonedge = _project(
                marked.map_batches(
                    lambda t: t.filter(pc.is_null(t["hit"])),
                    batch_format="pyarrow", zero_copy_batch=True,
                ),
                {"i": "i", "a": "a"},
            )
            pboth = _project(
                nonedge.join(
                    coords, join_type="inner", num_partitions=num_partitions,
                    on=("i",), right_on=("vid",),
                ),
                {"i": "i", "a": "a", **{f"i_{c}": c for c in xcols}},
            )
            scale = cur_alpha * (n - 1) / float(samples)

            def repulsion(t: pa.Table, _scale=scale) -> pa.Table:
                i = t["i"].combine_chunks().to_numpy(zero_copy_only=False)
                a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
                xi = np.stack(
                    [t[f"i_{c}"].combine_chunks().to_numpy(zero_copy_only=False)
                     for c in xcols], axis=1)
                xj = pool_x[a]
                diff = xi - xj
                r2 = (diff * diff).sum(axis=1)
                f = (_scale / np.maximum(r2, eps))[:, None] * diff
                vids = np.concatenate([i, pool_vids[a]])
                vals = np.concatenate([f, -f])  # symmetric -> sum-zero b
                uniq, inv = np.unique(vids, return_inverse=True)
                comb = np.zeros((len(uniq), K))
                np.add.at(comb, inv, vals)
                return pa.table(
                    {"vid": uniq, **{f"b{k}": comb[:, k] for k in range(K)}}
                )

            # ---- feed b into the CG actors and solve L_w x = b
            ray.get([a.cg_init.remote(K) for a in actors])

            def feed(t: pa.Table) -> pa.Table:
                v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
                vals = np.stack(
                    [t[f"b{k}"].combine_chunks().to_numpy(zero_copy_only=False)
                     for k in range(K)], axis=1)
                part = v % P
                ray.get([
                    actors[p].cg_add_b.remote(v[part == p], vals[part == p])
                    for p in range(P) if (part == p).any()
                ])
                return pa.table({"n": pa.array([t.num_rows], pa.int64())})

            both.map_batches(
                attraction, batch_format="pyarrow", zero_copy_batch=True
            ).map_batches(
                feed, batch_format="pyarrow", zero_copy_batch=True
            ).count()
            pboth.map_batches(
                repulsion, batch_format="pyarrow", zero_copy_batch=True
            ).map_batches(
                feed, batch_format="pyarrow", zero_copy_batch=True
            ).count()
            iters, resid = g.cg_solve(maxiter=cg_maxiter, tol=cg_tol,
                                      stats=stats)
            if stats is not None:
                stats.setdefault("cg_iters", []).append(iters)
            coords = _project(
                g._collect("cg_x_table"),
                {"vid": "vid", **{xcols[k]: f"z{k}" for k in range(K)}},
            ).materialize()
            cur_alpha = max(cur_alpha * float(alpha_decay), float(alpha_min))
        return coords
    finally:
        g.shutdown()


def maxent_attraction_stress(edges_ds, coords_ds, num_partitions: int = 8):
    """sum_E w_ij (||x_i - x_j|| - d_ij)^2 over canonical edges — the
    stress half of the maxent objective, for monitoring/tests."""
    import numpy as np
    import pyarrow as pa

    from networkit_ray.stages.graphops import canonicalize_undirected

    canon = canonicalize_undirected(edges_ds, weight="min").materialize()
    sample = coords_ds.take(1)[0]
    xcols = sorted(c for c in sample if c.startswith("x"))
    j1 = _project(
        canon.join(
            coords_ds, join_type="inner", num_partitions=num_partitions,
            on=("dst",), right_on=("vid",),
        ),
        {"src": "src", "w": "w", **{f"j_{c}": c for c in xcols}},
    )
    j2 = _project(
        j1.join(
            coords_ds, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("vid",),
        ),
        {"w": "w", **{f"j_{c}": f"j_{c}" for c in xcols},
         **{f"i_{c}": c for c in xcols}},
    )

    def sq(t: pa.Table) -> pa.Table:
        d = np.maximum(
            t["w"].combine_chunks().to_numpy(zero_copy_only=False), 1e-9
        )
        xi = np.stack(
            [t[f"i_{c}"].combine_chunks().to_numpy(zero_copy_only=False)
             for c in xcols], axis=1)
        xj = np.stack(
            [t[f"j_{c}"].combine_chunks().to_numpy(zero_copy_only=False)
             for c in xcols], axis=1)
        r = np.sqrt(((xi - xj) ** 2).sum(axis=1))
        return pa.table(
            {"s": pa.array([float((((r - d) / d) ** 2).sum())])}
        )

    return float(
        sum(
            b["s"][0].as_py()
            for b in j2.map_batches(
                sq, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow")
        )
    )
