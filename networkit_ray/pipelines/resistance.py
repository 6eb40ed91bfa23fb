"""Effective resistance family on a distributed Laplacian CG solver:
SpanningEdgeCentrality, CommuteTimeDistance, per-pair effective resistance
(reference catalog `centrality/SpanningEdgeCentrality`,
`distance/CommuteTimeDistance` — SURVEY.md §2.3; previously documented
out-of-scope for lack of a Laplacian solver — this module IS that solver).

Method (public): Spielman–Srivastava JL sketching (STOC'08) exactly as the
reference uses it — er(u,v) = ||Z e_u - Z e_v||^2 with Z = (1/sqrt(k))
Q W^(1/2) B L^+, approximated by solving L z_j = B^T W^(1/2) q_j for k
random +-1 projections q_j; the solver is batched conjugate gradient whose
matvec is ONE BSP exchange per iteration (state/csr.py cg_*), so vectors
stay partitioned and the driver moves only (k,)-sized dots.

Scale notes: the JL right-hand sides assemble from the edge stream in one
map_batches pass (per-batch pre-combine, shard by vid%%P, no shuffle);
er/sec scores come from TWO co-partitioned joins of the edge table against
the z table — nothing vertex- or edge-sized touches the driver.  Graphs
are assumed connected for resistance semantics (standard for these
measures); on disconnected inputs, per-component values are still correct
within each component and cross-component pairs return inf.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from networkit_ray.stages.graphops import canonicalize_undirected, symmetrize

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _jl_signs(su: np.ndarray, sv: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Deterministic (m, k) +-1/sqrt(k) projection entries keyed by the
    canonical edge pair — bit-identical across partitionings."""
    key = (
        su.astype(np.uint64) * _MIX
        + sv.astype(np.uint64) * np.uint64(2654435761)
        + np.uint64(seed)
    )
    cols = np.arange(k, dtype=np.uint64)
    h = pd.util.hash_array(
        (key[:, None] * np.uint64(1000003) + cols[None, :] * _MIX).ravel()
    ).reshape(len(su), k)
    return np.where((h & np.uint64(1)).astype(bool), 1.0, -1.0) / np.sqrt(k)


def _laplacian_graph(edges_ds, num_partitions: int):
    from networkit_ray.state.csr import BSPGraph

    canon = canonicalize_undirected(edges_ds, weight="sum").materialize()
    sym = symmetrize(canon).materialize()
    return canon, BSPGraph(sym, None, num_partitions)


def _feed_b(canon, g, k: int, seed: int, exact_cols=None):
    """Assemble the k right-hand sides into the actors.

    JL mode: edge e = (u, v) adds +-sqrt(w_e) q_(e,j) at u and the negation
    at v.  Exact mode (exact_cols = canonical edge list): column j is the
    indicator e_u_j - e_v_j of edge j."""
    import ray

    P, actors = g.P, g.actors
    ray.get([a.cg_init.remote(k) for a in actors])

    if exact_cols is not None:
        eu, ev = exact_cols
        vids = np.concatenate([eu, ev])
        vals = np.zeros((len(vids), k), dtype=np.float64)
        m = len(eu)
        vals[np.arange(m), np.arange(m)] = 1.0
        vals[m + np.arange(m), np.arange(m)] = -1.0
        part = vids % P
        ray.get(
            [
                actors[t].cg_add_b.remote(vids[part == t], vals[part == t])
                for t in range(P)
                if (part == t).any()
            ]
        )
        return

    def feed(tbl: pa.Table) -> pa.Table:
        u = tbl["src"].combine_chunks().to_numpy(zero_copy_only=False)
        v = tbl["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        w = tbl["w"].combine_chunks().to_numpy(zero_copy_only=False)
        q = _jl_signs(u, v, k, seed) * np.sqrt(w)[:, None]
        vids = np.concatenate([u, v])
        vals = np.concatenate([q, -q])
        # per-batch pre-combine on unique vids before shipping
        uniq, inv = np.unique(vids, return_inverse=True)
        comb = np.zeros((len(uniq), k), dtype=np.float64)
        np.add.at(comb, inv, vals)
        part = uniq % P
        refs = [
            actors[t].cg_add_b.remote(uniq[part == t], comb[part == t])
            for t in range(P)
            if (part == t).any()
        ]
        ray.get(refs)
        return pa.table({"n": pa.array([tbl.num_rows], type=pa.int64())})

    canon.map_batches(feed, batch_format="pyarrow", zero_copy_batch=True).count()


def _z_join_er(canon, g, k: int, num_partitions: int):
    """er(e) = sum_j (z_j(u) - z_j(v))^2 via two co-partitioned joins of
    the canonical edge table against the distributed z table."""
    zcols = [f"z{j}" for j in range(k)]
    z = g._collect("cg_x_table")

    def sq(t: pa.Table) -> pa.Table:
        zu = np.stack(
            [t[f"{c}_u"].combine_chunks().to_numpy(zero_copy_only=False)
             for c in zcols], axis=1,
        )
        zv = np.stack(
            [t[f"{c}_v"].combine_chunks().to_numpy(zero_copy_only=False)
             for c in zcols], axis=1,
        )
        w = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
        er = ((zu - zv) ** 2).sum(axis=1)
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "w": w,
                "er": er,
                "sec": w * er,
            }
        )

    zu = z.rename_columns({c: f"{c}_u" for c in zcols})
    zv = z.rename_columns({c: f"{c}_v" for c in zcols})
    j = canon.join(
        zu, join_type="inner", num_partitions=num_partitions,
        on=("src",), right_on=("vid",),
    ).join(
        zv, join_type="inner", num_partitions=num_partitions,
        on=("dst",), right_on=("vid",),
    )
    return j.map_batches(sq, batch_format="pyarrow", zero_copy_batch=True)


def spanning_edge_centrality(
    edges_ds,
    k: int = 128,
    seed: int = 42,
    num_partitions: int = 8,
    maxiter: int = 500,
    tol: float = 1e-8,
    exact: bool = False,
):
    """Per-edge effective resistance / spanning edge centrality
    (reference centrality/SpanningEdgeCentrality; Spielman–Srivastava
    JL + CG, the reference's own approximation scheme).  ``exact=True``
    solves one indicator RHS per edge instead of k projections — the m
    RHS columns make it a small-graph oracle path (used by the pytest
    layer), not a scale path.  -> (Dataset(src, dst, w, er, sec),
    cg_iters) with sec = w * er = Pr[edge in a uniform random spanning
    tree]."""
    canon, g = _laplacian_graph(edges_ds, num_partitions)
    try:
        if exact:
            # column j is edge j's own indicator RHS: er_j = b_j^T x_j =
            # x_j(u_j) - x_j(v_j) — read the diagonal, no join needed
            import ray
            import ray.data

            pdf = canon.to_pandas()
            eu = pdf["src"].to_numpy(np.int64)
            ev = pdf["dst"].to_numpy(np.int64)
            kk = len(eu)
            _feed_b(canon, g, kk, seed, exact_cols=(eu, ev))
            iters, _resid = g.cg_solve(maxiter=maxiter, tol=tol)
            xu = np.zeros((kk, kk))
            xv = np.zeros((kk, kk))
            for t in range(g.P):
                sel = np.flatnonzero(eu % g.P == t)
                if len(sel):
                    xu[sel] = ray.get(g.actors[t].cg_x_at.remote(eu[sel]))
                sel = np.flatnonzero(ev % g.P == t)
                if len(sel):
                    xv[sel] = ray.get(g.actors[t].cg_x_at.remote(ev[sel]))
            er = np.diag(xu) - np.diag(xv)
            w = pdf["w"].to_numpy(np.float64)
            out = ray.data.from_arrow(
                pa.table(
                    {"src": eu, "dst": ev, "w": w, "er": er, "sec": w * er}
                )
            )
        else:
            _feed_b(canon, g, k, seed)
            iters, _resid = g.cg_solve(maxiter=maxiter, tol=tol)
            out = _z_join_er(canon, g, k, num_partitions)
        out = out.materialize()
    finally:
        g.shutdown()
    return out, iters


def effective_resistance(
    edges_ds,
    u: int,
    v: int,
    num_partitions: int = 8,
    maxiter: int = 1000,
    tol: float = 1e-10,
):
    """Exact effective resistance between one vertex pair: solve
    L x = e_u - e_v by CG, er = x(u) - x(v) = b^T x (exact up to the CG
    tolerance — this is the solver's precision oracle).  inf when u, v
    are in different components (detected by CG stagnation on a
    non-range RHS is unreliable, so we check via the residual)."""
    import ray

    canon, g = _laplacian_graph(edges_ds, num_partitions)
    try:
        _feed_b(
            canon, g, 1, 0,
            exact_cols=(np.array([u], np.int64), np.array([v], np.int64)),
        )
        iters, resid = g.cg_solve(maxiter=maxiter, tol=tol)
        xu = ray.get(g.actors[int(u) % g.P].cg_x_at.remote(
            np.array([u], np.int64)))[0, 0]
        xv = ray.get(g.actors[int(v) % g.P].cg_x_at.remote(
            np.array([v], np.int64)))[0, 0]
    finally:
        g.shutdown()
    if resid > 1e-4:  # inconsistent system: u, v not connected
        return float("inf"), iters
    return float(xu - xv), iters


def forest_centrality(
    edges_ds,
    k: int = 256,
    seed: int = 42,
    num_partitions: int = 8,
    maxiter: int = 500,
    tol: float = 1e-9,
):
    """Forest closeness centrality (reference centrality/ForestCentrality;
    Jin/van der Grinten/Meyerhenke-style forest-matrix measure):
    fc(v) = (n-1) / sum_u rho(u, v) with forest distance
    rho(u, v) = O_uu + O_vv - 2 O_uv, O = (I + L)^-1.

    Estimator (public): Hutchinson 1989 — diag(O) ~= mean_j q_j * x_j over
    k hashed +-1 probes with (I+L) x_j = q_j, plus ONE extra ones-column
    solve for the row sums s = O 1; then
    sum_u rho(u, v) = trace(O) + n*O_vv - 2 s_v.  All k+1 solves ride the
    batched CG kernel (shift=1 makes the operator SPD — no nullspace
    care needed); probes hash from vids so results are partition-invariant.
    Well-defined on disconnected graphs (the forest matrix always is).
    -> (Dataset(vid, fc), cg_iters)."""
    import ray.data

    from networkit_ray.state.csr import BSPGraph

    canon = canonicalize_undirected(edges_ds, weight="sum").materialize()
    sym = symmetrize(canon).materialize()
    g = BSPGraph(sym, None, num_partitions)
    try:
        import ray

        ray.get([a.cg_init.remote(k + 1, 1.0) for a in g.actors])
        ray.get([a.cg_set_probes.remote(seed, True) for a in g.actors])
        iters, _ = g.cg_solve(maxiter=maxiter, tol=tol)
        refs = [a.fc_table.remote(k) for a in g.actors]
        stats = ray.data.from_arrow_refs(refs).materialize()
    finally:
        g.shutdown()
    n = stats.count()
    trace = stats.sum("diag")

    def fc(t: pa.Table) -> pa.Table:
        d = t["diag"].combine_chunks().to_numpy(zero_copy_only=False)
        s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        denom = trace + n * d - 2.0 * s
        return pa.table(
            {"vid": t["vid"], "fc": (n - 1) / np.maximum(denom, 1e-300)}
        )

    return stats.map_batches(
        fc, batch_format="pyarrow", zero_copy_batch=True
    ), iters


def commute_time_distance(
    edges_ds, u: int, v: int, num_partitions: int = 8, **kw
):
    """CommuteTimeDistance (reference distance/CommuteTimeDistance):
    ctd(u, v) = vol(G) * er(u, v), vol = sum of weighted degrees = 2W."""
    canon = canonicalize_undirected(edges_ds, weight="sum").materialize()
    vol = 2.0 * (canon.sum("w") or 0.0)
    er, iters = effective_resistance(
        canon, u, v, num_partitions=num_partitions, **kw
    )
    return vol * er, iters
