"""Per-vertex triangle counts (pinned spec: SURVEY.md §2.1.4).

Canonical MapReduce triangle enumeration, degree-oriented to kill hub skew:
orient every canonical undirected edge from the endpoint with smaller
(degree, vid) to the larger — oriented out-degree is O(sqrt m) — then

    wedges  = oriented ⋈ oriented on src          (pivot, a, b) with a ≺ b
    closed  = wedges ⋈ oriented on (a, b)
    tri(v)  = Σ corners                            groupby(vid).sum

Matches the reference's exact per-node triangle machinery
(LocalClusteringCoefficient / TriangleEdgeScore family, BASELINE.json:6 —
operationalized by networkx.triangles, SURVEY.md §0).  Self-loops and
multi-edges are removed by canonicalization first (SURVEY.md §7.3.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from networkit_ray.stages.graphops import (
    canonicalize_undirected,
    symmetrize,
    out_degrees,
    vertices_from_edges,
)


def triangle_counts(
    edges_ds,
    vertices_ds=None,
    num_partitions: int = 8,
    broadcast_threshold: int = 2_000_000,
):
    """edges(src,dst,w) [+ vertices(vid)] -> Dataset(vid, triangles).

    The vertex-sized side tables (degrees, final counts) are attached via
    BROADCAST lookup (ray.put once, searchsorted per batch) when the vertex
    count is at most ``broadcast_threshold`` — the standard broadcast-hash-
    join cutover, saving three all-to-all exchanges; beyond the threshold
    the co-partitioned join path runs (the 100-TB shape).
    """
    # materialized: reused by three consumers (degree pipeline, orientation
    # join left side, symmetrize) — also keeps the two join inputs from
    # sharing an unmaterialized subtree, which Ray 2.49's hash-shuffle
    # handles unreliably under load (see compat.py)
    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)

    sym = symmetrize(canon)
    deg = (
        out_degrees(sym, weighted=False)
        .select_columns(["vid", "out_deg"])
        .materialize()  # right side of two joins / broadcast source
    )
    use_broadcast = deg.count() <= broadcast_threshold

    def orient(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        dsrc = t["deg_src"].combine_chunks().to_numpy(zero_copy_only=False)
        ddst = t["deg_dst"].combine_chunks().to_numpy(zero_copy_only=False)
        fwd = (dsrc < ddst) | ((dsrc == ddst) & (src < dst))
        lo = np.where(fwd, src, dst)
        hi = np.where(fwd, dst, src)
        dhi = np.where(fwd, ddst, dsrc)
        return pa.table({"src": lo, "dst": hi, "ddst": dhi})

    if use_broadcast:
        import ray

        dv, dd = [], []
        for b in deg.iter_batches(batch_format="pyarrow", batch_size=None):
            dv.append(b["vid"].to_numpy(zero_copy_only=False))
            dd.append(b["out_deg"].to_numpy(zero_copy_only=False))
        dv = np.concatenate(dv) if dv else np.empty(0, np.int64)
        dd = np.concatenate(dd) if dd else np.empty(0, np.int64)
        order = np.argsort(dv)
        ref = ray.put((dv[order], dd[order]))

        def orient_bcast(t: pa.Table, _ref=ref) -> pa.Table:
            vids, degs = ray.get(_ref)
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            dsrc = degs[np.searchsorted(vids, src)]
            ddst = degs[np.searchsorted(vids, dst)]
            return orient(
                pa.table(
                    {"src": src, "dst": dst, "deg_src": dsrc, "deg_dst": ddst}
                )
            )

        oriented = (
            canon.select_columns(["src", "dst"])
            .map_batches(orient_bcast, batch_format="pyarrow", zero_copy_batch=True)
            .materialize()
        )
    else:
        # NOTE: explicit map_batches projections (not rename_columns/select)
        # between chained joins — Ray 2.49 mis-plans a Project placed
        # directly on an unmaterialized join output (the rename silently
        # vanishes and pyarrow later sees duplicate column names)
        e = (
            canon.select_columns(["src", "dst"])
            .join(
                deg,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("vid",),
            )
            .map_batches(
                lambda t: pa.table(
                    {"src": t["src"], "dst": t["dst"], "deg_src": t["out_deg"]}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .join(
                deg,
                join_type="inner",
                num_partitions=num_partitions,
                on=("dst",),
                right_on=("vid",),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "src": t["src"],
                        "dst": t["dst"],
                        "deg_src": t["deg_src"],
                        "deg_dst": t["out_deg"],
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        oriented = e.map_batches(
            orient, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    wedges = oriented.join(
        oriented,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        left_suffix="_l",
        right_suffix="_r",
    )

    def mk_wedges(t: pa.Table) -> pa.Table:
        a = t["dst_l"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["dst_r"].combine_chunks().to_numpy(zero_copy_only=False)
        da = t["ddst_l"].combine_chunks().to_numpy(zero_copy_only=False)
        db = t["ddst_r"].combine_chunks().to_numpy(zero_copy_only=False)
        piv = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        # keep each unordered wedge once, endpoints ordered by (deg, vid) so
        # the closing edge (if any) appears exactly as (a -> b) in `oriented`
        keep = (da < db) | ((da == db) & (a < b))
        return pa.table({"pivot": piv[keep], "a": a[keep], "b": b[keep]})

    wedges = wedges.map_batches(
        mk_wedges, batch_format="pyarrow", zero_copy_batch=True
    )

    closed = wedges.join(
        oriented.select_columns(["src", "dst"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("a", "b"),
        right_on=("src", "dst"),
    )

    def corners(t: pa.Table) -> pa.Table:
        piv = t["pivot"].combine_chunks().to_numpy(zero_copy_only=False)
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False)
        vids = np.concatenate([piv, a, b])
        u, c = np.unique(vids, return_counts=True)  # pre-combine per batch
        return pa.table({"vid": u, "t": c.astype(np.int64)})

    counts = (
        closed.map_batches(corners, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vid", num_partitions=num_partitions)
        .aggregate(Sum("t", alias_name="t"))
        .materialize()
    )

    zeros = lambda t: pa.table(  # noqa: E731
        {"vid": t["vid"], "triangles": np.zeros(t.num_rows, dtype=np.int64)}
    )
    if counts.count() == 0:
        # triangle-free graph: a join against an entirely-empty side has no
        # schema to shuffle (Ray 2.49 crashes on it — compat.py); emit zeros
        return vertices_ds.select_columns(["vid"]).map_batches(
            zeros, batch_format="pyarrow", zero_copy_batch=True
        )

    if use_broadcast:
        import ray

        cv, ct = [], []
        for b in counts.iter_batches(batch_format="pyarrow", batch_size=None):
            cv.append(b["vid"].to_numpy(zero_copy_only=False))
            ct.append(b["t"].to_numpy(zero_copy_only=False))
        cv = np.concatenate(cv)
        ct = np.concatenate(ct)
        order = np.argsort(cv)
        cref = ray.put((cv[order], ct[order].astype(np.int64)))

        def attach(t: pa.Table, _ref=cref) -> pa.Table:
            vids, cnts = ray.get(_ref)
            v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(vids, v), len(vids) - 1)
            tri = np.where(vids[pos] == v, cnts[pos], 0)
            return pa.table({"vid": v, "triangles": tri})

        return vertices_ds.select_columns(["vid"]).map_batches(
            attach, batch_format="pyarrow", zero_copy_batch=True
        )

    return (
        vertices_ds.select_columns(["vid"])
        .join(counts, join_type="left_outer", num_partitions=num_partitions, on=("vid",))
        .map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "triangles": pc.fill_null(pc.cast(t["t"], pa.int64()), 0),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
