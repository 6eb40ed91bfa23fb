"""Power-iteration PageRank (pinned spec: SURVEY.md §2.1.1).

    pr'[u] = (1-d)/n + d * ( Σ_{v→u} w(v,u)·pr[v]/wdeg_out(v) + dangling/n )

Uniform teleport; dangling (wdeg_out == 0) mass redistributed uniformly each
iteration; convergence on the L1 residual.  Semantics match the reference
power iteration (networkit.centrality.PageRank per BASELINE.json:6,
operationalized by the pure-Python oracle in tests/ref_pagerank.py —
/root/reference is empty, SURVEY.md §0).

Two physical engines, result-equal (a test asserts so):

- ``engine="dataset"``: each iteration is the prescribed groupby-aggregate
  shuffle of (dst, contribution) messages expressed purely in the Dataset
  API — join scores onto the degree-normalized edge table, emit messages
  with a per-batch pre-combine, then groupby(dst).sum.  The streaming
  executor schedules and spills; the driver only sees two scalar aggregates
  per iteration (dangling mass, L1 residual).
- ``engine="actor"`` (state/csr.py): hash-partitioned CSR block partitions
  held in stateful actors (BASELINE.json:6) with static message routing —
  the scale/bench path, with per-partition lineage checkpoints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from networkit_ray.stages.graphops import out_degrees, vertices_from_edges


def pagerank(
    edges_ds,
    vertices_ds=None,
    damping: float = 0.85,
    tol: float = 1e-10,
    max_iter: int = 100,
    fixed_iters: int | None = None,
    num_partitions: int = 8,
    engine: str = "dataset",
    checkpoint=None,
    exchange: str = "auto",
):
    """edges(src,dst,w) [+ vertices(vid)] -> (Dataset(vid, score), iterations).

    ``fixed_iters`` runs exactly that many iterations (the SQL-oracle queries
    use this for determinism); otherwise stop when the L1 residual < ``tol``.
    ``exchange`` (actor engine only) picks the BSP message exchange:
    "grouped" (scale path, checkpointable) / "pairwise" / "auto".
    """
    if engine == "actor":
        from networkit_ray.state.csr import bsp_pagerank

        return bsp_pagerank(
            edges_ds,
            vertices_ds,
            damping=damping,
            tol=tol,
            max_iter=max_iter,
            fixed_iters=fixed_iters,
            num_partitions=num_partitions,
            checkpoint=checkpoint,
            exchange=exchange,
        )
    return _pagerank_dataset(
        edges_ds, vertices_ds, damping, tol, max_iter, fixed_iters, num_partitions
    )


def _pagerank_dataset(
    edges_ds, vertices_ds, damping, tol, max_iter, fixed_iters, num_partitions
):
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    vertices_ds = vertices_ds.materialize()
    if vertices_ds.count() == 0:
        import ray.data

        empty = pa.table(
            {
                "vid": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
        return ray.data.from_arrow(empty), 0

    # static: per-vertex weighted out-degree (0 for dangling/sink vertices)
    deg = out_degrees(edges_ds).select_columns(["vid", "w_out_deg"])
    verts = (
        vertices_ds.select_columns(["vid"])
        .join(deg, join_type="left_outer", num_partitions=num_partitions, on=("vid",))
        .map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "wdeg": pc.fill_null(pc.cast(t["w_out_deg"], pa.float64()), 0.0),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    n = verts.count()
    if n == 0:
        return verts.select_columns(["vid"]), 0

    # static: edges normalized by source out-weight (reused every iteration
    # -> materialize; at scale this is the big pinned table, spilled by the
    # object store as needed)
    edges_norm = (
        edges_ds.join(
            verts,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "frac": pc.divide(pc.cast(t["w"], pa.float64()), t["wdeg"]),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    if edges_norm.count() == 0:
        # edgeless graph: uniform scores are the fixpoint immediately (and
        # a join against an entirely-empty side crashes Ray 2.49 shuffles)
        init = 1.0 / n
        return (
            verts.map_batches(
                lambda t: pa.table(
                    {"vid": t["vid"], "score": pa.array(np.full(t.num_rows, init))}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            1,
        )

    init = 1.0 / n
    scores = verts.map_batches(
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "score": pa.array(np.full(t.num_rows, init)),
                "wdeg": t["wdeg"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def _contrib(t: pa.Table) -> pa.Table:
        out = pa.table({"vid": t["dst"], "c": pc.multiply(t["frac"], t["score"])})
        # pre-combine before the shuffle
        return out.group_by("vid").aggregate([("c", "sum")]).rename_columns(
            ["vid", "c"]
        )

    def _apply(t: pa.Table, base: float, d: float) -> pa.Table:
        new = pc.add(
            pc.multiply(pc.fill_null(pc.cast(t["c"], pa.float64()), 0.0), d), base
        )
        dangling = pc.if_else(pc.equal(t["wdeg"], 0.0), new, 0.0)
        return pa.table(
            {
                "vid": t["vid"],
                "score": new,
                "wdeg": t["wdeg"],
                "r": pc.abs(pc.subtract(new, t["score"])),
                "dang": dangling,
            }
        )

    # initial dangling mass (one tiny aggregate; thereafter folded into the
    # per-iteration score materialization — 2 Ray jobs per iteration total)
    dangling = (
        scores.map_batches(
            lambda t: t.filter(pc.equal(t["wdeg"], 0.0)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("score", ignore_nulls=True)
        or 0.0
    )

    iters_target = fixed_iters if fixed_iters is not None else max_iter
    it = 0
    for it in range(1, iters_target + 1):
        contribs = (
            edges_norm.join(
                scores.select_columns(["vid", "score"]),
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("vid",),
            )
            .map_batches(_contrib, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Sum("c", alias_name="c"))
        )

        base = (1.0 - damping) / n + damping * dangling / n
        new_scores = (
            scores.select_columns(["vid", "score", "wdeg"])
            .join(
                contribs,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("vid",),
            )
            .map_batches(
                lambda t, base=base, d=damping: _apply(t, base, d),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )

        sums = new_scores.sum(["r", "dang"], ignore_nulls=True)
        resid, dangling = sums["sum(r)"], sums["sum(dang)"]
        scores = new_scores
        if fixed_iters is None and resid < tol:
            break

    return scores.select_columns(["vid", "score"]), it
