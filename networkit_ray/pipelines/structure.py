"""Graph-structure operators (SURVEY.md §2.3 catalog additions): k-core
membership, degree assortativity, triangle-based edge sparsification scores
with a global threshold filter.

Counterparts in the reference catalog: centrality/CoreDecomposition,
correlation/Assortativity, sparsification/{TriangleEdgeScore,
GlobalThresholdFilter} (SURVEY.md §2.3; /root/reference is empty — pinned
against networkx + DuckDB oracles instead, SURVEY.md §0).

Scale shapes:
- k-core: iterative peel; each round is two co-partitioned joins (edges x
  survivor set) + one pre-combined degree count.  Rounds are bounded by
  ``max_rounds`` (matching the fixed-depth SQL oracle) with early exit at
  the fixpoint.
- assortativity: one endpoint-degree join pass + a 6-scalar Pearson
  partial-sum combiner per batch; only scalars reach the driver.
- edge triangle scores: the linkpred wedge self-join restricted to actual
  edges — same hub caveat as linkpred (wedge volume is sum(deg²); cap hubs
  upstream for power-law graphs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from networkit_ray.stages.graphops import (
    canonicalize_undirected,
    out_degrees,
    symmetrize,
    vertices_from_edges,
)


def _project(ds, cols: dict):
    """Explicit projection after a join (Ray 2.49 mis-plans Project ops on
    unmaterialized join outputs — compat.py)."""
    return ds.map_batches(
        lambda t: pa.table({name: t[src] for name, src in cols.items()}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def kcore_membership(
    edges_ds,
    vertices_ds=None,
    k: int = 3,
    max_rounds: int | None = None,
    num_partitions: int = 8,
):
    """-> Dataset(vid): the vertices of the k-core (maximal subgraph with
    min degree >= k), computed by iterative peeling to the FIXPOINT — the
    reference CoreDecomposition is exact, and stopping early on deep-peel
    graphs (a chain needs O(n) rounds) returns a strict superset.  If
    ``max_rounds`` is given and exhausted before the fixpoint, raises
    RuntimeError (mirroring strongly_connected_components' pivot budget)
    rather than silently returning the superset."""
    canon = canonicalize_undirected(edges_ds, weight="one")
    sym = symmetrize(canon).select_columns(["src", "dst"]).materialize()
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    surv = vertices_ds.select_columns(["vid"]).materialize()
    n_surv = surv.count()
    at_fixpoint = False
    rounds_done = 0
    while not at_fixpoint and (max_rounds is None or rounds_done < max_rounds):
        rounds_done += 1
        if n_surv == 0:
            at_fixpoint = True
            break
        e1 = _project(
            sym.join(
                surv,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("vid",),
            ),
            {"src": "src", "dst": "dst"},
        )
        e2 = _project(
            e1.join(
                surv,
                join_type="inner",
                num_partitions=num_partitions,
                on=("dst",),
                right_on=("vid",),
            ),
            {"src": "src"},
        )

        def pre(t: pa.Table) -> pa.Table:
            return (
                t.group_by("src").aggregate([([], "count_all")])
                .rename_columns(["vid", "d"])
            )

        deg = (
            e2.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Sum("d", alias_name="d"))
        )
        new_surv = (
            deg.map_batches(
                lambda t: t.filter(pc.greater_equal(t["d"], k)).select(["vid"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
        n_new = new_surv.count()
        if n_new == n_surv:
            at_fixpoint = True
            break
        surv, n_surv = new_surv, n_new
    if not at_fixpoint and n_surv > 0:
        raise RuntimeError(
            f"kcore_membership: peel did not reach the fixpoint within "
            f"max_rounds={max_rounds} ({n_surv} survivors, still shrinking); "
            f"the result would be a superset of the true {k}-core"
        )
    if n_surv == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({"vid": pa.array([], pa.int64())}))
    return surv


def degree_assortativity(edges_ds, num_partitions: int = 8):
    """-> Dataset(1 row: assortativity): Pearson correlation of endpoint
    degrees over the symmetrized undirected edge list (Newman 2002; the
    reference's correlation/Assortativity on degree).  Matches
    networkx.degree_assortativity_coefficient."""
    canon = canonicalize_undirected(edges_ds, weight="one")
    sym = symmetrize(canon).materialize()
    deg = (
        out_degrees(sym, weighted=False)
        .select_columns(["vid", "out_deg"])
        .materialize()
    )
    j1 = _project(
        sym.join(
            deg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        ),
        {"dst": "dst", "dx": "out_deg"},
    )
    j2 = _project(
        j1.join(
            deg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vid",),
        ),
        {"dx": "dx", "dy": "out_deg"},
    )

    def partial(t: pa.Table) -> pa.Table:
        x = t["dx"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        y = t["dy"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([float(len(x))]),
                "sx": pa.array([x.sum()]),
                "sy": pa.array([y.sum()]),
                "sxy": pa.array([(x * y).sum()]),
                "sxx": pa.array([(x * x).sum()]),
                "syy": pa.array([(y * y).sum()]),
            }
        )

    parts = j2.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # one 6-scalar row per batch
    n = sum(r["n"] for r in parts)
    sx = sum(r["sx"] for r in parts)
    sy = sum(r["sy"] for r in parts)
    sxy = sum(r["sxy"] for r in parts)
    sxx = sum(r["sxx"] for r in parts)
    syy = sum(r["syy"] for r in parts)
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    r = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else 0.0
    import ray.data

    return ray.data.from_arrow(
        pa.table({"assortativity": pa.array([float(r)], pa.float64())})
    )


def _edge_cn_with_degrees(edges_ds, num_partitions: int = 8):
    """Shared core of the similarity-based edge scores: per canonical edge
    (src < dst) the common-neighbor count and both endpoint degrees ->
    Dataset(src, dst, cn, du, dv).  Wedge self-join shape shared with
    linkpred (same hub caveat: wedge volume is sum over pivots of deg²)."""
    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    sym = symmetrize(canon).materialize()
    deg = (
        out_degrees(sym, weighted=False)
        .select_columns(["vid", "out_deg"])
        .materialize()
    )

    # wedge pairs through a shared pivot -> candidate (u < v) with counts
    wed = sym.join(
        sym,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def mk(t: pa.Table) -> pa.Table:
        u = t["dst_a"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["dst_b"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = u < v
        out = pa.table({"src": u[keep], "dst": v[keep]})
        return (
            out.group_by(["src", "dst"]).aggregate([([], "count_all")])
            .rename_columns(["src", "dst", "cn"])
        )

    cn = (
        wed.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"], num_partitions=num_partitions)
        .aggregate(Sum("cn", alias_name="cn"))
    )

    # restrict to actual edges
    scored = _project(
        canon.select_columns(["src", "dst"]).join(
            cn,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("src", "dst"),
        ),
        {"src": "src", "dst": "dst", "cn": "cn"},
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "cn": pc.fill_null(pc.cast(t["cn"], pa.int64()), 0),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    j1 = _project(
        scored.join(
            deg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        ),
        {"src": "src", "dst": "dst", "cn": "cn", "du": "out_deg"},
    )
    j2 = _project(
        j1.join(
            deg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vid",),
        ),
        {"src": "src", "dst": "dst", "cn": "cn", "du": "du", "dv": "out_deg"},
    )
    return j2


def edge_triangle_scores(edges_ds, num_partitions: int = 8):
    """-> Dataset(src, dst, cn, score): per-edge common-neighbor (triangle)
    count and neighborhood-Jaccard similarity score
    score = cn / (deg_u + deg_v - cn)  — the reference's
    sparsification edge-score family (TriangleEdgeScore feeding similarity-
    based filters)."""
    j2 = _edge_cn_with_degrees(edges_ds, num_partitions)

    def score(t: pa.Table) -> pa.Table:
        cnv = t["cn"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        du = t["du"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        dv = t["dv"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        denom = np.maximum(du + dv - cnv, 1.0)
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "cn": t["cn"],
                "score": cnv / denom,
            }
        )

    return j2.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def scan_similarity_scores(edges_ds, num_partitions: int = 8):
    """SCAN structural similarity per edge (reference
    sparsification/SCANStructuralSimilarityScore):
        σ(u,v) = |Γ(u) ∩ Γ(v)| / sqrt(|Γ(u)|·|Γ(v)|)
    with CLOSED neighborhoods Γ(x) = N(x) ∪ {x}, so for an existing edge
    |Γ(u) ∩ Γ(v)| = cn(u,v) + 2.  Same wedge-join core as
    edge_triangle_scores.  -> Dataset(src, dst, score)."""
    j2 = _edge_cn_with_degrees(edges_ds, num_partitions)

    def score(t: pa.Table) -> pa.Table:
        cnv = t["cn"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        du = t["du"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        dv = t["dv"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "score": (cnv + 2.0) / np.sqrt((du + 1.0) * (dv + 1.0)),
            }
        )

    return j2.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def local_degree_scores(edges_ds, num_partitions: int = 8):
    """Local Degree sparsification score (reference
    sparsification/LocalDegreeScore, Lindner et al.): for directed view
    (u→v), rank v among u's neighbors ordered by (degree DESC, vid ASC);
    the directed score is 1 − ln(rank)/ln(d_u) (1.0 when d_u ≤ 1 or
    rank == 1); the edge score is the max over both directions — edges
    leading to locally-high-degree neighbors survive a threshold filter.

    Rank is computed as 1 + |{w ∈ N(u) ranked above v}| via a neighbor
    self-join on u with per-batch pre-combine (wedge volume Σ d_u² — the
    linkpred hub caveat applies; the deterministic (deg, vid) tie-break
    makes the output SQL-window mirrorable).
    -> Dataset(src, dst, score) over canonical (src < dst) edges."""
    from ray.data.aggregate import Sum

    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    sym_w = symmetrize(canon).materialize()
    deg = (
        out_degrees(sym_w, weighted=False)
        .select_columns(["vid", "out_deg"])
        .materialize()
    )
    sym = sym_w.select_columns(["src", "dst"])
    adj = _project(
        sym.join(
            deg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vid",),
        ),
        {"src": "src", "dst": "dst", "deg_dst": "out_deg"},
    ).materialize()

    pairs = adj.join(
        adj,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def above(t: pa.Table) -> pa.Table:
        # count neighbors b ranked above a in N(src): deg desc, vid asc
        da = t["deg_dst_a"].combine_chunks().to_numpy(zero_copy_only=False)
        db = t["deg_dst_b"].combine_chunks().to_numpy(zero_copy_only=False)
        va = t["dst_a"].combine_chunks().to_numpy(zero_copy_only=False)
        vb = t["dst_b"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = (db > da) | ((db == da) & (vb < va))
        out = pa.table(
            {
                "src": t["src"],
                "dst": t["dst_a"],
                "above": pa.array(hi.astype(np.int64)),
            }
        )
        return (
            out.group_by(["src", "dst"])
            .aggregate([("above", "sum")])
            .rename_columns(["src", "dst", "above"])
        )

    ranks = (
        pairs.map_batches(above, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"], num_partitions=num_partitions)
        .aggregate(Sum("above", alias_name="above"))
    )

    scored = _project(
        ranks.join(
            deg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        ),
        {"src": "src", "dst": "dst", "above": "above", "d_src": "out_deg"},
    )

    def directed_score(t: pa.Table) -> pa.Table:
        rank = (
            t["above"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
            + 1.0
        )
        d = t["d_src"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = 1.0 - np.log(rank) / np.log(np.maximum(d, 2.0))
        s = np.where((d <= 1.0) | (rank <= 1.0), 1.0, s)
        # canonicalize for the undirected max-combine
        u = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "src": np.minimum(u, v),
                "dst": np.maximum(u, v),
                "score": s,
            }
        )
        return (
            out.group_by(["src", "dst"])
            .aggregate([("score", "max")])
            .rename_columns(["src", "dst", "score"])
        )

    from ray.data.aggregate import Max

    return (
        scored.map_batches(directed_score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"], num_partitions=num_partitions)
        .aggregate(Max("score", alias_name="score"))
    )


def global_threshold_filter(scored_ds, col: str = "score", threshold: float = 0.1):
    """Keep rows with col >= threshold — the reference's
    GlobalThresholdFilter applied to any per-edge score column."""
    return scored_ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t[col], threshold)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
