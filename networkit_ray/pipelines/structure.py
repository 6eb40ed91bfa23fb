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


def simmelian_overlap_scores(edges_ds, max_rank: int = 10, num_partitions: int = 8):
    """Simmelian backbone overlap (reference
    sparsification/SimmelianOverlapScore, Nick et al. 2013, non-parametric
    top-k variant): each vertex ranks its neighbors by tie strength
    (edge embeddedness = common-neighbor count, ties -> smaller vid);
    overlap(u, v) = |Top_maxRank(u) ∩ Top_maxRank(v)|.  Deterministic
    tie-break makes the output SQL-window mirrorable.  Shapes: one wedge
    self-join (shared _edge_cn_with_degrees core), one rank self-join per
    direction, one membership join pair.  -> Dataset(src, dst, overlap)."""
    from ray.data.aggregate import Sum

    cn = (
        _edge_cn_with_degrees(edges_ds, num_partitions)
        .select_columns(["src", "dst", "cn"])
        .materialize()
    )
    # directed tie-strength view (u, v, cn) both ways
    dirv = cn.map_batches(
        lambda t: pa.concat_tables(
            [
                pa.table({"u": t["src"], "v": t["dst"], "cnv": t["cn"]}),
                pa.table({"u": t["dst"], "v": t["src"], "cnv": t["cn"]}),
            ]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    pairs = dirv.join(
        dirv,
        join_type="inner",
        num_partitions=num_partitions,
        on=("u",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def above(t: pa.Table) -> pa.Table:
        ca = t["cnv_a"].combine_chunks().to_numpy(zero_copy_only=False)
        cb = t["cnv_b"].combine_chunks().to_numpy(zero_copy_only=False)
        va = t["v_a"].combine_chunks().to_numpy(zero_copy_only=False)
        vb = t["v_b"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = (cb > ca) | ((cb == ca) & (vb < va))
        out = pa.table(
            {"u": t["u"], "v": t["v_a"], "above": pa.array(hi.astype(np.int64))}
        )
        return (
            out.group_by(["u", "v"]).aggregate([("above", "sum")])
            .rename_columns(["u", "v", "above"])
        )

    topk = (
        pairs.map_batches(above, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"], num_partitions=num_partitions)
        .aggregate(Sum("above", alias_name="above"))
        .map_batches(
            lambda t: pa.table({"u": t["u"], "x": t["v"]}).filter(
                pc.less(t["above"], max_rank).combine_chunks()
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    # overlap per canonical edge: x in Top(u) AND x in Top(v)
    j1 = _project(
        cn.select_columns(["src", "dst"]).join(
            topk, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("u",),
        ),
        {"src": "src", "dst": "dst", "x": "x"},
    )
    hits = j1.join(
        topk, join_type="inner", num_partitions=num_partitions,
        on=("dst", "x"), right_on=("u", "x"),
    )

    def cnt(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "overlap": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return (
            out.group_by(["src", "dst"]).aggregate([("overlap", "sum")])
            .rename_columns(["src", "dst", "overlap"])
        )

    ov = (
        hits.map_batches(cnt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"], num_partitions=num_partitions)
        .aggregate(Sum("overlap", alias_name="overlap"))
        .materialize()
    )
    if ov.count() == 0:  # empty join side guard (compat.py)
        return cn.map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "overlap": pa.array(np.zeros(t.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return _project(
        cn.select_columns(["src", "dst"]).join(
            ov, join_type="left_outer", num_partitions=num_partitions,
            on=("src", "dst"),
        ),
        {"src": "src", "dst": "dst", "overlap": "overlap"},
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "overlap": pc.fill_null(pc.cast(t["overlap"], pa.int64()), 0),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def local_similarity_scores(edges_ds, num_partitions: int = 8):
    """Local Similarity sparsification score (reference
    sparsification/LocalSimilarityScore, Satuluri et al.): rank v among
    u's neighbors by edge Jaccard similarity (DESC, ties -> smaller vid);
    directed score 1 - ln(rank)/ln(d_u) (1.0 when d_u <= 1 or rank == 1);
    edge score = max over both directions.  Identical shape to
    local_degree_scores with the ordering key swapped to Jaccard.
    -> Dataset(src, dst, score)."""
    from ray.data.aggregate import Max, Sum

    j2 = _edge_cn_with_degrees(edges_ds, num_partitions)

    def jac(t: pa.Table) -> pa.Table:
        cnv = t["cn"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        du = t["du"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        dv = t["dv"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "jac": cnv / np.maximum(du + dv - cnv, 1.0),
                "du": t["du"],
                "dv": t["dv"],
            }
        )

    tri = j2.map_batches(jac, batch_format="pyarrow", zero_copy_batch=True).materialize()
    dirv = tri.map_batches(
        lambda t: pa.concat_tables(
            [
                pa.table({"u": t["src"], "v": t["dst"], "jc": t["jac"], "d": t["du"]}),
                pa.table({"u": t["dst"], "v": t["src"], "jc": t["jac"], "d": t["dv"]}),
            ]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    pairs = dirv.join(
        dirv,
        join_type="inner",
        num_partitions=num_partitions,
        on=("u",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def above(t: pa.Table) -> pa.Table:
        ja = t["jc_a"].combine_chunks().to_numpy(zero_copy_only=False)
        jb = t["jc_b"].combine_chunks().to_numpy(zero_copy_only=False)
        va = t["v_a"].combine_chunks().to_numpy(zero_copy_only=False)
        vb = t["v_b"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = (jb > ja) | ((jb == ja) & (vb < va))
        out = pa.table(
            {
                "u": t["u"],
                "v": t["v_a"],
                "d": t["d_a"],
                "above": pa.array(hi.astype(np.int64)),
            }
        )
        return (
            out.group_by(["u", "v", "d"]).aggregate([("above", "sum")])
            .rename_columns(["u", "v", "d", "above"])
        )

    ranks = (
        pairs.map_batches(above, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v", "d"], num_partitions=num_partitions)
        .aggregate(Sum("above", alias_name="above"))
    )

    def directed_score(t: pa.Table) -> pa.Table:
        rank = (
            t["above"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
            + 1.0
        )
        d = t["d"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = 1.0 - np.log(rank) / np.log(np.maximum(d, 2.0))
        s = np.where((d <= 1.0) | (rank <= 1.0), 1.0, s)
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        out = pa.table(
            {"src": np.minimum(u, v), "dst": np.maximum(u, v), "score": s}
        )
        return (
            out.group_by(["src", "dst"]).aggregate([("score", "max")])
            .rename_columns(["src", "dst", "score"])
        )

    return (
        ranks.map_batches(directed_score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"], num_partitions=num_partitions)
        .aggregate(Max("score", alias_name="score"))
    )


def multiscale_scores(edges_ds, num_partitions: int = 8):
    """Multiscale backbone significance (reference
    sparsification/MultiscaleScore; Serrano et al. "disparity filter"):
    for the directed view (u -> v) with normalized weight
    p = w_uv / strength(u), the score is 1 - (1 - p)^(d_u - 1) (the
    probability a uniform null model would produce a weight this large);
    edge score = max over both directions (d_u == 1 -> 1.0).
    One strength/degree join per direction.  -> Dataset(src, dst, score)."""
    from ray.data.aggregate import Max

    canon = canonicalize_undirected(edges_ds, weight="sum").materialize()
    sym = symmetrize(canon).materialize()
    sd = (
        out_degrees(sym, weighted=True)
        .select_columns(["vid", "out_deg", "w_out_deg"])
        .materialize()
    )
    j = _project(
        sym.join(
            sd, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("vid",),
        ),
        {"src": "src", "dst": "dst", "w": "w", "d": "out_deg", "s": "w_out_deg"},
    )

    def score(t: pa.Table) -> pa.Table:
        w = t["w"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        d = t["d"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        s = t["s"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        p = w / np.maximum(s, 1e-300)
        sc = 1.0 - np.power(np.clip(1.0 - p, 0.0, 1.0), np.maximum(d - 1.0, 0.0))
        sc = np.where(d <= 1.0, 1.0, sc)
        u = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        out = pa.table(
            {"src": np.minimum(u, v), "dst": np.maximum(u, v), "score": sc}
        )
        return (
            out.group_by(["src", "dst"]).aggregate([("score", "max")])
            .rename_columns(["src", "dst", "score"])
        )

    return (
        j.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"], num_partitions=num_partitions)
        .aggregate(Max("score", alias_name="score"))
    )


def forest_fire_scores(
    edges_ds,
    burn_prob: float = 0.4,
    rounds: int = 3,
    waves: int = 4,
    seed: int = 42,
    num_partitions: int = 8,
):
    """Forest-fire sparsification score (reference
    sparsification/ForestFireScore): repeated burn processes — every
    vertex ignites once per ROUND, fires spread ``waves`` hops, each
    directed edge (u -> v) burns with probability ``burn_prob`` per
    visit; the score is the burn frequency normalized by rounds.  Burn
    draws are deterministic per-(round, wave, edge) hashes (counter-based,
    partition-invariant), so the output is reproducible — the VALUES are
    algorithm-defined (pytest oracles only, like minhash).  Each wave is
    one frontier-edge co-partitioned join.  -> Dataset(src, dst, score)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    sym = symmetrize(canon).select_columns(["src", "dst"]).materialize()
    from networkit_ray.stages.graphops import vertices_from_edges

    verts = vertices_from_edges(canon).materialize()
    burn_parts = []
    for r in range(rounds):
        frontier = verts.map_batches(
            lambda t: pa.table({"fv": t["vid"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        for wv in range(waves):
            salt = (seed * 1_000_003 + r) * 97 + wv
            cand = frontier.join(
                sym, join_type="inner", num_partitions=num_partitions,
                on=("fv",), right_on=("src",),
            )

            def burn(t: pa.Table, _salt=salt) -> pa.Table:
                u = t["fv"].combine_chunks().to_numpy(zero_copy_only=False)
                v = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
                h = pd.util.hash_array(
                    (u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                    ^ (v.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
                    ^ np.uint64(_salt)
                )
                lit = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
                keep = lit < burn_prob
                return pa.table({"bu": u[keep], "bv": v[keep]})

            burned = (
                cand.map_batches(burn, batch_format="pyarrow", zero_copy_batch=True)
                .groupby(["bu", "bv"], num_partitions=num_partitions)
                .count()
                .select_columns(["bu", "bv"])
                .materialize()
            )
            burn_parts.append(burned)
            if wv + 1 < waves:
                if burned.count() == 0:
                    break
                frontier = (
                    burned.map_batches(
                        lambda t: pa.table({"fv": t["bv"]}),
                        batch_format="pyarrow",
                        zero_copy_batch=True,
                    )
                    .groupby("fv", num_partitions=num_partitions)
                    .count()
                    .select_columns(["fv"])
                    .materialize()
                )
    if not burn_parts:
        return canon.map_batches(
            lambda t: pa.table(
                {"src": t["src"], "dst": t["dst"], "score": np.zeros(t.num_rows)}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    allb = burn_parts[0]
    for p in burn_parts[1:]:
        allb = allb.union(p)
    freq = (
        allb.map_batches(
            lambda t: pa.table(
                {
                    "src": pc.min_element_wise(t["bu"], t["bv"]),
                    "dst": pc.max_element_wise(t["bu"], t["bv"]),
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["src", "dst"], num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    return _project(
        canon.select_columns(["src", "dst"]).join(
            freq, join_type="left_outer", num_partitions=num_partitions,
            on=("src", "dst"),
        ),
        {"src": "src", "dst": "dst", "n": "n"},
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "score": pc.divide(
                    pc.cast(pc.fill_null(t["n"], 0), pa.float64()),
                    float(rounds),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def algebraic_distance_scores(
    edges_ds,
    systems: int = 5,
    iterations: int = 7,
    omega: float = 0.5,
    norm: float = 2.0,
    seed: int = 42,
    num_partitions: int = 8,
):
    """AlgebraicDistance (reference distance/AlgebraicDistance; Chen &
    Safro 2011): ``systems`` independent Jacobi smoothing sweeps over
    deterministic hash-uniform init vectors,
    x_{t+1}(v) = (1-omega) * x_t(v) + omega * mean_{u in N(v)} x_t(u);
    the per-edge score is the L_norm distance of the endpoint coordinate
    vectors after ``iterations`` sweeps (norm=inf -> max component).
    Structurally close vertices converge to similar coordinates, so LOW
    scores mark intra-cluster edges.

    Ray-Data shape: the K coordinate systems travel as K flat float64
    columns on one vertex table (Acero joins reject nested payloads —
    compat.py), so every sweep is ONE neighbor join + ONE pre-combined
    grouped mean + ONE stale-state join, all K systems simultaneously.
    Deterministic init (pd.util.hash_array counters) -> bit-reproducible
    across partitionings.  -> Dataset(src, dst, score) on canonical
    undirected edges."""
    import pandas as pd

    from ray.data.aggregate import Mean

    from networkit_ray.sources.generators import _uniform

    K = int(systems)
    xcols = [f"x{k}" for k in range(K)]
    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    sym = symmetrize(canon).select_columns(["src", "dst"]).materialize()
    verts = vertices_from_edges(canon)

    def init(t: pa.Table) -> pa.Table:
        v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
        cols = {"vid": v}
        for k in range(K):
            cols[xcols[k]] = _uniform(v, 20 + k, seed)
        return pa.table(cols)

    coords = verts.map_batches(
        init, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    for _ in range(int(iterations)):
        nb = _project(
            sym.join(
                coords, join_type="inner", num_partitions=num_partitions,
                on=("dst",), right_on=("vid",),
            ),
            {"vid": "src", **{c: c for c in xcols}},
        )

        def pre(t: pa.Table) -> pa.Table:
            g = t.group_by("vid").aggregate(
                [(c, "sum") for c in xcols] + [("vid", "count")]
            )
            names = ["vid"] + [f"s_{c}" for c in xcols] + ["cnt"]
            return g.rename_columns(names)

        # pre-combine sums per batch, then a grouped global mean via
        # sum-of-sums / sum-of-counts
        sums = (
            nb.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(
                *[Sum(f"s_{c}", alias_name=f"s_{c}") for c in xcols],
                Sum("cnt", alias_name="cnt"),
            )
        )
        j = coords.join(
            sums, join_type="inner", num_partitions=num_partitions, on=("vid",)
        )
        om = float(omega)

        def step(t: pa.Table) -> pa.Table:
            cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
            cols = {"vid": t["vid"]}
            for c in xcols:
                old = t[c].combine_chunks().to_numpy(zero_copy_only=False)
                s = t[f"s_{c}"].combine_chunks().to_numpy(zero_copy_only=False)
                cols[c] = (1.0 - om) * old + om * s / np.maximum(cnt, 1)
            return pa.table(cols)

        coords = j.map_batches(
            step, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    ju = _project(
        canon.select_columns(["src", "dst"]).join(
            coords, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("vid",),
        ),
        {"src": "src", "dst": "dst", **{f"a_{c}": c for c in xcols}},
    )
    jv = _project(
        ju.join(
            coords, join_type="inner", num_partitions=num_partitions,
            on=("dst",), right_on=("vid",),
        ),
        {
            "src": "src", "dst": "dst",
            **{f"a_{c}": f"a_{c}" for c in xcols},
            **{f"b_{c}": c for c in xcols},
        },
    )
    p = float(norm)

    def dist(t: pa.Table) -> pa.Table:
        diffs = np.stack(
            [
                np.abs(
                    t[f"a_{c}"].combine_chunks().to_numpy(zero_copy_only=False)
                    - t[f"b_{c}"].combine_chunks().to_numpy(zero_copy_only=False)
                )
                for c in xcols
            ]
        )
        if np.isinf(p):
            score = diffs.max(axis=0)
        else:
            score = np.power(np.power(diffs, p).sum(axis=0), 1.0 / p)
        return pa.table({"src": t["src"], "dst": t["dst"], "score": score})

    return jv.map_batches(dist, batch_format="pyarrow", zero_copy_batch=True)


def random_edge_scores(edges_ds, seed: int = 42):
    """RandomEdgeScore (reference sparsification/RandomEdgeScore): the
    uniform-random sparsifier baseline — a deterministic hash-uniform
    score per canonical edge (counter-style, so partitioning-invariant
    and reproducible, unlike a stateful RNG).  -> Dataset(src, dst, score)."""
    from networkit_ray.sources.generators import _uniform

    canon = canonicalize_undirected(edges_ds, weight="one")

    def score(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        key = s * np.int64(1_000_003) + d * np.int64(7919)
        return pa.table(
            {"src": s, "dst": d, "score": _uniform(key, 40, seed)}
        )

    return canon.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def random_node_edge_scores(edges_ds, seed: int = 42):
    """RandomNodeEdgeScore (reference sparsification/RandomNodeEdgeScore):
    per-NODE uniform randomness combined per edge (max of the endpoint
    draws — edges at "kept" nodes rank high together, the local-sampling
    baseline).  Deterministic hash draws.  -> Dataset(src, dst, score)."""
    from networkit_ray.sources.generators import _uniform

    canon = canonicalize_undirected(edges_ds, weight="one")

    def score(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        us = _uniform(s, 41, seed)
        ud = _uniform(d, 41, seed)
        return pa.table({"src": s, "dst": d, "score": np.maximum(us, ud)})

    return canon.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
