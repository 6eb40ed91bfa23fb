"""Centrality family beyond PageRank (SURVEY.md §2.3 `centrality/` module):
degree centrality, Katz centrality, local clustering coefficient.

All reuse existing skeletons: degree = the degrees aggregate; Katz = the
PageRank SpMV-iteration skeleton with a constant teleport (x' = α·Aᵀx + β,
fixed iterations — matching the reference's KatzCentrality power iteration);
LCC composes per-vertex triangle counts with degrees
(lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), the reference's
LocalClusteringCoefficient definition); Laplacian centrality and sfigality
(reference centrality/LaplacianCentrality, centrality/Sfigality) are one
neighbor-degree join each — closed forms over degrees, no eigensolve needed
for the unweighted Laplacian energy drop.
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


def degree_centrality(edges_ds, vertices_ds=None, num_partitions: int = 8):
    """Undirected degree per vertex -> (vid, degree). The reference's
    DegreeCentrality (normalize downstream if needed)."""
    canon = canonicalize_undirected(edges_ds, weight="one")
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    deg = (
        out_degrees(symmetrize(canon), weighted=False)
        .select_columns(["vid", "out_deg"])
        .materialize()
    )
    return (
        vertices_ds.select_columns(["vid"])
        .join(deg, join_type="left_outer", num_partitions=num_partitions, on=("vid",))
        .map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "degree": pc.fill_null(pc.cast(t["out_deg"], pa.int64()), 0),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def katz_centrality(
    edges_ds,
    vertices_ds=None,
    alpha: float = 0.05,
    beta: float = 1.0,
    iters: int = 10,
    num_partitions: int = 8,
):
    """x_{k+1}[u] = β + α · Σ_{v→u} w(v,u)·x_k[v], x_0 = β. Fixed-iteration
    (deterministic; the SQL oracle mirrors it). Directed semantics over the
    raw edge table — pass a symmetrized table for the undirected variant."""
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    verts = vertices_ds.select_columns(["vid"]).materialize()
    edges = edges_ds.select_columns(["src", "dst", "w"]).materialize()

    scores = verts.map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "x": pa.array(np.full(t.num_rows, beta))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def _contrib(t: pa.Table) -> pa.Table:
        out = pa.table({"vid": t["dst"], "c": pc.multiply(pc.cast(t["w"], pa.float64()), t["x"])})
        return out.group_by("vid").aggregate([("c", "sum")]).rename_columns(["vid", "c"])

    for _ in range(iters):
        contribs = (
            edges.join(
                scores,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("vid",),
            )
            .map_batches(_contrib, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Sum("c", alias_name="c"))
        )
        scores = (
            verts.join(
                contribs,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("vid",),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "vid": t["vid"],
                        "x": pc.add(
                            pc.multiply(
                                pc.fill_null(pc.cast(t["c"], pa.float64()), 0.0),
                                alpha,
                            ),
                            beta,
                        ),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
    return scores


def eigenvector_centrality(
    edges_ds,
    vertices_ds=None,
    iters: int = 10,
    num_partitions: int = 8,
):
    """Power iteration for the dominant eigenvector: x_{k+1} = Aᵀx_k with
    x_0 = 1, run a FIXED number of iterations, L2-normalized once at the
    end.  Skipping per-iteration normalization is mathematically identical
    for fixed k (scaling commutes with the linear map; numerically safe at
    float64 for the tested iteration counts) and keeps the SQL oracle a
    plain recursive aggregation.  Pass a symmetrized edge table for the
    undirected variant (the reference's EigenvectorCentrality).
    -> Dataset(vid, x)."""
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    verts = vertices_ds.select_columns(["vid"]).materialize()
    edges = edges_ds.select_columns(["src", "dst", "w"]).materialize()

    scores = verts.map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "x": pa.array(np.ones(t.num_rows, dtype=np.float64))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def _contrib(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "vid": t["dst"],
                "c": pc.multiply(pc.cast(t["w"], pa.float64()), t["x"]),
            }
        )
        return (
            out.group_by("vid").aggregate([("c", "sum")]).rename_columns(["vid", "c"])
        )

    for _ in range(iters):
        contribs = (
            edges.join(
                scores,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("vid",),
            )
            .map_batches(_contrib, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Sum("c", alias_name="c"))
        )
        scores = (
            verts.join(
                contribs,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("vid",),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "vid": t["vid"],
                        "x": pc.fill_null(pc.cast(t["c"], pa.float64()), 0.0),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )

    # final L2 normalization: one scalar aggregate + one stateless map
    sq = scores.map_batches(
        lambda t: pa.table(
            {
                "s": pa.array(
                    [
                        float(
                            np.square(
                                t["x"].combine_chunks().to_numpy(zero_copy_only=False)
                            ).sum()
                        )
                    ]
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sum("s")
    norm = float(np.sqrt(sq)) if sq else 1.0
    if norm == 0.0:
        norm = 1.0
    return scores.map_batches(
        lambda t: pa.table({"vid": t["vid"], "x": pc.divide(t["x"], norm)}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _neighbor_degree_join(edges_ds, num_partitions: int):
    """Shared skeleton for the degree-local centralities: canonical
    undirected simple edges, symmetrized, with BOTH endpoint degrees
    attached -> Dataset(src, dst, deg_src, deg_dst) plus the degree table.
    Two co-partitioned joins; degrees are vertex-sized (pre-combined)."""
    canon = canonicalize_undirected(edges_ds, weight="one")
    sym = symmetrize(canon).select_columns(["src", "dst"]).materialize()
    deg = (
        out_degrees(symmetrize(canon), weighted=False)
        .select_columns(["vid", "out_deg"])
        .materialize()
    )
    j1 = sym.join(
        deg, join_type="inner", num_partitions=num_partitions, on=("src",), right_on=("vid",)
    ).map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "deg_src": t["out_deg"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    both = j1.join(
        deg, join_type="inner", num_partitions=num_partitions, on=("dst",), right_on=("vid",)
    ).map_batches(
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
    return both, deg


def laplacian_centrality(edges_ds, vertices_ds=None, num_partitions: int = 8):
    """Unweighted Laplacian centrality (reference
    centrality/LaplacianCentrality): the drop in Laplacian energy
    E(G) = Σ d_i² + Σ d_i when vertex v is removed, which has the closed
    form  lc(v) = d_v² + d_v + 2·Σ_{u∈N(v)} d_u  — one neighbor-degree join
    + one pre-combined groupby, no eigensolve.  Isolated vertices score 0.
    -> Dataset(vid, lc) with lc int64."""
    from ray.data.aggregate import Sum

    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    both, deg = _neighbor_degree_join(edges_ds, num_partitions)

    def pre(t: pa.Table) -> pa.Table:
        # per-src partial sum of neighbor degrees
        g = t.select(["src", "deg_dst"]).group_by("src").aggregate(
            [("deg_dst", "sum")]
        )
        return g.rename_columns(["vid", "nbr_deg_sum"])

    nbr = (
        both.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vid", num_partitions=num_partitions)
        .aggregate(Sum("nbr_deg_sum", alias_name="nbr_deg_sum"))
    )
    return (
        vertices_ds.select_columns(["vid"])
        .join(deg, join_type="left_outer", num_partitions=num_partitions, on=("vid",))
        .map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "d": pc.fill_null(pc.cast(t["out_deg"], pa.int64()), 0),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .join(nbr, join_type="left_outer", num_partitions=num_partitions, on=("vid",))
        .map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "lc": pc.add(
                        pc.add(
                            pc.multiply(t["d"], t["d"]),
                            t["d"],
                        ),
                        pc.multiply(
                            pc.fill_null(pc.cast(t["nbr_deg_sum"], pa.int64()), 0),
                            pa.scalar(2, pa.int64()),
                        ),
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def sfigality(edges_ds, vertices_ds=None, num_partitions: int = 8):
    """Sfigality (reference centrality/Sfigality): the fraction of a
    vertex's neighbors that have STRICTLY higher degree,
    σ(v) = |{u ∈ N(v): d_u > d_v}| / d_v.  Same neighbor-degree join as
    Laplacian centrality; vertices with degree 0 score 0.
    -> Dataset(vid, sfigality float64)."""
    from ray.data.aggregate import Sum

    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    both, deg = _neighbor_degree_join(edges_ds, num_partitions)

    def pre(t: pa.Table) -> pa.Table:
        higher = pc.cast(pc.greater(t["deg_dst"], t["deg_src"]), pa.int64())
        out = pa.table({"vid": t["src"], "hi": higher})
        return (
            out.group_by("vid").aggregate([("hi", "sum")]).rename_columns(["vid", "hi"])
        )

    hi = (
        both.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vid", num_partitions=num_partitions)
        .aggregate(Sum("hi", alias_name="hi"))
    )
    return (
        vertices_ds.select_columns(["vid"])
        .join(deg, join_type="left_outer", num_partitions=num_partitions, on=("vid",))
        .map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "d": pc.fill_null(pc.cast(t["out_deg"], pa.int64()), 0),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .join(hi, join_type="left_outer", num_partitions=num_partitions, on=("vid",))
        .map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "sfigality": pc.if_else(
                        pc.greater(t["d"], 0),
                        pc.divide(
                            pc.cast(
                                pc.fill_null(pc.cast(t["hi"], pa.int64()), 0),
                                pa.float64(),
                            ),
                            pc.cast(t["d"], pa.float64()),
                        ),
                        pa.scalar(0.0),
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def local_clustering_coefficient(edges_ds, vertices_ds=None, num_partitions: int = 8):
    """lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)); 0 for deg < 2."""
    from networkit_ray.pipelines.triangles import triangle_counts

    tri = triangle_counts(edges_ds, vertices_ds, num_partitions).materialize()
    deg = degree_centrality(edges_ds, vertices_ds, num_partitions)
    return (
        deg.join(tri, join_type="inner", num_partitions=num_partitions, on=("vid",))
        .map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "lcc": np.where(
                        t["degree"].combine_chunks().to_numpy(zero_copy_only=False) >= 2,
                        2.0
                        * t["triangles"].combine_chunks().to_numpy(zero_copy_only=False)
                        / np.maximum(
                            t["degree"].combine_chunks().to_numpy(zero_copy_only=False)
                            * (
                                t["degree"].combine_chunks().to_numpy(zero_copy_only=False)
                                - 1
                            ),
                            1,
                        ),
                        0.0,
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def hits(
    edges_ds,
    vertices_ds=None,
    iters: int = 10,
    num_partitions: int = 8,
):
    """Kleinberg HITS hubs/authorities over the DIRECTED weighted edge
    table (the reference's centrality/HITS shape): fixed mutual power
    iterations

        a_{k+1}(v) = Σ_{u→v} w(u,v)·h_k(u)
        h_{k+1}(u) = Σ_{u→v} w(u,v)·a_{k+1}(v)

    from h_0 = 1, with ONE L2 normalization per vector at the end — for a
    fixed iteration count the unnormalized recursion is the normalized one
    up to a positive scalar (scaling commutes with the linear maps), which
    keeps the SQL oracle a plain chained aggregation; float64 headroom
    covers the tested iteration counts.  Per iteration: two co-partitioned
    joins + two pre-combined groupby sums — the PageRank message shape run
    once along edges and once against them.  -> Dataset(vid, auth, hub)."""
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    verts = vertices_ds.select_columns(["vid"]).materialize()
    edges = edges_ds.select_columns(["src", "dst", "w"]).materialize()

    hub = verts.map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "x": pa.array(np.ones(t.num_rows, dtype=np.float64))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    auth = None

    def _msg(key_col, out_col):
        def f(t: pa.Table) -> pa.Table:
            out = pa.table(
                {
                    "vid": t[key_col],
                    "c": pc.multiply(pc.cast(t["w"], pa.float64()), t["x"]),
                }
            )
            return (
                out.group_by("vid")
                .aggregate([("c", "sum")])
                .rename_columns(["vid", "c"])
            )

        return f

    def _sweep(state, join_on, group_to):
        """One half-iteration: fold `state` (vid, x) into messages keyed by
        the OTHER endpoint and rebuild a dense vertex vector."""
        contribs = (
            edges.join(
                state,
                join_type="inner",
                num_partitions=num_partitions,
                on=(join_on,),
                right_on=("vid",),
            )
            .map_batches(
                _msg(group_to, "c"), batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Sum("c", alias_name="c"))
        )
        return (
            verts.join(
                contribs,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("vid",),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "vid": t["vid"],
                        "x": pc.fill_null(pc.cast(t["c"], pa.float64()), 0.0),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )

    for _ in range(iters):
        auth = _sweep(hub, "src", "dst")      # a = Aᵀ h
        hub = _sweep(auth, "dst", "src")      # h = A a

    def _l2(ds):
        sq = ds.map_batches(
            lambda t: pa.table(
                {
                    "s": pa.array(
                        [
                            float(
                                np.square(
                                    t["x"]
                                    .combine_chunks()
                                    .to_numpy(zero_copy_only=False)
                                ).sum()
                            )
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("s")
        n = float(np.sqrt(sq)) if sq else 1.0
        return n if n > 0.0 else 1.0

    na, nh = _l2(auth), _l2(hub)
    joined = auth.join(
        hub,
        join_type="inner",
        num_partitions=num_partitions,
        on=("vid",),
        left_suffix="_a",
        right_suffix="_h",
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "auth": pc.divide(t["x_a"], na),
                "hub": pc.divide(t["x_h"], nh),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def permanence_centrality(
    edges_ds, labels_ds, num_partitions: int = 8
):
    """PermanenceCentrality (reference centrality/PermanenceCentrality;
    Chakraborty et al. KDD 2014): for vertex v in community c(v),
    Perm(v) = I(v) / (E_max(v) * deg(v)) - (1 - c_in(v)) with
    I(v) = # neighbors inside c(v), E_max(v) = max neighbors in any single
    OTHER community (1 when v has no external neighbors), c_in(v) =
    internal clustering coefficient = intra-community triangles at v /
    C(I(v), 2) (0 when I(v) < 2).  The reference tree is empty, so the
    published formula above IS the pinned contract (mirrored by the brute
    pytest oracle).

    Distributed decomposition: one labels join onto the symmetrized edge
    table gives per-(v, neighbor-community) counts (I and E_max are two
    grouped aggregates); c_in reuses the full triangle_counts pipeline on
    the INTRA-COMMUNITY edge subset — permanence is label joins + an
    existing kernel, no new shuffle shapes.  -> Dataset(vid, permanence)."""
    from ray.data.aggregate import Max, Sum

    from networkit_ray.pipelines.triangles import triangle_counts

    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    lab = labels_ds.map_batches(
        lambda t: pa.table({"lvid": t["vid"], "lcomm": t["label"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    sym = symmetrize(canon).materialize()
    j1 = sym.join(
        lab, join_type="inner", num_partitions=num_partitions,
        on=("src",), right_on=("lvid",),
    ).map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "cs": t["lcomm"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j2 = j1.join(
        lab, join_type="inner", num_partitions=num_partitions,
        on=("dst",), right_on=("lvid",),
    ).map_batches(
        lambda t: pa.table(
            {
                "vid": t["src"],
                "dst": t["dst"],
                "cs": t["cs"],
                "cd": t["lcomm"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def nbr_comm_counts(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "vid": t["vid"],
                "cs": t["cs"],
                "cd": t["cd"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return (
            out.group_by(["vid", "cs", "cd"]).aggregate([("n", "sum")])
            .rename_columns(["vid", "cs", "cd", "n"])
        )

    percomm = (
        j2.map_batches(
            nbr_comm_counts, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["vid", "cs", "cd"], num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    internal = percomm.map_batches(
        lambda t: pa.table({"vid": t["vid"], "i": t["n"]}).filter(
            pc.equal(t["cs"], t["cd"]).combine_chunks()
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).groupby("vid", num_partitions=num_partitions).aggregate(
        Sum("i", alias_name="i")
    ).materialize()
    emax = percomm.map_batches(
        lambda t: pa.table({"vid": t["vid"], "e": t["n"]}).filter(
            pc.not_equal(t["cs"], t["cd"]).combine_chunks()
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).groupby("vid", num_partitions=num_partitions).aggregate(
        Max("e", alias_name="emax")
    ).materialize()
    deg = (
        sym.groupby("src", num_partitions=num_partitions)
        .count()
        .map_batches(
            lambda t: pa.table({"vid": t["src"], "deg": t["count()"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    intra = j2.map_batches(
        lambda t: pa.table(
            {
                "src": t["vid"],
                "dst": t["dst"],
                "w": pa.array(np.ones(t.num_rows, np.float64)),
            }
        ).filter(
            pc.and_(
                pc.equal(t["cs"], t["cd"]),
                pc.less(t["vid"], t["dst"]),
            ).combine_chunks()
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    tri = triangle_counts(intra, num_partitions=num_partitions).materialize()

    base = deg.join(
        internal, join_type="left_outer", num_partitions=num_partitions,
        on=("vid",),
    ).map_batches(
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "deg": t["deg"],
                "i": pc.fill_null(pc.cast(t["i"], pa.int64()), 0),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    base = base.join(
        emax, join_type="left_outer", num_partitions=num_partitions,
        on=("vid",),
    ).map_batches(
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "deg": t["deg"],
                "i": t["i"],
                "emax": pc.fill_null(pc.cast(t["emax"], pa.int64()), 0),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    base = base.join(
        tri, join_type="left_outer", num_partitions=num_partitions,
        on=("vid",),
    )

    def perm(t: pa.Table) -> pa.Table:
        d = t["deg"].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        i = t["i"].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        em = t["emax"].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        tr = pc.fill_null(pc.cast(t["triangles"], pa.int64()), 0)
        tr = tr.combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        em = np.maximum(em, 1.0)
        pairs = i * (i - 1) / 2.0
        with np.errstate(divide="ignore", invalid="ignore"):
            cin = np.where(pairs > 0, tr / pairs, 0.0)
            p = i / (em * np.maximum(d, 1.0)) - (1.0 - cin)
        return pa.table({"vid": t["vid"], "permanence": p})

    return base.map_batches(perm, batch_format="pyarrow", zero_copy_batch=True)


def group_degree(edges_ds, k: int = 5, num_partitions: int = 8):
    """GroupDegreeCentrality (reference centrality/GroupDegree): greedily
    build a k-vertex group S maximizing the group degree
    |N(S) \\ S| (neighbors of the group outside it) — the classic
    (1 - 1/e) submodular greedy, ties -> smaller vid (deterministic).

    Per round: the covered set S ∪ N(S) broadcasts once (ray.put sorted
    array); every candidate's marginal gain is a vectorized
    searchsorted-membership count over the symmetrized adjacency — one
    pass over edges per round, k rounds, nothing edge-sized on the
    driver.  -> (Dataset(rank, vid, gain), group_degree)."""
    import ray
    import ray.data

    from ray.data.aggregate import Sum

    sym = symmetrize(
        canonicalize_undirected(edges_ds, weight="one")
    ).select_columns(["src", "dst"]).materialize()
    chosen: list[int] = []
    gains: list[int] = []
    s_set: set[int] = set()
    covered = np.empty(0, dtype=np.int64)  # sorted S ∪ N(S)
    for _ in range(k):
        cov_ref = ray.put(covered)
        sel_ref = ray.put(np.array(sorted(s_set), dtype=np.int64))

        def marginal(t: pa.Table) -> pa.Table:
            cov = ray.get(cov_ref)
            sel = ray.get(sel_ref)
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            # neighbor d counts for candidate s if d not already covered
            # and d != s (self-loops were canonicalized away upstream)
            new = ~_in_sorted(cov, d)
            out = pa.table(
                {"vid": s, "g": pa.array(new.astype(np.int64))}
            )
            g = out.group_by("vid").aggregate([("g", "sum")])
            return g.rename_columns(["vid", "g"])

        def _in_sorted(sorted_arr, x):
            if len(sorted_arr) == 0:
                return np.zeros(len(x), dtype=bool)
            idx = np.searchsorted(sorted_arr, x)
            idx = np.minimum(idx, len(sorted_arr) - 1)
            return sorted_arr[idx] == x

        cand = (
            sym.map_batches(
                marginal, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Sum("g", alias_name="g"))
        )

        def adjust(t: pa.Table) -> pa.Table:
            cov = ray.get(cov_ref)
            sel = ray.get(sel_ref)
            v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
            g = t["g"].combine_chunks().to_numpy(zero_copy_only=False)
            # joining S removes v from the outside-neighbor set if it was
            # covered-as-neighbor; members of S are not candidates
            was_nbr = _in_sorted(cov, v) & ~_in_sorted(sel, v)
            g = g - was_nbr.astype(np.int64)
            keep = ~_in_sorted(sel, v)
            return pa.table({"vid": v[keep], "g": g[keep]})

        scored = cand.map_batches(
            adjust, batch_format="pyarrow", zero_copy_batch=True
        )
        top = scored.sort(["g", "vid"], descending=[True, False]).limit(1)
        row = top.take_all()
        if not row:
            break
        v_star, gain = int(row[0]["vid"]), int(row[0]["g"])
        if gain <= 0 and len(chosen) > 0 and covered.size >= 1:
            # no positive marginal left: still fill the group (reference
            # returns exactly k members), smallest-vid candidates win
            pass
        chosen.append(v_star)
        gains.append(gain)
        s_set.add(v_star)
        # incremental covered update: N(S ∪ {v*}) = N(S) ∪ N(v*), so only
        # v*'s neighbors are fetched (degree-sized pull, not vertex-sized)
        def nbrs_of_v(t: pa.Table, v=v_star) -> pa.Table:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({"vid": np.unique(d[s == v])})

        nb = (
            sym.map_batches(
                nbrs_of_v, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("vid", num_partitions=num_partitions)
            .count()
            .to_pandas()["vid"]
            .to_numpy(np.int64)
        )
        covered = np.union1d(covered, np.append(nb, v_star))
    gd = int(len(np.setdiff1d(covered, np.array(sorted(s_set), np.int64))))
    out = ray.data.from_arrow(
        pa.table(
            {
                "rank": np.arange(len(chosen), dtype=np.int64),
                "vid": np.array(chosen, dtype=np.int64),
                "gain": np.array(gains, dtype=np.int64),
            }
        )
    )
    return out, gd
