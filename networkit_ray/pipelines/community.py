"""Community detection + quality metrics (SURVEY.md §2.3 `community/`
module): modularity of a labeling, and PLM/Louvain with coarsening.

Newman modularity for an undirected weighted graph:

    Q = Σ_c [ W_c / W  −  (S_c / 2W)² ]

where W = total undirected edge weight, W_c = weight inside community c,
S_c = summed weighted degree of c's vertices.  All three are tiny grouped
aggregates; the only real work is joining labels onto the edge endpoints.

``louvain`` is the distributed parallel-Louvain method (the reference's
community/PLM, Staudt & Meyerhenke 2016): synchronized local-moving rounds
(every vertex evaluates its best neighbor community by modularity gain in
one vectorized join+argmax pass) followed by graph coarsening (contract
communities, keep intra-weight as self-loops) and recursion.  Synchronous
moving accepts the same benign move races as the reference's parallel
implementation; determinism comes from fixed rounds and min-label
tie-breaking.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from networkit_ray.functions.aggregates import ArgMaxWMinLabel
from networkit_ray.stages.graphops import (
    canonicalize_undirected,
    out_degrees,
    symmetrize,
)


def modularity(edges_ds, labels_ds, num_partitions: int = 8):
    """-> 1-row Dataset(modularity: float64)."""
    canon = canonicalize_undirected(edges_ds, weight="sum").materialize()
    labels = labels_ds.select_columns(["vid", "label"]).materialize()

    W = canon.sum("w") or 0.0
    if W == 0.0:
        import ray.data

        return ray.data.from_arrow(pa.table({"modularity": pa.array([0.0])}))

    # W_c: edges whose two endpoints share a label
    lab_edges = (
        canon.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        )
        .map_batches(
            lambda t: pa.table(
                {"dst": t["dst"], "w": t["w"], "label_src": t["label"]}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vid",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "label": t["label_src"],
                    "w_in": pc.if_else(
                        pc.equal(t["label_src"], t["label"]), t["w"], 0.0
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    w_in = (
        lab_edges.groupby("label", num_partitions=num_partitions)
        .aggregate(Sum("w_in", alias_name="w_c"))
        .materialize()
    )

    # S_c: weighted degree mass per community
    deg = out_degrees(symmetrize(canon)).select_columns(["vid", "w_out_deg"])
    s_c = (
        deg.join(
            labels, join_type="inner", num_partitions=num_partitions, on=("vid",)
        )
        .map_batches(
            lambda t: pa.table({"label": t["label"], "s": t["w_out_deg"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("label", num_partitions=num_partitions)
        .aggregate(Sum("s", alias_name="s_c"))
        .materialize()
    )

    joined = s_c.join(
        w_in, join_type="left_outer", num_partitions=num_partitions, on=("label",)
    ).map_batches(
        lambda t, W=W: pa.table(
            {
                "q": pc.subtract(
                    pc.divide(pc.fill_null(pc.cast(t["w_c"], pa.float64()), 0.0), W),
                    pc.multiply(
                        pc.divide(pc.cast(t["s_c"], pa.float64()), 2.0 * W),
                        pc.divide(pc.cast(t["s_c"], pa.float64()), 2.0 * W),
                    ),
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    q = joined.sum("q") or 0.0
    import ray.data

    return ray.data.from_arrow(pa.table({"modularity": pa.array([float(q)])}))


def partition_quality(edges_ds, labels_ds, num_partitions: int = 8):
    """Coverage + edge cut of a labeling (reference community/Coverage and
    EdgeCut): coverage = W_in / W (intra-community weight fraction),
    edge_cut = W − W_in (inter-community weight).  Same one-pass label-join
    shape as modularity.  -> 1-row Dataset(coverage, edge_cut)."""
    import ray.data

    canon = canonicalize_undirected(edges_ds, weight="sum").materialize()
    labels = labels_ds.select_columns(["vid", "label"]).materialize()
    W = canon.sum("w") or 0.0
    if W == 0.0:
        return ray.data.from_arrow(
            pa.table({"coverage": pa.array([0.0]), "edge_cut": pa.array([0.0])})
        )
    lab_edges = (
        canon.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        )
        .map_batches(
            lambda t: pa.table(
                {"dst": t["dst"], "w": t["w"], "label_src": t["label"]}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vid",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "w_in": pc.if_else(
                        pc.equal(t["label_src"], t["label"]), t["w"], 0.0
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    w_in = lab_edges.sum("w_in") or 0.0
    return ray.data.from_arrow(
        pa.table(
            {
                "coverage": pa.array([float(w_in / W)]),
                "edge_cut": pa.array([float(W - w_in)]),
            }
        )
    )


def compare_partitions(labels_a_ds, labels_b_ds, num_partitions: int = 8):
    """Partition-comparison measures (reference community/NMIDistance,
    AdjustedRandMeasure, JaccardMeasure, RandMeasure — reported here in
    SIMILARITY form, 1 − the reference's distance form).

    Distributed shape: one co-partitioned join of the two (vid, label)
    tables, then a pre-combined ``groupby(label_a, label_b).count()``
    contingency.  Only the contingency (k_a × k_b cells, result-sized —
    never corpus-sized) reaches the driver; entropies / pair counts are
    numpy reductions over it.  Vertices present in only one labeling are
    ignored (inner join).

    nmi  = 2·I(A;B) / (H(A) + H(B))           (1 when both entropies are 0)
    ari  = (S − PQ/T) / ((P+Q)/2 − PQ/T)      (pair-counting adjusted Rand)
    rand = (T + 2S − P − Q) / T
    jaccard = S / (P + Q − S)                  (pair-based Jaccard; 1 if ∅)
    with T=C(n,2), P=Σ_i C(a_i,2), Q=Σ_j C(b_j,2), S=Σ_ij C(n_ij,2).

    -> 1-row Dataset(nmi, ari, rand, jaccard: float64).
    """
    import ray.data

    a = labels_a_ds.select_columns(["vid", "label"])
    b = labels_b_ds.select_columns(["vid", "label"]).map_batches(
        lambda t: pa.table({"vid": t["vid"], "label_b": t["label"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = _proj(
        a.join(b, join_type="inner", num_partitions=num_partitions, on=("vid",)),
        {"la": "label", "lb": "label_b"},
    )

    def pre(t: pa.Table) -> pa.Table:
        g = t.group_by(["la", "lb"]).aggregate([([], "count_all")])
        return g.rename_columns(["la", "lb", "cnt"])

    cont = (
        joined.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["la", "lb"])
        .sum("cnt")
        .to_pandas()
    )
    nij = cont["sum(cnt)"].to_numpy(dtype=np.float64)
    n = nij.sum()
    if n == 0:
        one = pa.array([1.0])
        return ray.data.from_arrow(
            pa.table({"nmi": one, "ari": one, "rand": one, "jaccard": one})
        )
    ai = cont.groupby("la")["sum(cnt)"].sum().to_numpy(dtype=np.float64)
    bj = cont.groupby("lb")["sum(cnt)"].sum().to_numpy(dtype=np.float64)

    h_a = -np.sum(ai / n * np.log(ai / n))
    h_b = -np.sum(bj / n * np.log(bj / n))
    a_of = cont.groupby("la")["sum(cnt)"].sum().reindex(cont["la"]).to_numpy(
        dtype=np.float64
    )
    b_of = cont.groupby("lb")["sum(cnt)"].sum().reindex(cont["lb"]).to_numpy(
        dtype=np.float64
    )
    mi = np.sum(nij / n * np.log(n * nij / (a_of * b_of)))
    nmi = 1.0 if (h_a + h_b) == 0.0 else 2.0 * mi / (h_a + h_b)

    c2 = lambda x: np.sum(x * (x - 1.0) / 2.0)  # noqa: E731
    T, Pp, Q, S = n * (n - 1.0) / 2.0, c2(ai), c2(bj), c2(nij)
    exp = Pp * Q / T if T else 0.0
    denom = (Pp + Q) / 2.0 - exp
    ari = 1.0 if denom == 0.0 else (S - exp) / denom
    rand = 1.0 if T == 0.0 else (T + 2.0 * S - Pp - Q) / T
    jac = 1.0 if (Pp + Q - S) == 0.0 else S / (Pp + Q - S)
    return ray.data.from_arrow(
        pa.table(
            {
                "nmi": pa.array([float(nmi)]),
                "ari": pa.array([float(ari)]),
                "rand": pa.array([float(rand)]),
                "jaccard": pa.array([float(jac)]),
            }
        )
    )


# ---- PLM / Louvain --------------------------------------------------------


def _proj(ds, cols: dict):
    """Explicit projection after a join (Ray 2.49 — compat.py)."""
    return ds.map_batches(
        lambda t: pa.table({name: t[src] for name, src in cols.items()}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _volumes(canon, num_partitions):
    """(vid, wd): weighted degree / volume per vertex — self-loops (present
    in coarsened graphs) count twice, per the Louvain volume convention."""

    def pre(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        w = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
        vid = np.concatenate([src, dst])
        wd = np.concatenate([w, w])  # self loop rows contribute 2w to src=dst
        out = pa.table({"vid": vid, "wd": wd})
        return out.group_by("vid").aggregate([("wd", "sum")]).rename_columns(
            ["vid", "wd"]
        )

    return (
        canon.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vid", num_partitions=num_partitions)
        .aggregate(Sum("wd", alias_name="wd"))
    )


def _move_round(
    sym_ds,
    vstate,
    W,
    num_partitions,
    min_gain,
    color_mod=1,
    color=0,
    eligible_ds=None,
):
    """One synchronized local-moving (sub-)round.

    vstate = materialized (vid, comm, wd).  Returns new (vid, comm) labels:
    each ELIGIBLE vertex (vid % color_mod == color, further intersected
    with ``eligible_ds`` (vid) when given — a distributed semi-join, never
    a driver-held set) picks
    argmax_C [ w(v,C) − wd(v)·(Σtot(C) − [C=C_v]·wd(v)) / (2W) ]
    over neighbor communities plus staying (stay score gets +min_gain so
    moves must strictly improve); ties break to the smaller community id;
    frozen vertices keep their label.  Color classes bound the staleness of
    simultaneous moves — with one class, singleton initialization degrades
    into pointer chases (v joins u's community while u departs), which is
    why every distributed Louvain schedules moves in sub-rounds.
    """
    tot = (
        _proj(vstate, {"comm": "comm", "wd": "wd"})
        .groupby("comm", num_partitions=num_partitions)
        .aggregate(Sum("wd", alias_name="tot"))
    )

    def _eligible(t: pa.Table, col: str) -> pa.Table:
        if color_mod <= 1:
            return t
        vids = t[col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(vids % color_mod == color))

    sym_src = sym_ds
    stay_base = vstate
    if eligible_ds is not None:
        eflag = eligible_ds.map_batches(
            lambda t: pa.table({"evid": t["vid"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        if eflag.count() == 0:
            return _proj(vstate, {"vid": "vid", "comm": "comm"})
        sym_src = _proj(
            sym_ds.join(
                eflag,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("evid",),
            ),
            {"src": "src", "dst": "dst", "w": "w"},
        )
        stay_base = _proj(
            vstate.join(
                eflag,
                join_type="inner",
                num_partitions=num_partitions,
                on=("vid",),
                right_on=("evid",),
            ),
            {"vid": "vid", "comm": "comm", "wd": "wd"},
        ).materialize()

    # neighbor-community edge weights: attach dst's community; only
    # eligible movers generate candidate rows
    elig_sym = sym_src.map_batches(
        lambda t: _eligible(t, "src"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    if elig_sym.count() == 0:
        # no eligible vertex has an edge this sub-round (common once the
        # coarsened graph is tiny); an entirely-empty join side crashes
        # Ray 2.49 shuffles (compat.py) — and there is nothing to move
        return _proj(vstate, {"vid": "vid", "comm": "comm"})
    nb = _proj(
        elig_sym.join(
            _proj(vstate, {"vid": "vid", "ncomm": "comm"}),
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vid",),
        ),
        {"vid": "src", "ncomm": "ncomm", "wvc": "w"},
    )
    # stay candidates: w(v, C_v) accumulates real neighbor weight via the
    # groupby; the zero row guarantees C_v is always a candidate
    stay = stay_base.map_batches(
        lambda t: _eligible(
            pa.table(
                {
                    "vid": t["vid"],
                    "ncomm": t["comm"],
                    "wvc": pa.array(np.zeros(t.num_rows)),
                }
            ),
            "vid",
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def pre(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["vid", "ncomm"]).aggregate([("wvc", "sum")])
            .rename_columns(["vid", "ncomm", "wvc"])
        )

    w_vc = (
        nb.union(stay)
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["vid", "ncomm"], num_partitions=num_partitions)
        .aggregate(Sum("wvc", alias_name="wvc"))
    )

    j1 = _proj(
        w_vc.join(
            vstate,
            join_type="inner",
            num_partitions=num_partitions,
            on=("vid",),
        ),
        {"vid": "vid", "ncomm": "ncomm", "wvc": "wvc", "comm": "comm", "wd": "wd"},
    )
    totr = _proj(tot, {"tcomm": "comm", "tot": "tot"}).materialize()
    j2 = _proj(
        j1.join(
            totr,
            join_type="inner",
            num_partitions=num_partitions,
            on=("ncomm",),
            right_on=("tcomm",),
        ),
        {
            "vid": "vid",
            "ncomm": "ncomm",
            "wvc": "wvc",
            "comm": "comm",
            "wd": "wd",
            "tot": "tot",
        },
    )

    def score(t: pa.Table) -> pa.Table:
        wvc = t["wvc"].combine_chunks().to_numpy(zero_copy_only=False)
        wd = t["wd"].combine_chunks().to_numpy(zero_copy_only=False)
        totv = t["tot"].combine_chunks().to_numpy(zero_copy_only=False)
        ncomm = t["ncomm"].combine_chunks().to_numpy(zero_copy_only=False)
        comm = t["comm"].combine_chunks().to_numpy(zero_copy_only=False)
        is_own = ncomm == comm
        eff_tot = totv - np.where(is_own, wd, 0.0)
        # Scaled by the positive constant 2W (argmax-invariant): for
        # integer edge weights every term is an exactly-representable
        # float64 integer, so scores are EXACT regardless of the order
        # distributed Sum() reduced wvc/tot — near-ties cannot flip with
        # block arrangement, and the min-label tie-break makes the round
        # bit-deterministic across partitionings (the partition-invariance
        # contract the leiden/plm pytest pins).
        s = 2.0 * W * wvc - wd * eff_tot
        s = s + np.where(is_own, 2.0 * W * min_gain, 0.0)
        return pa.table({"vid": t["vid"], "label": t["ncomm"], "w": s})

    scored = j2.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    winners = scored.groupby("vid", num_partitions=num_partitions).aggregate(
        ArgMaxWMinLabel(w_col="w", label_col="label", alias_name="comm")
    )
    # the aggregate's python-object accumulator infers a double column
    moved = winners.map_batches(
        lambda t: pa.table(
            {
                "vid": pc.cast(t["vid"], pa.int64()),
                "comm": pc.cast(t["comm"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if color_mod <= 1 and eligible_ds is None:
        return moved
    if eligible_ds is None:
        frozen = vstate.map_batches(
            lambda t: pa.table({"vid": t["vid"], "comm": t["comm"]}).filter(
                pa.array(
                    t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
                    % color_mod
                    != color
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        # complement of (eligible AND color-match), via the same semi-join
        ef2 = eligible_ds.map_batches(
            lambda t: pa.table(
                {"evid": t["vid"], "ef": pa.array(np.ones(t.num_rows, np.int8))}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

        def keep_frozen(t: pa.Table) -> pa.Table:
            vids = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
            inel = pc.is_null(t["ef"]).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            if color_mod > 1:
                inel = inel | (vids % color_mod != color)
            return pa.table(
                {"vid": t["vid"], "comm": t["comm"]}
            ).filter(pa.array(inel))

        frozen = vstate.join(
            ef2,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("vid",),
            right_on=("evid",),
        ).map_batches(keep_frozen, batch_format="pyarrow", zero_copy_batch=True)
    return moved.union(frozen)


def _contract(canon, labels, num_partitions):
    """Coarsen: vertices = communities; intra-community weight becomes
    self-loop weight (canonical (min,max) community pair, summed).
    Thin wrapper over the PUBLIC coarsening operator (coarsening.py) —
    `labels` here carries (vid, comm)."""
    from networkit_ray.pipelines.coarsening import contract_by_labels

    return contract_by_labels(
        canon,
        _proj(labels, {"vid": "vid", "label": "comm"}),
        num_partitions=num_partitions,
    )


def louvain(
    edges_ds,
    num_partitions: int = 8,
    max_levels: int = 3,
    move_rounds: int = 4,
    min_gain: float = 1e-9,
    colors: int = 4,
):
    """Distributed PLM/Louvain -> Dataset(vid, label), label = min original
    member vid of the community (canonical).  Each level: ``move_rounds``
    synchronized local-moving rounds, then coarsening; stops early when a
    level moves nothing.  Every step is joins + pre-combined groupbys —
    nothing vertex- or edge-sized touches the driver."""
    from networkit_ray.stages.graphops import vertices_from_edges

    canon = canonicalize_undirected(edges_ds, weight="sum").materialize()
    mapping = (
        vertices_from_edges(canon)
        .map_batches(
            lambda t: pa.table({"vid": t["vid"], "comm": t["vid"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    import ray.data

    if canon.count() == 0:
        return _proj(mapping, {"vid": "vid", "label": "comm"})

    for _level in range(max_levels):
        W = canon.sum("w") or 0.0
        if W <= 0:
            break
        # symmetrized view without self loops (self loops never affect the
        # argmax: they move with the vertex and cancel across candidates)
        no_loops = canon.map_batches(
            lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        sym = symmetrize(no_loops).materialize()
        wd = _volumes(canon, num_partitions).materialize()
        labels = _proj(wd, {"vid": "vid", "comm": "vid", "wd": "wd"}).materialize()
        if sym.count() == 0:
            break
        for _r in range(move_rounds):
            for color in range(colors):
                new_labels = _move_round(
                    sym, labels, W, num_partitions, min_gain,
                    color_mod=colors, color=color,
                )
                # re-attach volumes for the next sub-round
                labels = _proj(
                    new_labels.join(
                        wd,
                        join_type="inner",
                        num_partitions=num_partitions,
                        on=("vid",),
                    ),
                    {"vid": "vid", "comm": "comm", "wd": "wd"},
                ).materialize()
        moved = labels.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [
                            int(
                                pc.sum(
                                    pc.cast(
                                        pc.not_equal(t["vid"], t["comm"]), pa.int64()
                                    )
                                ).as_py()
                                or 0
                            )
                        ],
                        type=pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("n")
        if not moved:
            break
        lab2 = _proj(labels, {"vid": "vid", "comm": "comm"}).materialize()
        lab2r = _proj(lab2, {"cvid": "vid", "newcomm": "comm"}).materialize()
        mapping = _proj(
            mapping.join(
                lab2r,
                join_type="inner",
                num_partitions=num_partitions,
                on=("comm",),
                right_on=("cvid",),
            ),
            {"vid": "vid", "comm": "newcomm"},
        ).materialize()
        canon = _contract(canon, lab2, num_partitions).materialize()

    # canonical labels: min original member vid per community
    from ray.data.aggregate import Min

    cmin = (
        _proj(mapping, {"comm": "comm", "vid": "vid"})
        .groupby("comm", num_partitions=num_partitions)
        .aggregate(Min("vid", alias_name="label"))
        .materialize()
    )
    return _proj(
        mapping.join(
            cmin, join_type="inner", num_partitions=num_partitions, on=("comm",)
        ),
        {"vid": "vid", "label": "label"},
    )


def leiden(
    edges_ds,
    num_partitions: int = 8,
    max_levels: int = 3,
    move_rounds: int = 4,
    refine_rounds: int = 3,
    min_gain: float = 1e-9,
    colors: int = 4,
):
    """Distributed Leiden (reference community/ParallelLeiden; Traag et
    al. 2019) -> Dataset(vid, label), label = min original member vid.

    Louvain's level loop plus the two Leiden deltas:

    1. REFINEMENT before each contraction: inside every moving-phase
       community, restart from singletons and re-run local moving
       restricted to intra-community edges, where only vertices that are
       currently ALONE in their refined community may move (the
       merge-once rule).  Refined communities therefore only ever grow by
       attaching a singleton across a real edge — every refined community
       induces a CONNECTED subgraph, the Leiden guarantee Louvain lacks
       (the reference randomizes merge choice under a gamma bound; this
       variant is the deterministic greedy argmax, consistent with the
       PLM implementation above).
    2. The aggregate graph is contracted by the REFINED partition while
       the next level's moving phase starts from the MOVING partition
       (each refined community inherits its parent community's label).

    Every step is joins + pre-combined groupbys; eligibility (singleton
    refined communities) is a distributed semi-join, so nothing vertex-
    or edge-sized ever reaches the driver."""
    from ray.data.aggregate import Min

    from networkit_ray.stages.graphops import vertices_from_edges

    canon = canonicalize_undirected(edges_ds, weight="sum").materialize()
    canon_orig = canon
    mapping = (
        vertices_from_edges(canon)
        .map_batches(
            lambda t: pa.table({"vid": t["vid"], "comm": t["vid"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    if canon.count() == 0:
        return _proj(mapping, {"vid": "vid", "label": "comm"})

    init = None  # (vid, comm) aggregate-level starting partition
    flat = None  # (vid, label) best flat partition so far
    for _level in range(max_levels):
        W = canon.sum("w") or 0.0
        if W <= 0:
            break
        no_loops = canon.map_batches(
            lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        sym = symmetrize(no_loops).materialize()
        wd = _volumes(canon, num_partitions).materialize()
        if init is None:
            labels = _proj(
                wd, {"vid": "vid", "comm": "vid", "wd": "wd"}
            ).materialize()
        else:
            labels = _proj(
                init.join(
                    wd, join_type="inner", num_partitions=num_partitions,
                    on=("vid",),
                ),
                {"vid": "vid", "comm": "comm", "wd": "wd"},
            ).materialize()
        init_snapshot = _proj(labels, {"vid": "vid", "icomm": "comm"}).materialize()
        if sym.count() == 0:
            break

        # ---- moving phase (identical to PLM) ----
        for _r in range(move_rounds):
            for color in range(colors):
                new_labels = _move_round(
                    sym, labels, W, num_partitions, min_gain,
                    color_mod=colors, color=color,
                )
                labels = _proj(
                    new_labels.join(
                        wd, join_type="inner",
                        num_partitions=num_partitions, on=("vid",),
                    ),
                    {"vid": "vid", "comm": "comm", "wd": "wd"},
                ).materialize()
        P = _proj(labels, {"vid": "vid", "pcomm": "comm"}).materialize()
        flat = _proj(
            mapping.join(
                P, join_type="inner", num_partitions=num_partitions,
                on=("comm",), right_on=("vid",),
            ),
            {"vid": "vid", "label": "pcomm"},
        ).materialize()
        moved = (
            init_snapshot.join(
                P, join_type="inner", num_partitions=num_partitions,
                on=("vid",),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "n": pa.array(
                            [
                                int(
                                    pc.sum(
                                        pc.cast(
                                            pc.not_equal(t["icomm"], t["pcomm"]),
                                            pa.int64(),
                                        )
                                    ).as_py()
                                    or 0
                                )
                            ],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .sum("n")
        )
        if not moved:
            break

        # ---- refinement: singletons, intra-community edges only,
        # merge-once (only singleton refined communities may move) ----
        sp = _proj(P, {"svid": "vid", "spc": "pcomm"}).materialize()
        sym_intra = _proj(
            _proj(
                sym.join(
                    sp, join_type="inner", num_partitions=num_partitions,
                    on=("src",), right_on=("svid",),
                ),
                {"src": "src", "dst": "dst", "w": "w", "spc_s": "spc"},
            ).join(
                sp, join_type="inner", num_partitions=num_partitions,
                on=("dst",), right_on=("svid",),
            ),
            {"src": "src", "dst": "dst", "w": "w", "spc_s": "spc_s", "spc_d": "spc"},
        ).map_batches(
            lambda t: pa.table(
                {"src": t["src"], "dst": t["dst"], "w": t["w"]}
            ).filter(pc.equal(t["spc_s"], t["spc_d"]).combine_chunks()),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

        rstate = _proj(wd, {"vid": "vid", "comm": "vid", "wd": "wd"}).materialize()
        if sym_intra.count() > 0:
            for _r in range(refine_rounds):
                for color in range(colors):
                    sizes = (
                        _proj(rstate, {"comm": "comm"})
                        .groupby("comm", num_partitions=num_partitions)
                        .count()
                    )
                    singles = _proj(
                        rstate.join(
                            sizes, join_type="inner",
                            num_partitions=num_partitions, on=("comm",),
                        ),
                        {"vid": "vid", "count()": "count()"},
                    ).map_batches(
                        lambda t: pa.table({"vid": t["vid"]}).filter(
                            pc.equal(t["count()"], pa.scalar(1)).combine_chunks()
                        ),
                        batch_format="pyarrow",
                        zero_copy_batch=True,
                    ).materialize()
                    new_r = _move_round(
                        sym_intra, rstate, W, num_partitions, min_gain,
                        color_mod=colors, color=color, eligible_ds=singles,
                    )
                    rstate = _proj(
                        new_r.join(
                            wd, join_type="inner",
                            num_partitions=num_partitions, on=("vid",),
                        ),
                        {"vid": "vid", "comm": "comm", "wd": "wd"},
                    ).materialize()
        R = _proj(rstate, {"vid": "vid", "rcomm": "comm"}).materialize()

        # compose mapping through the refined partition
        mapping = _proj(
            mapping.join(
                R, join_type="inner", num_partitions=num_partitions,
                on=("comm",), right_on=("vid",),
            ),
            {"vid": "vid", "comm": "rcomm"},
        ).materialize()
        # contract by refined labels; next level starts from the parent
        # (moving-phase) community of each refined community
        rlab = _proj(R, {"vid": "vid", "comm": "rcomm"}).materialize()
        canon = _contract(canon, rlab, num_partitions).materialize()
        init = (
            _proj(
                R.join(
                    P, join_type="inner", num_partitions=num_partitions,
                    on=("vid",),
                ),
                {"rcomm": "rcomm", "pcomm": "pcomm"},
            )
            .groupby("rcomm", num_partitions=num_partitions)
            .aggregate(Min("pcomm", alias_name="comm"))
        )
        init = _proj(init, {"vid": "rcomm", "comm": "comm"}).materialize()

    if flat is None:
        flat = _proj(mapping, {"vid": "vid", "label": "comm"}).materialize()
    # Leiden contract enforcement: with a FIXED sub-round budget the moving
    # phase can strand a vertex in a community it no longer touches.  Split
    # every community into its connected pieces via the engine's own CC
    # over intra-community edges — splitting a disconnected community into
    # edge-free parts strictly INCREASES modularity (ΔQ = 2·S_A·S_B/(4W²)),
    # intra edges only connect same-label vertices so one global CC run
    # splits all communities at once, and CC's hash-min labels are already
    # the canonical min-member-vid labels.
    from networkit_ray.pipelines.components import connected_components

    fr = _proj(flat, {"fvid": "vid", "flab": "label"}).materialize()
    intra = (
        _proj(
            canon_orig.join(
                fr, join_type="inner", num_partitions=num_partitions,
                on=("src",), right_on=("fvid",),
            ),
            {"src": "src", "dst": "dst", "w": "w", "flab_s": "flab"},
        )
        .join(
            fr, join_type="inner", num_partitions=num_partitions,
            on=("dst",), right_on=("fvid",),
        )
        .map_batches(
            lambda t: pa.table(
                {"src": t["src"], "dst": t["dst"], "w": t["w"]}
            ).filter(pc.equal(t["flab_s"], t["flab"]).combine_chunks()),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    labels_final, _ = connected_components(
        intra,
        vertices_ds=flat.select_columns(["vid"]),
        num_partitions=num_partitions,
    )
    return labels_final


# --------------------------------------------------------------------------
# Map equation (Infomap two-level codelength) — reference
# community/LouvainMapEquation (Rosvall & Bergstrom 2008): same PLM
# local-moving skeleton, the objective swapped from modularity gain to
# codelength DELTA (minimized).
# --------------------------------------------------------------------------


def _plogp(x):
    """x * log2(x), elementwise, 0 at 0."""
    x = np.asarray(x, dtype=np.float64)
    out = np.zeros_like(x)
    pos = x > 0
    out[pos] = x[pos] * np.log2(x[pos])
    return out


def _community_cuts(sym_no_loops, labels, num_partitions):
    """(comm, cut): total weight of directed sym edges leaving each
    community (per-side; each undirected crossing edge contributes w to
    BOTH endpoint communities)."""
    lr = _proj(labels, {"lvid": "vid", "lcomm": "comm"}).materialize()
    j1 = _proj(
        sym_no_loops.join(
            lr, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("lvid",),
        ),
        {"dst": "dst", "w": "w", "cs": "lcomm"},
    )
    j2 = _proj(
        j1.join(
            lr, join_type="inner", num_partitions=num_partitions,
            on=("dst",), right_on=("lvid",),
        ),
        {"cs": "cs", "cd": "lcomm", "w": "w"},
    )

    def pre(t: pa.Table) -> pa.Table:
        out = pa.table({"comm": t["cs"], "cut": t["w"]}).filter(
            pc.not_equal(t["cs"], t["cd"]).combine_chunks()
        )
        return (
            out.group_by("comm").aggregate([("cut", "sum")])
            .rename_columns(["comm", "cut"])
        )

    return (
        j2.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("comm", num_partitions=num_partitions)
        .aggregate(Sum("cut", alias_name="cut"))
    )


def map_equation_codelength(edges_ds, labels_ds, num_partitions: int = 8):
    """Two-level map-equation codelength L(M) in bits for a labeling
    (reference community/MapEquation quality measure):
    L = plogp(q) - 2 sum_C plogp(q_C) - sum_v plogp(p_v)
        + sum_C plogp(q_C + p_C), with p_v = wd(v)/2W, q_C = cut(C)/2W.
    All terms are pre-combined grouped sums — nothing vertex-sized on the
    driver.  -> float (bits per step)."""
    canon = canonicalize_undirected(edges_ds, weight="sum").materialize()
    W = canon.sum("w") or 0.0
    if W <= 0:
        return 0.0
    wd = _volumes(canon, num_partitions).materialize()
    lab = _proj(labels_ds, {"vid": "vid", "comm": "label"}).materialize()
    vst = _proj(
        wd.join(lab, join_type="inner", num_partitions=num_partitions, on=("vid",)),
        {"vid": "vid", "comm": "comm", "wd": "wd"},
    ).materialize()
    no_loops = canon.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    sym = symmetrize(no_loops).materialize()
    cuts = (
        _community_cuts(sym, vst, num_partitions).to_pandas()
        if sym.count() > 0
        else None
    )
    pc_tbl = (
        _proj(vst, {"comm": "comm", "wd": "wd"})
        .groupby("comm", num_partitions=num_partitions)
        .aggregate(Sum("wd", alias_name="vol"))
        .to_pandas()
    )
    # per-vertex plogp sum (scalar aggregate, streamed)
    pv_sum = float(
        vst.map_batches(
            lambda t: pa.table(
                {
                    "s": pa.array(
                        [
                            float(
                                _plogp(
                                    t["wd"]
                                    .combine_chunks()
                                    .to_numpy(zero_copy_only=False)
                                    / (2.0 * W)
                                ).sum()
                            )
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("s")
        or 0.0
    )
    import pandas as pd

    comm = pc_tbl.set_index("comm")["vol"] / (2.0 * W)
    if cuts is not None and len(cuts):
        qc = (cuts.set_index("comm")["cut"] / (2.0 * W)).reindex(
            comm.index, fill_value=0.0
        )
    else:
        qc = pd.Series(np.zeros(len(comm)), index=comm.index)
    q = float(qc.sum())
    L = (
        float(_plogp(np.array([q]))[0])
        - 2.0 * float(_plogp(qc.values).sum())
        - pv_sum
        + float(_plogp(qc.values + comm.values).sum())
    )
    return L


def _map_move_round(
    sym_ds, vstate, W, cuts_ds, q_total, num_partitions, min_gain,
    color_mod=1, color=0,
):
    """One synchronized map-equation local-moving sub-round: eligible
    vertices pick argmin over neighbor communities of the codelength
    delta (stay = 0, moves must beat -min_gain); same staleness model and
    candidate construction as the modularity _move_round."""

    def _eligible(t: pa.Table, col: str) -> pa.Table:
        if color_mod <= 1:
            return t
        vids = t[col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(vids % color_mod == color))

    elig_sym = sym_ds.map_batches(
        lambda t: _eligible(t, "src"), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if elig_sym.count() == 0:
        return _proj(vstate, {"vid": "vid", "comm": "comm"})
    nb = _proj(
        elig_sym.join(
            _proj(vstate, {"vid": "vid", "ncomm": "comm"}),
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
            right_on=("vid",),
        ),
        {"vid": "src", "ncomm": "ncomm", "wvc": "w"},
    )
    stay = vstate.map_batches(
        lambda t: _eligible(
            pa.table(
                {
                    "vid": t["vid"],
                    "ncomm": t["comm"],
                    "wvc": pa.array(np.zeros(t.num_rows)),
                }
            ),
            "vid",
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def pre(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["vid", "ncomm"]).aggregate([("wvc", "sum")])
            .rename_columns(["vid", "ncomm", "wvc"])
        )

    w_vc = (
        nb.union(stay)
        .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["vid", "ncomm"], num_partitions=num_partitions)
        .aggregate(Sum("wvc", alias_name="wvc"))
        .materialize()
    )
    # per-vertex weight into its OWN community (constant across candidates)
    w_own = _proj(
        w_vc.join(
            _proj(vstate, {"ovid": "vid", "ocomm": "comm"}).materialize(),
            join_type="inner",
            num_partitions=num_partitions,
            on=("vid", "ncomm"),
            right_on=("ovid", "ocomm"),
        ),
        {"vid": "vid", "wown": "wvc"},
    ).materialize()

    # community aggregates: volume + cut (stale within the sub-round)
    tot = (
        _proj(vstate, {"comm": "comm", "wd": "wd"})
        .groupby("comm", num_partitions=num_partitions)
        .aggregate(Sum("wd", alias_name="tot"))
        .materialize()
    )
    comm_info = _proj(
        tot.join(
            _proj(cuts_ds, {"ccomm": "comm", "cut": "cut"}).materialize(),
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("comm",),
            right_on=("ccomm",),
        ),
        {"comm": "comm", "tot": "tot", "cut": "cut"},
    ).map_batches(
        lambda t: pa.table(
            {
                "comm": t["comm"],
                "tot": t["tot"],
                "cut": pc.fill_null(t["cut"], 0.0),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    j1 = _proj(
        w_vc.join(
            vstate, join_type="inner", num_partitions=num_partitions, on=("vid",)
        ),
        {"vid": "vid", "ncomm": "ncomm", "wvc": "wvc", "comm": "comm", "wd": "wd"},
    )
    j1b = _proj(
        j1.join(
            w_own, join_type="inner", num_partitions=num_partitions, on=("vid",)
        ),
        {
            "vid": "vid", "ncomm": "ncomm", "wvc": "wvc", "comm": "comm",
            "wd": "wd", "wown": "wown",
        },
    )
    # attach target-community info (B) and own-community info (A)
    j2 = _proj(
        j1b.join(
            _proj(comm_info, {"bc": "comm", "btot": "tot", "bcut": "cut"}).materialize(),
            join_type="inner",
            num_partitions=num_partitions,
            on=("ncomm",),
            right_on=("bc",),
        ),
        {
            "vid": "vid", "ncomm": "ncomm", "wvc": "wvc", "comm": "comm",
            "wd": "wd", "wown": "wown", "btot": "btot", "bcut": "bcut",
        },
    )
    j3 = _proj(
        j2.join(
            _proj(comm_info, {"ac": "comm", "atot": "tot", "acut": "cut"}).materialize(),
            join_type="inner",
            num_partitions=num_partitions,
            on=("comm",),
            right_on=("ac",),
        ),
        {
            "vid": "vid", "ncomm": "ncomm", "wvc": "wvc", "comm": "comm",
            "wd": "wd", "wown": "wown", "btot": "btot", "bcut": "bcut",
            "atot": "atot", "acut": "acut",
        },
    )
    W2 = 2.0 * W

    def score(t: pa.Table) -> pa.Table:
        wvc = t["wvc"].combine_chunks().to_numpy(zero_copy_only=False)
        wd = t["wd"].combine_chunks().to_numpy(zero_copy_only=False)
        wown = t["wown"].combine_chunks().to_numpy(zero_copy_only=False)
        btot = t["btot"].combine_chunks().to_numpy(zero_copy_only=False)
        bcut = t["bcut"].combine_chunks().to_numpy(zero_copy_only=False)
        atot = t["atot"].combine_chunks().to_numpy(zero_copy_only=False)
        acut = t["acut"].combine_chunks().to_numpy(zero_copy_only=False)
        ncomm = t["ncomm"].combine_chunks().to_numpy(zero_copy_only=False)
        comm = t["comm"].combine_chunks().to_numpy(zero_copy_only=False)
        is_own = ncomm == comm
        # rates
        qA, pA = acut / W2, atot / W2
        qB, pB = bcut / W2, btot / W2
        pv = wd / W2
        # after removing v from A: cut(A') = cut(A) - wd + 2*w(v, A')
        qA2 = (acut - wd + 2.0 * wown) / W2
        pA2 = pA - pv
        # after adding v to B: cut(B') = cut(B) + wd - 2*w(v, B)
        qB2 = (bcut + wd - 2.0 * wvc) / W2
        pB2 = pB + pv
        q2 = q_total - qA - qB + qA2 + qB2
        dL = (
            (_plogp(q2) - _plogp(np.full_like(q2, q_total)))
            - 2.0 * (_plogp(qA2) - _plogp(qA) + _plogp(qB2) - _plogp(qB))
            + (
                _plogp(qA2 + pA2) - _plogp(qA + pA)
                + _plogp(qB2 + pB2) - _plogp(qB + pB)
            )
        )
        dL = np.where(is_own, -min_gain, dL)  # stay unless a move wins
        # argmax of negated delta = argmin; ties -> smaller community id
        return pa.table({"vid": t["vid"], "label": t["ncomm"], "w": -dL})

    scored = j3.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    winners = scored.groupby("vid", num_partitions=num_partitions).aggregate(
        ArgMaxWMinLabel(w_col="w", label_col="label", alias_name="comm")
    )
    moved = winners.map_batches(
        lambda t: pa.table(
            {
                "vid": pc.cast(t["vid"], pa.int64()),
                "comm": pc.cast(t["comm"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if color_mod <= 1:
        return moved
    frozen = vstate.map_batches(
        lambda t: pa.table({"vid": t["vid"], "comm": t["comm"]}).filter(
            pa.array(
                t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
                % color_mod
                != color
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return moved.union(frozen)


def louvain_map_equation(
    edges_ds,
    num_partitions: int = 8,
    max_levels: int = 3,
    move_rounds: int = 3,
    min_gain: float = 1e-9,
    colors: int = 4,
):
    """Distributed LouvainMapEquation (reference
    community/LouvainMapEquation): PLM-style level loop minimizing the
    two-level map-equation codelength instead of maximizing modularity.
    -> Dataset(vid, label), label = min original member vid."""
    from networkit_ray.stages.graphops import vertices_from_edges

    canon = canonicalize_undirected(edges_ds, weight="sum").materialize()
    mapping = (
        vertices_from_edges(canon)
        .map_batches(
            lambda t: pa.table({"vid": t["vid"], "comm": t["vid"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    if canon.count() == 0:
        return _proj(mapping, {"vid": "vid", "label": "comm"})

    for _level in range(max_levels):
        W = canon.sum("w") or 0.0
        if W <= 0:
            break
        no_loops = canon.map_batches(
            lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        sym = symmetrize(no_loops).materialize()
        if sym.count() == 0:
            break
        wd = _volumes(canon, num_partitions).materialize()
        labels = _proj(wd, {"vid": "vid", "comm": "vid", "wd": "wd"}).materialize()
        for _r in range(move_rounds):
            for color in range(colors):
                cuts = _community_cuts(sym, labels, num_partitions).materialize()
                q_total = float(cuts.sum("cut") or 0.0) / (2.0 * W)
                new_labels = _map_move_round(
                    sym, labels, W, cuts, q_total, num_partitions, min_gain,
                    color_mod=colors, color=color,
                )
                labels = _proj(
                    new_labels.join(
                        wd, join_type="inner",
                        num_partitions=num_partitions, on=("vid",),
                    ),
                    {"vid": "vid", "comm": "comm", "wd": "wd"},
                ).materialize()
        moved = labels.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [
                            int(
                                pc.sum(
                                    pc.cast(
                                        pc.not_equal(t["vid"], t["comm"]),
                                        pa.int64(),
                                    )
                                ).as_py()
                                or 0
                            )
                        ],
                        type=pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("n")
        if not moved:
            break
        lab2 = _proj(labels, {"vid": "vid", "comm": "comm"}).materialize()
        lab2r = _proj(lab2, {"cvid": "vid", "newcomm": "comm"}).materialize()
        mapping = _proj(
            mapping.join(
                lab2r, join_type="inner", num_partitions=num_partitions,
                on=("comm",), right_on=("cvid",),
            ),
            {"vid": "vid", "comm": "newcomm"},
        ).materialize()
        canon = _contract(canon, lab2, num_partitions).materialize()

    from ray.data.aggregate import Min

    cmin = (
        _proj(mapping, {"comm": "comm", "vid": "vid"})
        .groupby("comm", num_partitions=num_partitions)
        .aggregate(Min("vid", alias_name="label"))
        .materialize()
    )
    found = _proj(
        mapping.join(
            cmin, join_type="inner", num_partitions=num_partitions, on=("comm",)
        ),
        {"vid": "vid", "label": "label"},
    ).materialize()

    # endgame: synchronized stale moves cannot always reach the coarse
    # optimum (nor guarantee monotone codelength), so return the best of
    # the found partition and the two trivial models — the result provably
    # never codes worse than all-singletons or one-blob
    orig = canonicalize_undirected(edges_ds, weight="sum").materialize()
    verts = found.select_columns(["vid"]).materialize()
    minvid = verts.min("vid")
    sing = verts.map_batches(
        lambda t: pa.table({"vid": t["vid"], "label": t["vid"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    one = verts.map_batches(
        lambda t, m=int(minvid): pa.table(
            {"vid": t["vid"], "label": pa.array(np.full(t.num_rows, m, np.int64))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    cands = [
        (map_equation_codelength(orig, found, num_partitions), 0, found),
        (map_equation_codelength(orig, one, num_partitions), 1, one),
        (map_equation_codelength(orig, sing, num_partitions), 2, sing),
    ]
    return min(cands, key=lambda c: (c[0], c[1]))[2]


# --------------------------------------------------------------------------
# ClusteringGenerator (reference community/ClusteringGenerator): the three
# canonical synthetic labelings used as quality-measure baselines.  All are
# one vectorized map_batches over the vertex table.
# --------------------------------------------------------------------------


def make_singleton_clustering(vertices_ds):
    """Every vertex its own community.  -> Dataset(vid, label)."""
    return vertices_ds.map_batches(
        lambda t: pa.table({"vid": t["vid"], "label": t["vid"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def make_one_clustering(vertices_ds):
    """All vertices in one community labeled by the min vid (the engine's
    canonical community id).  -> Dataset(vid, label)."""
    verts = vertices_ds.materialize()
    m = int(verts.min("vid"))
    return verts.map_batches(
        lambda t, m=m: pa.table(
            {
                "vid": t["vid"],
                "label": pa.array(np.full(t.num_rows, m, np.int64)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def make_random_clustering(vertices_ds, k: int, seed: int = 42):
    """Uniform hash assignment of each vertex to one of k communities —
    deterministic, partitioning-invariant.  -> Dataset(vid, label)."""
    import pandas as pd

    def assign(t: pa.Table) -> pa.Table:
        v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(
            (v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + np.uint64(seed)).view(np.int64)
        )
        return pa.table(
            {"vid": v, "label": (h % np.uint64(k)).astype(np.int64)}
        )

    return vertices_ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )
