"""Link prediction indices (SURVEY.md §2.3 `linkprediction/` module):
common neighbors, Jaccard, Adamic-Adar, Resource Allocation, Preferential
Attachment — neighbor-intersection self-joins, the same wedge-join skeleton
as triangle counting.

For every unordered vertex pair (u, v), u < v, with at least one common
neighbor:
    cn(u,v)  = |N(u) ∩ N(v)|
    jac(u,v) = cn / |N(u) ∪ N(v)|
    aa(u,v)  = Σ_{z ∈ N(u)∩N(v)} 1 / ln(deg(z))
    ra(u,v)  = Σ_{z ∈ N(u)∩N(v)} 1 / deg(z)      (ResourceAllocationIndex)
    pa(u,v)  = deg(u) · deg(v)                   (PreferentialAttachmentIndex)

Plan: symmetrized adjacency self-joined on the PIVOT (the common neighbor)
emits one row per wedge (u, z, v); groupby (u, v) counts wedges (= cn) and
sums 1/ln(deg(pivot)) (= aa); degrees joined back for the Jaccard
denominator.  Wedge volume is Σ deg(z)² — cap hub pivots upstream if the
degree distribution is extreme (same hub bound as triangles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum

from networkit_ray.stages.graphops import (
    canonicalize_undirected,
    out_degrees,
    symmetrize,
)


def random_link_sampler(
    edges_ds, holdout_mod: int = 5, seed: int = 0, num_partitions: int = 8,
    fold: int = 0,
):
    """Deterministic edge holdout (reference linkprediction/
    RandomLinkSampler): canonical (src<dst) edges whose pair hash
    (src*1000003 + dst*7919 + seed) % holdout_mod == fold are HELD OUT as
    test positives; the rest are the training graph.  The hash is plain
    int64 arithmetic so the DuckDB oracle reproduces the exact same split.
    ``fold`` selects which residue class is held out — the k folds of
    ``kfold_cross_validation`` partition the edge set exactly.
    -> (train_edges, test_edges), both (src, dst, w=1)."""
    canon = canonicalize_undirected(edges_ds, weight="one").materialize()

    def part(keep_train: bool):
        def f(t: pa.Table) -> pa.Table:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            h = (s * np.int64(1000003) + d * np.int64(7919) + np.int64(seed)) % holdout_mod
            mask = (h != fold) if keep_train else (h == fold)
            return t.filter(pa.array(mask))

        return canon.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    return part(True), part(False)


def _nonempty_block_refs(materialized_ds):
    """Block refs of a materialized Dataset with EMPTY BLOCKS DROPPED,
    judged from block metadata only — no data touches the driver.
    Hash-aggregate partitions that received no rows finalize as
    schema-less empty blocks (zero columns); pyarrow's Table.join inside
    a downstream Dataset.join rejects a key FieldRef against them, and
    map_batches never invokes the UDF on them, so the only safe seam is
    to rebuild the dataset from the surviving refs.
    ``iter_internal_ref_bundles`` is a private Ray Data API, verified
    against Ray 2.49.2 (the version this engine pins); the AttributeError
    fallback covers the pre-2.10 public accessor and any future removal
    fails loudly here rather than corrupting results."""
    try:
        bundles = materialized_ds.iter_internal_ref_bundles()
        return [
            ref
            for b in bundles
            for ref, meta in b.blocks
            if (meta.num_rows or 0) > 0
        ]
    except AttributeError:  # older Ray: no per-block metadata filter
        return materialized_ds.get_internal_block_refs()


def link_prediction_auc(
    edges_ds,
    holdout_mod: int = 5,
    neg_per_vertex: int = 8,
    seed: int = 0,
    num_partitions: int = 8,
    fold: int = 0,
):
    """Link-prediction evaluation harness (reference linkprediction/
    MissingLinksFinder + ROC/PR metrics): hold out 1/holdout_mod of the
    edges (random_link_sampler), score every candidate pair by COMMON
    NEIGHBORS on the training graph, and compute ROC-AUC (Mann-Whitney
    with tie-averaged ranks) + PR-AUC (average precision, ties broken
    deterministically by (u, v)) over candidates = held-out positives +
    counter-hash-sampled non-edge negatives.  Negatives are BOUNDED per
    vertex (O(n·s) candidates, O(batch·s) worker temporaries — the r4
    quadratic repeat/tile sampler is gone): for each vertex u and counter
    i < neg_per_vertex, draw v = (u·1000003 + i·40503 + seed) mod
    (max_vid+1), keep draws that land on a real vertex (semi-join on the
    vertex table), canonicalize u<v, de-dup, and remove true edges by a
    distributed anti-join — the same closed form the SQL oracle
    evaluates.  The metric pass is ONE distributed sort + a streaming
    O(1)-memory scan (prefix sums); nothing but the two scalars reaches
    the driver.
    -> Dataset(1 row: auc_roc, auc_pr, n_pos, n_neg)."""
    import ray
    import ray.data

    from networkit_ray.stages.graphops import vertices_from_edges

    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    train, test = random_link_sampler(
        canon, holdout_mod=holdout_mod, seed=seed,
        num_partitions=num_partitions, fold=fold,
    )
    train = train.materialize()

    # candidate negatives: s counter-hash draws per vertex (one scalar
    # aggregate fixes the modulus; draw generation is vectorized per
    # vertex batch; draws landing off the vertex set are dropped by a
    # semi-join, true edges by a distributed anti-join)
    verts = vertices_from_edges(canon).materialize()
    nmod = int(verts.max("vid")) + 1
    s = int(neg_per_vertex)

    def gen_pairs(t: pa.Table) -> pa.Table:
        a = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
        U = np.repeat(a, s)
        i = np.tile(np.arange(s, dtype=np.int64), len(a))
        V = (
            U * np.int64(1000003) + i * np.int64(40503) + np.int64(seed)
        ) % np.int64(nmod)
        keep = U != V
        U, V = U[keep], V[keep]
        return pa.table(
            {"src": np.minimum(U, V), "dst": np.maximum(U, V), "v_drawn": V}
        )

    neg_cand = (
        verts.map_batches(gen_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .join(
            verts.map_batches(
                lambda t: pa.table({"v_drawn": t["vid"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("v_drawn",),
        )
        .map_batches(  # explicit projection after join (compat: see memory)
            lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["src", "dst"])
        .count()
        .map_batches(
            lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    flagged = canon.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "is_e": pa.array(np.ones(t.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    negs = (
        neg_cand.join(
            flagged,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("src", "dst"),
        )
        .map_batches(
            lambda t: pa.table(
                {"u": t["src"], "v": t["dst"]}
            ).filter(pc.is_null(t["is_e"]).combine_chunks()),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    cands = (
        test.map_batches(
            lambda t: pa.table(
                {
                    "u": t["src"],
                    "v": t["dst"],
                    "lab": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .union(
            negs.map_batches(
                lambda t: pa.table(
                    {
                        "u": t["u"],
                        "v": t["v"],
                        "lab": pa.array(np.zeros(t.num_rows, np.int64)),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        .materialize()
    )

    # common-neighbor score on the TRAIN graph, CANDIDATE-BOUNDED: the
    # generic link_prediction_scores wedge join costs O(Σ deg(z)²) over
    # ALL cn>=1 pairs, but the AUC needs cn for the ~(n_pos + n·s)
    # candidates only.  Explode each candidate (u, v) by N(u) (one hash
    # join, Σ_cand deg(u) rows), keep rows where (v, w) is also a train
    # edge (second hash join = the N(v) probe), pre-combine per batch and
    # count — identical cn = |N(u) ∩ N(v)| without materializing any
    # non-candidate wedge.  Candidates with no common neighbor score 0
    # via the final left join.
    sym_t = symmetrize(train).materialize()
    adj_u = sym_t.map_batches(
        lambda t: pa.table({"u": t["src"], "w": t["dst"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    adj_vw = sym_t.map_batches(
        lambda t: pa.table({"v": t["src"], "w": t["dst"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def count_pre(t: pa.Table) -> pa.Table:
        g = (
            t.select(["u", "v"])
            .group_by(["u", "v"])
            .aggregate([("v", "count")])
        )
        return g.rename_columns(["u", "v", "one"])

    cn = (
        cands.map_batches(
            lambda t: pa.table({"u": t["u"], "v": t["v"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .join(adj_u, join_type="inner", num_partitions=num_partitions, on=("u",))
        .map_batches(
            lambda t: pa.table({"u": t["u"], "v": t["v"], "w": t["w"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .join(
            adj_vw,
            join_type="inner",
            num_partitions=num_partitions,
            on=("v", "w"),
        )
        .map_batches(count_pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"], num_partitions=num_partitions)
        .aggregate(Sum("one", alias_name="cn"))
        .materialize()
    )
    live = _nonempty_block_refs(cn)
    if not live:
        # bipartite-ish splits can leave NO candidate with a common
        # neighbor: every score is 0, no join needed
        scored = cands.map_batches(
            lambda t: pa.table(
                {
                    "u": t["u"],
                    "v": t["v"],
                    "lab": t["lab"],
                    "score": pa.array(
                        np.zeros(t.num_rows, np.float64), pa.float64()
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        scored = cands.join(
            ray.data.from_arrow_refs(live),
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("u", "v"),
        ).map_batches(
            lambda t: pa.table(
                {
                    "u": t["u"],
                    "v": t["v"],
                    "lab": t["lab"],
                    "score": pc.cast(pc.fill_null(t["cn"], 0), pa.float64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    # ONE sort, then a streaming scan: desc by (score, u, v) — tie groups
    # are contiguous, so both tie-averaged ROC ranks and deterministic PR
    # precision come from running prefix sums
    ordered = scored.sort(["score", "u", "v"], descending=[True, False, False])
    n_total = cands.count()
    n_pos = 0
    sum_avg_rank_pos = 0.0  # ascending tie-averaged ranks of positives
    ap_sum = 0.0
    cum_pos = 0
    base = 0  # desc rows consumed so far
    carry = None  # open tie group spanning batches: (score, start, n, npos)

    def group_rank_sum(start, n, npos):
        # group at desc positions [start, start+n-1]: ascending ranks
        # average to n_total - start + 1 - (n-1)/2
        return npos * (n_total - start + 1 - (n - 1) / 2.0)

    for b in ordered.iter_batches(batch_format="pyarrow", batch_size=65536):
        sc = b["score"].combine_chunks().to_numpy(zero_copy_only=False)
        lb = b["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        kk = len(sc)
        if kk == 0:
            continue
        ranks = np.arange(1, kk + 1, dtype=np.float64) + base
        cp = np.cumsum(lb) + cum_pos
        posm = lb == 1
        ap_sum += float((cp[posm] / ranks[posm]).sum())
        # contiguous tie groups within the batch
        newg = np.r_[True, sc[1:] != sc[:-1]]
        g_start = base + np.flatnonzero(newg) + 1.0
        g_n = np.diff(np.r_[np.flatnonzero(newg), kk]).astype(np.float64)
        g_pos = np.add.reduceat(lb.astype(np.float64), np.flatnonzero(newg))
        g_score = sc[newg]
        if carry is not None:
            if g_score[0] == carry[0]:
                g_start[0] = carry[1]
                g_n[0] += carry[2]
                g_pos[0] += carry[3]
            else:
                sum_avg_rank_pos += group_rank_sum(carry[1], carry[2], carry[3])
        # every group but the last is closed
        if len(g_n) > 1:
            sum_avg_rank_pos += float(
                np.sum(
                    g_pos[:-1]
                    * (n_total - g_start[:-1] + 1 - (g_n[:-1] - 1) / 2.0)
                )
            )
        carry = (g_score[-1], g_start[-1], g_n[-1], g_pos[-1])
        base += kk
        cum_pos = int(cp[-1])
        n_pos = cum_pos
    if carry is not None:
        sum_avg_rank_pos += group_rank_sum(carry[1], carry[2], carry[3])
    n_neg = n_total - n_pos
    if n_pos and n_neg:
        auc_roc = (sum_avg_rank_pos - n_pos * (n_pos + 1) / 2.0) / (
            n_pos * n_neg
        )
    else:
        auc_roc = 0.5
    auc_pr = ap_sum / n_pos if n_pos else 0.0
    return ray.data.from_arrow(
        pa.table(
            {
                "auc_roc": pa.array([auc_roc], pa.float64()),
                "auc_pr": pa.array([auc_pr], pa.float64()),
                "n_pos": pa.array([n_pos], pa.int64()),
                "n_neg": pa.array([n_neg], pa.int64()),
            }
        )
    )


def kfold_cross_validation(
    edges_ds,
    k: int = 5,
    neg_per_vertex: int = 8,
    seed: int = 0,
    num_partitions: int = 8,
):
    """KFoldCrossValidator (reference linkprediction/KFoldCrossValidator):
    the k residue classes of the deterministic pair hash partition the
    edge set exactly; fold f evaluates the common-neighbor predictor
    trained WITHOUT class f against class f as positives (same negatives
    contract as link_prediction_auc).  Folds run sequentially — each fold
    is itself a fully distributed pipeline, and k is a small constant.
    -> Dataset(k rows: fold, auc_roc, auc_pr, n_pos, n_neg)."""
    import ray.data

    outs = []
    for f in range(k):
        one = link_prediction_auc(
            edges_ds,
            holdout_mod=k,
            neg_per_vertex=neg_per_vertex,
            seed=seed,
            num_partitions=num_partitions,
            fold=f,
        ).map_batches(
            lambda t, f=f: t.add_column(
                0, "fold", pa.array(np.full(t.num_rows, f, np.int64))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        outs.append(one)
    ds = outs[0]
    for o in outs[1:]:
        ds = ds.union(o)
    return ds


def katz_index_scores(
    edges_ds,
    beta: float = 0.005,
    max_path: int = 3,
    num_partitions: int = 8,
):
    """KatzIndex link-prediction score (reference
    linkprediction/KatzIndex): katz(u, v) = sum_{l=1..max_path} beta^l *
    walks_l(u, v), the damped truncated walk-count series.  Per-level walk
    counts are INTEGER tables W_l = W_{l-1} |x| A (one co-partitioned join
    + grouped sum per level, pre-combined per batch); the polynomial is
    evaluated in one vectorized pass over the joined counts, so a SQL
    oracle computing the same expression is bit-identical.
    -> Dataset(u, v, katz_index) over unordered pairs u < v with a
    positive truncated count."""
    from ray.data.aggregate import Sum

    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    sym = symmetrize(canon).select_columns(["src", "dst"]).materialize()

    levels = []
    w = sym.map_batches(
        lambda t: pa.table(
            {"s": t["src"], "t": t["dst"], "c": np.ones(t.num_rows, np.int64)}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    levels.append(w)
    for _l in range(2, max_path + 1):
        nxt = w.join(
            sym, join_type="inner", num_partitions=num_partitions,
            on=("t",), right_on=("src",),
        ).map_batches(
            lambda t: pa.table({"s": t["s"], "t": t["dst"], "c": t["c"]})
            .group_by(["s", "t"])
            .aggregate([("c", "sum")])
            .rename_columns(["s", "t", "c"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).groupby(["s", "t"], num_partitions=num_partitions).aggregate(
            Sum("c", alias_name="c")
        ).map_batches(
            lambda t: pa.table(
                {"s": t["s"], "t": t["t"], "c": pc.cast(t["c"], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        levels.append(nxt)
        w = nxt

    # pad each level to (s, t, c1..cL) and union + grouped integer sums —
    # exact and order-free (a join-chain would drop pairs present only at
    # some levels: path endpoints have 2-walks but no 3-walks)
    L = max_path

    def pad(i):
        def f(t: pa.Table) -> pa.Table:
            cols = {"s": t["s"], "t": t["t"]}
            for j in range(1, L + 1):
                cols[f"c{j}"] = (
                    t["c"]
                    if j == i
                    else pa.array(np.zeros(t.num_rows, np.int64))
                )
            return pa.table(cols)

        return f

    acc = levels[0].map_batches(pad(1), batch_format="pyarrow", zero_copy_batch=True)
    for i, lv in enumerate(levels[1:], start=2):
        acc = acc.union(
            lv.map_batches(pad(i), batch_format="pyarrow", zero_copy_batch=True)
        )
    from ray.data.aggregate import Sum as _Sum

    acc = acc.groupby(["s", "t"], num_partitions=num_partitions).aggregate(
        *[_Sum(f"c{j}", alias_name=f"c{j}") for j in range(1, L + 1)]
    )

    betas = [beta]
    for _ in range(2, max_path + 1):
        betas.append(betas[-1] * beta)

    def finish(t: pa.Table) -> pa.Table:
        s = t["s"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["t"].combine_chunks().to_numpy(zero_copy_only=False)
        k = np.zeros(t.num_rows, np.float64)
        for i, b in enumerate(betas, start=1):
            k = k + t[f"c{i}"].combine_chunks().to_numpy(
                zero_copy_only=False
            ).astype(np.float64) * b
        keep = s < d
        return pa.table(
            {"u": s[keep], "v": d[keep], "katz_index": k[keep]}
        )

    return acc.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def link_prediction_scores(edges_ds, num_partitions: int = 8):
    """-> Dataset(u, v, cn, jaccard, adamic_adar, resource_alloc, pref_attach)
    for pairs with cn >= 1."""
    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    sym = symmetrize(canon).materialize()  # keeps w (out_degrees needs it)
    deg = (
        out_degrees(sym, weighted=False)
        .select_columns(["vid", "out_deg"])
        .materialize()
    )

    # adjacency annotated with pivot degree: (pivot=src, nbr=dst, inv_ln_deg)
    adj = (
        sym.join(
            deg,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("vid",),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "pivot": t["src"],
                    "nbr": t["dst"],
                    "inv_ln_deg": 1.0
                    / np.log(
                        np.maximum(
                            t["out_deg"].combine_chunks().to_numpy(zero_copy_only=False),
                            2,
                        ).astype(np.float64)
                    ),
                    # wedge pivots always have deg >= 2, no clamp needed for 1/d
                    "inv_deg": 1.0
                    / t["out_deg"]
                    .combine_chunks()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    wedges = adj.join(
        adj,
        join_type="inner",
        num_partitions=num_partitions,
        on=("pivot",),
        left_suffix="_l",
        right_suffix="_r",
    )

    def mk(t: pa.Table) -> pa.Table:
        u = t["nbr_l"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["nbr_r"].combine_chunks().to_numpy(zero_copy_only=False)
        ild = t["inv_ln_deg_l"].combine_chunks().to_numpy(zero_copy_only=False)
        idg = t["inv_deg_l"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = u < v
        out = pa.table(
            {"u": u[keep], "v": v[keep], "aa": ild[keep], "ra": idg[keep]}
        )
        # local pre-combine
        g = out.group_by(["u", "v"]).aggregate(
            [("aa", "sum"), ("ra", "sum"), ("aa", "count")]
        )
        return g.rename_columns(["u", "v", "aa", "ra", "cn"])

    pairs = (
        wedges.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"], num_partitions=num_partitions)
        .aggregate(
            Sum("aa", alias_name="adamic_adar"),
            Sum("ra", alias_name="resource_alloc"),
            Sum("cn", alias_name="cn"),
        )
    )

    # Jaccard denominator: deg(u) + deg(v) - cn
    j1 = pairs.join(
        deg, join_type="inner", num_partitions=num_partitions, on=("u",), right_on=("vid",)
    ).map_batches(
        lambda t: pa.table(
            {
                "u": t["u"],
                "v": t["v"],
                "cn": t["cn"],
                "adamic_adar": t["adamic_adar"],
                "resource_alloc": t["resource_alloc"],
                "deg_u": t["out_deg"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return (
        j1.join(
            deg, join_type="inner", num_partitions=num_partitions, on=("v",), right_on=("vid",)
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "u": t["u"],
                    "v": t["v"],
                    "cn": pc.cast(t["cn"], pa.int64()),
                    "jaccard": pc.divide(
                        pc.cast(t["cn"], pa.float64()),
                        pc.cast(
                            pc.subtract(
                                pc.add(t["deg_u"], t["out_deg"]), t["cn"]
                            ),
                            pa.float64(),
                        ),
                    ),
                    "adamic_adar": t["adamic_adar"],
                    "resource_alloc": t["resource_alloc"],
                    "pref_attach": pc.cast(
                        pc.multiply(t["deg_u"], t["out_deg"]), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
