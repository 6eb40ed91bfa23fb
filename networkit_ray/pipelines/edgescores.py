"""Edge-score utility family (reference catalog `edgescores/`,
SURVEY.md §2.3: PrefixJaccardScore, EdgeScoreAsWeight, EdgeScoreBlender,
EdgeScoreLinearizer, EdgeScoreNormalizer; /root/reference is empty —
semantics pinned to the published NetworKit API docs and brute pytest
oracles).

All ops are per-edge column transforms over a scored edge table
(src, dst, <score>): vectorized pyarrow/numpy inside ``map_batches``,
scalar aggregates for the global reductions (min/max, distinct-rank
prefix sums) — nothing edge-sized ever lands on the driver except the
documented distinct-score table of the linearizer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from networkit_ray.pipelines.structure import _edge_cn_with_degrees, _project


def prefix_jaccard_scores(edges_ds, k: int = 10, num_partitions: int = 8):
    """PrefixJaccardScore (reference edgescores/PrefixJaccardScore, the
    ranking core of Simmelian backbones): each vertex ranks its neighbors
    by tie strength (edge embeddedness = common-neighbor count, ties ->
    smaller vid) and keeps the top-k PREFIX set P_k(.); the edge score is
    the Jaccard of the two prefix sets,
    |P_k(u) ∩ P_k(v)| / |P_k(u) ∪ P_k(v)|.
    Same deterministic rank construction as simmelian_overlap_scores
    (rank = count of strictly-higher neighbors), so SQL-window
    mirrorable.  -> Dataset(src, dst, score)."""
    from ray.data.aggregate import Count, Sum

    cn = (
        _edge_cn_with_degrees(edges_ds, num_partitions)
        .select_columns(["src", "dst", "cn"])
        .materialize()
    )
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
                pc.less(t["above"], k).combine_chunks()
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    sizes = (
        topk.groupby("u", num_partitions=num_partitions)
        .aggregate(Count(alias_name="sz"))
        .materialize()
    )
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
                "inter": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return (
            out.group_by(["src", "dst"]).aggregate([("inter", "sum")])
            .rename_columns(["src", "dst", "inter"])
        )

    inter = (
        hits.map_batches(cnt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"], num_partitions=num_partitions)
        .aggregate(Sum("inter", alias_name="inter"))
        .materialize()
    )
    base = _project(
        cn.select_columns(["src", "dst"]).join(
            sizes, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("u",),
        ),
        {"src": "src", "dst": "dst", "sa": "sz"},
    )
    base = _project(
        base.join(
            sizes, join_type="inner", num_partitions=num_partitions,
            on=("dst",), right_on=("u",),
        ),
        {"src": "src", "dst": "dst", "sa": "sa", "sb": "sz"},
    )
    if inter.count() > 0:
        base = base.join(
            inter, join_type="left_outer", num_partitions=num_partitions,
            on=("src", "dst"),
        )
    else:
        base = base.map_batches(
            lambda t: t.append_column(
                "inter", pa.array(np.zeros(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def score(t: pa.Table) -> pa.Table:
        i = pc.fill_null(pc.cast(t["inter"], pa.int64()), 0)
        iv = i.combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        sa = t["sa"].combine_chunks().to_numpy(zero_copy_only=False)
        sb = t["sb"].combine_chunks().to_numpy(zero_copy_only=False)
        union = sa + sb - iv
        with np.errstate(invalid="ignore", divide="ignore"):
            s = np.where(union > 0, iv / union, 0.0)
        return pa.table({"src": t["src"], "dst": t["dst"], "score": s})

    return base.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def edge_score_as_weight(
    scored_ds,
    score_col: str = "score",
    squared: bool = False,
    offset: float = 0.0,
    factor: float = 1.0,
    num_partitions: int = 8,
):
    """EdgeScoreAsWeight (reference edgescores/EdgeScoreAsWeight):
    w = offset + factor * score (or factor * score^2).
    -> Dataset(src, dst, w)."""

    def conv(t: pa.Table) -> pa.Table:
        s = pc.cast(t[score_col], pa.float64())
        if squared:
            s = pc.multiply(s, s)
        w = pc.add(pc.multiply(s, pa.scalar(float(factor))), pa.scalar(float(offset)))
        return pa.table({"src": t["src"], "dst": t["dst"], "w": w})

    return scored_ds.map_batches(
        conv, batch_format="pyarrow", zero_copy_batch=True
    )


def blend_edge_scores(
    a_ds,
    b_ds,
    alpha: float = 0.5,
    a_col: str = "score",
    b_col: str = "score",
    num_partitions: int = 8,
):
    """EdgeScoreBlender (reference edgescores/EdgeScoreBlender):
    score = alpha * a + (1 - alpha) * b, joined on the canonical edge key.
    -> Dataset(src, dst, score)."""
    a = a_ds.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"],
             "sa": pc.cast(t[a_col], pa.float64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    b = b_ds.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"],
             "sb": pc.cast(t[b_col], pa.float64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = a.join(b, join_type="inner", num_partitions=num_partitions,
               on=("src", "dst"))
    al = float(alpha)

    def mix(t: pa.Table) -> pa.Table:
        s = pc.add(
            pc.multiply(t["sa"], pa.scalar(al)),
            pc.multiply(t["sb"], pa.scalar(1.0 - al)),
        )
        return pa.table({"src": t["src"], "dst": t["dst"], "score": s})

    return j.map_batches(mix, batch_format="pyarrow", zero_copy_batch=True)


def normalize_edge_scores(
    scored_ds,
    score_col: str = "score",
    invert: bool = False,
    lower: float = 0.0,
    upper: float = 1.0,
):
    """EdgeScoreNormalizer (reference edgescores/EdgeScoreNormalizer):
    min-max rescale to [lower, upper] (inverted maps the max to lower);
    two scalar aggregates + one vectorized pass.  Constant score columns
    map everything to ``lower``.  -> Dataset(src, dst, score)."""
    ds = scored_ds.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"],
             "score": pc.cast(t[score_col], pa.float64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    lo = ds.min("score")
    hi = ds.max("score")
    if lo is None:
        return ds
    span = float(hi) - float(lo)
    lo_f, up_f, lw_f = float(lo), float(upper), float(lower)

    def norm(t: pa.Table) -> pa.Table:
        s = t["score"].combine_chunks().to_numpy(zero_copy_only=False)
        if span <= 0:
            out = np.full(len(s), lw_f)
        else:
            x = (s - lo_f) / span
            if invert:
                x = 1.0 - x
            out = lw_f + x * (up_f - lw_f)
        return pa.table({"src": t["src"], "dst": t["dst"], "score": out})

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def linearize_edge_scores(
    scored_ds,
    score_col: str = "score",
    inverse: bool = False,
    num_partitions: int = 8,
    distinct_cap: int = 2_000_000,
):
    """EdgeScoreLinearizer (reference edgescores/EdgeScoreLinearizer):
    replace each score by its rank position scaled to [0, 1] — order is
    preserved, the distribution becomes uniform.  Ties (equal scores)
    all receive the AVERAGE position of their run, which is
    deterministic and partitioning-free (the reference leaves tie order
    unspecified).  Distributed shape: groupby(score).count() — the
    distinct-score table — then a driver-side prefix sum over distinct
    values (bounded by ``distinct_cap``, raises beyond: integer-ish score
    columns are small; for truly continuous columns normalize instead)
    and a broadcast vectorized lookup.  -> Dataset(src, dst, score)."""
    import ray

    ds = scored_ds.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"],
             "score": pc.cast(t[score_col], pa.float64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    dist = (
        ds.groupby("score", num_partitions=num_partitions)
        .count()
        .to_pandas()
    )
    if len(dist) > distinct_cap:
        raise ValueError(
            f"linearize_edge_scores: {len(dist)} distinct scores exceeds "
            f"distinct_cap={distinct_cap}; normalize_edge_scores instead"
        )
    dist = dist.sort_values("score").reset_index(drop=True)
    vals = dist["score"].to_numpy(np.float64)
    cnts = dist["count()"].to_numpy(np.int64)
    starts = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    m = int(cnts.sum())
    # average position of each tie run, scaled by 1/(m-1)
    avg_pos = (starts + (cnts - 1) / 2.0) / max(m - 1, 1)
    if inverse:
        avg_pos = 1.0 - avg_pos
    ref = ray.put((vals, avg_pos))

    def lin(t: pa.Table) -> pa.Table:
        v, p = ray.get(ref)
        s = t["score"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(v, s)
        return pa.table({"src": t["src"], "dst": t["dst"], "score": p[idx]})

    return ds.map_batches(lin, batch_format="pyarrow", zero_copy_batch=True)
