"""Edge-table graph operations — the building blocks every pipeline shares.

All stages are vectorized pyarrow/numpy map_batches over the canonical edge
schema ``edges(src: int64, dst: int64, w: float64)``.  Shuffling operations
(dedup, degrees, distinct vertices) pre-aggregate inside map_batches before
the groupby so the all-to-all exchange moves pre-combined rows, not raw
edges (SURVEY.md §4.2: partial/final aggregation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum

EDGE_NAMES = ["src", "dst", "w"]


def _edges_table(src, dst, w) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pc.cast(src, pa.int64()),
            pc.cast(dst, pa.int64()),
            pc.cast(w, pa.float64()),
        ],
        names=EDGE_NAMES,
    )


def drop_self_loops(edges_ds):
    return edges_ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["src"], t["dst"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def canonicalize_undirected(
    edges_ds, drop_loops: bool = True, weight: str = "sum", dedupe: bool = True
):
    """Directed/multi edge table -> canonical undirected simple edges.

    Each edge is swapped to (min, max); self-loops optionally dropped; then
    exact dedup with weight aggregation ``sum`` | ``max`` | ``min`` | ``one``
    (``min`` is the shortest-path semantics for parallel edges).
    One shuffle on (src, dst), preceded by a per-batch local combine.

    ``dedupe=False`` skips the global groupby and returns locally-combined
    canonical rows that may still repeat ACROSS batches — sound for every
    consumer whose per-key math is duplicate-invariant under partial sums
    (CC min-propagation, PLP / PageRank weight tallies), and it removes an
    entire all-to-all exchange from those pipelines.  Consumers that need
    distinct edges (triangles, degrees, link prediction) keep the default.
    """

    def canon(t: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(t["src"], t["dst"])
        hi = pc.max_element_wise(t["src"], t["dst"])
        out = _edges_table(lo, hi, t["w"])
        if drop_loops:
            out = out.filter(pc.not_equal(out["src"], out["dst"]))
        # local pre-combine: collapse in-batch duplicates before the shuffle
        local_agg = {"sum": "sum", "min": "min"}.get(weight, "max")
        out = out.group_by(["src", "dst"]).aggregate(
            [("w", local_agg)]
        ).rename_columns(EDGE_NAMES)
        if weight == "one" and not dedupe:
            # duplicates across batches would double-count: a "one" weight
            # must survive re-aggregation, so emit the max-combinable form
            out = _edges_table(
                out["src"], out["dst"], np.ones(out.num_rows, dtype=np.float64)
            )
        return out

    ds = edges_ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
    if not dedupe:
        return ds
    agg = {
        "sum": Sum("w", alias_name="w"),
        "min": Min("w", alias_name="w"),
    }.get(weight, Max("w", alias_name="w"))
    ds = ds.groupby(["src", "dst"]).aggregate(agg)
    if weight == "one":
        ds = ds.map_batches(
            lambda t: _edges_table(
                t["src"], t["dst"], np.ones(t.num_rows, dtype=np.float64)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds


def dedup_edges(edges_ds, weight: str = "sum"):
    """Exact (src, dst) dedup of a *directed* edge table; weight
    sum/max/min/one (min = shortest-path semantics for parallel edges)."""

    local_agg = {"sum": "sum", "min": "min"}.get(weight, "max")

    def pre(t: pa.Table) -> pa.Table:
        return (
            t.select(EDGE_NAMES)
            .group_by(["src", "dst"])
            .aggregate([("w", local_agg)])
            .rename_columns(EDGE_NAMES)
        )

    ds = edges_ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    agg = {
        "sum": Sum("w", alias_name="w"),
        "min": Min("w", alias_name="w"),
    }.get(weight, Max("w", alias_name="w"))
    ds = ds.groupby(["src", "dst"]).aggregate(agg)
    if weight == "one":
        ds = ds.map_batches(
            lambda t: _edges_table(
                t["src"], t["dst"], np.ones(t.num_rows, dtype=np.float64)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds


def symmetrize(edges_ds):
    """Canonical (src<dst) edges -> both directions, in one map pass."""

    def both(t: pa.Table) -> pa.Table:
        fwd = t.select(EDGE_NAMES)
        rev = _edges_table(t["dst"], t["src"], t["w"])
        return pa.concat_tables([fwd, rev])

    return edges_ds.map_batches(both, batch_format="pyarrow", zero_copy_batch=True)


def out_degrees(edges_ds, weighted: bool = True):
    """(vid, out_deg, w_out_deg) per distinct src. Pre-combined shuffle."""

    def pre(t: pa.Table) -> pa.Table:
        g = t.group_by("src").aggregate([("dst", "count"), ("w", "sum")])
        return g.rename_columns(["vid", "cnt", "wsum"])

    ds = edges_ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    return (
        ds.groupby("vid")
        .aggregate(
            Sum("cnt", alias_name="out_deg"), Sum("wsum", alias_name="w_out_deg")
        )
    )


def vertices_from_edges(edges_ds):
    """Distinct vids appearing as src or dst -> Dataset(vid). One shuffle."""

    def pre(t: pa.Table) -> pa.Table:
        vids = pa.concat_arrays(
            [
                t["src"].combine_chunks().cast(pa.int64()),
                t["dst"].combine_chunks().cast(pa.int64()),
            ]
        )
        u = pc.unique(vids)
        return pa.Table.from_arrays([u], names=["vid"])

    ds = edges_ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("vid").count().select_columns(["vid"])


def transpose(edges_ds):
    """Directed edge table -> its transpose (reference GraphTools.transpose:
    a column swap, one stateless map pass)."""
    return edges_ds.map_batches(
        lambda t: _edges_table(t["dst"], t["src"], t["w"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def to_undirected(edges_ds, weight: str = "sum"):
    """Directed -> undirected simple graph (reference GraphTools.
    toUndirected): canonical (min,max) swap + dedup with weight merge."""
    return canonicalize_undirected(edges_ds, weight=weight)


def subgraph(edges_ds, vertices_ds, num_partitions: int = 8):
    """Induced subgraph on a vertex set (reference GraphTools.
    subgraphFromNodes): two co-partitioned semi-joins keep edges whose BOTH
    endpoints are in the set.  The vertex set streams — nothing requires it
    to fit anywhere."""
    verts = vertices_ds.select_columns(["vid"]).materialize()
    j1 = edges_ds.select_columns(EDGE_NAMES).join(
        verts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("vid",),
    ).map_batches(
        # explicit projection after a join (Ray 2.49 — compat.py)
        lambda t: t.select(EDGE_NAMES),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return j1.join(
        verts,
        join_type="inner",
        num_partitions=num_partitions,
        on=("dst",),
        right_on=("vid",),
    ).map_batches(
        lambda t: t.select(EDGE_NAMES),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def top_k(scores_ds, k: int, col: str = "score", descending: bool = True):
    """Global top-k by score (SURVEY.md §2.2 #12): distributed sort + limit."""
    return scores_ds.sort(col, descending=descending).limit(k)


def sample_edges(edges_ds, frac: float, seed: int = 42):
    """Deterministic edge sample (SURVEY.md §2.2 #17): seeded hash-filter —
    reproducible across runs and partitionings, unlike random_sample."""
    import pandas as pd

    threshold = np.uint64(int(frac * (1 << 64)))

    def pick(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(src * np.int64(0x9E3779B9) ^ dst ^ np.int64(seed))
        return t.filter(pa.array(h < threshold))

    return edges_ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def validate_sha256(corpus_with_sha_ds, col: str = "content", sha_col: str = "sha256"):
    """QA stage (SURVEY.md §2.2 #18): recompute sha256 per row and assert
    equality with the stored column; raises inside the task on mismatch.
    Returns the number of validated rows."""
    import hashlib

    def check(t: pa.Table) -> pa.Table:
        for content, sha in zip(t[col].to_pylist(), t[sha_col].to_pylist()):
            actual = hashlib.sha256((content or "").encode()).hexdigest()
            if actual != sha:
                raise ValueError(f"sha256 mismatch: {sha} != {actual}")
        return pa.table({"n": pa.array([t.num_rows], type=pa.int64())})

    checked = corpus_with_sha_ds.map_batches(
        check, batch_format="pyarrow", zero_copy_batch=True
    )
    return checked.sum("n") or 0
