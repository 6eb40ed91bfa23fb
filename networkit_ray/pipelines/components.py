"""Connected components — both north-rule strategies (SURVEY.md §2.1.2).

Pinned spec: undirected graph; output label = minimum vid in the component
(canonical, order-independent), making "exact component equality" vs the
reference (networkit.components.ConnectedComponents, BASELINE.json:6 —
operationalized by canonicalized networkx.connected_components, SURVEY.md §0)
well defined.

- ``mode="hashmin"``: O(diameter) rounds; each round is one pre-combined
  groupby(vid).min(label) shuffle of neighbor labels.  Fully streaming —
  nothing ever leaves the cluster but two scalars per round.
- ``mode="unionfind"``: the filtering/contraction CC — every edge block runs
  a local in-memory union-find and emits only its spanning-forest
  equivalence pairs (≤ distinct vids in the block); rounds of local
  contraction shrink the pair set geometrically; the final (small)
  contracted equivalence set is solved by one union-find reducer.  1.5
  shuffles typical vs O(diameter).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Min

from networkit_ray.stages.graphops import (
    canonicalize_undirected,
    dedup_edges,
    drop_self_loops,
    symmetrize,
    vertices_from_edges,
)
def connected_components(
    edges_ds,
    vertices_ds=None,
    mode: str = "unionfind",
    num_partitions: int = 8,
    max_iter: int = 200,
    driver_pair_limit: int = 2_000_000,
    engine: str = "dataset",
):
    """edges(src,dst,w) [+ vertices(vid)] -> (Dataset(vid, label), rounds).

    ``engine="actor"`` runs hash-min on the BSP CSR actor pool
    (state/csr.py); ``mode`` selects the Dataset-engine strategy.
    """
    canon = canonicalize_undirected(edges_ds, weight="one", dedupe=False)
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    vertices_ds = vertices_ds.select_columns(["vid"])
    if engine == "actor":
        from networkit_ray.state.csr import BSPGraph

        g = BSPGraph(symmetrize(canon), vertices_ds, num_partitions)
        try:
            return g.cc_hashmin(max_iter=max_iter)
        finally:
            g.shutdown()
    if mode == "hashmin":
        return _cc_hashmin(canon, vertices_ds, num_partitions, max_iter)
    return _cc_unionfind(canon, vertices_ds, num_partitions, driver_pair_limit)


def weakly_connected_components(edges_ds, vertices_ds=None, **kw):
    """Directed edge table -> weak components (reference components/
    WeaklyConnectedComponents: toUndirected + CC).  connected_components
    already canonicalizes to the undirected view, so this is the same
    computation under the directed-input name."""
    return connected_components(edges_ds, vertices_ds, **kw)


def _scc_proj(ds, cols: dict):
    """Explicit projection after a join (Ray 2.49 — compat.py)."""
    return ds.map_batches(
        lambda t: pa.table({name: t[src] for name, src in cols.items()}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _distinct_col(ds, col, num_partitions):
    def pre(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(t[col].combine_chunks())})

    return (
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(col, num_partitions=num_partitions)
        .count()
        .select_columns([col])
    )


def _semi_join(ds, keep_ds, on, num_partitions, out_cols):
    """Inner semi-join: rows of ds whose ``on`` value appears in keep_ds
    (keep_ds must be a materialized single-column 'vid' set)."""
    return _scc_proj(
        ds.join(
            keep_ds,
            join_type="inner",
            num_partitions=num_partitions,
            on=(on,),
            right_on=("vid",),
        ),
        out_cols,
    )


def _reach(edges, start_vid, num_partitions, reverse=False):
    """Directed reachable set from start_vid over a materialized edge set
    -> materialized Dataset(vid).  Frontier rounds: one inner join + one
    anti-join (left_outer + null filter) per round."""
    import ray.data

    src_col, dst_col = ("dst", "src") if reverse else ("src", "dst")
    visited = ray.data.from_arrow(
        pa.table({"vid": np.array([start_vid], dtype=np.int64)})
    ).materialize()
    frontier = visited
    while True:
        nxt = _scc_proj(
            edges.join(
                frontier,
                join_type="inner",
                num_partitions=num_partitions,
                on=(src_col,),
                right_on=("vid",),
            ),
            {"vid": dst_col},
        )
        nxt = (
            nxt.groupby("vid", num_partitions=num_partitions)
            .count()
            .select_columns(["vid"])
            .materialize()
        )
        if nxt.count() == 0:  # empty join sides crash Ray 2.49 (compat.py)
            return visited
        # anti-join vs visited
        marked = visited.map_batches(
            lambda t: pa.table(
                {"vid": t["vid"], "seen": np.ones(t.num_rows, dtype=np.int64)}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        newly = (
            nxt.join(
                marked,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("vid",),
            )
            .map_batches(
                lambda t: pa.table(
                    {"vid": t["vid"].filter(pc.is_null(t["seen"]))}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
        if newly.count() == 0:
            return visited
        visited = visited.union(newly).materialize()
        frontier = newly


def strongly_connected_components(
    edges_ds,
    vertices_ds=None,
    num_partitions: int = 8,
    max_pivots: int = 64,
    max_trim_rounds: int = 100,
):
    """Directed SCC via FW-BW-Trim (Fleischer/Hendrickson/Pinar 2000 with
    the trimming step of McLendon et al.) -> (Dataset(vid, label), stats);
    label = min vid of the SCC.

    - TRIM rounds peel vertices with zero in- or out-degree inside the
      remaining subgraph (each is a singleton SCC) — this alone resolves
      DAG-like graphs (e.g. the bipartite customer-supplier projection)
      with no pivoting at all.
    - Each PIVOT round takes the minimum remaining vid, computes forward
      and backward reachable sets (frontier joins), labels FW∩BW as one
      SCC, removes it, and resumes trimming.  ``max_pivots`` bounds the
      sequential pivot count; graphs with more non-trivial SCCs than that
      raise (documented limitation — the reference's Tarjan is inherently
      sequential; FW-BW is the standard parallel compromise).
    """
    import ray.data

    stats = {"trim_rounds": 0, "pivots": 0}
    edges = (
        drop_self_loops(dedup_edges(edges_ds, weight="one"))
        .select_columns(["src", "dst"])
        .materialize()
    )
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    remaining = vertices_ds.select_columns(["vid"]).materialize()
    label_parts: list = []

    def _label_rows(vids_ds, label_of_vid=None, const_label=None):
        def mk(t: pa.Table) -> pa.Table:
            v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
            lab = (
                v
                if const_label is None
                else np.full(len(v), const_label, dtype=np.int64)
            )
            return pa.table({"vid": v, "label": lab})

        return vids_ds.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)

    while remaining.count() > 0:
        # ---- trim loop ---------------------------------------------------
        for _ in range(max_trim_rounds):
            stats["trim_rounds"] += 1
            if edges.count() == 0:
                # everything left is a singleton SCC
                label_parts.append(_label_rows(remaining).materialize())
                remaining = ray.data.from_arrow(
                    pa.table({"vid": pa.array([], pa.int64())})
                )
                break
            srcs = _distinct_col(edges, "src", num_partitions).materialize()
            dsts = _distinct_col(edges, "dst", num_partitions).materialize()
            # vertices with BOTH roles survive; everything else trims
            both = _semi_join(
                _scc_proj(srcs, {"vid": "src"}),
                _scc_proj(dsts, {"vid": "dst"}).materialize(),
                "vid",
                num_partitions,
                {"vid": "vid"},
            ).materialize()
            n_both = both.count()
            n_rem = remaining.count()
            if n_both == 0:
                # pure DAG remainder: every remaining vertex is a singleton
                label_parts.append(_label_rows(remaining).materialize())
                remaining = ray.data.from_arrow(
                    pa.table({"vid": pa.array([], pa.int64())})
                )
                break
            if n_both == n_rem:
                break
            trimmed = (
                remaining.join(
                    both.map_batches(
                        lambda t: pa.table(
                            {
                                "vid": t["vid"],
                                "keep": np.ones(t.num_rows, dtype=np.int64),
                            }
                        ),
                        batch_format="pyarrow",
                        zero_copy_batch=True,
                    ),
                    join_type="left_outer",
                    num_partitions=num_partitions,
                    on=("vid",),
                )
                .map_batches(
                    lambda t: pa.table(
                        {"vid": t["vid"].filter(pc.is_null(t["keep"]))}
                    ),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                .materialize()
            )
            if trimmed.count() == 0:
                break
            label_parts.append(_label_rows(trimmed).materialize())
            remaining = both
            if remaining.count() == 0:
                break
            edges = _semi_join(
                _semi_join(
                    edges, remaining, "src", num_partitions,
                    {"src": "src", "dst": "dst"},
                ),
                remaining,
                "dst",
                num_partitions,
                {"src": "src", "dst": "dst"},
            ).materialize()
        if remaining.count() == 0:
            break
        # ---- pivot: FW ∩ BW ---------------------------------------------
        stats["pivots"] += 1
        if stats["pivots"] > max_pivots:
            raise RuntimeError(
                f"strongly_connected_components: pivot budget {max_pivots} "
                f"exhausted with {remaining.count()} vertices remaining — "
                "this graph's SCC structure needs more FW-BW rounds than "
                "configured (raise max_pivots)."
            )
        pivot = int(remaining.min("vid"))
        fw = _reach(edges, pivot, num_partitions, reverse=False)
        bw = _reach(edges, pivot, num_partitions, reverse=True)
        scc = _semi_join(fw, bw, "vid", num_partitions, {"vid": "vid"}).materialize()
        label_parts.append(_label_rows(scc, const_label=pivot).materialize())
        # remove the SCC from remaining + edges
        scc_marked = scc.map_batches(
            lambda t: pa.table(
                {"vid": t["vid"], "gone": np.ones(t.num_rows, dtype=np.int64)}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        remaining = (
            remaining.join(
                scc_marked,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("vid",),
            )
            .map_batches(
                lambda t: pa.table({"vid": t["vid"].filter(pc.is_null(t["gone"]))}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
        if remaining.count() == 0:
            break
        edges = _semi_join(
            _semi_join(
                edges, remaining, "src", num_partitions, {"src": "src", "dst": "dst"}
            ),
            remaining,
            "dst",
            num_partitions,
            {"src": "src", "dst": "dst"},
        ).materialize()

    if not label_parts:
        out = _label_rows(vertices_ds.select_columns(["vid"]))
    else:
        out = label_parts[0]
        for p in label_parts[1:]:
            out = out.union(p)
    return out, stats


def _cc_hashmin(canon, vertices_ds, num_partitions, max_iter):
    sym = symmetrize(canon).select_columns(["src", "dst"]).materialize()

    labels = vertices_ds.map_batches(
        lambda t: pa.table({"vid": t["vid"], "label": t["vid"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    if sym.count() == 0:
        return labels, 1

    def _msg(t: pa.Table) -> pa.Table:
        out = pa.table({"vid": t["dst"], "m": t["label"]})
        return out.group_by("vid").aggregate([("m", "min")]).rename_columns(
            ["vid", "m"]
        )

    rounds = 0
    for rounds in range(1, max_iter + 1):
        msgs = (
            sym.join(
                labels,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("vid",),
            )
            .map_batches(_msg, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Min("m", alias_name="m"))
        )
        joined = labels.join(
            msgs, join_type="left_outer", num_partitions=num_partitions, on=("vid",)
        )
        new_labels = joined.map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "label": pc.min_element_wise(
                        t["label"], pc.fill_null(t["m"], np.iinfo(np.int64).max)
                    ),
                    "chg": pc.cast(
                        pc.less(
                            pc.min_element_wise(
                                t["label"],
                                pc.fill_null(t["m"], np.iinfo(np.int64).max),
                            ),
                            t["label"],
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        changed = new_labels.sum("chg") or 0
        labels = new_labels.select_columns(["vid", "label"]).materialize()
        if changed == 0:
            break
    return labels, rounds


def _local_forest(t: pa.Table) -> pa.Table:
    """One edge block -> (vid, local-min-root) equivalence pairs.

    Fully vectorized local contraction (numpy_components: hash-min hooking
    + pointer-jumping shortcuts — O(log n) numpy passes, no per-edge
    Python)."""
    from networkit_ray.pipelines.equivalence import numpy_components

    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    if len(src) == 0:
        return pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    vids, roots = numpy_components(src, dst)
    keep = vids != roots  # self pairs carry no information
    return pa.table({"src": vids[keep], "dst": roots[keep]})


def _cc_unionfind(canon, vertices_ds, num_partitions, driver_pair_limit):
    from networkit_ray.pipelines.equivalence import resolve_equivalence_pairs

    pairs = canon.select_columns(["src", "dst"]).map_batches(
        _local_forest, batch_format="pyarrow", zero_copy_batch=True
    )
    rounds = 1
    count = pairs.count()
    # contraction rounds: co-locate pairs, re-run local contraction.  Stop
    # when the pair set stops shrinking — a fully contracted forest has
    # ~(n - #comp) pairs and cannot shrink further.
    while count > driver_pair_limit and rounds < 6:
        new_pairs = pairs.repartition(num_partitions, shuffle=True).map_batches(
            _local_forest, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        rounds += 1
        new_count = new_pairs.count()
        if new_count >= count:
            break
        pairs, count = new_pairs, new_count

    # endgame: the contracted set is ~the per-vertex root map, O(V) —
    # resolve_equivalence_pairs keeps it DISTRIBUTED (star contraction)
    # above driver_pair_limit and solves small sets in one vectorized
    # driver pass (no per-pair interpreted union-find either way)
    root_ds = resolve_equivalence_pairs(
        pairs, num_partitions=num_partitions, driver_pair_limit=driver_pair_limit
    ).materialize()

    if root_ds.count() == 0:
        # edgeless graph: every vertex is its own component (empty join
        # sides crash Ray 2.49 shuffles — compat.py)
        labels = vertices_ds.map_batches(
            lambda t: pa.table({"vid": t["vid"], "label": t["vid"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return labels, rounds

    # vertices not touched by any edge are their own component
    labels = (
        vertices_ds.join(
            root_ds, join_type="left_outer", num_partitions=num_partitions, on=("vid",)
        )
        .map_batches(
            lambda t: pa.table(
                {"vid": t["vid"], "label": pc.coalesce(t["label"], t["vid"])}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    return labels, rounds
