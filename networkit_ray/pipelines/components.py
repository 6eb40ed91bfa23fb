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


_SCC_MIX = np.uint64(0x9E3779B97F4A7C15)


def _scc_priority(vids: np.ndarray, rnd: int, seed: int) -> np.ndarray:
    """Counter-based per-round vertex priority (deterministic; re-randomized
    each round so adversarial vid orderings cannot force sequential pivot
    chains)."""
    import pandas as pd

    key = vids.astype(np.uint64) * _SCC_MIX + np.uint64(rnd * 2654435761 + seed)
    return pd.util.hash_array(key.view(np.int64)).view(np.int64) >> 1


def _tag_reach(edges, seeds, num_partitions, reverse=False):
    """Multi-source reachability, one source per tag group, over a
    materialized same-tag edge set -> materialized Dataset(vid, tag).
    Every tag's frontier expands in the SAME join rounds (the multi-pivot
    replacement for one-reach-per-pivot); per-round cost is one inner join
    + one anti-join regardless of how many pivots are live.  A vid belongs
    to exactly one tag, so frontier rows carry the tag and joins key on vid
    alone."""
    src_col, dst_col = ("dst", "src") if reverse else ("src", "dst")
    visited = seeds.materialize()
    if edges.count() == 0:  # empty join sides crash Ray 2.49 (compat.py)
        return visited
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
            {"vid": dst_col, "tag": "tag"},
        )
        nxt = (
            nxt.groupby("vid", num_partitions=num_partitions)
            .aggregate(Min("tag", alias_name="tag"))  # distinct vid (one tag)
            .materialize()
        )
        if nxt.count() == 0:  # empty join sides crash Ray 2.49 (compat.py)
            return visited
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
                    {
                        "vid": t["vid"].filter(pc.is_null(t["seen"])),
                        "tag": t["tag"].filter(pc.is_null(t["seen"])),
                    }
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
    max_trim_rounds: int = 100,
    seed: int = 42,
    max_pivots: int | None = None,  # retained for API compat; unused
):
    """Directed SCC via parallel FW-BW-Trim with multi-pivot coloring ->
    (Dataset(vid, label), stats); label = min vid of the SCC.

    Fleischer/Hendrickson/Pinar FW-BW with McLendon-style trimming, but the
    round-2 one-pivot-per-round loop (and its hard ``max_pivots`` raise)
    is replaced by the ColorSCC refinement (Orzan; Slota/Rajamanickam
    Multistep): EVERY remaining vertex is a potential pivot each round.

    - TRIM rounds peel vertices with zero in- or out-degree inside the
      remaining subgraph (each a singleton SCC); this alone resolves
      DAG-like graphs with no coloring at all.
    - Each COLOR round draws a deterministic per-round random priority for
      every vertex, forward-propagates the minimum reaching priority to a
      fixpoint (directed hash-min), takes every vertex whose color equals
      its own priority as a ROOT (disjoint regions each produce their own
      root — e.g. N disjoint cycles all resolve in ONE round), runs ONE
      multi-source backward reach from all roots simultaneously restricted
      to same-color edges, and labels each color's reached set (= exactly
      SCC(root)) with its min vid.  Priorities re-randomize every round, so
      adversarial vid orderings cannot force sequential behavior; a
      priority collision between two roots is detected (tiny root-side
      groupby) and the round redrawn — correctness never depends on hash
      uniqueness.
    """
    import ray.data

    stats = {"trim_rounds": 0, "pivots": 0, "redraws": 0}
    edges = (
        drop_self_loops(dedup_edges(edges_ds, weight="one"))
        .select_columns(["src", "dst"])
        .materialize()
    )
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    remaining = vertices_ds.select_columns(["vid"]).materialize()
    label_parts: list = []

    def _self_label_rows(vids_ds):
        return vids_ds.map_batches(
            lambda t: pa.table({"vid": t["vid"], "label": t["vid"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    rseq = 0  # monotone draw counter (bumps on redraws too)
    while remaining.count() > 0:
        # ---- trim loop ---------------------------------------------------
        for _ in range(max_trim_rounds):
            stats["trim_rounds"] += 1
            if edges.count() == 0:
                # everything left is a singleton SCC
                label_parts.append(_self_label_rows(remaining).materialize())
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
                label_parts.append(_self_label_rows(remaining).materialize())
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
            label_parts.append(_self_label_rows(trimmed).materialize())
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

        # ---- multi-pivot coloring round ---------------------------------
        stats["pivots"] += 1
        while True:  # redraw loop (priority collisions between roots)
            rseq += 1

            def _init_colors(t: pa.Table, _r=rseq) -> pa.Table:
                v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
                return pa.table({"vid": v, "ck": _scc_priority(v, _r, seed)})

            colors = remaining.map_batches(
                _init_colors, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()

            # forward hash-min of priorities to the fixpoint: ck(v) = min
            # priority over vertices with a directed path to v
            while True:
                msgs = (
                    edges.join(
                        colors,
                        join_type="inner",
                        num_partitions=num_partitions,
                        on=("src",),
                        right_on=("vid",),
                    )
                    .map_batches(
                        lambda t: pa.table({"vid": t["dst"], "m": t["ck"]})
                        .group_by("vid")
                        .aggregate([("m", "min")])
                        .rename_columns(["vid", "m"]),
                        batch_format="pyarrow",
                        zero_copy_batch=True,
                    )
                    .groupby("vid", num_partitions=num_partitions)
                    .aggregate(Min("m", alias_name="m"))
                )
                joined = colors.join(
                    msgs,
                    join_type="left_outer",
                    num_partitions=num_partitions,
                    on=("vid",),
                )
                new_colors = joined.map_batches(
                    lambda t: pa.table(
                        {
                            "vid": t["vid"],
                            "ck": pc.min_element_wise(
                                t["ck"],
                                pc.fill_null(t["m"], np.iinfo(np.int64).max),
                            ),
                            "chg": pc.cast(
                                pc.less(
                                    pc.min_element_wise(
                                        t["ck"],
                                        pc.fill_null(
                                            t["m"], np.iinfo(np.int64).max
                                        ),
                                    ),
                                    t["ck"],
                                ),
                                pa.int64(),
                            ),
                        }
                    ),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                ).materialize()
                changed = new_colors.sum("chg") or 0
                colors = new_colors.select_columns(["vid", "ck"]).materialize()
                if changed == 0:
                    break

            # roots: own priority survived as the color
            def _root_rows(t: pa.Table, _r=rseq) -> pa.Table:
                v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
                ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False)
                is_root = ck == _scc_priority(v, _r, seed)
                return pa.table({"vid": v[is_root], "tag": ck[is_root]})

            roots = colors.map_batches(
                _root_rows, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
            dup_roots = (
                roots.groupby("tag", num_partitions=num_partitions)
                .count()
                .map_batches(
                    lambda t: pa.table(
                        {
                            "n": pa.array(
                                [
                                    int(
                                        pc.sum(
                                            pc.cast(
                                                pc.greater(t["count()"], 1),
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
            if not dup_roots:
                break
            stats["redraws"] += 1  # ~2^-63 per root pair; redraw the round

        # same-color edge set for the backward sweep
        ce = _scc_proj(
            edges.join(
                colors,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("vid",),
            ),
            {"src": "src", "dst": "dst", "ck_s": "ck"},
        )
        ce = _scc_proj(
            ce.join(
                colors,
                join_type="inner",
                num_partitions=num_partitions,
                on=("dst",),
                right_on=("vid",),
            ),
            {"src": "src", "dst": "dst", "ck_s": "ck_s", "ck_d": "ck"},
        )
        ce = ce.map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"].filter(pc.equal(t["ck_s"], t["ck_d"])),
                    "dst": t["dst"].filter(pc.equal(t["ck_s"], t["ck_d"])),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

        # one multi-source backward reach from ALL roots at once; a color's
        # reached set is exactly SCC(root) (root reaches v forward by color
        # definition; v reaches root backward within the class)
        reached = _tag_reach(ce, roots, num_partitions, reverse=True)
        scc_min = (
            reached.map_batches(
                lambda t: pa.table({"tag": t["tag"], "label": t["vid"]})
                .group_by("tag")
                .aggregate([("label", "min")])
                .rename_columns(["tag", "label"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("tag", num_partitions=num_partitions)
            .aggregate(Min("label", alias_name="label"))
        )
        labeled = _scc_proj(
            reached.join(
                scc_min,
                join_type="inner",
                num_partitions=num_partitions,
                on=("tag",),
            ),
            {"vid": "vid", "label": "label"},
        ).materialize()
        label_parts.append(labeled)

        # remove the labeled SCCs from remaining + edges
        gone = labeled.map_batches(
            lambda t: pa.table(
                {"vid": t["vid"], "gone": np.ones(t.num_rows, dtype=np.int64)}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        remaining = (
            remaining.join(
                gone,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("vid",),
            )
            .map_batches(
                lambda t: pa.table(
                    {"vid": t["vid"].filter(pc.is_null(t["gone"]))}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
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

    if not label_parts:
        out = _self_label_rows(vertices_ds.select_columns(["vid"]))
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
