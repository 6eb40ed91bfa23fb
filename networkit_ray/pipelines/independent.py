"""Maximal independent set — Luby's algorithm (reference independentset/
Luby; SURVEY.md §2.3 "random-priority rounds").

Deterministic variant: the per-round priority of vertex v is
hash(v, round, seed) (counter-based, no RNG state), so the result is
bit-identical across partitionings and re-runs while keeping Luby's
O(log n) expected round count.  Each round:

  1. join active edges with priorities on both endpoints (one exchange;
     priorities are derived IN the map from the vid — no table needed);
  2. per-vertex max neighbor priority (pre-combined groupby);
  3. winners = active vertices whose priority beats every active
     neighbor's (ties broken by vid — priorities get the vid mixed in,
     collisions are ~2^-64); winners enter the MIS, winners+neighbors
     deactivate, incident edges drop.

Output is a valid maximal independent set: no two members adjacent
(winners beat strict neighbors), and every non-member has a member
neighbor (it was deactivated by one).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Max

from networkit_ray.stages.graphops import (
    canonicalize_undirected,
    symmetrize,
    vertices_from_edges,
)

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _priority(vids: np.ndarray, rnd: int, seed: int) -> np.ndarray:
    key = vids.astype(np.uint64) * _MIX + np.uint64(rnd * 2654435761 + seed)
    return pd.util.hash_array(key.view(np.int64)).view(np.int64)


def luby_mis(
    edges_ds,
    vertices_ds=None,
    seed: int = 42,
    num_partitions: int = 8,
    max_rounds: int = 200,
):
    """-> Dataset(vid): a maximal independent set (deterministic Luby)."""
    import ray.data

    sym = (
        symmetrize(canonicalize_undirected(edges_ds, weight="one"))
        .select_columns(["src", "dst"])
        .materialize()
    )
    if vertices_ds is None:
        vertices_ds = vertices_from_edges(edges_ds)
    active_v = vertices_ds.select_columns(["vid"]).materialize()
    mis_parts: list = []
    edges = sym
    converged = False

    for rnd in range(1, max_rounds + 1):
        if active_v.count() == 0:
            converged = True
            break
        if edges.count() == 0:
            # no remaining conflicts: every active vertex joins the MIS
            mis_parts.append(active_v)
            converged = True
            break

        def pr_edges(t: pa.Table, _r=rnd) -> pa.Table:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({"vid": src, "nb_p": _priority(dst, _r, seed)})

        # max active-neighbor priority per vertex (pre-combined)
        def pre(t: pa.Table) -> pa.Table:
            return (
                t.group_by("vid").aggregate([("nb_p", "max")])
                .rename_columns(["vid", "nb_p"])
            )

        nb_max = (
            edges.map_batches(pr_edges, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Max("nb_p", alias_name="nb_p"))
            .materialize()
        )

        # winners: active vertices with priority above every active
        # neighbor; isolated-in-remaining vertices (no nb_max row) win too
        marked = nb_max.map_batches(
            lambda t: pa.table({"vid": t["vid"], "nb_p": t["nb_p"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        joined = active_v.join(
            marked,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("vid",),
        )

        def pick(t: pa.Table, _r=rnd) -> pa.Table:
            v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
            nb = t["nb_p"].combine_chunks()
            own = _priority(v, _r, seed)
            nb_np = np.where(
                pc.is_null(nb).to_numpy(zero_copy_only=False),
                np.iinfo(np.int64).min,
                nb.fill_null(np.iinfo(np.int64).min).to_numpy(zero_copy_only=False),
            )
            win = own > nb_np
            return pa.table({"vid": v[win]})

        winners = joined.map_batches(
            pick, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        if winners.count() == 0:
            continue  # rare all-tie round; next round redraws priorities
        mis_parts.append(winners)

        # deactivate winners + their neighbors
        w_marked = winners.map_batches(
            lambda t: pa.table(
                {"vid": t["vid"], "win": np.ones(t.num_rows, dtype=np.int64)}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        # neighbors of winners
        nb_of_w = (
            edges.join(
                w_marked,
                join_type="inner",
                num_partitions=num_partitions,
                on=("src",),
                right_on=("vid",),
            )
            .map_batches(
                lambda t: pa.table({"vid": pc.unique(t["dst"].combine_chunks())}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("vid", num_partitions=num_partitions)
            .count()
            .select_columns(["vid"])
        )
        gone = (
            nb_of_w.union(winners)
            .map_batches(
                lambda t: pa.table(
                    {"vid": t["vid"], "gone": np.ones(t.num_rows, dtype=np.int64)}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("vid", num_partitions=num_partitions)
            .aggregate(Max("gone", alias_name="gone"))
            .materialize()
        )
        active_v = (
            active_v.join(
                gone,
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
        if active_v.count() == 0:
            break
        # drop edges with any deactivated endpoint (keep both-active)
        act = active_v.map_batches(
            lambda t: pa.table(
                {"vid": t["vid"], "a": np.ones(t.num_rows, dtype=np.int64)}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        e1 = edges.join(
            act, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("vid",),
        ).map_batches(
            lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        edges = e1.join(
            act, join_type="inner", num_partitions=num_partitions,
            on=("dst",), right_on=("vid",),
        ).map_batches(
            lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

    if not converged and active_v.count() != 0:
        # silently dropping active vertices would return a NON-maximal set,
        # violating the documented contract; Luby converges in O(log n)
        # expected rounds, so exhaustion means max_rounds was set too low
        raise RuntimeError(
            f"luby_mis: {active_v.count()} vertices still active after "
            f"max_rounds={max_rounds}; raise max_rounds"
        )
    if not mis_parts:
        import ray.data as _rd

        return _rd.from_arrow(pa.table({"vid": pa.array([], pa.int64())}))
    out = mis_parts[0]
    for p in mis_parts[1:]:
        out = out.union(p)
    return out
