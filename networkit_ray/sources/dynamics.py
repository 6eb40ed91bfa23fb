"""Dynamic-graph event streams: generators, DGS IO, and snapshot replay
(reference catalog `dynamics/` + `generators/Dynamic*` — SURVEY.md §2.3;
/root/reference is empty, so semantics are pinned to the published
GraphEvent model: typed (time, type, u, v, w) events, with snapshots as
the fold of the event prefix).

Event table schema (the engine-wide contract):
    seq  int64   total order over the stream (ties are same-kind adds)
    t    int64   logical time step (the DGS ``st`` clock)
    type string  node_add | node_del | edge_add | edge_del |
                 weight_update | time_step
    u, v int64   endpoints (v = -1 for node/step events)
    w    float64 weight payload (1.0 default)

Ray-Data-native shape: generator events derive counter-style from hashed
ids (`ray.data.range` -> map_batches), so streams are bit-identical across
partitionings and resumable at block granularity; ``events_to_snapshot``
is a groupby-max fold (last event per edge key wins), never a sequential
replay.  DGS is a line-ordered single-file format, so its reader/writer
are documented DRIVER-SIDE compat paths like METIS (sources/io.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from networkit_ray.sources.generators import _uniform

EVENT_TYPES = (
    "node_add",
    "node_del",
    "edge_add",
    "edge_del",
    "weight_update",
    "time_step",
)


def _events_table(seq, t, typ, u, v, w) -> pa.Table:
    return pa.table(
        {
            "seq": np.asarray(seq, np.int64),
            "t": np.asarray(t, np.int64),
            "type": pa.array(typ, pa.string()),
            "u": np.asarray(u, np.int64),
            "v": np.asarray(v, np.int64),
            "w": np.asarray(w, np.float64),
        }
    )


def dynamic_path_events(n: int, parallelism: int = 8):
    """DynamicPathGenerator: node i arrives at step i, edge (i-1, i) with
    it.  -> Dataset of 2n-1 events."""
    import ray.data

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        # per node i: node_add at seq 2i; for i>0 edge_add (i-1, i) at 2i+1
        e = ids[ids > 0]
        return pa.concat_tables(
            [
                _events_table(
                    2 * ids, ids, ["node_add"] * len(ids), ids,
                    np.full(len(ids), -1), np.ones(len(ids)),
                ),
                _events_table(
                    2 * e + 1, e, ["edge_add"] * len(e), e - 1, e,
                    np.ones(len(e)),
                ),
            ]
        )

    return ray.data.range(n, override_num_blocks=parallelism).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )


def dynamic_barabasi_albert_events(
    n: int, k: int, seed: int = 42, parallelism: int = 8
):
    """DynamicBarabasiAlbertGenerator: the growth replay of the static
    Batagelj–Brandes construction (generators.barabasi_albert_edges) —
    node v arrives at step v together with its k preferential-attachment
    edges, so the final snapshot is BIT-IDENTICAL to the static generator
    with the same seed.  -> Dataset of n*(k+1) events."""
    import ray.data

    from networkit_ray.sources.generators import barabasi_albert_edges

    edges = barabasi_albert_edges(n, k, seed=seed, parallelism=parallelism)

    def edge_events(tbl: pa.Table) -> pa.Table:
        s = tbl["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = tbl["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        w = tbl["w"].combine_chunks().to_numpy(zero_copy_only=False)
        # src is the arriving node: its edges land at step src, after the
        # node_add (seq 2*src) — same-step adds need no finer order
        return _events_table(
            2 * s + 1, s, ["edge_add"] * len(s), s, d, w
        )

    def node_events(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        return _events_table(
            2 * ids, ids, ["node_add"] * len(ids), ids,
            np.full(len(ids), -1), np.ones(len(ids)),
        )

    nodes = ray.data.range(n, override_num_blocks=parallelism).map_batches(
        node_events, batch_format="pyarrow", zero_copy_batch=True
    )
    return nodes.union(
        edges.map_batches(
            edge_events, batch_format="pyarrow", zero_copy_batch=True
        )
    )


def dynamic_erdos_renyi_events(
    n: int,
    steps: int,
    adds_per_step: int,
    del_frac: float = 0.25,
    seed: int = 42,
    parallelism: int = 8,
):
    """Dynamic G(n, m) churn stream: every step t adds ``adds_per_step``
    uniform edges (counter-hashed, so generation is embarrassingly
    parallel); steps t >= 1 also DELETE floor(del_frac * adds) edges,
    each deterministically re-derived from step t-1's additions — the
    deletion targets provably existed, no membership oracle needed.
    -> Dataset, seq = t * (adds + dels) + slot."""
    import ray.data

    dels = int(np.floor(del_frac * adds_per_step))
    width = adds_per_step + dels

    def _pair(step: np.ndarray, slot: np.ndarray):
        key = step * np.int64(adds_per_step) + slot
        uu = np.floor(_uniform(key, 11, seed) * n).astype(np.int64)
        vv = np.floor(_uniform(key, 13, seed) * n).astype(np.int64)
        return np.minimum(uu, n - 1), np.minimum(vv, n - 1)

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        step = ids // width
        slot = ids % width
        is_add = slot < adds_per_step
        # adds: pair from (step, slot); dels: re-derive a step-(t-1) add,
        # slot picked by hash over (step, del-slot)
        a_u, a_v = _pair(step, slot)
        pick = np.floor(
            _uniform(ids, 17, seed) * adds_per_step
        ).astype(np.int64)
        d_u, d_v = _pair(step - 1, np.minimum(pick, adds_per_step - 1))
        u = np.where(is_add, a_u, d_u)
        v = np.where(is_add, a_v, d_v)
        valid = is_add | (step >= 1)
        typ = np.where(is_add, "edge_add", "edge_del")
        return _events_table(
            ids[valid], step[valid], list(typ[valid]), u[valid], v[valid],
            np.ones(int(valid.sum())),
        )

    return ray.data.range(
        steps * width, override_num_blocks=parallelism
    ).map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)


def events_to_snapshot(
    events_ds, t=None, directed: bool = False, num_partitions: int = 8
):
    """Fold an event stream into the edge table of the graph at time
    ``t`` (None = end of stream): for every edge key the LAST event in
    seq order decides — present iff that event is an add/weight_update
    and no later node_del removed an endpoint.  Distributed as three
    groupby-max aggregates plus one winner join (fetches the surviving
    weight); never a sequential replay, so a 10^12-event history folds
    at shuffle speed.  node_del removes incident edges (re-adding later
    resurrects them, matching GraphEvent semantics).
    -> Dataset(src, dst, w)."""
    from ray.data.aggregate import Max

    ev = events_ds
    if t is not None:
        ev = ev.filter(expr=f"t <= {int(t)}")
    ev = ev.materialize()

    def edge_rows(tbl: pa.Table) -> pa.Table:
        typ = tbl["type"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.isin(typ, ("edge_add", "edge_del", "weight_update"))
        u = tbl["u"].combine_chunks().to_numpy(zero_copy_only=False)[keep]
        v = tbl["v"].combine_chunks().to_numpy(zero_copy_only=False)[keep]
        if not directed:
            u, v = np.minimum(u, v), np.maximum(u, v)
        typ = typ[keep]
        seq = tbl["seq"].combine_chunks().to_numpy(zero_copy_only=False)[keep]
        is_add = typ != "edge_del"
        return pa.table(
            {
                "src": u,
                "dst": v,
                "add_seq": np.where(is_add, seq, np.int64(-1)),
                "del_seq": np.where(~is_add, seq, np.int64(-1)),
                "w": tbl["w"].combine_chunks().to_numpy(
                    zero_copy_only=False
                )[keep],
            }
        )

    flat = ev.map_batches(
        edge_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    agg = (
        flat.groupby(["src", "dst"])
        .aggregate(Max("add_seq", alias_name="a"), Max("del_seq", alias_name="d"))
        .filter(expr="a > d")
    )
    # fetch the winning event's weight (supports weight_update payloads);
    # same-seq ties (k same-step adds of one BA node) collapse by max w
    winners = (
        agg.join(
            flat.select_columns(["src", "dst", "add_seq", "w"]),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src", "dst"),
        )
        .filter(expr="a == add_seq")
        .groupby(["src", "dst"])
        .aggregate(Max("w", alias_name="w"), Max("a", alias_name="a"))
    )

    # node deletions: an edge survives only if its add is newer than the
    # last node_del of EITHER endpoint
    def ndel_rows(tbl: pa.Table) -> pa.Table:
        typ = tbl["type"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = typ == "node_del"
        return pa.table(
            {
                "nd_vid": tbl["u"].combine_chunks().to_numpy(
                    zero_copy_only=False
                )[keep],
                "nd_seq": tbl["seq"].combine_chunks().to_numpy(
                    zero_copy_only=False
                )[keep],
            }
        )

    ndel = (
        ev.map_batches(ndel_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("nd_vid")
        .aggregate(Max("nd_seq", alias_name="nd_seq"))
        .materialize()
    )
    if ndel.count() > 0:
        # the node_del side is vanishingly small next to the edge stream:
        # broadcast it instead of two shuffle joins
        import ray

        pdf = ndel.to_pandas()
        nd_ref = ray.put(
            (
                pdf["nd_vid"].to_numpy(np.int64),
                pdf["nd_seq"].to_numpy(np.int64),
            )
        )

        def drop_node_deleted(tbl: pa.Table) -> pa.Table:
            vids, seqs = ray.get(nd_ref)
            o = np.argsort(vids)
            vids, seqs = vids[o], seqs[o]

            def last_del(x):
                i = np.minimum(np.searchsorted(vids, x), len(vids) - 1)
                return np.where(vids[i] == x, seqs[i], np.int64(-1))

            s = tbl["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = tbl["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            a = tbl["a"].combine_chunks().to_numpy(zero_copy_only=False)
            alive = (a > last_del(s)) & (a > last_del(d))
            return tbl.filter(pa.array(alive))

        winners = winners.map_batches(
            drop_node_deleted, batch_format="pyarrow", zero_copy_batch=True
        )
    return winners.select_columns(["src", "dst", "w"])


# --------------------------------------------------------------------------
# DGS (GraphStream) stream IO — driver-side single-file compat, like METIS
# --------------------------------------------------------------------------


def write_dgs(events_ds, path: str, name: str = "networkit_ray"):
    """Serialize an event stream to DGS004 (GraphStream's dynamic-graph
    text format): ``st`` on clock ticks, ``an/dn`` nodes, ``ae/de`` edges
    with ids ``e<u>_<v>``, weights as an ``weight=<w>`` attribute.  Events
    stream through sorted by seq; the file is inherently sequential, so
    this is a driver-side sink for ecosystem interchange."""
    ev = events_ds.sort("seq").to_pandas()
    with open(path, "w") as f:
        f.write("DGS004\n")
        f.write(f"{name} 0 0\n")
        clock = None
        for row in ev.itertuples(index=False):
            if clock is None or row.t != clock:
                clock = int(row.t)
                f.write(f"st {clock}\n")
            ty = row.type
            if ty == "node_add":
                f.write(f"an {int(row.u)}\n")
            elif ty == "node_del":
                f.write(f"dn {int(row.u)}\n")
            elif ty == "edge_add":
                f.write(
                    f"ae e{int(row.u)}_{int(row.v)} {int(row.u)} "
                    f"{int(row.v)} weight={float(row.w)}\n"
                )
            elif ty == "edge_del":
                f.write(f"de e{int(row.u)}_{int(row.v)}\n")
            elif ty == "weight_update":
                f.write(
                    f"ce e{int(row.u)}_{int(row.v)} weight={float(row.w)}\n"
                )
            elif ty == "time_step":
                pass  # st lines carry the clock
    return path


def read_dgs(path: str):
    """Parse a DGS004 file back into the event-table contract.  Numeric
    node ids pass through; non-numeric ids map by first appearance.  Edge
    ids resolve through a declaration map so ``de``/``ce`` lines find
    their endpoints.  seq = line order, t = the running ``st`` clock.
    Driver-side by necessity (the format is line-ordered)."""
    import re

    import ray.data

    node_ids: dict[str, int] = {}
    edge_ids: dict[str, tuple[int, int]] = {}

    def nid(tok: str) -> int:
        try:
            return int(tok)
        except ValueError:
            if tok not in node_ids:
                node_ids[tok] = len(node_ids)
            return node_ids[tok]

    seqs, ts, typs, us, vs, ws = [], [], [], [], [], []
    clock = 0
    with open(path) as f:
        magic = f.readline().strip()
        if not magic.startswith("DGS"):
            raise ValueError(f"not a DGS file: {magic!r}")
        f.readline()  # name line
        for i, line in enumerate(f):
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            op = parts[0]
            w = 1.0
            m = re.search(r"weight[=:]([-\d.eE+]+)", line)
            if m:
                w = float(m.group(1))
            if op == "st":
                clock = int(float(parts[1]))
                continue
            if op == "an":
                rec = ("node_add", nid(parts[1]), -1)
            elif op == "dn":
                rec = ("node_del", nid(parts[1]), -1)
            elif op == "ae":
                ops = [p for p in parts[2:4] if p not in ("<", ">")]
                extra = parts[4] if len(ops) < 2 else None
                if extra is not None:
                    ops.append(extra)
                u, v = nid(ops[0]), nid(ops[1])
                edge_ids[parts[1]] = (u, v)
                rec = ("edge_add", u, v)
            elif op == "de":
                u, v = edge_ids[parts[1]]
                rec = ("edge_del", u, v)
            elif op == "ce":
                u, v = edge_ids[parts[1]]
                rec = ("weight_update", u, v)
            else:
                continue  # tolerate attribute/other lines
            seqs.append(i)
            ts.append(clock)
            typs.append(rec[0])
            us.append(rec[1])
            vs.append(rec[2])
            ws.append(w)
    return ray.data.from_arrow(
        _events_table(seqs, ts, typs, us, vs, ws)
    )
