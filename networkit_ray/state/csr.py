"""BSP engine: hash-partitioned CSR block partitions in stateful Ray actors.

This is the north-star physical plan (BASELINE.json:6): "each iteration is a
groupby-aggregate shuffle of (dst, contribution) messages against
hash-partitioned CSR block partitions held in stateful actor pools".  The
Dataset API cannot express a fixpoint loop without re-planning and
re-materializing per iteration, so the iterative kernels drop to raw Ray
actors — the one place SURVEY.md §4.2 sanctions it — while graph *build*
stays pure Ray Data (the edge/vertex Datasets stream INTO the actors via a
map_batches feed stage).

Design (scale rationale):
- Partitioning: ``part(v) = v % P`` over int64 vids (blake2b-hashed for
  string keys -> uniform).  Actor p owns vertices with part==p and the CSR
  of out-edges whose src it owns.
- Static message routing: at finalize time each actor computes, per target
  partition t, the sorted unique destination vids it ever sends to
  (``out_vids[t]``) and the per-edge index into that array.  Targets
  pre-translate these once (``in_idx``).  After that, one PageRank
  iteration moves ONLY float64 arrays (pre-aggregated per-destination
  sums) actor-to-actor through the object store — the per-iteration
  shuffle volume is O(unique dst per partition pair), not O(edges).
- Per-partition pre-aggregation = the combiner: np.bincount over the local
  CSR before anything is shipped.  Hub vertices receive P partial sums,
  one per source partition — the skew-splitting of the reduce
  (BASELINE.json:14 "skew splitting for hub vertices"): a hub's in-mass
  arrives as ≤P pre-combined partials, never as raw per-edge messages.
- Lineage: state/lineage.py manifests per (iteration, partition) with an
  atomic _SUCCESS per iteration; kill-resume restarts mid-iteration at
  partition granularity.

The same actor pool runs PageRank (scores), hash-min connected components
and synchronous PLP (labels) — only the message/apply kernels differ.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray

from networkit_ray.state import lineage


def _part(vids: np.ndarray, P: int) -> np.ndarray:
    return vids % P


def _to_np(col) -> np.ndarray:
    return col.combine_chunks().to_numpy(zero_copy_only=False)


@ray.remote
class CSRPartition:
    """One hash partition: owned vertices + CSR of their out-edges + state."""

    def __init__(self, part_id: int, num_parts: int):
        self.pid = part_id
        self.P = num_parts
        self._edge_chunks: list[pa.Table] = []
        self._vert_chunks: list[np.ndarray] = []
        self._repl = None  # replicated-ingest params (scaled bench)
        self.owned = None  # sorted unique vids owned by this partition

    # ---- load phase -------------------------------------------------------
    def add_edges(self, tbl: pa.Table):
        self._edge_chunks.append(tbl)

    def add_vertices(self, vids: np.ndarray):
        self._vert_chunks.append(np.asarray(vids, dtype=np.int64))

    def ingest_replicated(self, base: pa.Table, copies: int, offset: int):
        """Store this partition's slice of the BASE edge table plus the
        replication parameters (offset is a multiple of P, so the partition
        mask is computed once on the base and holds for every copy; offset
        also exceeds every base vid, so per-copy vid ranges are disjoint).
        The K-times-replicated routes are then constructed ANALYTICALLY in
        finalize_graph — per-copy routes are the base routes shifted by
        k*offset, so nothing corpus-sized is ever gathered or re-hashed
        (the naive path, 8 actors each factorizing K x |base|/P rows with
        random gathers, was memory-subsystem-bound and stopped scaling
        with cores on large K)."""
        src = _to_np(base["src"])
        dst = _to_np(base["dst"])
        w = _to_np(base["w"]).astype(np.float64)
        assert offset % self.P == 0
        assert int(max(src.max(), dst.max())) < offset
        mask = _part(src, self.P) == self.pid
        self._repl = (src[mask], dst[mask], w[mask], int(copies), int(offset))

    def _finalize_replicated(self):
        """Analytic route construction for the replicated ingest: factorize
        ONLY the base slice, then broadcast-add the copy offsets (k-major
        order, identical to concatenating the per-copy chunk tables)."""
        import pandas as pd

        s0, d0, w0, K, OFF = self._repl
        self._repl = None
        kK = np.arange(K, dtype=np.int64)
        self._src = (s0[None, :] + (kK * OFF)[:, None]).ravel()
        dpart0 = _part(d0, self.P)
        self._route_raw = []
        out_vids_all = []
        for t_id in range(self.P):
            pos = np.flatnonzero(dpart0 == t_id)
            # static source-sorted route: the per-iteration rate[src_local]
            # gather walks `owned` near-sequentially (measured ~35% faster
            # per round than hash order).  k-major replication keeps each
            # copy block internally sorted — the same order a full stable
            # sort of the explicit concat produces, so bit-equality with
            # the explicit ingest path is preserved.
            pos = pos[np.argsort(s0[pos], kind="stable")]
            inv0, uniq0 = pd.factorize(d0[pos], sort=False)
            uniq0 = np.asarray(uniq0, dtype=np.int64)
            u = len(uniq0)
            src_t = (s0[pos][None, :] + (kK * OFF)[:, None]).ravel()
            w_t = np.tile(w0[pos], K)
            inv_t = (
                inv0.astype(np.int64)[None, :] + (kK * u)[:, None]
            ).ravel()
            self._route_raw.append((src_t, w_t, inv_t, u * K))
            out_vids_all.append(
                (uniq0[None, :] + (kK * OFF)[:, None]).ravel()
            )
        if self.P == 1:
            return out_vids_all[0]
        return tuple(out_vids_all)

    def finalize_graph(self):
        """Group edges by destination partition; returns P out_vids arrays.

        Ownership is only fixed in ``set_in_routes``: a vertex that appears
        solely as a *destination* (sink) is owned by its hash partition,
        which learns of it from the incoming route vid arrays — so no
        explicit vertex table is required for correctness.
        """
        if getattr(self, "_repl", None) is not None:
            return self._finalize_replicated()
        if self._edge_chunks:
            t = pa.concat_tables(self._edge_chunks)
            src = _to_np(t["src"])
            dst = _to_np(t["dst"])
            w = _to_np(t["w"]).astype(np.float64)
        else:
            src = dst = np.empty(0, dtype=np.int64)
            w = np.empty(0, dtype=np.float64)
        self._edge_chunks = []
        self._src = src

        # static routing: group edges by destination partition.  Unique-dst
        # compaction uses pd.factorize (hash-based, O(E)) instead of
        # np.unique (sort-based, O(E log E)); out_vids order is arbitrary
        # but consistent with out_idx, which is all the receiving
        # partition's searchsorted translation needs.
        import pandas as pd

        dpart = _part(dst, self.P)
        self._route_raw = []  # per target t: (src_vids_t, w_t, out_idx_t, n_out)
        out_vids_all = []
        for t_id in range(self.P):
            pos = np.flatnonzero(dpart == t_id)
            # static source-sorted route (stable): per-iteration gathers of
            # rate[src_local] become near-sequential — see
            # _finalize_replicated for the measurement and the bit-equality
            # argument
            pos = pos[np.argsort(src[pos], kind="stable")]
            inv, out_vids = pd.factorize(dst[pos], sort=False)
            out_vids = np.asarray(out_vids, dtype=np.int64)
            self._route_raw.append(
                (src[pos], w[pos], inv.astype(np.int64), len(out_vids))
            )
            out_vids_all.append(out_vids)
        if self.P == 1:
            return out_vids_all[0]
        return tuple(out_vids_all)

    def set_in_routes(self, *vid_arrays):
        """vid_arrays[s] = out_vids of source partition s destined here.

        Fixes ownership (sources ∪ explicit vertices ∪ incoming sinks),
        builds the CSR-side arrays and the static incoming index maps.
        """
        vert_extra = (
            np.concatenate(self._vert_chunks)
            if self._vert_chunks
            else np.empty(0, dtype=np.int64)
        )
        self._vert_chunks = []
        incoming = [np.asarray(v, dtype=np.int64) for v in vid_arrays]
        self.owned = np.unique(np.concatenate([self._src, vert_extra, *incoming]))
        n = self.n_owned = len(self.owned)

        self.wdeg = np.zeros(n, dtype=np.float64)
        self.route = []
        for src_vids, w_t, out_idx, n_out in self._route_raw:
            src_local = np.searchsorted(self.owned, src_vids).astype(np.int64)
            self.route.append((src_local, w_t, out_idx, n_out))
            np.add.at(self.wdeg, src_local, w_t)
        del self._src
        self._route_raw = None

        self.in_idx = [np.searchsorted(self.owned, v) for v in incoming]
        return self.n_owned

    def num_owned(self) -> int:
        return self.n_owned

    # ---- PageRank ---------------------------------------------------------
    def pr_init(self, n_total: int) -> float:
        self.n_total = n_total
        self.score = np.full(self.n_owned, 1.0 / n_total, dtype=np.float64)
        return float(self.score[self.wdeg == 0.0].sum())

    def pr_messages(self):
        """Per-target pre-aggregated (dst, contribution) sums, plus this
        partition's dangling mass under the CURRENT scores (last return
        value) — shipping it with the messages lets the appliers perform
        the dangling allreduce themselves, so the driver never blocks
        inside an iteration (pipelined BSP)."""
        rate = np.divide(
            self.score, self.wdeg, out=np.zeros_like(self.score), where=self.wdeg > 0
        )
        out = []
        for src_local, w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(np.empty(0, dtype=np.float64))
                continue
            contrib = rate[src_local] * w
            out.append(np.bincount(out_idx, weights=contrib, minlength=n_out))
        dang = float(self.score[self.wdeg == 0.0].sum())
        if self.P == 1:
            return out[0], dang
        return (*out, dang)

    def pr_apply(self, damping: float, *args):
        """args = P dangling scalars followed by P message arrays."""
        P = self.P
        dangling = float(sum(args[:P]))
        msgs = args[P:]
        base = (1.0 - damping) / self.n_total + damping * dangling / self.n_total
        new = np.full(self.n_owned, base, dtype=np.float64)
        for s, m in enumerate(msgs):
            if len(m):
                new[self.in_idx[s]] += damping * m
        resid = float(np.abs(new - self.score).sum())
        self.score = new
        return resid

    def scores_table(self) -> pa.Table:
        return pa.table({"vid": self.owned, "score": self.score})

    # ---- grouped (hierarchical) PageRank exchange --------------------------
    # The pairwise exchange ships P^2 message objects per round (one per
    # source->target partition pair) — at P=512 on a real cluster that is
    # ~262k object-store round trips per iteration, a per-round latency
    # floor that caps scaling.  The grouped exchange maps partitions to G
    # "node groups" (on a real cluster: G = #nodes): each source ships ONE
    # bundle per GROUP (P*G objects per round), holding the pre-combined
    # contribution vectors for every member of that group; each member
    # pulls its group's P bundles (on a cluster the object lands on the
    # node once and all co-located members read it from shared plasma) and
    # scatters only its own slice — so the merge work stays distributed
    # over all P partitions and the float semantics are bit-identical to
    # the pairwise apply.  A fused apply+emit step also halves the task
    # count per round.  (A variant with dedicated per-group merger actors
    # was measured 2.3x SLOWER at P=8: it centralizes the scatter work
    # into G actors — rejected.)

    def set_groups(self, groups: list[list[int]], my_slot: int) -> None:
        """groups[g] = partition ids of group g; my_slot = this partition's
        index within its own group (the slice it extracts from incoming
        bundles)."""
        self._groups = [list(m) for m in groups]
        self._my_slot = int(my_slot)

    def _pr_apply_bundles(self, damping: float, bundles) -> float:
        """bundles[s] = (dang_s, vals-per-member of MY group); extract my
        slot's vector from each source and scatter — identical accumulation
        order and float semantics as the pairwise pr_apply."""
        j = self._my_slot
        dangling = float(sum(b[0] for b in bundles))
        base = (
            (1.0 - damping) / self.n_total
            + damping * dangling / self.n_total
        )
        new = np.full(self.n_owned, base, dtype=np.float64)
        for s, b in enumerate(bundles):
            v = b[1][j]
            if v is not None and len(v):
                new[self.in_idx[s]] += damping * v
        resid = float(np.abs(new - self.score).sum())
        self.score = new
        return resid

    def pr_apply_bundles(self, damping: float, *bundles) -> float:
        return self._pr_apply_bundles(damping, bundles)

    def pr_emit_bundles(self):
        """Emit this round's bundles — one per group, each holding this
        partition's dangling mass and the pre-combined (np.bincount = the
        combiner) per-member contribution vectors."""
        rate = np.divide(
            self.score, self.wdeg, out=np.zeros_like(self.score), where=self.wdeg > 0
        )
        dang = float(self.score[self.wdeg == 0.0].sum())
        bundles = []
        for members in self._groups:
            vals = []
            for t in members:
                src_local, w, out_idx, n_out = self.route[t]
                if n_out == 0:
                    vals.append(None)
                else:
                    vals.append(
                        np.bincount(
                            out_idx, weights=rate[src_local] * w, minlength=n_out
                        )
                    )
            bundles.append((dang, vals))
        return bundles[0] if len(bundles) == 1 else tuple(bundles)

    def pr_step_g(self, damping: float, first: bool, *bundles):
        """Fused BSP step: apply LAST round's bundles (skipped when first),
        then emit THIS round's.  Returns (resid_of_applied_round,
        bundle_0, .., bundle_{G-1})."""
        resid = -1.0 if first else self._pr_apply_bundles(damping, bundles)
        out = self.pr_emit_bundles()
        if len(self._groups) == 1:
            return (resid, out)
        return (resid, *out)

    # ---- label state (CC hash-min / sync PLP) -----------------------------
    def lab_init(self) -> None:
        self.label = self.owned.copy()

    def cc_messages(self):
        out = []
        for src_local, _w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            m = np.full(n_out, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(m, out_idx, self.label[src_local])
            out.append(m)
        return out[0] if self.P == 1 else tuple(out)

    def cc_apply(self, *msgs) -> int:
        new = self.label.copy()
        for s, m in enumerate(msgs):
            if len(m):
                idx = self.in_idx[s]
                np.minimum.at(new, idx, m)
        changed = int((new != self.label).sum())
        self.label = new
        return changed

    def plp_messages(self):
        import pandas as pd

        out = []
        for src_local, w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(
                    (
                        np.empty(0, dtype=np.int64),
                        np.empty(0, dtype=np.int64),
                        np.empty(0, dtype=np.float64),
                    )
                )
                continue
            df = pd.DataFrame(
                {"i": out_idx, "l": self.label[src_local], "w": w}
            ).groupby(["i", "l"], sort=False, as_index=False)["w"].sum()
            out.append(
                (
                    df["i"].to_numpy(np.int64),
                    df["l"].to_numpy(np.int64),
                    df["w"].to_numpy(np.float64),
                )
            )
        return out[0] if self.P == 1 else tuple(out)

    def plp_apply(self, *msgs) -> int:
        import pandas as pd

        locs, labs, ws = [], [], []
        for s, (i, l, w) in enumerate(msgs):
            if len(i):
                locs.append(self.in_idx[s][i])
                labs.append(l)
                ws.append(w)
        if not locs:
            return 0
        loc = np.concatenate(locs)
        lab = np.concatenate(labs)
        w = np.concatenate(ws)
        df = (
            pd.DataFrame({"v": loc, "l": lab, "w": w})
            .groupby(["v", "l"], sort=False, as_index=False)["w"]
            .sum()
        )
        v = df["v"].to_numpy(np.int64)
        l = df["l"].to_numpy(np.int64)
        ws_ = df["w"].to_numpy(np.float64)
        # winner per vertex: max w, ties -> min label (lexsort: last key primary)
        order = np.lexsort((l, -ws_, v))
        v_o, l_o = v[order], l[order]
        first = np.ones(len(v_o), dtype=bool)
        first[1:] = v_o[1:] != v_o[:-1]
        winners_v = v_o[first]
        winners_l = l_o[first]
        new = self.label.copy()
        new[winners_v] = winners_l
        changed = int((new != self.label).sum())
        self.label = new
        return changed

    def labels_table(self) -> pa.Table:
        return pa.table({"vid": self.owned, "label": self.label})

    # ---- topological levels (longest path from a source, DAG only) --------
    def topo_init(self) -> None:
        self.level = np.zeros(self.n_owned, dtype=np.int64)

    def topo_messages(self):
        """Per-target max over incident edges of level[src] + 1."""
        out = []
        for src_local, _w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            m = np.full(n_out, -1, dtype=np.int64)
            np.maximum.at(m, out_idx, self.level[src_local] + 1)
            out.append(m)
        return out[0] if self.P == 1 else tuple(out)

    def topo_apply(self, *msgs) -> int:
        new = self.level.copy()
        for s, m in enumerate(msgs):
            if len(m):
                np.maximum.at(new, self.in_idx[s], m)
        changed = int((new != self.level).sum())
        self.level = new
        return changed

    def levels_table(self) -> pa.Table:
        return pa.table({"vid": self.owned, "level": self.level})

    # ---- BFS frontier kernel ----------------------------------------------
    def bfs_init(self, sources: np.ndarray) -> int:
        """Multi-source BFS: depth 0 at owned sources; frontier = those."""
        self.depth = np.full(self.n_owned, -1, dtype=np.int64)
        self._bfs_round = 0
        sources = np.asarray(sources, dtype=np.int64)
        if self.n_owned == 0 or len(sources) == 0:
            self._bfs_frontier = np.empty(0, dtype=np.int64)
            return 0
        pos = np.minimum(np.searchsorted(self.owned, sources), self.n_owned - 1)
        hit = self.owned[pos] == sources
        mine = np.unique(pos[hit])
        self.depth[mine] = 0
        self._bfs_frontier = mine
        return int(len(mine))

    def bfs_messages(self):
        """Per target partition: the SET of out-vid indices reached from the
        current frontier — one int64 index array per partition pair; no
        depths ship (synchronous rounds make the level implicit)."""
        flag = np.zeros(self.n_owned, dtype=bool)
        flag[self._bfs_frontier] = True
        out = []
        for src_local, _w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            mask = flag[src_local]
            out.append(
                np.unique(out_idx[mask]) if mask.any() else np.empty(0, np.int64)
            )
        return out[0] if self.P == 1 else tuple(out)

    def bfs_apply(self, *msgs) -> int:
        self._bfs_round += 1
        cand = [self.in_idx[s][m] for s, m in enumerate(msgs) if len(m)]
        if cand:
            c = np.unique(np.concatenate(cand))
            newly = c[self.depth[c] < 0]
            self.depth[newly] = self._bfs_round
        else:
            newly = np.empty(0, dtype=np.int64)
        self._bfs_frontier = newly
        return int(len(newly))

    def depths_table(self) -> pa.Table:
        return pa.table({"vid": self.owned, "depth": self.depth})

    # ---- weighted SSSP (delta-stepping bucketed frontier) ------------------
    def sssp_init(self, sources: np.ndarray, delta: float) -> int:
        """Tentative distances inf everywhere, 0 at owned sources; sources
        start dirty.  Weights must be non-negative (bucket monotonicity)."""
        self._sp_delta = float(delta)
        n = self.n_owned
        self.dist = np.full(n, np.inf, dtype=np.float64)
        self._sp_dirty = np.zeros(n, dtype=bool)
        sources = np.asarray(sources, dtype=np.int64)
        if n == 0 or len(sources) == 0:
            return 0
        pos = np.minimum(np.searchsorted(self.owned, sources), n - 1)
        hit = self.owned[pos] == sources
        mine = np.unique(pos[hit])
        self.dist[mine] = 0.0
        self._sp_dirty[mine] = True
        return int(len(mine))

    def sssp_messages(self, k: int):
        """Relax out-edges of the current bucket's dirty vertices
        (bucket(v) = floor(dist/delta) == k): per target partition one
        pre-MINIMIZED float array of candidate distances — the combiner
        shape of pr_messages with min instead of sum.  Emitting clears the
        frontier's dirty flags."""
        with np.errstate(invalid="ignore"):
            bucket = np.floor(self.dist / self._sp_delta)
        frontier = self._sp_dirty & (bucket == k)
        self._sp_dirty[frontier] = False
        out = []
        for src_local, w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(np.empty(0, dtype=np.float64))
                continue
            mask = frontier[src_local]
            m = np.full(n_out, np.inf, dtype=np.float64)
            if mask.any():
                np.minimum.at(
                    m, out_idx[mask], self.dist[src_local[mask]] + w[mask]
                )
            out.append(m)
        return out[0] if self.P == 1 else tuple(out)

    def sssp_apply(self, *msgs) -> float:
        """Take elementwise mins; improved vertices become dirty.  Returns
        the minimum bucket index over dirty vertices (-1 if none) — the
        driver advances the global bucket to the min across partitions."""
        incoming = np.full(self.n_owned, np.inf, dtype=np.float64)
        for s, m in enumerate(msgs):
            if len(m):
                idx = self.in_idx[s]  # unique per route: fancy min is safe
                incoming[idx] = np.minimum(incoming[idx], m)
        improved = incoming < self.dist
        self.dist[improved] = incoming[improved]
        self._sp_dirty |= improved
        if not self._sp_dirty.any():
            return -1.0
        return float(
            np.floor(self.dist[self._sp_dirty].min() / self._sp_delta)
        )

    def dist_table(self) -> pa.Table:
        return pa.table({"vid": self.owned, "dist": self.dist})

    def bfs_stats_part(self) -> tuple[float, int, float]:
        """(sum of finite depths, reached count, sum of 1/depth for
        depth>0) — closeness numerator/denominator + harmonic closeness."""
        reached = self.depth >= 0
        pos = self.depth > 0
        inv = float((1.0 / self.depth[pos]).sum()) if pos.any() else 0.0
        return float(self.depth[reached].sum()), int(reached.sum()), inv

    # ---- Brandes betweenness (sampled sources) ----------------------------
    def bc_init(self, sources: np.ndarray) -> int:
        """Start a Brandes pass from the given sources (usually one):
        forward BFS also accumulates sigma (#shortest paths)."""
        n = self.n_owned
        self.depth = np.full(n, -1, dtype=np.int64)
        self.sigma = np.zeros(n, dtype=np.float64)
        self.delta = np.zeros(n, dtype=np.float64)
        if not hasattr(self, "btw") or self.btw is None or len(self.btw) != n:
            self.btw = np.zeros(n, dtype=np.float64)
        self._bc_round = 0
        self._bc_sources = np.empty(0, dtype=np.int64)
        sources = np.asarray(sources, dtype=np.int64)
        if n == 0 or len(sources) == 0:
            self._bfs_frontier = np.empty(0, dtype=np.int64)
            return 0
        pos = np.minimum(np.searchsorted(self.owned, sources), n - 1)
        hit = self.owned[pos] == sources
        mine = np.unique(pos[hit])
        self.depth[mine] = 0
        self.sigma[mine] = 1.0
        self._bfs_frontier = mine
        self._bc_sources = mine
        return int(len(mine))

    def bc_reset_accum(self):
        self.btw = np.zeros(self.n_owned, dtype=np.float64)

    def bc_forward_messages(self):
        """Frontier vertices send their sigma along out-edges."""
        flag = np.zeros(self.n_owned, dtype=bool)
        flag[self._bfs_frontier] = True
        out = []
        for src_local, _w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(np.empty(0, dtype=np.float64))
                continue
            mask = flag[src_local]
            m = np.zeros(n_out, dtype=np.float64)
            if mask.any():
                np.add.at(m, out_idx[mask], self.sigma[src_local[mask]])
            out.append(m)
        return out[0] if self.P == 1 else tuple(out)

    def bc_forward_apply(self, *msgs) -> int:
        self._bc_round += 1
        incoming = np.zeros(self.n_owned, dtype=np.float64)
        for s, m in enumerate(msgs):
            if len(m):
                incoming[self.in_idx[s]] += m
        newly = np.flatnonzero((self.depth < 0) & (incoming > 0))
        self.depth[newly] = self._bc_round
        self.sigma[newly] = incoming[newly]
        self._bfs_frontier = newly
        return int(len(newly))

    def bc_backward_messages(self, d: int):
        """Vertices at depth d send (1+delta)/sigma along (symmetric)
        out-edges; only depth d-1 receivers accept in apply."""
        at_d = self.depth == d
        out = []
        for src_local, _w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(np.empty(0, dtype=np.float64))
                continue
            mask = at_d[src_local]
            m = np.zeros(n_out, dtype=np.float64)
            if mask.any():
                sl = src_local[mask]
                val = (1.0 + self.delta[sl]) / self.sigma[sl]
                np.add.at(m, out_idx[mask], val)
            out.append(m)
        return out[0] if self.P == 1 else tuple(out)

    def bc_backward_apply(self, d: int, *msgs) -> float:
        incoming = np.zeros(self.n_owned, dtype=np.float64)
        for s, m in enumerate(msgs):
            if len(m):
                incoming[self.in_idx[s]] += m
        takers = self.depth == d - 1
        self.delta[takers] += self.sigma[takers] * incoming[takers]
        return float(self.delta[takers].sum())

    def bc_accumulate(self) -> None:
        """Fold this source's dependencies into the betweenness totals
        (the source itself is excluded, per Brandes)."""
        add = self.delta.copy()
        add[self._bc_sources] = 0.0
        self.btw += add

    def btw_table(self, scale: float = 1.0) -> pa.Table:
        return pa.table({"vid": self.owned, "betweenness": self.btw * scale})

    # ---- batched multi-source BFS / Brandes (wave kernels) -----------------
    # One forward pass serves S sources simultaneously: per-vertex state is
    # (n_owned, S) matrices, per-round messages are (n_out, S) pre-combined
    # matrices per partition pair — rounds per wave = eccentricity, waves =
    # ceil(|sources|/S), so exact all-sources algorithms (Brandes
    # betweenness, closeness, the exact neighborhood function) cost
    # O(n/S * diameter) BSP rounds instead of O(n * diameter).  Per-route
    # segment sums run vectorized across all S columns via a static
    # out_idx-sorted reduceat plan.  Choose S so route_len x S floats fit
    # the worker heap (default 64).

    def _ms_route_aux(self):
        if not hasattr(self, "_ms_aux"):
            aux = []
            for src_local, _w, out_idx, n_out in self.route:
                if n_out == 0 or len(out_idx) == 0:
                    aux.append(None)
                    continue
                order = np.argsort(out_idx, kind="stable")
                sorted_idx = out_idx[order]
                starts = np.flatnonzero(
                    np.r_[True, sorted_idx[1:] != sorted_idx[:-1]]
                )
                touched = sorted_idx[starts]
                aux.append((src_local[order], starts, touched))
            self._ms_aux = aux
        return self._ms_aux

    def ms_init(self, sources, with_sigma: bool) -> int:
        sources = np.asarray(sources, dtype=np.int64)
        S = len(sources)
        self._ms_S = S
        self._ms_sigma_on = bool(with_sigma)
        n = self.n_owned
        self.ms_depth = np.full((n, S), -1, dtype=np.int32)
        self.ms_sigma = (
            np.zeros((n, S), dtype=np.float64) if with_sigma else None
        )
        self.ms_delta = (
            np.zeros((n, S), dtype=np.float64) if with_sigma else None
        )
        self._ms_round = 0
        if n and S:
            pos = np.minimum(np.searchsorted(self.owned, sources), n - 1)
            hit = self.owned[pos] == sources
            rows, cols = pos[hit], np.flatnonzero(hit)
            self.ms_depth[rows, cols] = 0
            if with_sigma:
                self.ms_sigma[rows, cols] = 1.0
            self._ms_srcpos = (rows, cols)
        else:
            self._ms_srcpos = (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
            )
        self._ms_route_aux()
        return int(len(self._ms_srcpos[0]))

    def _ms_segmented(self, coef):
        """Per-route segment sums of the (n_owned, S) coefficient matrix
        along out-edges -> one (n_out, S) matrix per target."""
        out = []
        for aux, (_sl, _w, _oi, n_out) in zip(self._ms_aux, self.route):
            if aux is None:
                out.append(np.zeros((0, self._ms_S), dtype=np.float64))
                continue
            src_sorted, starts, touched = aux
            seg = np.add.reduceat(coef[src_sorted], starts, axis=0)
            m = np.zeros((n_out, self._ms_S), dtype=np.float64)
            m[touched] = seg
            out.append(m)
        return out[0] if self.P == 1 else tuple(out)

    def ms_forward_messages(self):
        """Frontier columns (depth == current round) send sigma (or a 1.0
        reach indicator when sigma is off) along out-edges."""
        active = self.ms_depth == self._ms_round
        if self._ms_sigma_on:
            coef = self.ms_sigma * active
        else:
            coef = active.astype(np.float64)
        return self._ms_segmented(coef)

    def ms_forward_apply(self, *msgs) -> int:
        self._ms_round += 1
        incoming = np.zeros((self.n_owned, self._ms_S), dtype=np.float64)
        for s, m in enumerate(msgs):
            if len(m):
                incoming[self.in_idx[s]] += m
        newly = (self.ms_depth < 0) & (incoming > 0)
        self.ms_depth[newly] = self._ms_round
        if self._ms_sigma_on:
            self.ms_sigma[newly] = incoming[newly]
        return int(newly.sum())

    def ms_backward_messages(self, d: int):
        """Columns at depth d send (1+delta)/sigma along (symmetric)
        out-edges; only depth d-1 receivers accept in apply."""
        coef = np.zeros_like(self.ms_sigma)
        at_d = self.ms_depth == d
        np.divide(
            1.0 + self.ms_delta,
            self.ms_sigma,
            out=coef,
            where=at_d & (self.ms_sigma > 0),
        )
        return self._ms_segmented(coef)

    def ms_backward_apply(self, d: int, *msgs) -> None:
        incoming = np.zeros((self.n_owned, self._ms_S), dtype=np.float64)
        for s, m in enumerate(msgs):
            if len(m):
                incoming[self.in_idx[s]] += m
        takers = self.ms_depth == d - 1
        self.ms_delta[takers] += (self.ms_sigma * incoming)[takers]

    def ms_accumulate(self) -> None:
        """Fold this wave's per-source dependencies into the betweenness
        totals (each source's own cell excluded, per Brandes)."""
        add = self.ms_delta.copy()
        rows, cols = self._ms_srcpos
        add[rows, cols] = 0.0
        if not hasattr(self, "btw") or self.btw is None or len(self.btw) != self.n_owned:
            self.btw = np.zeros(self.n_owned, dtype=np.float64)
        self.btw += add.sum(axis=1)

    def ms_farness_part(self):
        """Per-source-column (sum of finite depths, reached count, sum of
        reciprocal positive depths) over owned rows — closeness + harmonic
        numerators, summed across partitions by the driver."""
        reach = self.ms_depth >= 0
        d = np.where(reach, self.ms_depth, 0)
        pos = self.ms_depth > 0
        with np.errstate(divide="ignore"):
            inv = np.where(pos, 1.0 / np.maximum(self.ms_depth, 1), 0.0)
        return (
            d.sum(axis=0).astype(np.float64),
            reach.sum(axis=0).astype(np.int64),
            inv.sum(axis=0).astype(np.float64),
        )

    def ms_ecc_part(self):
        """Per-source-column (max finite depth, reached count) over owned
        rows — eccentricity partials; the driver max/sum-combines across
        partitions.  -1 where this partition reached nothing."""
        reach = self.ms_depth >= 0
        d = np.where(reach, self.ms_depth, -1)
        if d.shape[0] == 0:
            s = self.ms_depth.shape[1]
            return (
                np.full(s, -1, dtype=np.int64),
                np.zeros(s, dtype=np.int64),
            )
        return (
            d.max(axis=0).astype(np.int64),
            reach.sum(axis=0).astype(np.int64),
        )

    # ---- group-closeness greedy state --------------------------------------
    def gc_init(self) -> None:
        """dist-to-group over owned rows; inf = unreached (S empty)."""
        self.gc_dist = np.full(self.n_owned, np.inf, dtype=np.float64)

    def gc_farness_part(self):
        """Per-source-column sum over owned rows of min(dist_to_S, depth):
        the partition's share of farness(S ∪ {source}).  Unreached-by-
        source keeps dist_to_S; unreached-by-both stays inf (connected-
        graph contract, same as top_closeness's level-1 bound)."""
        if self.n_owned == 0:
            return np.zeros(self.ms_depth.shape[1], dtype=np.float64)
        D = self.ms_depth.astype(np.float64)
        D[D < 0] = np.inf
        return np.minimum(self.gc_dist[:, None], D).sum(axis=0)

    def gc_update(self, col: int) -> None:
        """Fold BFS column ``col`` of the current wave into dist-to-S."""
        if self.n_owned == 0:
            return
        d = self.ms_depth[:, col].astype(np.float64)
        d[d < 0] = np.inf
        self.gc_dist = np.minimum(self.gc_dist, d)

    def gc_argmax_part(self):
        """(vid, dist) of the owned vertex FARTHEST from the current
        dist-to-group state (maxmin pivot selection; ties -> smaller vid;
        inf-distance vertices win, keeping maxmin exact on any graph)."""
        if self.n_owned == 0:
            return -1, -np.inf
        i = int(np.argmax(self.gc_dist))
        return int(self.owned[i]), float(self.gc_dist[i])

    # ---- PivotMDS layout ----------------------------------------------------
    def pmds_center_rows(self, fill: float):
        """Row-center the squared pivot-distance matrix of the current wave
        (unreached cells take the finite ``fill`` proxy) and return this
        partition's (column sums of d^2, row count) so the driver can form
        the column/grand means.  Caches d^2 - rowmean for pmds_gram."""
        D = self.ms_depth.astype(np.float64)
        D[D < 0] = fill
        D2 = D * D
        self._pmds_d2 = D2 - D2.mean(axis=1, keepdims=True)
        return D2.sum(axis=0), self.n_owned

    def pmds_gram(self, colmean2, grand2):
        """Finish the double centering locally — C = -1/2 (d^2 - rowmean -
        colmean + grand) — cache C, and return the partition's k x k Gram
        contribution C^T C (the driver sum-reduces these and solves the
        k x k eigenproblem; per-vertex rows never leave the partition)."""
        colmean2 = np.asarray(colmean2, dtype=np.float64)
        self._pmds_C = -0.5 * (
            self._pmds_d2 - colmean2[None, :] + float(grand2)
        )
        del self._pmds_d2
        return self._pmds_C.T @ self._pmds_C

    def pmds_coords(self, V) -> pa.Table:
        """Project owned rows onto the top eigenvectors: coords = C @ V
        -> (vid, x, y[, ...]) table."""
        V = np.asarray(V, dtype=np.float64)
        xy = self._pmds_C @ V
        cols = {"vid": self.owned}
        names = ["x", "y", "z"] + [f"c{i}" for i in range(3, V.shape[1])]
        for i in range(V.shape[1]):
            cols[names[i]] = xy[:, i]
        return pa.table(cols)

    def ms_depth_table(self, src_vids) -> pa.Table:
        """Finite (source, vid, depth) triplets of the current wave over
        owned rows — the distance-table emit (returned tables are copied
        into plasma, so later waves never mutate them)."""
        d = self.ms_depth
        fin = d >= 0
        ri, si = np.nonzero(fin)
        return pa.table(
            {
                "source": np.asarray(src_vids, np.int64)[si],
                "vid": self.owned[ri],
                "depth": d[ri, si].astype(np.int64),
            }
        )

    def ms_depth_hist(self, max_d: int):
        """Histogram of finite depths over owned rows x source columns —
        the exact per-wave contribution to the neighborhood function."""
        d = self.ms_depth[self.ms_depth >= 0]
        return np.bincount(
            np.minimum(d, max_d), minlength=max_d + 1
        ).astype(np.int64)

    # ---- KADABRA adaptive pair-sampled betweenness -------------------------
    def kb_init(self) -> None:
        """Pair-sample accumulators: running sum and sum-of-squares of the
        per-pair estimator X_i(v) over owned vertices (for the empirical-
        Bernstein stopping bound)."""
        self.kb_sum = np.zeros(self.n_owned, dtype=np.float64)
        self.kb_sumsq = np.zeros(self.n_owned, dtype=np.float64)

    def ms_depth_sigma_at(self, vids, cols):
        """Read (depth, sigma) of (vid_j, column_j) cells owned by this
        partition from the current wave -> (hit positions j, depths,
        sigmas).  Used by the KADABRA driver to fetch per-pair d_st /
        sigma_st scalars (one O(B) pull per round, not per vertex)."""
        vids = np.asarray(vids, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        if self.n_owned == 0 or len(vids) == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy(), np.empty(0, dtype=np.float64)
        pos = np.minimum(np.searchsorted(self.owned, vids), self.n_owned - 1)
        hit = self.owned[pos] == vids
        j = np.flatnonzero(hit)
        r, c = pos[hit], cols[hit]
        sig = (
            self.ms_sigma[r, c]
            if self._ms_sigma_on
            else np.zeros(len(j), dtype=np.float64)
        )
        return j, self.ms_depth[r, c].astype(np.int64), sig

    def kb_accumulate(self, B: int, st_depth, st_sigma) -> None:
        """Fold the current 2B-wide (s_0..s_{B-1} || t_0..t_{B-1}) sigma
        wave into the pair accumulators.  Per owned vertex v and pair i:

            X_i(v) = sigma_{s_i}(v) * sigma_{t_i}(v) / sigma_{s_i t_i}
                     if d_s(v) + d_t(v) == d(s_i, t_i), else 0

        — the probability that a uniformly random shortest s-t path passes
        through v, i.e. the CONDITIONAL EXPECTATION of KADABRA's one-path
        indicator given the pair (Rao-Blackwellized: identical mean,
        strictly lower variance than sampling one path).  Endpoints are
        excluded via d > 0; unreachable pairs (d_st <= 0) contribute 0 but
        still count in tau, matching the uniform-ordered-pair estimator."""
        if self.n_owned == 0 or self._ms_S != 2 * B:
            return
        st_depth = np.asarray(st_depth, dtype=np.int64)
        st_sigma = np.maximum(np.asarray(st_sigma, dtype=np.float64), 1.0)
        D1, D2 = self.ms_depth[:, :B], self.ms_depth[:, B:]
        S1, S2 = self.ms_sigma[:, :B], self.ms_sigma[:, B:]
        ok = (D1 > 0) & (D2 > 0) & (D1 + D2 == st_depth[None, :])
        X = np.where(ok, S1 * S2 / st_sigma[None, :], 0.0)
        self.kb_sum += X.sum(axis=1)
        self.kb_sumsq += (X * X).sum(axis=1)

    def kb_bound_part(self, tau: int, log3d: float) -> float:
        """Max empirical-Bernstein half-width over owned vertices at sample
        size tau: sqrt(2 * var_hat * log3d / tau) + 3 * log3d / tau
        (Maurer-Pontil; X in [0,1] so the range constant is 1)."""
        if self.n_owned == 0:
            return 0.0
        if tau < 2:
            return float("inf")
        var = np.maximum(self.kb_sumsq - self.kb_sum**2 / tau, 0.0) / (tau - 1)
        return float(
            (np.sqrt(2.0 * var * log3d / tau) + 3.0 * log3d / tau).max()
        )

    def kb_table(self, tau: int) -> pa.Table:
        """Normalized betweenness estimates b_hat(v) = kb_sum(v)/tau (the
        fraction of sampled ordered pairs whose shortest-path mass crosses
        v — KADABRA's normalized-betweenness scale)."""
        return pa.table(
            {
                "vid": self.owned,
                "betweenness": self.kb_sum / max(int(tau), 1),
            }
        )

    def owned_vids(self) -> np.ndarray:
        return self.owned

    # ---- ANF / Flajolet-Martin neighborhood sketch ------------------------
    def anf_init(self, registers: int, seed: int) -> float:
        """Per-vertex FM bitmasks: register r of vertex v sets bit index =
        trailing zeros of hash(v, r, seed) — the geometric(1/2) draw."""
        import pandas as pd

        R = registers
        self._anf_R = R
        n = self.n_owned
        self.anf = np.zeros((n, R), dtype=np.uint64)
        for r in range(R):
            h = pd.util.hash_array(
                self.owned * np.int64(2654435761) + np.int64(r * 40503 + seed)
            )
            lb = h & (np.uint64(0) - h)  # lowest set bit (0 iff h == 0)
            # log2 of a power of two is exact in float64
            tz = np.where(
                h == 0, 62.0, np.log2(np.maximum(lb, 1).astype(np.float64))
            )
            self.anf[:, r] = np.uint64(1) << np.minimum(tz, 62.0).astype(np.uint64)
        return self._anf_estimate_total()

    def _anf_estimate_total(self) -> float:
        """Sum over owned vertices of the FM cardinality estimate
        2^mean(lowest-unset-bit) / 0.77351."""
        if self.n_owned == 0:
            return 0.0
        inv = np.invert(self.anf)  # lowest unset bit of x = lowest set of ~x
        lb = inv & (np.uint64(0) - inv)
        b = np.where(inv == 0, 64.0, np.log2(np.maximum(lb, 1).astype(np.float64)))
        est = (2.0 ** b.mean(axis=1)) / 0.77351
        return float(est.sum())

    def anf_messages(self):
        """Per target: (n_out, R) OR-merged bitmask matrix — the sketch
        aggregate whose merge is a single vectorized bitwise OR."""
        out = []
        for src_local, _w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(np.empty((0, self._anf_R), dtype=np.uint64))
                continue
            m = np.zeros((n_out, self._anf_R), dtype=np.uint64)
            np.bitwise_or.at(m, out_idx, self.anf[src_local])
            out.append(m)
        return out[0] if self.P == 1 else tuple(out)

    def anf_apply(self, *msgs) -> float:
        for s, m in enumerate(msgs):
            if len(m):
                idx = self.in_idx[s]  # unique per route: fancy |= is safe
                self.anf[idx] = self.anf[idx] | m
        return self._anf_estimate_total()

    # ---- pruned landmark labeling (2-hop cover) -----------------------------
    def pll_init(self) -> None:
        """Per-partition label store for Pruned Landmark Labeling (Akiba/
        Iwata/Yoshida, SIGMOD'13): ``_pll[hub] = (sorted local idx, hop
        dist)`` — one compact pair of arrays per landmark whose pruned BFS
        reached any vertex owned here.  Nothing vertex-global lives on the
        driver; label lookups during later prunes are vectorized
        searchsorted probes against these arrays."""
        self._pll: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def pll_root_label(self, root: int):
        """Gather L(root) = {(hub, dist)} for an owned vertex — the small
        broadcast side of the next landmark's pruned BFS."""
        pos = np.searchsorted(self.owned, root)
        if pos >= self.n_owned or self.owned[pos] != root:
            return (np.empty(0, np.int64), np.empty(0, np.int32))
        hubs, dists = [], []
        for h, (loc, dd) in self._pll.items():
            i = np.searchsorted(loc, pos)
            if i < len(loc) and loc[i] == pos:
                hubs.append(h)
                dists.append(int(dd[i]))
        return (np.asarray(hubs, np.int64), np.asarray(dists, np.int32))

    def pll_bfs_init(self, root: int, hub_vids, hub_dists) -> int:
        """Start the pruned BFS for landmark ``root``; ``hub_vids/dists``
        is L(root) from the previously processed landmarks (rank order)."""
        self._pll_root = int(root)
        self._pll_rhubs = np.asarray(hub_vids, np.int64)
        self._pll_rdists = np.asarray(hub_dists, np.int32)
        self._pll_seen = np.zeros(self.n_owned, dtype=bool)
        self._pll_buf_loc: list[np.ndarray] = []
        self._pll_buf_d: list[np.ndarray] = []
        self._pll_frontier = np.empty(0, dtype=np.int64)
        if self.n_owned == 0:
            return 0
        pos = np.searchsorted(self.owned, root)
        if pos < self.n_owned and self.owned[pos] == root:
            # the root always labels itself (root, 0): no earlier hub can
            # witness distance 0 before root itself is a hub
            self._pll_seen[pos] = True
            self._pll_frontier = np.array([pos], dtype=np.int64)
            self._pll_buf_loc.append(self._pll_frontier)
            self._pll_buf_d.append(np.zeros(1, dtype=np.int32))
            return 1
        return 0

    def pll_messages(self):
        flag = np.zeros(self.n_owned, dtype=bool)
        flag[self._pll_frontier] = True
        out = []
        for src_local, _w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            mask = flag[src_local]
            out.append(
                np.unique(out_idx[mask]) if mask.any() else np.empty(0, np.int64)
            )
        return out[0] if self.P == 1 else tuple(out)

    def pll_apply(self, d: int, *msgs) -> int:
        """Candidates are unseen vertices reached at hop ``d``; a candidate
        u is PRUNED iff an earlier-rank hub already witnesses
        dist(root,u) <= d:  min over w in L(root) of d(root,w) + d(w,u),
        with d(w,u) probed from the local label store.  Pruned vertices are
        marked seen but neither labeled nor expanded (Akiba et al. lemma:
        their subtree is covered by the same witness)."""
        cand = [self.in_idx[s][m] for s, m in enumerate(msgs) if len(m)]
        if not cand:
            self._pll_frontier = np.empty(0, dtype=np.int64)
            return 0
        c = np.unique(np.concatenate(cand))
        c = c[~self._pll_seen[c]]
        if len(c) == 0:
            self._pll_frontier = np.empty(0, dtype=np.int64)
            return 0
        self._pll_seen[c] = True
        best = np.full(len(c), np.inf)
        for w, dw in zip(self._pll_rhubs, self._pll_rdists):
            ent = self._pll.get(int(w))
            if ent is None:
                continue
            loc, dd = ent
            i = np.searchsorted(loc, c)
            i_cl = np.minimum(i, len(loc) - 1)
            valid = loc[i_cl] == c
            if valid.any():
                best[valid] = np.minimum(
                    best[valid], dd[i_cl[valid]].astype(np.float64) + float(dw)
                )
        keep = best > d
        labeled = c[keep]
        if len(labeled):
            self._pll_buf_loc.append(labeled)
            self._pll_buf_d.append(np.full(len(labeled), d, dtype=np.int32))
        self._pll_frontier = labeled
        return int(len(labeled))

    def pll_bfs_finalize(self) -> int:
        """Commit this landmark's labels (visible to later prunes)."""
        if not self._pll_buf_loc:
            return 0
        loc = np.concatenate(self._pll_buf_loc)
        dd = np.concatenate(self._pll_buf_d)
        order = np.argsort(loc)
        self._pll[self._pll_root] = (loc[order], dd[order])
        self._pll_buf_loc = []
        self._pll_buf_d = []
        return int(len(loc))

    def pll_labels_table(self) -> pa.Table:
        vid, hub, dist = [], [], []
        for h, (loc, dd) in sorted(self._pll.items()):
            vid.append(self.owned[loc])
            hub.append(np.full(len(loc), h, dtype=np.int64))
            dist.append(dd.astype(np.int64))
        if not vid:
            return pa.table(
                {
                    "vid": np.empty(0, np.int64),
                    "hub": np.empty(0, np.int64),
                    "dist": np.empty(0, np.int64),
                }
            )
        return pa.table(
            {
                "vid": np.concatenate(vid),
                "hub": np.concatenate(hub),
                "dist": np.concatenate(dist),
            }
        )

    # ---- Laplacian conjugate gradient (batched multi-RHS) -------------------
    def cg_init(self, k: int, shift: float = 0.0) -> None:
        """State for k simultaneous CG solves of (shift*I + L) x = b,
        L = D_w - A_w on the symmetrized routes (shift=0: the singular
        Laplacian; shift=1: the SPD forest matrix I + L).  b accumulates
        via cg_add_b partials; all vectors live partitioned (n_owned x k);
        the driver only ever sees (k,)-sized dot products."""
        self._cg_k = int(k)
        self._cg_shift = float(shift)
        self._cg_b = np.zeros((self.n_owned, self._cg_k), dtype=np.float64)

    def cg_set_probes(self, seed: int, ones_col: bool = False) -> None:
        """Hutchinson probe RHS: b[:, j] = +-1 hashed from (vid, j) —
        partition-invariant; optional last column = the all-ones vector
        (the row-sum solve)."""
        import pandas as pd

        k = self._cg_k - (1 if ones_col else 0)
        cols = np.arange(k, dtype=np.uint64)
        key = (
            self.owned.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)
            + cols[None, :] * np.uint64(2654435761)
            + np.uint64(seed)
        )
        h = pd.util.hash_array(key.ravel()).reshape(self.n_owned, k)
        self._cg_b[:, :k] = np.where((h & np.uint64(1)).astype(bool), 1.0, -1.0)
        if ones_col:
            self._cg_b[:, k] = 1.0

    def cg_add_b(self, vids: np.ndarray, vals: np.ndarray) -> None:
        pos = np.searchsorted(self.owned, np.asarray(vids, np.int64))
        np.add.at(self._cg_b, pos, np.asarray(vals, np.float64))

    def cg_start(self) -> np.ndarray:
        """x = 0, r = p = b.  Returns local column sums of r.r and b.b."""
        self._cg_x = np.zeros_like(self._cg_b)
        self._cg_r = self._cg_b.copy()
        self._cg_p = self._cg_b.copy()
        rr = (self._cg_r * self._cg_r).sum(axis=0)
        return np.stack([rr, rr])

    def cg_matvec_messages(self):
        """Per target: (n_out, k) pre-combined sums of w * p[src] — the
        off-diagonal half of L p, same exchange shape as anf_messages."""
        p = self._cg_p
        out = []
        for src_local, w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(np.empty((0, self._cg_k), dtype=np.float64))
                continue
            m = np.zeros((n_out, self._cg_k), dtype=np.float64)
            np.add.at(m, out_idx, w[:, None] * p[src_local])
            out.append(m)
        return out[0] if self.P == 1 else tuple(out)

    def cg_matvec_apply(self, *msgs) -> np.ndarray:
        """Ap = wdeg*p - sum_in(w*p); returns local p.Ap column sums."""
        inc = np.zeros_like(self._cg_p)
        for s, m in enumerate(msgs):
            if len(m):
                idx = self.in_idx[s]  # unique per route: fancy += is safe
                inc[idx] += m
        self._cg_ap = (self.wdeg + self._cg_shift)[:, None] * self._cg_p - inc
        return (self._cg_p * self._cg_ap).sum(axis=0)

    def cg_update(self, alpha: np.ndarray) -> np.ndarray:
        """x += alpha p; r -= alpha Ap (per column); returns local r.r."""
        a = np.asarray(alpha, np.float64)[None, :]
        self._cg_x += a * self._cg_p
        self._cg_r -= a * self._cg_ap
        return (self._cg_r * self._cg_r).sum(axis=0)

    def cg_direction(self, beta: np.ndarray) -> None:
        self._cg_p = self._cg_r + np.asarray(beta, np.float64)[None, :] * self._cg_p

    def cg_x_table(self) -> pa.Table:
        cols = {"vid": self.owned}
        for j in range(self._cg_k):
            cols[f"z{j}"] = self._cg_x[:, j]
        return pa.table(cols)

    def fc_table(self, n_probes: int) -> pa.Table:
        """Forest-centrality locals after a shifted (I+L) solve whose first
        n_probes columns were Hutchinson probes and last column the ones
        vector: diag estimate = mean_j q_j * x_j, s = (I+L)^-1 1."""
        diag = (
            self._cg_b[:, :n_probes] * self._cg_x[:, :n_probes]
        ).mean(axis=1)
        s = self._cg_x[:, n_probes]
        return pa.table({"vid": self.owned, "diag": diag, "s": s})

    def cg_x_at(self, vids: np.ndarray) -> np.ndarray:
        """x rows for OWNED vids (callers route by vid %% P); (m, k)."""
        vids = np.asarray(vids, np.int64)
        pos = np.minimum(np.searchsorted(self.owned, vids), self.n_owned - 1)
        hit = self.owned[pos] == vids
        out = np.full((len(vids), self._cg_k), np.nan, dtype=np.float64)
        out[hit] = self._cg_x[pos[hit]]
        return out

    # ---- GED-Walk masked walk counts ----------------------------------------
    def gw_init(self, mask_vids: np.ndarray) -> float:
        """Walk-count chain x_l = (A_masked)^l 1 for GED-Walk: masked
        vertices (the group S) have their rows/cols zeroed, so sum(x_l)
        counts the l-walks that AVOID S entirely.  Keeps the per-level
        history for candidate scoring.  Returns local sum(x_0)."""
        mask = np.zeros(self.n_owned, dtype=bool)
        mv = np.asarray(mask_vids, np.int64)
        if len(mv) and self.n_owned:
            pos = np.minimum(np.searchsorted(self.owned, mv), self.n_owned - 1)
            hit = self.owned[pos] == mv
            mask[pos[hit]] = True
        self._gw_mask = mask
        self._gw_x = np.where(mask, 0.0, 1.0)
        self._gw_hist = [self._gw_x.copy()]
        return float(self._gw_x.sum())

    def gw_messages(self):
        x = self._gw_x
        out = []
        for src_local, w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(np.empty(0, dtype=np.float64))
                continue
            out.append(
                np.bincount(out_idx, weights=w * x[src_local], minlength=n_out)
            )
        return out[0] if self.P == 1 else tuple(out)

    def gw_apply(self, *msgs) -> float:
        inc = np.zeros(self.n_owned, dtype=np.float64)
        for s, m in enumerate(msgs):
            if len(m):
                inc[self.in_idx[s]] += m
        inc[self._gw_mask] = 0.0
        self._gw_x = inc
        self._gw_hist.append(inc.copy())
        return float(inc.sum())

    def gw_candidate_scores(self, alpha: float, top_c: int):
        """Heuristic marginal-gain score per non-masked owned vertex from
        the stored levels: score(v) = sum over i + j + 1 <= L of
        alpha^(i+j+1) f_i(v) f_j(v) — walks counted through v (symmetric
        A: forward == backward).  Returns this partition's top_c
        (vids, scores)."""
        H = np.stack(self._gw_hist, axis=1)  # (n_owned, L+1)
        L = H.shape[1] - 1
        score = np.zeros(self.n_owned, dtype=np.float64)
        for i in range(L + 1):
            for j in range(L - i):
                score += (alpha ** (i + j + 1)) * H[:, i] * H[:, j]
        score[self._gw_mask] = -np.inf
        c = min(top_c, self.n_owned)
        if c == 0:
            return (np.empty(0, np.int64), np.empty(0, np.float64))
        idx = np.argpartition(-score, c - 1)[:c]
        idx = idx[np.argsort(-score[idx], kind="stable")]
        keep = np.isfinite(score[idx])
        return (self.owned[idx[keep]], score[idx[keep]])

    # ---- SEIR epidemic simulation -------------------------------------------
    def seir_init(
        self, zero_vids, e_time: int, i_time: int, trans_p: float, seed: int
    ) -> tuple:
        """States: 0=S 1=E 2=I 3=R plus a phase timer.  Randomness is a
        counter hash of (vid, t) — partition-invariant and replayable."""
        self._seir_et, self._seir_it = int(e_time), int(i_time)
        self._seir_p, self._seir_seed = float(trans_p), int(seed)
        self._seir_state = np.zeros(self.n_owned, dtype=np.int8)
        self._seir_timer = np.zeros(self.n_owned, dtype=np.int32)
        zv = np.asarray(zero_vids, np.int64)
        if len(zv) and self.n_owned:
            pos = np.minimum(np.searchsorted(self.owned, zv), self.n_owned - 1)
            hit = self.owned[pos] == zv
            self._seir_state[pos[hit]] = 2
            self._seir_timer[pos[hit]] = self._seir_it
        return self._seir_counts()

    def _seir_counts(self) -> tuple:
        return tuple(int((self._seir_state == s).sum()) for s in range(4))

    def seir_messages(self):
        inf = self._seir_state == 2
        out = []
        for src_local, _w, out_idx, n_out in self.route:
            if n_out == 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            mask = inf[src_local]
            out.append(
                np.bincount(out_idx[mask], minlength=n_out).astype(np.int64)
                if mask.any()
                else np.zeros(n_out, dtype=np.int64)
            )
        return out[0] if self.P == 1 else tuple(out)

    def seir_apply(self, t: int, *msgs) -> tuple:
        """Synchronous step: timers first (E->I, I->R on expiry), then new
        exposures from the PRE-STEP infectious set (the message counts).
        P(S->E) = 1 - (1-p)^(#I neighbors); draw = hash(vid, t, seed)."""
        import pandas as pd

        st, tm = self._seir_state, self._seir_timer
        tm[(st == 1) | (st == 2)] -= 1
        to_i = (st == 1) & (tm <= 0)
        to_r = (st == 2) & (tm <= 0)
        st[to_i] = 2
        tm[to_i] = self._seir_it
        st[to_r] = 3
        cnt = np.zeros(self.n_owned, dtype=np.int64)
        for s, m in enumerate(msgs):
            if len(m):
                cnt[self.in_idx[s]] += m
        sus = (st == 0) & (cnt > 0)
        if sus.any():
            key = (
                self.owned[sus].astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                + np.uint64(t) * np.uint64(2654435761)
                + np.uint64(self._seir_seed)
            )
            u = (pd.util.hash_array(key.view(np.int64)) >> np.uint64(11)) * (
                2.0**-53
            )
            p_inf = 1.0 - (1.0 - self._seir_p) ** cnt[sus]
            newly = np.flatnonzero(sus)[u < p_inf]
            st[newly] = 1
            tm[newly] = self._seir_et
        return self._seir_counts()

    def dist_of(self, vid: int) -> float:
        """Current tentative SSSP distance of an owned vertex (inf when
        unreached; also inf when not owned — callers route to the owner)."""
        pos = np.searchsorted(self.owned, vid)
        if pos >= self.n_owned or self.owned[pos] != vid:
            return float("inf")
        return float(self.dist[pos])

    # ---- lineage / checkpoint --------------------------------------------
    def checkpoint(self, run_dir: str, it: int, job_id: str, kind: str = "score"):
        tbl = self.scores_table() if kind == "score" else self.labels_table()
        return lineage.write_partition(
            run_dir,
            it,
            self.pid,
            tbl,
            job_id,
            extra={"kind": kind, "n_owned": self.n_owned},
        )

    def load_checkpoint(self, run_dir: str, it: int, kind: str = "score") -> float:
        tbl = lineage.load_partition(run_dir, it, self.pid)
        vids = _to_np(tbl["vid"])
        if len(vids) != self.n_owned or not np.array_equal(vids, self.owned):
            raise RuntimeError(
                f"checkpoint partition {self.pid} does not match graph partition"
            )
        if kind == "score":
            self.score = _to_np(tbl["score"]).astype(np.float64)
            return float(self.score[self.wdeg == 0.0].sum())
        self.label = _to_np(tbl["label"]).astype(np.int64)
        return 0.0


# --------------------------------------------------------------------------
# driver-side orchestration
# --------------------------------------------------------------------------


def _feed_actors(edges_ds, vertices_ds, actors, P):
    """Stream the edge/vertex Datasets into the partition actors.

    A map_batches stage splits every Arrow batch by destination partition
    and pushes the slices to the owning actors; ray.get inside the task
    provides backpressure.  Data flows task -> actor through the object
    store without touching the driver.
    """
    import pyarrow.compute as pc

    def feed_edges(batch: pa.Table) -> pa.Table:
        p = _part(_to_np(batch["src"]), P)
        refs = []
        for t_id in range(P):
            sub = batch.filter(pa.array(p == t_id))
            if sub.num_rows:
                refs.append(actors[t_id].add_edges.remote(sub.select(["src", "dst", "w"])))
        ray.get(refs)
        return pa.table({"n": pa.array([batch.num_rows], type=pa.int64())})

    def feed_vertices(batch: pa.Table) -> pa.Table:
        vids = _to_np(batch["vid"])
        p = _part(vids, P)
        refs = []
        for t_id in range(P):
            sub = vids[p == t_id]
            if len(sub):
                refs.append(actors[t_id].add_vertices.remote(sub))
        ray.get(refs)
        return pa.table({"n": pa.array([len(vids)], type=pa.int64())})

    edges_ds.map_batches(
        feed_edges, batch_format="pyarrow", zero_copy_batch=True
    ).count()
    if vertices_ds is not None:
        vertices_ds.select_columns(["vid"]).map_batches(
            feed_vertices, batch_format="pyarrow", zero_copy_batch=True
        ).count()


def _wire_routes(actors, P):
    if P == 1:
        route_refs = [[actors[0].finalize_graph.remote()]]
    else:
        route_refs = [
            list(a.finalize_graph.options(num_returns=P).remote()) for a in actors
        ]
    n_refs = [
        actors[t].set_in_routes.remote(*[route_refs[s][t] for s in range(P)])
        for t in range(P)
    ]
    return sum(ray.get(n_refs))


class BSPGraph:
    """A loaded, routed actor-pool graph ready to run iterative kernels.

    ``actor_num_cpus`` sizes the per-partition CPU reservation: benchmarks
    pin 1 CPU per partition (P ~= cluster CPUs); tests use a fractional
    reservation so P actors + the Dataset feed stage co-schedule on small
    ray.init(num_cpus=...) sessions without deadlocking.
    """

    def __init__(
        self,
        edges_ds,
        vertices_ds=None,
        num_partitions: int = 8,
        actor_num_cpus: float = 0.25,
    ):
        self.P = num_partitions
        self.actors = [
            CSRPartition.options(num_cpus=actor_num_cpus).remote(p, num_partitions)
            for p in range(num_partitions)
        ]
        _feed_actors(edges_ds, vertices_ds, self.actors, self.P)
        self.n = _wire_routes(self.actors, self.P)

    @classmethod
    def from_replicated(
        cls,
        base_table: pa.Table,
        copies: int,
        offset: int,
        num_partitions: int,
        actor_num_cpus: float = 0.1,
    ):
        """Scaled-bench constructor: every actor deterministically generates
        its own slice of the copies-times-replicated base edge table from a
        single broadcast (ray.put) base — no per-row feed through a Dataset
        stage, so graph build is O(|base| x copies / P) per actor."""
        self = cls.__new__(cls)
        self.P = num_partitions
        self.actors = [
            CSRPartition.options(num_cpus=actor_num_cpus).remote(p, num_partitions)
            for p in range(num_partitions)
        ]
        ref = ray.put(base_table)
        ray.get(
            [a.ingest_replicated.remote(ref, copies, offset) for a in self.actors]
        )
        self.n = _wire_routes(self.actors, self.P)
        return self

    def _collect(self, method: str):
        refs = [getattr(a, method).remote() for a in self.actors]
        import ray.data

        ds = ray.data.from_arrow_refs(refs).materialize()
        return ds

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []

    # ---- grouped exchange wiring -------------------------------------------
    def _setup_grouped(self, num_groups=None):
        """Wire the hierarchical exchange: contiguous partition groups (at
        scale: one group per node, so each per-round bundle crosses the
        network once and is read from shared plasma by every co-located
        member)."""
        G = num_groups or max(1, self.P // 4)
        if getattr(self, "_grouped_G", None) == G:
            return
        groups = [
            [int(t) for t in c]
            for c in np.array_split(np.arange(self.P), G)
            if len(c)
        ]
        self._groups = groups
        self._pos = {}
        for g, ms in enumerate(groups):
            for j, t in enumerate(ms):
                self._pos[t] = (g, j)
        ray.get(
            [
                self.actors[t].set_groups.remote(groups, self._pos[t][1])
                for t in range(self.P)
            ]
        )
        self._grouped_G = len(groups)

    # ---- PageRank ---------------------------------------------------------
    def pagerank(
        self,
        damping=0.85,
        tol=1e-10,
        max_iter=100,
        fixed_iters=None,
        checkpoint=None,
        stats=None,
        exchange="auto",
        num_groups=None,
    ):
        """exchange: "pairwise" = one message object per partition pair per
        round (P^2); "grouped" = hierarchical group-bundled exchange
        (P*G objects + fused apply/emit steps — the scale path); "auto" =
        grouped when P >= 4.  Both exchanges support per-partition lineage
        checkpoints + resume, so the north rule's scaling AND
        mid-iteration resume hold in the SAME run."""
        if exchange == "auto":
            exchange = "grouped" if self.P >= 4 else "pairwise"
        if exchange == "grouped":
            return self._pagerank_grouped(
                damping, tol, max_iter, fixed_iters, stats, num_groups,
                checkpoint=checkpoint,
            )
        P, actors = self.P, self.actors
        ck = checkpoint or {}
        run_dir, every = ck.get("dir"), ck.get("every", 0)
        job_id = ck.get("job_id", "job")
        start_it = 0
        ray.get([a.pr_init.remote(self.n) for a in actors])
        if run_dir and ck.get("resume"):
            latest = lineage.latest_complete_iter(run_dir)
            if latest is not None:
                ray.get(
                    [a.load_checkpoint.remote(run_dir, latest) for a in actors]
                )
                start_it = latest

        # Pipelined BSP: the dangling allreduce travels with the messages
        # (pr_messages ships each partition's dangling scalar; pr_apply
        # sums all P), so the driver enqueues iterations ahead and only
        # synchronizes every CHECK iterations for the residual stop test —
        # per-actor serial execution order provides the BSP barrier.
        # Convergence may overshoot by up to CHECK-1 iterations (harmless:
        # extra power iterations only tighten the fixpoint).
        CHECK = 4
        it = start_it
        iters_target = fixed_iters if fixed_iters is not None else max_iter
        pending: dict[int, list] = {}
        t_loop = time.perf_counter()
        while it < iters_target:
            it += 1
            mr = [
                list(a.pr_messages.options(num_returns=P + 1).remote())
                for a in actors
            ]
            dang_refs = [mr[s][P] for s in range(P)]
            pending[it] = [
                actors[t].pr_apply.remote(
                    damping, *dang_refs, *[mr[s][t] for s in range(P)]
                )
                for t in range(P)
            ]
            is_ckpt = run_dir and every and it % every == 0
            if is_ckpt or fixed_iters is None and (
                it % CHECK == 0 or it == iters_target
            ):
                resid = None
                for k in sorted(pending):
                    resid = sum(ray.get(pending.pop(k)))
                if is_ckpt:
                    ray.get(
                        [
                            a.checkpoint.remote(run_dir, it, job_id, "score")
                            for a in actors
                        ]
                    )
                    lineage.commit_iteration(run_dir, it, P, {"resid": resid})
                if fixed_iters is None and resid is not None and resid < tol:
                    break
        for k in sorted(pending):
            ray.get(pending.pop(k))
        if stats is not None:
            stats.setdefault("iter_wall_s", []).append(
                time.perf_counter() - t_loop
            )
        return self._collect("scores_table"), it

    def _pagerank_grouped(
        self, damping, tol, max_iter, fixed_iters, stats, num_groups=None,
        checkpoint=None,
    ):
        """Pipelined hierarchical BSP: round r's fused step applies round
        r-1's bundles then emits round r's; the final emitted round is
        applied by one trailing pr_apply_bundles wave.  Objects per round:
        P*G bundles + P residuals (vs P^2 + 2P pairwise); tasks per round:
        P fused steps (vs 2P).  Convergence mode syncs every CHECK rounds
        on the (one-round-lagged) residuals — overshoot only tightens the
        fixpoint.

        Checkpointing rides the lag: step ``it`` applies iteration
        ``it-1``, so when iteration K = it-1 is a checkpoint multiple the
        driver enqueues per-actor ``checkpoint`` tasks right behind step
        ``it`` (per-actor serial order IS the barrier — no extra sync),
        gets the manifests, and commits the iteration.  The final
        iteration (applied by the trailing wave) checkpoints after it.
        Resume loads the latest committed iteration into actor scores and
        re-enters the loop with a fresh emit — the accumulation order is
        identical, so resumed == uninterrupted bit-for-bit."""
        self._setup_grouped(num_groups)
        P, actors = self.P, self.actors
        pos = self._pos
        G = len(self._groups)
        ck = checkpoint or {}
        run_dir, every = ck.get("dir"), ck.get("every", 0)
        job_id = ck.get("job_id", "job")
        start_it = 0
        ray.get([a.pr_init.remote(self.n) for a in actors])
        if run_dir and ck.get("resume"):
            latest = lineage.latest_complete_iter(run_dir)
            if latest is not None:
                ray.get(
                    [a.load_checkpoint.remote(run_dir, latest) for a in actors]
                )
                start_it = latest
        CHECK = 4
        it = start_it
        iters_target = fixed_iters if fixed_iters is not None else max_iter
        prev = None  # prev[s] = [resid_ref, bundle_g0_ref, .., bundle_gG-1_ref]
        resid_refs: dict[int, list] = {}
        stop = False

        def do_checkpoint(k: int):
            # enqueued behind the step that applied iteration k: per-actor
            # serial execution means every checkpoint reads post-apply state
            ray.get(
                [a.checkpoint.remote(run_dir, k, job_id, "score") for a in actors]
            )
            resid = None
            for kk in sorted(resid_refs):
                if kk <= k:
                    resid = sum(ray.get(resid_refs.pop(kk)))
            lineage.commit_iteration(run_dir, k, P, {"resid": resid})
            return resid

        t_loop = time.perf_counter()
        while it < iters_target and not stop:
            it += 1
            step_refs = []
            for t in range(P):
                g = pos[t][0]
                if prev is None:
                    r = actors[t].pr_step_g.options(num_returns=G + 1).remote(
                        damping, True
                    )
                else:
                    r = actors[t].pr_step_g.options(num_returns=G + 1).remote(
                        damping, False, *[prev[s][1 + g] for s in range(P)]
                    )
                step_refs.append(list(r))
            if it >= start_it + 2:
                resid_refs[it - 1] = [sr[0] for sr in step_refs]
            prev = step_refs
            applied = it - 1  # iteration whose apply step `it` performs
            if (
                run_dir and every and applied > start_it
                and applied % every == 0
            ):
                resid = do_checkpoint(applied)
                if fixed_iters is None and resid is not None and resid < tol:
                    stop = True
            if fixed_iters is None and not stop and it % CHECK == 0 and resid_refs:
                last = None
                for k in sorted(resid_refs):
                    last = sum(ray.get(resid_refs.pop(k)))
                if last is not None and last < tol:
                    stop = True
        # apply the last emitted round
        if prev is not None:
            ray.get(
                [
                    actors[t].pr_apply_bundles.remote(
                        damping, *[prev[s][1 + pos[t][0]] for s in range(P)]
                    )
                    for t in range(P)
                ]
            )
        for k in sorted(resid_refs):
            ray.get(resid_refs.pop(k))
        if run_dir and every and it > start_it and it % every == 0:
            ray.get(
                [a.checkpoint.remote(run_dir, it, job_id, "score") for a in actors]
            )
            lineage.commit_iteration(run_dir, it, P, {"resid": None})
        if stats is not None:
            stats.setdefault("iter_wall_s", []).append(
                time.perf_counter() - t_loop
            )
        return self._collect("scores_table"), it

    # ---- label-kernel loop (shared by CC hash-min and sync PLP) -----------
    def _label_loop(
        self,
        msg_method: str,
        apply_method: str,
        max_iter,
        fixed_iters,
        stats,
        snapshot_at: int | None = None,
    ):
        """Pipelined BSP label rounds (same scheme as pagerank's loop): the
        driver enqueues round r+1 before reading round r's changed-counters,
        so actors never idle on driver syncs — per-actor serial execution
        order IS the barrier.  Convergence mode overshoots by at most ONE
        round; both kernels are fixpoint-stable (changed==0 => further
        rounds are identity), so the overshoot only costs wall time, never
        changes the answer.  Fixed-iteration mode never syncs mid-loop."""
        P, actors = self.P, self.actors
        ray.get([a.lab_init.remote() for a in actors])
        rounds = 0
        iters_target = fixed_iters if fixed_iters is not None else max_iter
        prev_refs = None
        snapshot = None
        t_loop = time.perf_counter()
        while rounds < iters_target:
            rounds += 1
            if P == 1:
                msg_refs = [[getattr(actors[0], msg_method).remote()]]
            else:
                msg_refs = [
                    list(getattr(a, msg_method).options(num_returns=P).remote())
                    for a in actors
                ]
            refs = [
                getattr(actors[t], apply_method).remote(
                    *[msg_refs[s][t] for s in range(P)]
                )
                for t in range(P)
            ]
            if fixed_iters is None and prev_refs is not None:
                # read LAST round's counters while this round executes
                if sum(ray.get(prev_refs)) == 0:
                    ray.get(refs)  # the in-flight round is a no-op
                    break
            prev_refs = refs
            if snapshot_at is not None and rounds == snapshot_at:
                # one driver sync, then capture the intermediate labeling
                # (costs the pipelining overlap for this round only)
                ray.get(refs)
                snapshot = self._collect("labels_table")
        else:
            if prev_refs is not None:
                ray.get(prev_refs)
        if stats is not None:
            stats.setdefault("iter_wall_s", []).append(time.perf_counter() - t_loop)
        final = self._collect("labels_table")
        if snapshot_at is not None:
            return final, rounds, snapshot
        return final, rounds

    # ---- BFS (multi-source frontier) --------------------------------------
    def bfs(self, sources: np.ndarray, max_depth=None, stats=None, collect=True):
        """Synchronous frontier rounds until the frontier empties (or
        max_depth).  Rounds are driver-synced on the newly-reached counter —
        the frontier-empty test IS the termination, so no pipelining
        overshoot is possible or needed; per-round payload is only the
        touched destination-index sets."""
        P, actors = self.P, self.actors
        ray.get([a.bfs_init.remote(sources) for a in actors])
        rounds = 0
        limit = max_depth if max_depth is not None else 2**62
        t0 = time.perf_counter()
        while rounds < limit:
            rounds += 1
            if P == 1:
                msg_refs = [[actors[0].bfs_messages.remote()]]
            else:
                msg_refs = [
                    list(a.bfs_messages.options(num_returns=P).remote())
                    for a in actors
                ]
            newly = sum(
                ray.get(
                    [
                        actors[t].bfs_apply.remote(*[msg_refs[s][t] for s in range(P)])
                        for t in range(P)
                    ]
                )
            )
            if newly == 0:
                break
        if stats is not None:
            stats.setdefault("iter_wall_s", []).append(time.perf_counter() - t0)
        if not collect:
            return None, rounds
        return self._collect("depths_table"), rounds

    # ---- topological levels (DAG) ------------------------------------------
    def topo_levels(self, max_rounds: int | None = None, stats=None):
        """Longest-path-from-a-source level per vertex of a DAG — the
        parallel formulation of the reference's graph/TopologicalSort
        (vertices sorted by (level, vid) are a valid topological order;
        level r = Kahn peel round r).  Max-propagation rounds to the
        fixpoint; on a DAG the fixpoint is reached within diameter rounds,
        so exceeding |V| rounds (or ``max_rounds``) proves a cycle and
        raises ValueError.  Returns (Dataset(vid, level), rounds)."""
        P, actors = self.P, self.actors
        ray.get([a.topo_init.remote() for a in actors])
        limit = max_rounds if max_rounds is not None else self.n + 1
        rounds = 0
        t0 = time.perf_counter()
        while True:
            rounds += 1
            if rounds > limit:
                raise ValueError(
                    "topo_levels did not reach a fixpoint within "
                    f"{limit} rounds — the input graph has a cycle "
                    "(topological order undefined)"
                )
            if P == 1:
                msg_refs = [[actors[0].topo_messages.remote()]]
            else:
                msg_refs = [
                    list(a.topo_messages.options(num_returns=P).remote())
                    for a in actors
                ]
            changed = sum(
                ray.get(
                    [
                        actors[t].topo_apply.remote(
                            *[msg_refs[s][t] for s in range(P)]
                        )
                        for t in range(P)
                    ]
                )
            )
            if changed == 0:
                break
        if stats is not None:
            stats.setdefault("iter_wall_s", []).append(time.perf_counter() - t0)
        return self._collect("levels_table"), rounds

    # ---- weighted SSSP (delta-stepping) ------------------------------------
    def gw_chain(self, mask_vids: np.ndarray, L: int) -> np.ndarray:
        """Run L masked walk-count matvec rounds; returns the (L+1,) array
        of global level sums [sum(x_0), ..., sum(x_L)] — everything GED
        evaluation needs, one scalar per round on the driver."""
        P, actors = self.P, self.actors
        sums = [sum(ray.get([a.gw_init.remote(mask_vids) for a in actors]))]
        for _ in range(L):
            if P == 1:
                msg_refs = [[actors[0].gw_messages.remote()]]
            else:
                msg_refs = [
                    list(a.gw_messages.options(num_returns=P).remote())
                    for a in actors
                ]
            sums.append(
                sum(
                    ray.get(
                        [
                            actors[t].gw_apply.remote(
                                *[msg_refs[s][t] for s in range(P)]
                            )
                            for t in range(P)
                        ]
                    )
                )
            )
        return np.asarray(sums, dtype=np.float64)

    def seir_run(
        self,
        zero_vids,
        t_max: int,
        e_time: int,
        i_time: int,
        trans_p: float,
        seed: int,
    ) -> np.ndarray:
        """Synchronous SEIR rounds; returns the (t_max+1, 4) S/E/I/R count
        trajectory (row 0 = initial state).  Stops early when no E or I
        remain (epidemic over)."""
        P, actors = self.P, self.actors
        c0 = ray.get(
            [
                a.seir_init.remote(zero_vids, e_time, i_time, trans_p, seed)
                for a in actors
            ]
        )
        traj = [np.sum(c0, axis=0)]
        for t in range(1, t_max + 1):
            if traj[-1][1] + traj[-1][2] == 0:
                break
            if P == 1:
                msg_refs = [[actors[0].seir_messages.remote()]]
            else:
                msg_refs = [
                    list(a.seir_messages.options(num_returns=P).remote())
                    for a in actors
                ]
            cs = ray.get(
                [
                    actors[t_id].seir_apply.remote(
                        t, *[msg_refs[s][t_id] for s in range(P)]
                    )
                    for t_id in range(P)
                ]
            )
            traj.append(np.sum(cs, axis=0))
        return np.asarray(traj, dtype=np.int64)

    def cg_solve(self, maxiter: int = 500, tol: float = 1e-8, stats=None):
        """Batched conjugate gradient on the graph Laplacian over the BSP
        exchange: k right-hand sides advance in lockstep (per-column
        alpha/beta), one matvec exchange per iteration, driver traffic is
        two (k,) dot-product reductions per round.  L is singular
        (nullspace = per-component constants); with x0 = 0 and every RHS
        component-sum-zero (guaranteed for B^T W^(1/2) q and e_u - e_v
        within a component) CG converges to the pseudoinverse solution.
        Callers must cg_init + cg_add_b first.  Returns (iters, final
        max relative residual)."""
        P, actors = self.P, self.actors
        start = ray.get([a.cg_start.remote() for a in actors])
        rs = sum(s[0] for s in start)
        bb = sum(s[1] for s in start)
        bb = np.maximum(bb, 1e-300)
        it = 0
        t0 = time.perf_counter()
        while it < maxiter and float(np.max(rs / bb)) > tol * tol:
            it += 1
            if P == 1:
                msg_refs = [[actors[0].cg_matvec_messages.remote()]]
            else:
                msg_refs = [
                    list(a.cg_matvec_messages.options(num_returns=P).remote())
                    for a in actors
                ]
            pap = sum(
                ray.get(
                    [
                        actors[t].cg_matvec_apply.remote(
                            *[msg_refs[s][t] for s in range(P)]
                        )
                        for t in range(P)
                    ]
                )
            )
            alpha = np.where(pap > 0, rs / np.maximum(pap, 1e-300), 0.0)
            rs_new = sum(
                ray.get([a.cg_update.remote(alpha) for a in actors])
            )
            beta = rs_new / np.maximum(rs, 1e-300)
            ray.get([a.cg_direction.remote(beta) for a in actors])
            rs = rs_new
        if stats is not None:
            stats.setdefault("iter_wall_s", []).append(time.perf_counter() - t0)
        return it, float(np.max(np.sqrt(rs / bb)))

    def pll_build(self, order: np.ndarray, stats=None):
        """Pruned Landmark Labeling build (Akiba/Iwata/Yoshida SIGMOD'13):
        one pruned BFS per vertex in ``order`` (degree-descending canonical
        rank).  Each BFS is the synchronous frontier kernel of ``bfs`` plus
        a vectorized witness probe against the partition-local label store;
        the only driver traffic per landmark is L(root) (a few dozen hub
        ids) and the per-round frontier counters.  Processing ALL vertices
        in rank order makes the resulting 2-hop cover exact for every pair.
        Returns (Dataset(vid, hub, dist), total label entries)."""
        P, actors = self.P, self.actors
        ray.get([a.pll_init.remote() for a in actors])
        total = 0
        t0 = time.perf_counter()
        for root in np.asarray(order, dtype=np.int64):
            root = int(root)
            owner = actors[root % P]
            hubs, dists = ray.get(owner.pll_root_label.remote(root))
            found = sum(
                ray.get(
                    [a.pll_bfs_init.remote(root, hubs, dists) for a in actors]
                )
            )
            d = 0  # depth is implicit in the synchronous round counter
            while found > 0:
                d += 1
                if P == 1:
                    msg_refs = [[actors[0].pll_messages.remote()]]
                else:
                    msg_refs = [
                        list(a.pll_messages.options(num_returns=P).remote())
                        for a in actors
                    ]
                found = sum(
                    ray.get(
                        [
                            actors[t].pll_apply.remote(
                                d, *[msg_refs[s][t] for s in range(P)]
                            )
                            for t in range(P)
                        ]
                    )
                )
            total += sum(
                ray.get([a.pll_bfs_finalize.remote() for a in actors])
            )
        if stats is not None:
            stats.setdefault("iter_wall_s", []).append(time.perf_counter() - t0)
        return self._collect("pll_labels_table"), total

    def sssp(
        self,
        sources: np.ndarray,
        delta: float = 1.0,
        stats=None,
        stop_vid: int | None = None,
    ):
        """Delta-stepping shortest paths (Meyer/Sanders 2003, bucketed
        frontier without the light/heavy edge split — each bucket relaxes
        all out-edges, re-relaxation bounded by bucket width): the driver
        tracks the global current bucket k = min over partitions of the
        dirty vertices' floor(dist/delta); a round relaxes bucket k's dirty
        frontier everywhere at once (messages are per-partition-pair
        pre-minimized float arrays).  Non-negative weights required; exact
        at termination (the final state is the Bellman-Ford fixpoint).
        ``stop_vid`` enables the A*/point-to-point early exit: once the
        global bucket has advanced past stop_vid's tentative bucket, its
        distance is settled (bucket monotonicity) and the loop ends — the
        distributed analogue of popping the target off the heap.
        Returns (Dataset(vid, dist) with inf for unreachable, rounds)."""
        P, actors = self.P, self.actors
        found = sum(
            ray.get([a.sssp_init.remote(np.asarray(sources), delta) for a in actors])
        )
        rounds = 0
        t0 = time.perf_counter()
        k = 0.0
        stop_owner = actors[int(stop_vid) % P] if stop_vid is not None else None
        while found > 0:
            rounds += 1
            if P == 1:
                msg_refs = [[actors[0].sssp_messages.remote(k)]]
            else:
                msg_refs = [
                    list(a.sssp_messages.options(num_returns=P).remote(k))
                    for a in actors
                ]
            nbs = ray.get(
                [
                    actors[t].sssp_apply.remote(*[msg_refs[s][t] for s in range(P)])
                    for t in range(P)
                ]
            )
            live = [b for b in nbs if b >= 0.0]
            if not live:
                break
            k = min(live)
            if stop_owner is not None:
                dt = ray.get(stop_owner.dist_of.remote(int(stop_vid)))
                if np.isfinite(dt) and k > np.floor(dt / delta):
                    break
        if stats is not None:
            stats.setdefault("iter_wall_s", []).append(time.perf_counter() - t0)
        return self._collect("dist_table"), rounds

    def bfs_stats(self) -> tuple[float, int, float]:
        """(sum of finite depths, reached count, sum of reciprocal depths)
        over the whole graph, after a bfs() run."""
        parts = ray.get([a.bfs_stats_part.remote() for a in self.actors])
        return (
            sum(p[0] for p in parts),
            sum(p[1] for p in parts),
            sum(p[2] for p in parts),
        )

    # ---- Brandes betweenness driver ---------------------------------------
    def betweenness(self, sources, stats=None):
        """Exact Brandes dependency accumulation restricted to the given
        source set (the 'approx betweenness' estimator when sources are a
        sample): per source, one forward sigma-BFS and one backward
        per-level dependency sweep — 2·eccentricity actor rounds, payloads
        are float arrays per partition pair.  Returns Dataset(vid,
        betweenness) with the plain sum over sources (caller normalizes)."""
        P, actors = self.P, self.actors
        ray.get([a.bc_reset_accum.remote() for a in actors])
        t0 = time.perf_counter()
        for s in sources:
            found = sum(
                ray.get(
                    [a.bc_init.remote(np.asarray([s], dtype=np.int64)) for a in actors]
                )
            )
            if found == 0:
                continue
            maxd = 0
            while True:
                if P == 1:
                    msg_refs = [[actors[0].bc_forward_messages.remote()]]
                else:
                    msg_refs = [
                        list(a.bc_forward_messages.options(num_returns=P).remote())
                        for a in actors
                    ]
                newly = sum(
                    ray.get(
                        [
                            actors[t].bc_forward_apply.remote(
                                *[msg_refs[s_][t] for s_ in range(P)]
                            )
                            for t in range(P)
                        ]
                    )
                )
                if newly == 0:
                    break
                maxd += 1
            for d in range(maxd, 0, -1):
                if P == 1:
                    msg_refs = [[actors[0].bc_backward_messages.remote(d)]]
                else:
                    msg_refs = [
                        list(
                            a.bc_backward_messages.options(num_returns=P).remote(d)
                        )
                        for a in actors
                    ]
                ray.get(
                    [
                        actors[t].bc_backward_apply.remote(
                            d, *[msg_refs[s_][t] for s_ in range(P)]
                        )
                        for t in range(P)
                    ]
                )
            ray.get([a.bc_accumulate.remote() for a in actors])
        if stats is not None:
            stats.setdefault("iter_wall_s", []).append(time.perf_counter() - t0)
        return self._collect("btw_table")

    # ---- batched multi-source wave drivers ----------------------------------
    def _ms_exchange(self, msg_method, apply_method, *args):
        P, actors = self.P, self.actors
        if P == 1:
            msg_refs = [[getattr(actors[0], msg_method).remote(*args)]]
        else:
            msg_refs = [
                list(getattr(a, msg_method).options(num_returns=P).remote(*args))
                for a in actors
            ]
        return ray.get(
            [
                getattr(actors[t], apply_method).remote(
                    *args, *[msg_refs[s][t] for s in range(P)]
                )
                for t in range(P)
            ]
        )

    def ms_forward(self, sources, with_sigma: bool) -> int:
        """Run one batched multi-source forward BFS wave to exhaustion;
        returns the max depth reached (eccentricity of the wave)."""
        sources = np.asarray(sources, dtype=np.int64)
        ray.get(
            [a.ms_init.remote(sources, with_sigma) for a in self.actors]
        )
        maxd = 0
        while True:
            newly = sum(
                self._ms_exchange("ms_forward_messages", "ms_forward_apply")
            )
            if newly == 0:
                break
            maxd += 1
        return maxd

    def all_vids(self) -> np.ndarray:
        return np.sort(
            np.concatenate(ray.get([a.owned_vids.remote() for a in self.actors]))
        )

    def betweenness_exact(self, sources=None, batch: int = 64, stats=None):
        """Exact Brandes betweenness over ALL vertices (or the given
        sources) in waves of ``batch`` simultaneous sources — the batched
        source waves make exact betweenness ceil(n/batch)*2*ecc BSP rounds.
        Returns Dataset(vid, betweenness) with raw directed-path sums
        (caller halves for undirected)."""
        ray.get([a.bc_reset_accum.remote() for a in self.actors])
        vids = self.all_vids() if sources is None else np.asarray(sources, np.int64)
        t0 = time.perf_counter()
        for i in range(0, len(vids), batch):
            wave = vids[i : i + batch]
            maxd = self.ms_forward(wave, with_sigma=True)
            for d in range(maxd, 0, -1):
                self._ms_exchange("ms_backward_messages", "ms_backward_apply", d)
            ray.get([a.ms_accumulate.remote() for a in self.actors])
        if stats is not None:
            stats.setdefault("iter_wall_s", []).append(time.perf_counter() - t0)
        return self._collect("btw_table")

    def farness_batched(self, sources):
        """(sum_depth, reached, sum_reciprocal) arrays per source (exact,
        one batched BFS wave)."""
        self.ms_forward(sources, with_sigma=False)
        parts = ray.get([a.ms_farness_part.remote() for a in self.actors])
        sumd = np.sum([p[0] for p in parts], axis=0)
        reach = np.sum([p[1] for p in parts], axis=0)
        inv = np.sum([p[2] for p in parts], axis=0)
        return sumd, reach, inv

    def kadabra(
        self,
        pairs_per_round: int = 32,
        eps: float = 0.05,
        delta: float = 0.1,
        max_rounds: int = 64,
        min_tau: int = 256,
        seed: int = 42,
        stats=None,
    ):
        """KADABRA-style ADaptive betweenness approximation (Borassi &
        Natale, ESA'16; SURVEY.md §2.3 centrality/KadabraBetweenness):
        rounds of B uniformly sampled ordered vertex pairs (s, t), one
        2B-wide batched sigma-BFS wave per round (s-block || t-block share
        every BSP exchange), partition-local accumulation of the per-pair
        shortest-path-DAG estimator (see kb_accumulate), and an empirical-
        Bernstein stopping rule: stop when the max half-width over all
        vertices is <= eps (with per-round confidence delta), so easy
        graphs stop after few rounds and hard ones keep sampling.  The
        driver moves only O(B) scalars per round; per-vertex state stays
        partitioned.  Returns (Dataset(vid, betweenness), tau, bound) with
        betweenness on KADABRA's normalized scale (fraction of ordered
        pairs routed through v)."""
        import ray.data

        vids = self.all_vids()
        n = len(vids)
        B = int(min(pairs_per_round, max(1, n // 2)))
        rng = np.random.default_rng(seed)
        log3d = float(np.log(3.0 / delta))
        ray.get([a.kb_init.remote() for a in self.actors])
        tau, bound = 0, float("inf")
        cols = np.arange(B, dtype=np.int64)
        t0 = time.perf_counter()
        for _ in range(max_rounds):
            s = vids[rng.integers(0, n, B)]
            t = vids[rng.integers(0, n, B)]
            for _retry in range(16):
                coll = s == t
                if not coll.any():
                    break
                t[coll] = vids[rng.integers(0, n, int(coll.sum()))]
            self.ms_forward(np.concatenate([s, t]), with_sigma=True)
            parts = ray.get(
                [a.ms_depth_sigma_at.remote(t, cols) for a in self.actors]
            )
            d_st = np.full(B, -1, dtype=np.int64)
            s_st = np.zeros(B, dtype=np.float64)
            for j, dep, sig in parts:
                d_st[j], s_st[j] = dep, sig
            ray.get(
                [a.kb_accumulate.remote(B, d_st, s_st) for a in self.actors]
            )
            tau += B
            if tau >= min_tau:
                bound = max(
                    ray.get(
                        [a.kb_bound_part.remote(tau, log3d) for a in self.actors]
                    )
                )
                if bound <= eps:
                    break
        if stats is not None:
            stats["tau"] = tau
            stats["bound"] = bound
            stats.setdefault("iter_wall_s", []).append(
                time.perf_counter() - t0
            )
        refs = [a.kb_table.remote(int(tau)) for a in self.actors]
        ds = ray.data.from_arrow_refs(refs).materialize()
        return ds, tau, bound

    def pivot_mds(self, k: int = 16, dim: int = 2, stats=None):
        """PivotMDS graph layout (Brandes & Pich, GD'06; reference
        viz/PivotMDS): maxmin pivot selection (first pivot = smallest vid;
        each next = vertex farthest from the chosen set, ties -> smaller
        vid) via k single-source BFS waves folded into per-partition
        dist-to-set state, then ONE k-wide batched BFS wave gives every
        partition its local (n_owned, k) pivot-distance block.  Double
        centering and the C^T C Gram are computed partition-locally (one
        (k,) and one (k, k) reduce to the driver), the k x k eigenproblem
        is solved driver-side, and coordinates C @ V are emitted straight
        from the partitions — per-vertex rows never cross the driver.
        Unreached cells take the finite proxy (max finite depth + 1)
        (connected-graph contract, same as top_closeness).  Eigenvector
        signs are fixed (largest-|component| positive) so layouts are
        deterministic and partition-invariant.
        Returns (Dataset(vid, x, y, ...), pivots, eigenvalues)."""
        import ray.data

        vids = self.all_vids()
        k = int(min(k, len(vids)))
        dim = int(min(dim, k))
        ray.get([a.gc_init.remote() for a in self.actors])
        pivots = [int(vids.min())]
        maxd_all = 0
        for _ in range(k - 1):
            maxd_all = max(
                maxd_all,
                self.ms_forward(
                    np.asarray([pivots[-1]], dtype=np.int64), with_sigma=False
                ),
            )
            ray.get([a.gc_update.remote(0) for a in self.actors])
            cand = ray.get([a.gc_argmax_part.remote() for a in self.actors])
            # max dist, ties -> smaller vid; skip already-picked pivots
            chosen = sorted(
                (c for c in cand if c[0] >= 0 and c[0] not in pivots),
                key=lambda c: (-c[1], c[0]),
            )
            if not chosen:
                break
            pivots.append(int(chosen[0][0]))
        maxd_all = max(
            maxd_all,
            self.ms_forward(np.asarray(pivots, dtype=np.int64), with_sigma=False),
        )
        fill = float(maxd_all + 1)
        parts = ray.get(
            [a.pmds_center_rows.remote(fill) for a in self.actors]
        )
        colsum = np.sum([p[0] for p in parts], axis=0)
        n = sum(p[1] for p in parts)
        colmean2 = colsum / max(n, 1)
        grand2 = float(colsum.sum() / max(n * len(pivots), 1))
        gram = np.sum(
            ray.get([a.pmds_gram.remote(colmean2, grand2) for a in self.actors]),
            axis=0,
        )
        evals, evecs = np.linalg.eigh(gram)
        order = np.argsort(evals)[::-1][:dim]
        V = evecs[:, order]
        for j in range(V.shape[1]):  # deterministic sign
            i = int(np.argmax(np.abs(V[:, j])))
            if V[i, j] < 0:
                V[:, j] = -V[:, j]
        refs = [a.pmds_coords.remote(V) for a in self.actors]
        ds = ray.data.from_arrow_refs(refs).materialize()
        if stats is not None:
            stats["pivots"] = pivots
            stats["eigenvalues"] = np.sqrt(np.maximum(evals[order], 0.0))
        return ds, pivots, evals[order]

    def group_closeness_greedy(self, k: int, batch: int = 64, stats=None):
        """Greedy group closeness (reference centrality/GroupCloseness):
        round r picks the candidate u minimizing the resulting group
        farness sum_v min(d(v, S), d(v, u)) — evaluated EXACTLY via
        batched multi-source BFS waves against per-partition dist-to-S
        state — then one single-source wave folds the winner in.  Ties ->
        smaller vid.  Rounds >= 3 run CELF-style lazy re-evaluation:
        gains F(S) - F(S ∪ {u}) are submodular-decreasing, so a stale
        gain upper-bounds the current one and candidates are re-evaluated
        in stale-gain order only until the confirmed best STRICTLY beats
        the next bound (strict: equal bounds are still evaluated, so tie
        resolution is identical to the exhaustive greedy).  Connected-
        graph contract: infinite farness ranks last but stays exact.
        -> list of (vid, farness_after_pick)."""
        vids = self.all_vids()
        if len(vids) == 0:
            return []
        ray.get([a.gc_init.remote() for a in self.actors])
        k = min(int(k), len(vids))
        chosen: list[int] = []
        out: list[tuple[int, float]] = []
        delta = None  # stale gain upper bounds, aligned to sorted vids
        F = np.inf
        t0 = time.perf_counter()
        for _r in range(k):
            in_s = np.isin(vids, np.array(chosen, dtype=np.int64))
            cand = vids[~in_s]
            if delta is None or not np.isfinite(F):
                cand_o = cand
                bounds = np.full(len(cand), np.inf)
            else:
                d_c = delta[~in_s]
                order = np.lexsort((cand, -d_c))
                cand_o, bounds = cand[order], d_c[order]
            best = None  # (farness, vid)
            best_gain = -np.inf
            i = 0
            while i < len(cand_o):
                if best is not None and best_gain > bounds[i]:
                    break  # CELF prune: bound < confirmed best gain
                wave = cand_o[i : i + batch]
                self.ms_forward(wave, with_sigma=False)
                parts = ray.get(
                    [a.gc_farness_part.remote() for a in self.actors]
                )
                tot = np.sum(parts, axis=0)
                if np.isfinite(F) and delta is not None:
                    delta[np.searchsorted(vids, wave)] = F - tot
                for v, f in zip(wave, tot):
                    pair = (float(f), int(v))
                    if best is None or pair < best:
                        best = pair
                        best_gain = (
                            F - pair[0] if np.isfinite(F) else np.inf
                        )
                i += batch
            if delta is None:
                delta = np.full(len(vids), np.inf, dtype=np.float64)
            chosen.append(best[1])
            out.append((best[1], best[0]))
            F = best[0]
            self.ms_forward(np.array([best[1]], np.int64), with_sigma=False)
            ray.get([a.gc_update.remote(0) for a in self.actors])
        if stats is not None:
            stats.setdefault("iter_wall_s", []).append(
                time.perf_counter() - t0
            )
        return out

    def distance_table(self, sources, batch: int = 64):
        """Exact BFS distance table for the given sources -> Dataset
        (source, vid, depth), finite rows only.  Batched waves; each
        wave's per-actor tables are emitted as plasma objects and unioned
        lazily, so the n*reach output STREAMS — the driver never holds
        it.  Serial actor-task order guarantees each wave's emit runs
        before the next wave's init."""
        import ray.data

        vids = np.asarray(sources, np.int64)
        parts = []
        for i in range(0, len(vids), batch):
            wave = vids[i : i + batch]
            self.ms_forward(wave, with_sigma=False)
            parts.append(
                ray.data.from_arrow_refs(
                    [a.ms_depth_table.remote(wave) for a in self.actors]
                )
            )
        if not parts:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "source": np.empty(0, np.int64),
                        "vid": np.empty(0, np.int64),
                        "depth": np.empty(0, np.int64),
                    }
                )
            )
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    def eccentricity_batched(self, sources):
        """(ecc, reached) arrays per source: max finite BFS depth and
        reached-vertex count (exact, one batched BFS wave)."""
        self.ms_forward(sources, with_sigma=False)
        parts = ray.get([a.ms_ecc_part.remote() for a in self.actors])
        ecc = np.max([p[0] for p in parts], axis=0)
        reach = np.sum([p[1] for p in parts], axis=0)
        return ecc, reach

    def depth_histogram(self, batch: int = 64, max_d: int = 256) -> np.ndarray:
        """Exact counts of ordered vertex pairs at each distance d=0..max_d
        (d=0 rows are the self-pairs) — the exact neighborhood function,
        via batched multi-source BFS waves over all vertices."""
        vids = self.all_vids()
        hist = np.zeros(max_d + 1, dtype=np.int64)
        for i in range(0, len(vids), batch):
            self.ms_forward(vids[i : i + batch], with_sigma=False)
            hist += np.sum(
                ray.get([a.ms_depth_hist.remote(max_d) for a in self.actors]),
                axis=0,
            )
        return hist

    # ---- ANF neighborhood-function sketch ---------------------------------
    def anf(self, max_dist=8, registers=64, seed=42):
        """Run max_dist OR-merge rounds; returns [est_pairs(t)] for
        t=1..max_dist (sum over vertices of per-vertex FM estimates)."""
        P, actors = self.P, self.actors
        ray.get([a.anf_init.remote(registers, seed) for a in actors])
        totals = []
        for _ in range(max_dist):
            if P == 1:
                msg_refs = [[actors[0].anf_messages.remote()]]
            else:
                msg_refs = [
                    list(a.anf_messages.options(num_returns=P).remote())
                    for a in actors
                ]
            ests = ray.get(
                [
                    actors[t].anf_apply.remote(*[msg_refs[s][t] for s in range(P)])
                    for t in range(P)
                ]
            )
            totals.append(float(sum(ests)))
        return totals

    # ---- connected components (hash-min) ----------------------------------
    def cc_hashmin(self, max_iter=200, stats=None):
        return self._label_loop("cc_messages", "cc_apply", max_iter, None, stats)

    # ---- synchronous PLP ---------------------------------------------------
    def plp(self, max_iter=100, fixed_iters=None, stats=None, snapshot_at=None):
        return self._label_loop(
            "plp_messages", "plp_apply", max_iter, fixed_iters, stats, snapshot_at
        )


def bsp_pagerank(
    edges_ds,
    vertices_ds=None,
    damping=0.85,
    tol=1e-10,
    max_iter=100,
    fixed_iters=None,
    num_partitions=8,
    checkpoint=None,
    stats=None,
    actor_num_cpus=0.25,
    exchange="auto",
):
    g = BSPGraph(edges_ds, vertices_ds, num_partitions, actor_num_cpus)
    try:
        return g.pagerank(
            damping=damping,
            tol=tol,
            max_iter=max_iter,
            fixed_iters=fixed_iters,
            checkpoint=checkpoint,
            stats=stats,
            exchange=exchange,
        )
    finally:
        g.shutdown()
