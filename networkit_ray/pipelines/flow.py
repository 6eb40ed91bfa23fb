"""Max-flow and flow-based clustering — the one reference family every
prior round documented out-of-scope (reference flow/EdmondsKarp,
community/CutClustering; SURVEY.md §2.3).

Both ship as documented DRIVER-SIDE compat algorithms, the same pattern as
HavelHakimi / CliqueDetect / PathGrowingMatcher: augmenting-path max-flow
is inherently sequential state (each augmentation depends on every prior
one), so a faithful dataflow expression does not exist; the edge table is
collected once behind an ``edge_limit`` guard and the chase runs on the
driver.  The distributed engine surfaces stay the scale path for the
use-cases these serve (connectivity -> components/biconnectivity,
communities -> PLM/Leiden/LouvainMapEquation).

- ``edmonds_karp``: shortest-augmenting-path max-flow (Edmonds & Karp
  1972) on an arc-pair residual array; BFS per augmentation, O(V·E²)
  worst case, fine at compat sizes.
- ``cut_clustering``: Flake-Tarjan cut clustering (Flake, Tarjan,
  Tsioutsiouliklis 2004): augment the graph with an artificial sink t
  wired to every vertex with capacity alpha; for each vertex u in
  ascending vid order still unassigned, the source side of a min u-t cut
  becomes u's community.  alpha -> 0 degenerates to connected components,
  alpha -> inf to singletons (both pinned by pytest).
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pyarrow as pa

from networkit_ray.stages.graphops import canonicalize_undirected


class MaxFlowResult:
    """Mirrors the reference EdmondsKarp surface: max-flow value, the
    source side of a min cut, and per-edge flows."""

    def __init__(self, flow_value, source_set, flow_table):
        self.flow_value = float(flow_value)
        self.source_set = source_set  # np.ndarray of original vids
        self.flow_table = flow_table  # pa.Table(src, dst, flow)


def _collect_arcs(edges_ds, directed, edge_limit):
    """Edge table -> (vids, arc_to, arc_cap, head CSR) with arc i^1 the
    reverse of arc i (the classic residual pairing)."""
    if directed:
        df = edges_ds.to_pandas()
        if len(df) > edge_limit:
            raise ValueError(
                f"driver-side compat max-flow: {len(df)} edges > "
                f"edge_limit={edge_limit}"
            )
        u_raw = df["src"].to_numpy().astype(np.int64)
        v_raw = df["dst"].to_numpy().astype(np.int64)
        w = df["w"].to_numpy().astype(np.float64)
        keep = u_raw != v_raw
        u_raw, v_raw, w = u_raw[keep], v_raw[keep], w[keep]
        rev_cap = np.zeros(len(w))
    else:
        df = canonicalize_undirected(edges_ds, weight="sum").to_pandas()
        if len(df) > edge_limit:
            raise ValueError(
                f"driver-side compat max-flow: {len(df)} edges > "
                f"edge_limit={edge_limit}"
            )
        u_raw = df["src"].to_numpy().astype(np.int64)
        v_raw = df["dst"].to_numpy().astype(np.int64)
        w = df["w"].to_numpy().astype(np.float64)
        rev_cap = w  # undirected edge = symmetric arc pair
    return u_raw, v_raw, w, rev_cap


def _max_flow_arrays(n, arc_to, arc_cap, arc_head_of, s, t):
    """Edmonds-Karp on paired arc arrays; returns (flow_value, residual
    caps, reachable-from-s bool mask in the final residual graph)."""
    # CSR over arcs by tail vertex
    order = np.argsort(arc_head_of, kind="stable")
    arcs_sorted = order
    indptr = np.searchsorted(arc_head_of[order], np.arange(n + 1))
    res = arc_cap.copy()
    total = 0.0
    prev_arc = np.empty(n, dtype=np.int64)
    while True:
        prev_arc.fill(-1)
        prev_arc[s] = -2
        q = deque([s])
        found = False
        while q and not found:
            x = q.popleft()
            for j in range(indptr[x], indptr[x + 1]):
                a = arcs_sorted[j]
                if res[a] <= 1e-12:
                    continue
                y = arc_to[a]
                if prev_arc[y] != -1:
                    continue
                prev_arc[y] = a
                if y == t:
                    found = True
                    break
                q.append(y)
        if not found:
            break
        # bottleneck along the path, then augment
        bottleneck = np.inf
        y = t
        while y != s:
            a = prev_arc[y]
            bottleneck = min(bottleneck, res[a])
            y = arc_head_of[a]
        y = t
        while y != s:
            a = prev_arc[y]
            res[a] -= bottleneck
            res[a ^ 1] += bottleneck
            y = arc_head_of[a]
        total += bottleneck
    reach = prev_arc != -1  # the last (failed) BFS marks exactly reach(s)
    reach[s] = True
    return total, res, reach


def edmonds_karp(
    edges_ds,
    source: int,
    sink: int,
    directed: bool = False,
    edge_limit: int = 2_000_000,
) -> MaxFlowResult:
    """Max s-t flow (reference flow/EdmondsKarp) — driver-side compat.

    edges(src,dst,w>=0) -> MaxFlowResult(flow_value, source_set,
    flow_table(src, dst, flow)); ``source_set`` is the source side of a
    minimum cut (residual reachability), flows are net per input arc.
    """
    u_raw, v_raw, w, rev_cap = _collect_arcs(edges_ds, directed, edge_limit)
    if np.any(w < 0):
        raise ValueError("capacities must be non-negative")
    vids, inv = np.unique(
        np.concatenate([u_raw, v_raw, [source, sink]]), return_inverse=True
    )
    n = len(vids)
    u, v = inv[: len(u_raw)], inv[len(u_raw) : 2 * len(u_raw)]
    s, t = int(inv[-2]), int(inv[-1])
    if s == t:
        raise ValueError("source == sink")
    m = len(u)
    # arc 2i = u->v cap w, arc 2i+1 = v->u (0 if directed, w if undirected)
    arc_to = np.empty(2 * m, dtype=np.int64)
    arc_to[0::2], arc_to[1::2] = v, u
    arc_head_of = np.empty(2 * m, dtype=np.int64)
    arc_head_of[0::2], arc_head_of[1::2] = u, v
    arc_cap = np.empty(2 * m)
    arc_cap[0::2], arc_cap[1::2] = w, rev_cap
    total, res, reach = _max_flow_arrays(n, arc_to, arc_cap, arc_head_of, s, t)
    net = arc_cap[0::2] - res[0::2]  # net flow along the input arc direction
    flow_table = pa.table(
        {
            "src": vids[u],
            "dst": vids[v],
            "flow": net,
        }
    )
    return MaxFlowResult(total, vids[reach], flow_table)


def cut_clustering(
    edges_ds,
    alpha: float,
    edge_limit: int = 2_000_000,
) -> pa.Table:
    """Flake-Tarjan cut clustering (reference community/CutClustering) —
    driver-side compat on the same residual kernel.

    edges(src,dst,w) undirected -> pa.Table(vid, label): label = the
    lowest vid of the community's founding cut.  Deterministic: vertices
    are processed in ascending vid order and the min cut is the residual
    reachability cut of the Edmonds-Karp run (unique for the BFS order).
    """
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    u_raw, v_raw, w, _ = _collect_arcs(edges_ds, False, edge_limit)
    vids, inv = np.unique(np.concatenate([u_raw, v_raw]), return_inverse=True)
    n = len(vids)
    if n == 0:
        return pa.table(
            {"vid": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
        )
    m = len(u_raw)
    u, v = inv[:m], inv[m:]
    t = n  # artificial sink
    # graph arcs (symmetric pairs) + one alpha arc pair per vertex to t
    arc_to = np.empty(2 * m + 2 * n, dtype=np.int64)
    arc_head_of = np.empty(2 * m + 2 * n, dtype=np.int64)
    arc_cap = np.empty(2 * m + 2 * n)
    arc_to[0 : 2 * m : 2], arc_to[1 : 2 * m : 2] = v, u
    arc_head_of[0 : 2 * m : 2], arc_head_of[1 : 2 * m : 2] = u, v
    arc_cap[0 : 2 * m] = np.repeat(w, 2)
    verts = np.arange(n)
    arc_to[2 * m :: 2], arc_to[2 * m + 1 :: 2] = t, verts
    arc_head_of[2 * m :: 2], arc_head_of[2 * m + 1 :: 2] = verts, t
    arc_cap[2 * m :: 2] = alpha
    arc_cap[2 * m + 1 :: 2] = 0.0  # sink never pushes back into the graph
    label = np.full(n, -1, dtype=np.int64)
    for start in range(n):
        if label[start] != -1:
            continue
        _, _, reach = _max_flow_arrays(
            n + 1, arc_to, arc_cap, arc_head_of, int(start), t
        )
        side = reach[:n] & (label == -1)
        side[start] = True
        label[side] = start
    return pa.table({"vid": vids, "label": vids[label]})
