"""Pure-Python reference synchronous label propagation (FIXTURES.md §3).

Exactly the pinned spec of SURVEY.md §2.1.3: init label = vid; Jacobi rounds
over previous-round labels; new label = argmax of summed incident edge
weight over neighbor labels, ties -> smallest label id; isolated vertices
keep their label; fixpoint (or a fixed round count).
"""

from __future__ import annotations


def ref_sync_plp(
    undirected_edges: list[tuple[int, int, float]],
    vertices: set[int],
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> tuple[dict[int, int], int]:
    verts = set(vertices)
    adj: dict[int, dict[int, float]] = {}
    for u, v, w in undirected_edges:
        verts.add(u)
        verts.add(v)
        if u == v:
            continue
        adj.setdefault(u, {})[v] = adj.setdefault(u, {}).get(v, 0.0) + w
        adj.setdefault(v, {})[u] = adj.setdefault(v, {}).get(u, 0.0) + w
    labels = {v: v for v in verts}
    iters = fixed_iters if fixed_iters is not None else max_iter
    rounds = 0
    for rounds in range(1, iters + 1):
        new = {}
        changed = 0
        for v in verts:
            nbrs = adj.get(v)
            if not nbrs:
                new[v] = labels[v]
                continue
            tally: dict[int, float] = {}
            for u, w in nbrs.items():
                lab = labels[u]
                tally[lab] = tally.get(lab, 0.0) + w
            best = max(tally.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            new[v] = best
            if best != labels[v]:
                changed += 1
        labels = new
        if fixed_iters is None and changed == 0:
            break
    return labels, rounds
