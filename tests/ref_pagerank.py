"""Pure-Python reference power-iteration PageRank (FIXTURES.md §3).

The primary PageRank oracle (networkit is uninstallable here and
networkx.pagerank needs the absent scipy).  Semantics pinned in SURVEY.md
§2.1.1: damping d, uniform teleport, dangling mass redistributed uniformly
every iteration, weighted contributions w(v,u)/wdeg_out(v), L1 stopping.
Cross-checked against networkx's private _pagerank_python in the tests.
"""

from __future__ import annotations


def ref_pagerank(
    edges: list[tuple[int, int, float]],
    vertices: set[int],
    damping: float = 0.85,
    tol: float = 1e-12,
    max_iter: int = 200,
    fixed_iters: int | None = None,
) -> tuple[dict[int, float], int]:
    verts = set(vertices)
    for s, d, _ in edges:
        verts.add(s)
        verts.add(d)
    n = len(verts)
    if n == 0:
        return {}, 0
    wdeg: dict[int, float] = {v: 0.0 for v in verts}
    for s, d, w in edges:
        wdeg[s] += w
    score = {v: 1.0 / n for v in verts}
    iters = fixed_iters if fixed_iters is not None else max_iter
    it = 0
    for it in range(1, iters + 1):
        dangling = sum(score[v] for v in verts if wdeg[v] == 0.0)
        base = (1.0 - damping) / n + damping * dangling / n
        new = {v: base for v in verts}
        for s, d, w in edges:
            new[d] += damping * score[s] * w / wdeg[s]
        resid = sum(abs(new[v] - score[v]) for v in verts)
        score = new
        if fixed_iters is None and resid < tol:
            break
    return score, it


def nx_graph_to_weighted_edges(G) -> list[tuple[int, int, float]]:
    """Undirected nx graph -> both-direction weighted edge list."""
    out = []
    for u, v, data in G.edges(data=True):
        w = float(data.get("weight", 1.0))
        out.append((int(u), int(v), w))
        if not G.is_directed() and u != v:
            out.append((int(v), int(u), w))
    return out
