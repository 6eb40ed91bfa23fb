"""Array-based union-find with union-by-min-vid.

Counterpart of the reference's UnionFind structure (upstream NetworKit
``structures/UnionFind.hpp`` — union-by-rank + path compression; SURVEY.md
§1.1).  We track the *minimum member vid* per set so the final root of every
set is the canonical min-vid label the oracle comparison is defined on
(SURVEY.md §2.1.2) — no separate relabel pass needed.

Operates on arbitrary (non-dense) int64 vids via a local compaction dict;
used inside map_batches tasks (per-block spanning forests) and on the driver
for the contracted equivalence set.
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    __slots__ = ("parent", "minvid", "index", "vids")

    def __init__(self):
        self.parent: list[int] = []
        self.minvid: list[int] = []  # min member vid of the set rooted here
        self.index: dict[int, int] = {}
        self.vids: list[int] = []  # slot -> vid

    def _slot(self, v: int) -> int:
        i = self.index.get(v)
        if i is None:
            i = len(self.vids)
            self.index[v] = i
            self.vids.append(v)
            self.parent.append(i)
            self.minvid.append(v)
        return i

    def _find(self, i: int) -> int:
        p = self.parent
        root = i
        while p[root] != root:
            root = p[root]
        while p[i] != root:  # path compression
            p[i], i = root, p[i]
        return root

    def union(self, u: int, v: int):
        ru = self._find(self._slot(int(u)))
        rv = self._find(self._slot(int(v)))
        if ru != rv:
            mu, mv = self.minvid[ru], self.minvid[rv]
            self.parent[rv] = ru
            self.minvid[ru] = mu if mu <= mv else mv

    def union_arrays(self, us: np.ndarray, vs: np.ndarray):
        union = self.union
        for u, v in zip(us.tolist(), vs.tolist()):
            union(u, v)

    def roots(self) -> tuple[np.ndarray, np.ndarray]:
        """(vids, min_vid_of_component) for every vid ever touched."""
        n = len(self.vids)
        vids = np.asarray(self.vids, dtype=np.int64)
        out = np.empty(n, dtype=np.int64)
        for i in range(n):
            out[i] = self.minvid[self._find(i)]
        return vids, out
