"""Distributed deterministic graph generators (reference catalog:
generators/{ErdosRenyiGenerator, RmatGenerator} — SURVEY.md §2.3; the
reference tree is empty, so semantics are pinned to the published models:
G(n, m) uniform edge sampling and the Chakrabarti/Zhan/Faloutsos R-MAT
recursive quadrant model).

Ray-Data-native shape: ``ray.data.range(num_edges)`` streams edge *ids*;
every edge derives its randomness counter-style from a keyed hash of its id
(pd.util.hash_array — siphash with a fixed key), so output is bit-identical
across partitionings, cluster sizes and re-runs — no sequential RNG state,
no driver-side generation.  Generating 10^12 edges is embarrassingly
parallel and restartable at block granularity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _uniform(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Deterministic U[0,1) per id for a given stream index."""
    key = ids.astype(np.uint64) * _MIX + np.uint64(stream * 2654435761 + seed)
    h = pd.util.hash_array(key.view(np.int64))
    # 53-bit mantissa path: h/2**64 rounds to exactly 1.0 for h within
    # ~2^10 of 2^64, which lets floor(u*n) emit the out-of-range vid n
    return (h >> np.uint64(11)) * np.float64(2.0**-53)


def erdos_renyi_edges(n: int, m: int, seed: int = 42, parallelism: int = 8):
    """G(n, m)-style: m directed edges sampled uniformly (self-loops and
    duplicates possible, as in one-shot uniform sampling; pipe through
    canonicalize_undirected/dedup_edges for a simple graph).
    -> Dataset(src, dst, w)."""
    import ray.data

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        src = np.floor(_uniform(ids, 0, seed) * n).astype(np.int64)
        dst = np.floor(_uniform(ids, 1, seed) * n).astype(np.int64)
        return pa.table(
            {"src": src, "dst": dst, "w": np.ones(len(ids), dtype=np.float64)}
        )

    return ray.data.range(m, override_num_blocks=parallelism).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )


def rmat_edges(
    scale: int,
    edge_factor: int = 16,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    parallelism: int = 8,
):
    """R-MAT: 2^scale vertices, edge_factor * 2^scale edges; each edge
    descends ``scale`` quadrant levels with probabilities (a, b, c, d).
    Power-law degree skew by construction — the benchable synthetic graph
    for sizes beyond the TPC-H projections.  -> Dataset(src, dst, w)."""
    import ray.data

    n_edges = edge_factor << scale
    d = 1.0 - a - b - c
    assert d >= -1e-12, "a+b+c must be <= 1"
    # cumulative quadrant thresholds
    t1, t2, t3 = a, a + b, a + b + c

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["id"].combine_chunks().to_numpy(zero_copy_only=False)
        src = np.zeros(len(ids), dtype=np.int64)
        dst = np.zeros(len(ids), dtype=np.int64)
        for level in range(scale):  # scale ~ 20-40 vectorized passes
            u = _uniform(ids, level + 2, seed)
            right = (u >= t1) & (u < t2) | (u >= t3)  # quadrants b, d
            down = u >= t2  # quadrants c, d
            src = (src << 1) | down.astype(np.int64)
            dst = (dst << 1) | right.astype(np.int64)
        return pa.table(
            {"src": src, "dst": dst, "w": np.ones(len(ids), dtype=np.float64)}
        )

    return ray.data.range(n_edges, override_num_blocks=parallelism).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )
