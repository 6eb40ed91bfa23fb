"""Vertex id assignment: string key -> int64 vid.

SURVEY.md §7.3.2 decision: use *hashed* (non-dense, collision-checked) int64
ids rather than dense rank ids.  Rationale at 100 TB scale: hashed ids are
assigned fully in parallel with ZERO shuffles (a dense rank requires a global
sort of the distinct-key set), and the BSP/CSR engine (state/csr.py) only
needs per-partition *local* dense indices, which each actor builds from its
own vertex slice.  Collisions are detected by a cheap aggregate
(count distinct vid vs distinct key) and are ~2^-63·pairs probable.

vid = first 8 bytes of blake2b(key) masked to non-negative int63 — stable
across processes, platforms, and runs (unlike Python's salted hash()).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MASK63 = (1 << 63) - 1


def key_to_vid(key: str) -> int:
    d = hashlib.blake2b(key.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big") & _MASK63


def _hash_unique_keys(uniq) -> np.ndarray:
    """blake2b over an array of DISTINCT keys (the only per-item C calls)."""
    b2 = hashlib.blake2b
    fb = int.from_bytes
    out = np.empty(len(uniq), dtype=np.int64)
    for i, k in enumerate(uniq):
        out[i] = fb(b2(k.encode("utf-8"), digest_size=8).digest(), "big") & _MASK63
    return out


def keys_to_vids(keys: list) -> np.ndarray:
    """Hash only the batch's DISTINCT keys (one C-speed factorize), then
    gather — graph batches repeat endpoints heavily, so this cuts the
    per-row blake2b calls by the batch's duplication factor while staying
    bit-identical to hashing every row."""
    import pandas as pd

    arr = np.asarray(keys, dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.int64)
    codes, uniq = pd.factorize(arr)
    return _hash_unique_keys(uniq)[codes]


def edge_keys_to_edges(edge_keys_ds, weight: float = 1.0):
    """(src_key, dst_key) Dataset -> edges(src, dst, w) Dataset. No shuffle."""

    def to_vids(batch: pa.Table) -> pa.Table:
        import pandas as pd

        sk = batch["src_key"].to_pylist()
        dk = batch["dst_key"].to_pylist()
        # one factorize across BOTH endpoint columns: src/dst share keys
        codes, uniq = pd.factorize(np.asarray(sk + dk, dtype=object))
        vids = _hash_unique_keys(uniq)[codes]
        src, dst = vids[: len(sk)], vids[len(sk) :]
        w = np.full(len(src), weight, dtype=np.float64)
        return pa.Table.from_arrays(
            [pa.array(src), pa.array(dst), pa.array(w)], names=["src", "dst", "w"]
        )

    return edge_keys_ds.map_batches(
        to_vids, batch_format="pyarrow", zero_copy_batch=True
    )


def vertex_table(edge_keys_ds):
    """Distinct (vid, key) mapping table from an edge-key Dataset.

    One shuffle (distinct on key).  Used for reporting / joins back to
    human-readable keys; the algorithms themselves run on int64 vids only.
    """

    def keys_both(batch: pa.Table) -> pa.Table:
        ks = pa.concat_arrays(
            [batch["src_key"].combine_chunks(), batch["dst_key"].combine_chunks()]
        )
        return pa.Table.from_arrays([ks], names=["key"])

    # distributed distinct: pre-dedup per batch, then groupby (stays a
    # Dataset — ds.unique() would materialize the values onto the driver)
    keys = (
        edge_keys_ds.map_batches(
            keys_both, batch_format="pyarrow", zero_copy_batch=True
        )
        .map_batches(
            lambda t: t.group_by("key").aggregate([]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("key")
        .count()
        .select_columns(["key"])
    )

    def add_vid(batch: pa.Table) -> pa.Table:
        vids = keys_to_vids(batch["key"].to_pylist())
        return pa.Table.from_arrays(
            [pa.array(vids), batch["key"].combine_chunks()], names=["vid", "key"]
        )

    return keys.map_batches(add_vid, batch_format="pyarrow", zero_copy_batch=True)


def assert_no_vid_collisions(vertices_ds) -> int:
    """Raise if two distinct keys hashed to one vid. Returns vertex count."""
    n_rows = vertices_ds.count()
    n_vids = vertices_ds.groupby("vid").count().count()
    if n_vids != n_rows:
        raise RuntimeError(
            f"vid hash collision: {n_rows} distinct keys -> {n_vids} distinct vids"
        )
    return n_rows
