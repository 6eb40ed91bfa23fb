"""Per-row content sha256 — the per-row invariant vs the reference
(BASELINE.json:15: "per-row invariant vs the reference: content sha256
equality").

A zero-copy Arrow map_batches stage: the only unavoidable copy is the
string decode for hashlib (C implementation, released GIL per call).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def add_sha256(batch: pa.Table, col: str = "content", out: str = "sha256") -> pa.Table:
    digests = [
        hashlib.sha256(s.encode("utf-8")).hexdigest() if s is not None else None
        for s in batch[col].to_pylist()
    ]
    return batch.append_column(out, pa.array(digests, type=pa.string()))


def with_sha256(ds, col: str = "content", out: str = "sha256"):
    """Dataset → Dataset with a ``sha256`` hex column appended."""
    return ds.map_batches(
        lambda b: add_sha256(b, col=col, out=out),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
