"""Per-partition lineage records + checkpoint/resume (BASELINE.json:14).

Layout under a run directory (resumable, partitioned output — never one
giant file):

    <run_dir>/iter=<K>/part=<J>.parquet       score/label snapshot
    <run_dir>/iter=<K>/part=<J>.manifest.json {job_id, iter, part, rows,
                                               output_digest, wall_s, ...}
    <run_dir>/iter=<K>/_SUCCESS               atomic iteration commit marker

A partition file + manifest pair is written atomically (temp file + rename);
the `_SUCCESS` marker commits the whole iteration.  ``latest_complete_iter``
scans markers so `--resume` restarts from the last committed iteration;
partitions of an *incomplete* iteration that already committed their pair
are skipped on rewrite (mid-iteration resume at partition granularity).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def digest_arrays(*arrays: np.ndarray) -> str:
    h = hashlib.sha256()
    for a in arrays:
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def iter_dir(run_dir: str, it: int) -> str:
    return os.path.join(run_dir, f"iter={it}")


def part_paths(run_dir: str, it: int, part: int) -> tuple[str, str]:
    d = iter_dir(run_dir, it)
    return (
        os.path.join(d, f"part={part}.parquet"),
        os.path.join(d, f"part={part}.manifest.json"),
    )


def write_partition(
    run_dir: str,
    it: int,
    part: int,
    table: pa.Table,
    job_id: str,
    extra: dict | None = None,
) -> dict:
    """Atomically write one partition snapshot + manifest. Returns manifest."""
    t0 = time.perf_counter()
    pq_path, mf_path = part_paths(run_dir, it, part)
    os.makedirs(os.path.dirname(pq_path), exist_ok=True)
    if os.path.exists(mf_path):  # partition already committed (resume path)
        with open(mf_path) as f:
            return json.load(f)
    tmp = pq_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, pq_path)
    digest = digest_arrays(
        *[table.column(i).combine_chunks().to_numpy(zero_copy_only=False)
          for i in range(table.num_columns)]
    )
    manifest = {
        "job_id": job_id,
        "iter": it,
        "part": part,
        "rows": table.num_rows,
        "output_digest": digest,
        "wall_s": time.perf_counter() - t0,
        **(extra or {}),
    }
    tmp = mf_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mf_path)
    return manifest


def commit_iteration(run_dir: str, it: int, num_parts: int, meta: dict | None = None):
    d = iter_dir(run_dir, it)
    for p in range(num_parts):
        _, mf = part_paths(run_dir, it, p)
        if not os.path.exists(mf):
            raise RuntimeError(f"cannot commit iter {it}: missing partition {p}")
    tmp = os.path.join(d, "_SUCCESS.tmp")
    with open(tmp, "w") as f:
        json.dump({"iter": it, "num_parts": num_parts, **(meta or {})}, f)
    os.replace(tmp, os.path.join(d, "_SUCCESS"))


def latest_complete_iter(run_dir: str) -> int | None:
    if not os.path.isdir(run_dir):
        return None
    best = None
    for name in os.listdir(run_dir):
        if name.startswith("iter=") and os.path.exists(
            os.path.join(run_dir, name, "_SUCCESS")
        ):
            it = int(name.split("=", 1)[1])
            best = it if best is None or it > best else best
    return best


def read_success_meta(run_dir: str, it: int) -> dict:
    with open(os.path.join(iter_dir(run_dir, it), "_SUCCESS")) as f:
        return json.load(f)


def load_partition(run_dir: str, it: int, part: int) -> pa.Table:
    pq_path, _ = part_paths(run_dir, it, part)
    return pq.read_table(pq_path)
