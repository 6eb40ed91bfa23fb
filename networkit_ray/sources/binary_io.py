"""Binary graph IO — the reference `io/` module's binary family
(NetworkitBinaryReader/Writer, ThrillGraphBinaryReader/Writer,
GraphToolBinaryReader; SURVEY.md §2.3), the last uncovered IO rows.

Honesty note (SURVEY §0): `/root/reference` is empty and there is no
network, so BYTE-level parity with the upstream implementations is
unverifiable in-sandbox.  Each format here follows its PUBLISHED layout
description (cited per function) and is pinned by roundtrip tests; where
the public description leaves detail ambiguous, the choice is documented
in the docstring rather than guessed silently.

Scale split, same contract as `sources/io.py`:
- **NKBR sharded binary** is the scale path: one self-describing shard
  per block, written by a `map_batches` task pool and read back
  partition-parallel via `read_binary_files` — resumable, order-free.
- **Thrill / graph-tool** are vertex-order-addressed single-stream
  formats (vertex id = position in the stream), which cannot be decoded
  from unordered distributed blocks: DRIVER-SIDE compat loaders, like
  METIS (`sources/io.py:85`).  Decode is still vectorized — one numpy
  varint/fixed-width scan per file, never a per-byte Python loop.
"""

from __future__ import annotations

import os
import struct
import uuid

import numpy as np
import pyarrow as pa

# --------------------------------------------------------------------------
# Vectorized varint (LEB128) + zigzag kernels — shared by all formats
# --------------------------------------------------------------------------

_MAX_VARINT_BYTES = 10


def varint_encode(vals: np.ndarray) -> np.ndarray:
    """Non-negative int64 array -> LEB128 byte buffer (uint8 array).
    Vectorized: <=10 masked passes (one per possible byte position)."""
    v = np.asarray(vals, dtype=np.int64)
    if (v < 0).any():
        raise ValueError("varint_encode needs non-negative values (zigzag first)")
    u = v.astype(np.uint64)
    nb = np.ones(len(u), dtype=np.int64)
    for k in range(1, _MAX_VARINT_BYTES):
        nb += (u >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    offs = np.zeros(len(u) + 1, dtype=np.int64)
    np.cumsum(nb, out=offs[1:])
    buf = np.zeros(offs[-1], dtype=np.uint8)
    for j in range(_MAX_VARINT_BYTES):
        mask = nb > j
        if not mask.any():
            break
        byte = ((u[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        buf[offs[:-1][mask] + j] = byte | cont
    return buf


def varint_decode(buf: np.ndarray) -> np.ndarray:
    """LEB128 byte buffer -> int64 value array.  Vectorized: one
    continuation-bit scan + one scatter-add, no Python per-value loop."""
    b = np.asarray(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.int64)
    ends = (b & 0x80) == 0
    if not ends[-1]:
        raise ValueError("truncated varint stream")
    gid = np.zeros(len(b), dtype=np.int64)
    gid[1:] = np.cumsum(ends[:-1])
    idx = np.arange(len(b), dtype=np.int64)
    first = np.zeros(gid[-1] + 1, dtype=np.int64)
    changed = np.ones(len(b), dtype=bool)
    changed[1:] = gid[1:] != gid[:-1]
    first[gid[changed]] = idx[changed]
    pos = idx - first[gid]
    if (pos >= _MAX_VARINT_BYTES).any():
        raise ValueError("varint longer than 10 bytes")
    vals = np.zeros(gid[-1] + 1, dtype=np.int64)
    np.add.at(vals, gid, (b & 0x7F).astype(np.int64) << (7 * pos))
    return vals


def zigzag(v: np.ndarray) -> np.ndarray:
    """Signed int64 -> non-negative zigzag code (int64)."""
    v = np.asarray(v, dtype=np.int64)
    return np.bitwise_xor(v << 1, v >> 63)


def unzigzag(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, dtype=np.int64)
    return np.bitwise_xor(u >> 1, -(u & 1))


# --------------------------------------------------------------------------
# NKBR — sharded NetworKit-style binary (the scale path)
# --------------------------------------------------------------------------

_NKBR_MAGIC = b"NKBR1\x00"


def _encode_nkbr_shard(t: pa.Table, directed: bool, weighted: bool) -> bytes:
    """One block -> one self-describing shard: varint-delta CSR slice.

    Layout (all varints LEB128, deltas zigzagged):
      magic 'NKBR1\\0' | flags u8 (bit0 directed, bit1 weighted)
      | n_vertices varint | n_edges varint
      | vertex-id deltas (sorted unique src, first absolute)
      | per-vertex degrees
      | per-vertex adjacency dst deltas (sorted within vertex,
        first absolute per vertex)
      | [weights: raw little-endian float64 * n_edges, edge order matching
         the adjacency stream]
    """
    src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
    dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
    w = (
        t["w"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        if weighted and "w" in t.schema.names
        else np.ones(len(src), dtype=np.float64)
    )
    order = np.lexsort((dst, src))
    src, dst, w = src[order], dst[order], w[order]
    verts, counts = np.unique(src, return_counts=True)
    vdelta = np.empty(len(verts), dtype=np.int64)
    if len(verts):
        vdelta[0] = verts[0]
        vdelta[1:] = np.diff(verts)
    # per-vertex first dst absolute, rest deltas (sorted, so deltas >= 0,
    # but zigzag anyway: the first-of-vertex slot holds an absolute id)
    ddelta = np.empty(len(dst), dtype=np.int64)
    if len(dst):
        ddelta[0] = dst[0]
        ddelta[1:] = np.diff(dst)
        starts = np.zeros(len(src), dtype=bool)
        starts[0] = True
        starts[1:] = src[1:] != src[:-1]
        ddelta[starts] = dst[starts]
    flags = (1 if directed else 0) | (2 if weighted else 0)
    parts = [
        _NKBR_MAGIC,
        struct.pack("<B", flags),
        varint_encode(np.asarray([len(verts), len(src)])).tobytes(),
        varint_encode(zigzag(vdelta)).tobytes(),
        varint_encode(counts).tobytes(),
        varint_encode(zigzag(ddelta)).tobytes(),
    ]
    if weighted:
        parts.append(w.astype("<f8").tobytes())
    return b"".join(parts)


def _decode_nkbr_shard(raw: bytes):
    if raw[: len(_NKBR_MAGIC)] != _NKBR_MAGIC:
        raise ValueError("not an NKBR shard (bad magic)")
    flags = raw[len(_NKBR_MAGIC)]
    weighted = bool(flags & 2)
    body = np.frombuffer(raw, dtype=np.uint8, offset=len(_NKBR_MAGIC) + 1)
    if weighted:
        # weights are a raw float64 tail; find its start by decoding the
        # varint stream prefix lazily: decode ALL leading varints by
        # scanning from the back — the tail length is 8 * n_edges, and
        # n_edges is the SECOND decoded value, so decode front first on
        # the full buffer minus a conservatively-grown tail.
        # Simpler and exact: the varint section never contains a byte
        # sequence we must guess — decode counts from the front:
        head = varint_decode(_varint_prefix(body, 2))
        n_edges = int(head[1])
        tail = 8 * n_edges
        varint_section = body[: len(body) - tail]
        wvals = np.frombuffer(
            raw, dtype="<f8", offset=len(raw) - tail, count=n_edges
        ).astype(np.float64)
    else:
        head = varint_decode(_varint_prefix(body, 2))
        n_edges = int(head[1])
        varint_section = body
        wvals = np.ones(n_edges, dtype=np.float64)
    vals = varint_decode(varint_section)
    n_verts = int(vals[0])
    assert int(vals[1]) == n_edges
    p = 2
    verts = np.cumsum(unzigzag(vals[p : p + n_verts]))
    p += n_verts
    counts = vals[p : p + n_verts]
    p += n_verts
    ddelta = unzigzag(vals[p : p + n_edges])
    # rebuild dst: cumsum of deltas, re-based at each vertex-run start so
    # the run's first (absolute) value carries through unchanged
    src = np.repeat(verts, counts)
    if n_edges:
        starts = np.zeros(n_edges, dtype=bool)
        starts[0] = True
        starts[np.cumsum(counts)[:-1]] = True
        run_id = np.cumsum(starts) - 1
        csum = np.cumsum(ddelta)
        start_idx = np.flatnonzero(starts)
        base = csum[start_idx] - ddelta[start_idx]  # cumsum before each run
        dst = csum - base[run_id]
    else:
        dst = np.zeros(0, dtype=np.int64)
    return pa.table({"src": src.astype(np.int64), "dst": dst.astype(np.int64), "w": wvals})


def _varint_prefix(body: np.ndarray, k: int) -> np.ndarray:
    """First k varints' bytes from a uint8 buffer (tiny scalar scan)."""
    seen = 0
    for i in range(len(body)):
        if body[i] < 0x80:
            seen += 1
            if seen == k:
                return body[: i + 1]
    raise ValueError("truncated varint stream")


def write_networkit_binary(
    edges_ds, path: str, directed: bool = False, weighted: bool = True
):
    """NetworkitBinaryWriter role (reference io/NetworkitBinary*): compact
    chunked binary adjacency with varint-delta compression — re-expressed
    as SHARDED self-describing files so a 100-TB graph writes from a task
    pool and reads back partition-parallel (the upstream format's "chunk"
    concept, one file per chunk).  Upstream's exact single-file byte
    layout is unverifiable in-sandbox (see module docstring); capability
    parity (directed/weighted flags, varint-delta adjacency, chunking) is
    what this format carries, pinned by roundtrip tests.
    -> Dataset(shard, vertices, edges) manifest (one row per shard)."""
    os.makedirs(path, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "shard": pa.array([], pa.string()),
                    "vertices": pa.array([], pa.int64()),
                    "edges": pa.array([], pa.int64()),
                }
            )
        fn = os.path.join(path, f"shard-{uuid.uuid4().hex}.nkbr")
        raw = _encode_nkbr_shard(t, directed, weighted)
        with open(fn + ".tmp", "wb") as fh:
            fh.write(raw)
        os.rename(fn + ".tmp", fn)  # atomic per shard -> resumable output
        nv = len(np.unique(t["src"].combine_chunks().to_numpy(zero_copy_only=False)))
        return pa.table(
            {
                "shard": pa.array([fn]),
                "vertices": pa.array([nv], pa.int64()),
                "edges": pa.array([len(t)], pa.int64()),
            }
        )

    return edges_ds.map_batches(
        dump, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()


def read_networkit_binary(path: str):
    """NetworkitBinaryReader role: NKBR shard directory -> Dataset(src,
    dst, w), one decode task per shard (partition-parallel)."""
    import ray.data

    def decode(t: pa.Table) -> pa.Table:
        outs = [_decode_nkbr_shard(raw.as_py()) for raw in t["bytes"]]
        return pa.concat_tables(outs) if outs else _empty_edges()

    return ray.data.read_binary_files(path).map_batches(
        decode, batch_format="pyarrow"
    )


def _empty_edges() -> pa.Table:
    return pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "w": pa.array([], pa.float64()),
        }
    )


# --------------------------------------------------------------------------
# Thrill binary (vertex-order varint adjacency) — driver-side compat
# --------------------------------------------------------------------------


def write_thrill_binary(edges_ds, path: str, n: int | None = None, num_shards: int = 1):
    """ThrillGraphBinaryWriter (reference io/ThrillGraphBinaryWriter;
    Thrill project's published graph serialization): vertices appear in
    ascending id order with IMPLICIT ids — each vertex contributes a
    varint out-degree followed by its out-neighbors as varints; degree-0
    vertices contribute a lone 0x00.  Files concatenate in order
    (``num_shards`` > 1 splits on contiguous vertex ranges).  Undirected
    graphs: pass the symmetrized edge table (upstream stores full
    adjacency).  Vertex-order-addressed => DRIVER-SIDE compat writer
    (module docstring); the per-range encode is one vectorized varint
    pass, streamed via sorted iter_batches."""
    n_detect = 0
    adj_src: list[np.ndarray] = []
    adj_dst: list[np.ndarray] = []
    for batch in (
        edges_ds.select_columns(["src", "dst"])
        .sort(["src", "dst"])
        .iter_batches(batch_format="pyarrow")
    ):
        s = batch["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = batch["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(s):
            n_detect = max(n_detect, int(s.max()) + 1, int(d.max()) + 1)
        adj_src.append(s)
        adj_dst.append(d)
    src = np.concatenate(adj_src) if adj_src else np.zeros(0, np.int64)
    dst = np.concatenate(adj_dst) if adj_dst else np.zeros(0, np.int64)
    n = int(n if n is not None else n_detect)
    if len(src) and (src.min() < 0 or src.max() >= n):
        raise ValueError("thrill writer needs dense vertex ids 0..n-1")
    degs = np.bincount(src, minlength=n).astype(np.int64)
    paths = []
    bounds = np.linspace(0, n, num_shards + 1).astype(np.int64)
    epos = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(degs, out=epos[1:])
    for k in range(num_shards):
        lo, hi = int(bounds[k]), int(bounds[k + 1])
        # interleave degree + neighbor varints for the vertex range
        vals = np.zeros((hi - lo) + int(epos[hi] - epos[lo]), dtype=np.int64)
        dcursor = np.cumsum(np.r_[0, degs[lo:hi] + 1])[:-1]
        vals[dcursor] = degs[lo:hi]
        mask = np.ones(len(vals), dtype=bool)
        mask[dcursor] = False
        vals[mask] = dst[epos[lo] : epos[hi]]
        fn = os.path.join(path, f"part-{k:05d}.thrill") if num_shards > 1 else path
        if num_shards > 1:
            os.makedirs(path, exist_ok=True)
        with open(fn, "wb") as fh:
            fh.write(varint_encode(vals).tobytes())
        paths.append(fn)
    return paths


def read_thrill_binary(paths, offset: int = 0):
    """ThrillGraphBinaryReader: files in ORDER -> Dataset(src, dst, w=1).
    Ids are implicit (position), continuing across files starting at
    ``offset``.  One vectorized varint scan per file; the degree/neighbor
    de-interleave is a cumsum walk (no per-byte Python loop).  Driver-side
    compat loader (vertex-order-addressed; module docstring)."""
    import ray.data

    if isinstance(paths, (str, os.PathLike)):
        p = str(paths)
        paths = (
            sorted(os.path.join(p, f) for f in os.listdir(p))
            if os.path.isdir(p)
            else [p]
        )
    srcs, dsts = [], []
    vid = int(offset)
    for fn in paths:
        raw = np.fromfile(fn, dtype=np.uint8)
        vals = varint_decode(raw)
        # walk: vals[i] is a degree d, the next d values are neighbors.
        # positions of degree slots: p_{k+1} = p_k + vals[p_k] + 1 — a
        # scalar chase over VERTICES (not bytes/edges), unavoidable for a
        # self-delimiting stream; numpy slicing moves the edge payload.
        pos = 0
        deg_pos = []
        while pos < len(vals):
            deg_pos.append(pos)
            pos += int(vals[pos]) + 1
        if pos != len(vals):
            raise ValueError(f"truncated thrill stream in {fn}")
        deg_pos = np.asarray(deg_pos, dtype=np.int64)
        degs = vals[deg_pos]
        nbr_mask = np.ones(len(vals), dtype=bool)
        nbr_mask[deg_pos] = False
        srcs.append(np.repeat(vid + np.arange(len(degs), dtype=np.int64), degs))
        dsts.append(vals[nbr_mask])
        vid += len(degs)
    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": src,
                "dst": dst,
                "w": np.ones(len(src), dtype=np.float64),
            }
        )
    )


# --------------------------------------------------------------------------
# graph-tool .gt binary — driver-side compat
# --------------------------------------------------------------------------

_GT_MAGIC = "⛾ gt".encode()  # published magic: '⛾ gt'


def _gt_width(n: int) -> tuple[int, str]:
    for width, code in ((1, "B"), (2, "H"), (4, "I"), (8, "Q")):
        if n < (1 << (8 * width)):
            return width, code
    raise ValueError("vertex count exceeds uint64")


def write_graphtool_binary(
    edges_ds, path: str, directed: bool = False, comment: str = "networkit_ray"
):
    """GraphToolBinaryWriter role (graph-tool's published `gt` layout:
    magic '⛾ gt' | version u8=1 | big-endian bool u8 | comment u64len+utf8
    | directed bool u8 | N u64 | per-vertex out-degree + out-neighbor ids,
    all at the smallest uint width that fits N; property maps omitted —
    we write none, the reader ignores trailing bytes).  Little-endian.
    Undirected graphs store each edge ONCE in the lower endpoint's list
    (graph-tool convention).  Vertex-order-addressed => driver-side
    compat writer."""
    rows = []
    for batch in edges_ds.select_columns(["src", "dst"]).iter_batches(
        batch_format="pyarrow"
    ):
        s = batch["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = batch["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        rows.append((s, d))
    src = np.concatenate([r[0] for r in rows]) if rows else np.zeros(0, np.int64)
    dst = np.concatenate([r[1] for r in rows]) if rows else np.zeros(0, np.int64)
    if not directed:
        src, dst = np.minimum(src, dst), np.maximum(src, dst)
    n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    degs = np.bincount(src, minlength=n).astype(np.int64)
    width, code = _gt_width(n)
    comment_b = comment.encode()
    out = [
        _GT_MAGIC,
        struct.pack("<B", 1),
        struct.pack("<B", 0),  # little-endian
        struct.pack("<Q", len(comment_b)),
        comment_b,
        struct.pack("<B", 1 if directed else 0),
        struct.pack("<Q", n),
    ]
    # interleave degree + neighbors at fixed width, one vectorized fill
    total = n + len(dst)
    vals = np.zeros(total, dtype=np.uint64)
    dcursor = np.cumsum(np.r_[0, degs + 1])[:-1]
    vals[dcursor] = degs.astype(np.uint64)
    mask = np.ones(total, dtype=bool)
    mask[dcursor] = False
    vals[mask] = dst.astype(np.uint64)
    out.append(vals.astype(f"<{code}").tobytes())
    with open(path, "wb") as fh:
        fh.write(b"".join(out))
    return path


def read_graphtool_binary(path: str):
    """GraphToolBinaryReader (reference io/GraphToolBinaryReader): parse
    the published `gt` layout (see writer) -> (Dataset(src, dst, w=1),
    directed: bool).  Undirected files return each stored edge once
    (canonical lower-endpoint form, as written).  Trailing property-map
    bytes are ignored.  Driver-side compat loader; the adjacency is one
    fixed-width numpy scan."""
    import ray.data

    raw = open(path, "rb").read()
    if raw[: len(_GT_MAGIC)] != _GT_MAGIC:
        raise ValueError("not a gt file (bad magic)")
    p = len(_GT_MAGIC)
    version = raw[p]
    p += 1
    if version != 1:
        raise ValueError(f"unsupported gt version {version}")
    big = bool(raw[p])
    p += 1
    endian = ">" if big else "<"
    (clen,) = struct.unpack_from(f"{endian}Q", raw, p)
    p += 8 + clen
    directed = bool(raw[p])
    p += 1
    (n,) = struct.unpack_from(f"{endian}Q", raw, p)
    p += 8
    width, code = _gt_width(int(n))
    flat = np.frombuffer(raw, dtype=f"{endian}{code}", offset=p)
    pos = 0
    deg_pos = []
    for _ in range(int(n)):
        if pos >= len(flat):
            raise ValueError("truncated gt adjacency")
        deg_pos.append(pos)
        pos += int(flat[pos]) + 1
    deg_pos = np.asarray(deg_pos, dtype=np.int64)
    degs = flat[deg_pos].astype(np.int64)
    mask = np.zeros(len(flat), dtype=bool)
    mask[:pos] = True
    mask[deg_pos] = False
    dst = flat[mask].astype(np.int64)
    src = np.repeat(np.arange(int(n), dtype=np.int64), degs)
    ds = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst, "w": np.ones(len(src), np.float64)})
    )
    return ds, directed
