"""Maximal clique enumeration — distributed Eppstein–Löffler–Strash shape.

Reference counterpart: clique/MaximalCliques (SURVEY.md §2.3; the
reference runs sequential Bron–Kerbosch with degeneracy ordering).  The
distributed decomposition:

  1. orient edges by (degree, vid) order — the same orientation the
     triangle pipeline uses; every vertex's forward neighborhood N+(v)
     has O(sqrt m) size on degree-bounded inputs;
  2. ship each vertex its forward neighborhood AND the edges inside it
     (the triangle-corner wedge join, pre-filtered by orientation);
  3. per-vertex pivoted Bron–Kerbosch on the tiny local subgraph
     (map_groups; group size <= oriented-degree^2) emits every clique
     that is maximal within {v} u N+(v) and has v as its order-minimum —
     each global maximal clique is emitted exactly once, by its minimum
     member;
  4. a candidate can still be extendable by an order-EARLIER vertex, so a
     global maximality filter runs distributed: explode members, join to
     the symmetric edge table, and any outside vertex adjacent to ALL k
     members (count == k) kills the candidate.  Survivors are exactly the
     maximal cliques.

Nothing vertex- or clique-set-sized reaches the driver; skew is bounded
by the orientation exactly as in the triangle pipeline."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count

from networkit_ray.stages.graphops import canonicalize_undirected, symmetrize


def _bk_group(df: pd.DataFrame) -> pd.DataFrame:
    """One vertex's forward neighborhood -> its locally-maximal cliques."""
    v = int(df["v"].iat[0])
    nbrs = sorted(int(x) for x in df.loc[df["kind"] == 0, "a"])
    idx = {u: i for i, u in enumerate(nbrs)}
    n = len(nbrs)
    adj = [0] * n
    for a, b in zip(df.loc[df["kind"] == 1, "a"], df.loc[df["kind"] == 1, "b"]):
        i, j = idx[int(a)], idx[int(b)]
        adj[i] |= 1 << j
        adj[j] |= 1 << i
    out = []

    def bk(r_bits, p_bits, x_bits):
        if p_bits == 0 and x_bits == 0:
            members = [v] + [nbrs[i] for i in _bits(r_bits)]
            out.append(members)
            return
        pool = p_bits | x_bits
        pivot = max(_bits(pool), key=lambda i: bin(adj[i] & p_bits).count("1"))
        for i in _bits(p_bits & ~adj[pivot]):
            bi = 1 << i
            bk(r_bits | bi, p_bits & adj[i], x_bits & adj[i])
            p_bits &= ~bi
            x_bits |= bi

    full = (1 << n) - 1
    bk(0, full, 0)
    rows = []
    for members in out:
        members = sorted(members)
        rows.append(
            {
                "clique": ",".join(str(m) for m in members),
                "size": len(members),
            }
        )
    return pd.DataFrame(rows, columns=["clique", "size"])


def _bits(x: int):
    while x:
        b = x & -x
        yield b.bit_length() - 1
        x ^= b


def maximal_cliques(edges_ds, num_partitions: int = 8):
    """edges(src,dst[,w]) -> Dataset(clique: string, size: int64): every
    maximal clique (of size >= 2; isolated vertices carry no edges) as a
    comma-joined sorted vid list."""
    import ray.data

    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    empty = ray.data.from_arrow(
        pa.table({"clique": pa.array([], pa.string()),
                  "size": pa.array([], pa.int64())})
    )
    if canon.count() == 0:
        return empty
    sym = symmetrize(canon).select_columns(["src", "dst"]).materialize()
    deg = (
        sym.groupby("src", num_partitions=num_partitions)
        .count()
        .map_batches(
            lambda t: pa.table(
                {"dv": t["src"], "d": pc.cast(t["count()"], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    # orient: keep (u -> v) if (d(u), u) < (d(v), v)
    j = sym.join(
        deg, join_type="inner", num_partitions=num_partitions, on=("src",),
        right_on=("dv",),
    )
    j = j.map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["dst"], "ds_": t["d"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).join(
        deg, join_type="inner", num_partitions=num_partitions, on=("dst",),
        right_on=("dv",),
    )

    def orient(t: pa.Table) -> pa.Table:
        du = t["ds_"].combine_chunks().to_numpy(zero_copy_only=False)
        dv = t["d"].combine_chunks().to_numpy(zero_copy_only=False)
        u = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        fwd = (du < dv) | ((du == dv) & (u < v))
        return pa.table({"u": u[fwd], "x": v[fwd]})

    fwd = j.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True)
    fwd = fwd.materialize()

    # wedge pairs (v, a, b) with a, b in N+(v), a < b, joined against the
    # oriented edge set to mark which pairs are edges
    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        v = df["u"].iat[0]
        ns = np.sort(df["x"].to_numpy(dtype=np.int64))
        if len(ns) < 2:
            return pd.DataFrame(columns=["v", "a", "b"])
        ii, jj = np.triu_indices(len(ns), k=1)
        return pd.DataFrame(
            {"v": np.int64(v), "a": ns[ii], "b": ns[jj]}
        )

    wed = (
        fwd.groupby("u", num_partitions=num_partitions)
        .map_groups(wedges, batch_format="pandas")
        .materialize()
    )
    emark = fwd.map_batches(
        lambda t: pa.table(
            {
                "ea": pc.min_element_wise(t["u"], t["x"]),
                "eb": pc.max_element_wise(t["u"], t["x"]),
                "ise": pa.array(np.ones(t.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    closed = (
        wed.join(
            emark,
            join_type="inner",
            num_partitions=num_partitions,
            on=("a", "b"),
            right_on=("ea", "eb"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "v": t["v"],
                    "a": t["a"],
                    "b": t["b"],
                    "kind": pa.array(np.ones(t.num_rows, np.int8)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        if wed.count() > 0
        else None
    )
    nbr_rows = fwd.map_batches(
        lambda t: pa.table(
            {
                "v": t["u"],
                "a": t["x"],
                "b": pa.array(np.full(t.num_rows, -1, np.int64)),
                "kind": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    grp = nbr_rows if closed is None else nbr_rows.union(closed)
    cands = (
        grp.groupby("v", num_partitions=num_partitions)
        .map_groups(_bk_group, batch_format="pandas")
        .materialize()
    )
    if cands.count() == 0:
        return empty

    # global maximality filter: an outside vertex adjacent to ALL members
    # (count == size) extends the candidate -> drop it.  The member-degree
    # explosion is keyed by an int64 siphash of the clique string (not the
    # string itself) — the shuffle moves ints, the string only survives in
    # the small candidate table (collisions ~ #cliques^2 / 2^64).
    def cid_col(t: pa.Table) -> pa.Table:
        cid = pd.util.hash_array(
            np.asarray(t["clique"].to_pylist(), dtype=object)
        ).view(np.int64)
        return t.append_column("cid", pa.array(cid))

    cands = cands.map_batches(
        cid_col, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def explode(t: pa.Table) -> pa.Table:
        cl = t["clique"].to_pylist()
        sz = t["size"].combine_chunks().to_numpy(zero_copy_only=False)
        ci = t["cid"].combine_chunks().to_numpy(zero_copy_only=False)
        cs, ss, ms = [], [], []
        for c, s, i in zip(cl, sz, ci):
            for m in c.split(","):
                cs.append(int(i))
                ss.append(int(s))
                ms.append(int(m))
        return pa.table(
            {
                "cid": pa.array(cs, pa.int64()),
                "size": pa.array(ss, pa.int64()),
                "member": pa.array(ms, pa.int64()),
            }
        )

    mem = cands.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    # sorted neighbor-set blob per vertex: the extender test becomes the
    # intersection of the members' neighbor sets minus the members — one
    # co-partitioned join ships each member its blob, and the per-clique
    # intersections run at C speed inside hash-bucketed groups.  (A naive
    # per-(clique, neighbor) count explodes to sum-of-member-degrees ROWS;
    # the blob form ships the same bytes but aggregates them vectorized.)
    def adj_group(df: pd.DataFrame) -> pd.DataFrame:
        v = int(df["src"].iat[0])
        ns = np.sort(df["dst"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"av_": [np.int64(v)], "nblob": [ns.tobytes()]})

    adj = (
        sym.groupby("src", num_partitions=num_partitions)
        .map_groups(adj_group, batch_format="pandas")
        .materialize()
    )
    mem_b = mem.join(
        adj, join_type="inner", num_partitions=num_partitions, on=("member",),
        right_on=("av_",),
    ).map_batches(
        lambda t: pa.table(
            {
                "bucket": pc.bit_wise_and(t["cid"], pa.scalar(255)),
                "cid": t["cid"],
                "member": t["member"],
                "nblob": t["nblob"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def check_bucket(df: pd.DataFrame) -> pd.DataFrame:
        dead = []
        for cid, g in df.groupby("cid"):
            inter = None
            for b in g["nblob"]:
                a = np.frombuffer(b, dtype=np.int64)
                inter = a if inter is None else np.intersect1d(
                    inter, a, assume_unique=True
                )
                if len(inter) == 0:
                    break
            if inter is not None and len(inter):
                members = g["member"].to_numpy(dtype=np.int64)
                if len(np.setdiff1d(inter, members)):
                    dead.append(int(cid))
        return pd.DataFrame({"badc": np.array(dead, dtype=np.int64),
                             "count()": np.ones(len(dead), dtype=np.int64)})

    ext = (
        mem_b.groupby("bucket", num_partitions=num_partitions)
        .map_groups(check_bucket, batch_format="pandas")
        .materialize()
    )
    if ext.count() == 0:
        return cands.select_columns(["clique", "size"])
    out = cands.join(
        ext, join_type="left_outer", num_partitions=num_partitions,
        on=("cid",), right_on=("badc",),
    )
    return out.map_batches(
        lambda t: pa.table({"clique": t["clique"], "size": t["size"]}).filter(
            pc.is_null(t["count()"])
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
