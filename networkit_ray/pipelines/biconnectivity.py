"""Biconnected components + articulation points — Tarjan–Vishkin, fully
distributed.

Reference counterpart: components/BiconnectedComponents (SURVEY.md §2.3;
the reference computes Hopcroft–Tarjan DFS, which is inherently
sequential).  The Ray-Data-first shape is the Tarjan & Vishkin (1985)
parallel biconnectivity algorithm — the textbook PRAM method, re-expressed
as Dataset stages:

  1. spanning forest (Boruvka, spanning.py) + component labels; the root
     of every tree is its component's min vid (== the CC label).
  2. Euler tour of each tree: arcs = doubled tree edges; the successor of
     arc (u,v) is (v, next neighbor of v after u in sorted cyclic order);
     the tour breaks into a list at the root's closing arc.
  3. distributed list ranking of the tour by pointer doubling
     (O(log V) rounds, one self-join on the successor key per round).
  4. entry(v) = tour position of the first arc into v (its parent arc —
     this also yields parent(v) with no BFS), exit(v) = position of the
     last arc out of v; subtree(v) is exactly the position interval
     [entry(v), exit(v)].
  5. low(v)/high(v) = min/max over subtree(v) of m(u) = min/max of
     entry(u) and the entries of u's non-tree neighbors — a range-min/max
     query answered with a distributed sparse table (O(log V) doubling
     levels, one shifted self-join per level; every query is two
     power-of-two windows at its own level).
  6. auxiliary graph on non-root vertices (vertex v stands for its parent
     tree edge):  (a) non-tree edge {v,w} with neither endpoint an
     ancestor of the other -> aux edge {v,w};  (b) tree edge (v=p(w), w)
     with low(w) < entry(v) or high(w) > exit(v) -> aux edge {v,w}.
     Connected components of the auxiliary graph ARE the biconnected
     components (Tarjan–Vishkin Theorem 1).
  7. every tree edge (p(w), w) gets the aux component of w; every
     non-tree edge gets the aux component of its deeper endpoint; labels
     canonicalize to the min vid incident to the component.

Partitioning assumptions: arcs hash-partition by (comp, position); every
round moves only the arc/vertex tables (2(V-1) rows per tree), never the
full edge set; nothing vertex- or edge-sized reaches the driver.  Skewed
tree degrees (hubs) are handled inside vectorized per-vertex groups.

Articulation points fall out for free: a vertex is an articulation point
iff it is incident to >= 2 distinct biconnected components.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min

from networkit_ray.stages.graphops import canonicalize_undirected

_INF = np.int64(1) << 62
_NEG = -(np.int64(1) << 62)


def _t(ds, fn):
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _succ_group(df: pd.DataFrame) -> pd.DataFrame:
    """Arcs arriving at one vertex v -> successor arcs (v, next nbr)."""
    v = int(df["av"].iat[0])
    c = int(df["c"].iat[0])
    au = df["au"].to_numpy(dtype=np.int64)
    nbrs = np.sort(au)
    idx = np.searchsorted(nbrs, au)
    sv = nbrs[(idx + 1) % len(nbrs)]
    su = np.full(len(df), v, dtype=np.int64)
    if v == c:
        # root: the arc whose cyclic next would wrap to the first
        # neighbor closes the tour -> its successor is null (-1)
        end = au == nbrs[-1]
        su[end] = -1
        sv[end] = -1
    return pd.DataFrame(
        {"c": np.int64(c), "au": au, "av": np.int64(v), "su": su, "sv": sv}
    )


def _entry_group(df: pd.DataFrame) -> pd.DataFrame:
    """Arcs into one (non-root) vertex -> its entry position + parent."""
    i = int(df["pos"].to_numpy().argmin())
    return pd.DataFrame(
        {
            "c": [np.int64(df["c"].iat[i])],
            "vid": [np.int64(df["av"].iat[i])],
            "entry": [np.int64(df["pos"].iat[i])],
            "parent": [np.int64(df["au"].iat[i])],
        }
    )


def _rank_tour(arcs, num_partitions, max_rounds=64):
    """(c, au, av, su, sv) -> (c, au, av, pos) via pointer doubling.

    Rounds are the fixed doubling bound ceil(log2(n_arcs)) + 1 — after k
    rounds every pointer has advanced 2^k or hit the terminator, so no
    per-round convergence counter (one fewer stage per round)."""
    cur = _t(
        arcs,
        lambda t: t.append_column("dist", pa.array(np.ones(t.num_rows, np.int64))),
    ).materialize()
    n_arcs = max(2, cur.count())
    rounds = min(max_rounds, int(np.ceil(np.log2(n_arcs))) + 1)
    for _ in range(rounds):
        nxt = _t(
            cur,
            lambda t: pa.table(
                {
                    "ju": t["au"],
                    "jv": t["av"],
                    "su2": t["su"],
                    "sv2": t["sv"],
                    "dist2": t["dist"],
                }
            ),
        )
        j = cur.join(
            nxt,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("su", "sv"),
            right_on=("ju", "jv"),
        )

        def hop(t: pa.Table) -> pa.Table:
            live = pc.not_equal(t["su"], pa.scalar(-1))
            has = pc.and_(live, pc.is_valid(t["dist2"]))
            return pa.table(
                {
                    "c": t["c"],
                    "au": t["au"],
                    "av": t["av"],
                    "su": pc.if_else(has, pc.fill_null(t["su2"], -1), t["su"]),
                    "sv": pc.if_else(has, pc.fill_null(t["sv2"], -1), t["sv"]),
                    "dist": pc.if_else(
                        has,
                        pc.add(t["dist"], pc.fill_null(t["dist2"], 0)),
                        t["dist"],
                    ),
                }
            )

        cur = _t(j, hop).materialize()
    # pos = tour_length(c) - dist  (the closing arc has dist 1 -> last pos)
    lens = cur.groupby("c", num_partitions=num_partitions).aggregate(
        Count(alias_name="tlen")
    )
    j = cur.join(lens, join_type="inner", num_partitions=num_partitions, on=("c",))
    return _t(
        j,
        lambda t: pa.table(
            {
                "c": t["c"],
                "au": t["au"],
                "av": t["av"],
                "pos": pc.subtract(pc.cast(t["tlen"], pa.int64()), t["dist"]),
            }
        ),
    ).materialize()


def _sparse_levels(base, levels_k, num_partitions):
    """base(c, idx, minv, maxv) -> union of doubling levels with column k.

    Level k row (c, idx) aggregates the window [idx, idx + 2^k)."""
    out = _t(
        base,
        lambda t: t.append_column("k", pa.array(np.zeros(t.num_rows, np.int64))),
    ).materialize()
    prev = base.materialize()
    for k in range(1, levels_k + 1):
        half = 1 << (k - 1)
        shifted = _t(
            prev,
            lambda t, _h=half: pa.table(
                {
                    "c2": t["c"],
                    "idx2": pc.subtract(t["idx"], pa.scalar(_h)),
                    "minv2": t["minv"],
                    "maxv2": t["maxv"],
                }
            ),
        )
        j = prev.join(
            shifted,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("c", "idx"),
            right_on=("c2", "idx2"),
        )
        prev = _t(
            j,
            lambda t: pa.table(
                {
                    "c": t["c"],
                    "idx": t["idx"],
                    "minv": pc.min_element_wise(
                        t["minv"], pc.fill_null(t["minv2"], _INF)
                    ),
                    "maxv": pc.max_element_wise(
                        t["maxv"], pc.fill_null(t["maxv2"], _NEG)
                    ),
                }
            ),
        ).materialize()
        out = out.union(
            _t(
                prev,
                lambda t, _k=k: t.append_column(
                    "k", pa.array(np.full(t.num_rows, _k, np.int64))
                ),
            )
        )
    return out.materialize()


def _rmq(vert, levels, num_partitions):
    """vert(c, vid, entry, exitp, ...) + levels -> vert + (low, high) over
    the position interval [entry, exitp]."""

    def qprep(t: pa.Table) -> pa.Table:
        e = t["entry"].combine_chunks().to_numpy(zero_copy_only=False)
        x = t["exitp"].combine_chunks().to_numpy(zero_copy_only=False)
        ln = x - e + 1
        kq = np.int64(np.floor(np.log2(ln)))
        i2 = x - (np.int64(1) << kq) + 1
        out = {n: t[n] for n in t.schema.names}
        out["kq"] = pa.array(kq)
        out["i2"] = pa.array(i2)
        return pa.table(out)

    q = _t(vert, qprep)
    la = _t(
        levels,
        lambda t: pa.table(
            {
                "ca": t["c"],
                "ka": t["k"],
                "ia": t["idx"],
                "mina": t["minv"],
                "maxa": t["maxv"],
            }
        ),
    )
    lb = _t(
        levels,
        lambda t: pa.table(
            {
                "cb": t["c"],
                "kb": t["k"],
                "ib": t["idx"],
                "minb": t["minv"],
                "maxb": t["maxv"],
            }
        ),
    )
    j = q.join(
        la,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c", "kq", "entry"),
        right_on=("ca", "ka", "ia"),
    )
    j = j.join(
        lb,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c", "kq", "i2"),
        right_on=("cb", "kb", "ib"),
    )

    def fin(t: pa.Table) -> pa.Table:
        keep = {
            n: t[n]
            for n in ("c", "vid", "entry", "exitp", "parent", "mmin", "mmax")
        }
        keep["low"] = pc.min_element_wise(
            pc.fill_null(t["mina"], _INF), pc.fill_null(t["minb"], _INF)
        )
        keep["high"] = pc.max_element_wise(
            pc.fill_null(t["maxa"], _NEG), pc.fill_null(t["maxb"], _NEG)
        )
        return pa.table(keep)

    return _t(j, fin).materialize()


def biconnected_components(edges_ds, num_partitions: int = 8):
    """edges(src,dst[,w]) -> Dataset(src, dst, bcc): every canonical edge
    labeled by its biconnected component; bcc = min vid incident to the
    component.  Requires non-negative vids (-1 is the null-successor
    sentinel)."""
    import ray.data

    from networkit_ray.pipelines.components import connected_components
    from networkit_ray.pipelines.spanning import spanning_forest

    empty = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "bcc": pa.array([], pa.int64()),
            }
        )
    )
    canon = canonicalize_undirected(edges_ds, weight="one").materialize()
    if canon.count() == 0:
        return empty
    labels, _ = connected_components(canon, num_partitions=num_partitions)
    labels = labels.materialize()
    forest = spanning_forest(canon, num_partitions=num_partitions).materialize()

    # ---- Euler tour arcs + successors ------------------------------------
    both = _t(
        forest,
        lambda t: pa.table(
            {
                "au": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                ),
                "av": pa.concat_arrays(
                    [t["dst"].combine_chunks(), t["src"].combine_chunks()]
                ),
            }
        ),
    )
    lab2 = _t(labels, lambda t: pa.table({"lv": t["vid"], "c": t["label"]}))
    arcs0 = both.join(
        lab2, join_type="inner", num_partitions=num_partitions, on=("au",),
        right_on=("lv",),
    ).select_columns(["c", "au", "av"])
    succ = (
        arcs0.groupby("av", num_partitions=num_partitions)
        .map_groups(_succ_group, batch_format="pandas")
        .materialize()
    )

    # ---- list ranking -> positions; entry/exit/parent --------------------
    arcs = _rank_tour(succ, num_partitions)
    nonroot_in = _t(arcs, lambda t: t.filter(pc.not_equal(t["av"], t["c"])))
    vent = (
        nonroot_in.groupby("av", num_partitions=num_partitions)
        .map_groups(_entry_group, batch_format="pandas")
        .materialize()
    )
    vexit = (
        _t(
            arcs,
            lambda t: pa.table({"xv": t["au"], "pos": t["pos"]}).filter(
                pc.not_equal(t["au"], t["c"])
            ),
        )
        .groupby("xv", num_partitions=num_partitions)
        .aggregate(Max("pos", alias_name="exitp"))
    )
    vert = vent.join(
        vexit, join_type="inner", num_partitions=num_partitions, on=("vid",),
        right_on=("xv",),
    ).select_columns(["c", "vid", "entry", "parent", "exitp"])

    # ---- non-tree edges + m(v) = min/max(entry(v), entries of nt nbrs) ---
    fmark = _t(
        forest,
        lambda t: pa.table(
            {"fs": t["src"], "fd": t["dst"],
             "tree": pa.array(np.ones(t.num_rows, np.int8))}
        ),
    )
    nt = canon.join(
        fmark,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("src", "dst"),
        right_on=("fs", "fd"),
    )
    nontree = _t(
        nt,
        lambda t: pa.table({"src": t["src"], "dst": t["dst"]}).filter(
            pc.is_null(t["tree"])
        ),
    ).materialize()

    # entries including roots (entry(root) = -1: before every real entry,
    # so a subtree reaching its root always escapes every interval)
    root_rows = _t(
        labels,
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "entry": pa.array(np.full(t.num_rows, -1, np.int64)),
            }
        ).filter(pc.equal(t["vid"], t["label"])),
    )
    ent_all = vert.select_columns(["vid", "entry"]).union(root_rows).materialize()

    have_nt = nontree.count() > 0
    if have_nt:
        nt_arcs = _t(
            nontree,
            lambda t: pa.table(
                {
                    "u": pa.concat_arrays(
                        [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                    ),
                    "nbr": pa.concat_arrays(
                        [t["dst"].combine_chunks(), t["src"].combine_chunks()]
                    ),
                }
            ),
        )
        ne = _t(ent_all, lambda t: pa.table({"ev": t["vid"], "ee": t["entry"]}))
        jn = nt_arcs.join(
            ne, join_type="inner", num_partitions=num_partitions, on=("nbr",),
            right_on=("ev",),
        )

        def ntpre(t: pa.Table) -> pa.Table:
            g = (
                pa.table({"u": t["u"], "nmin": t["ee"], "nmax": t["ee"]})
                .group_by("u")
                .aggregate([("nmin", "min"), ("nmax", "max")])
            )
            return g.rename_columns(["u", "nmin", "nmax"])

        ntm = (
            _t(jn, ntpre)
            .groupby("u", num_partitions=num_partitions)
            .aggregate(Min("nmin", alias_name="nmin"), Max("nmax", alias_name="nmax"))
        )
        vm = vert.join(
            ntm, join_type="left_outer", num_partitions=num_partitions,
            on=("vid",), right_on=("u",),
        )
        vert = _t(
            vm,
            lambda t: pa.table(
                {
                    "c": t["c"],
                    "vid": t["vid"],
                    "entry": t["entry"],
                    "parent": t["parent"],
                    "exitp": t["exitp"],
                    "mmin": pc.min_element_wise(
                        t["entry"], pc.fill_null(t["nmin"], _INF)
                    ),
                    "mmax": pc.max_element_wise(
                        t["entry"], pc.fill_null(t["nmax"], _NEG)
                    ),
                }
            ),
        ).materialize()
    else:
        vert = _t(
            vert,
            lambda t: pa.table(
                {
                    "c": t["c"],
                    "vid": t["vid"],
                    "entry": t["entry"],
                    "parent": t["parent"],
                    "exitp": t["exitp"],
                    "mmin": t["entry"],
                    "mmax": t["entry"],
                }
            ),
        ).materialize()

    # ---- low/high via sparse-table RMQ over tour positions ---------------
    vm2 = _t(vert, lambda t: pa.table({"bv": t["vid"], "bm": t["mmin"],
                                       "bM": t["mmax"], "be": t["entry"]}))
    jb = arcs.join(
        vm2, join_type="left_outer", num_partitions=num_partitions, on=("av",),
        right_on=("bv",),
    )

    def mkbase(t: pa.Table) -> pa.Table:
        is_entry = pc.and_(
            pc.is_valid(t["be"]), pc.equal(pc.fill_null(t["be"], -2), t["pos"])
        )
        return pa.table(
            {
                "c": t["c"],
                "idx": t["pos"],
                "minv": pc.if_else(is_entry, pc.fill_null(t["bm"], _INF),
                                   pa.scalar(_INF)),
                "maxv": pc.if_else(is_entry, pc.fill_null(t["bM"], _NEG),
                                   pa.scalar(_NEG)),
            }
        )

    base = _t(jb, mkbase)
    max_len = arcs.groupby("c", num_partitions=num_partitions).aggregate(
        Count(alias_name="n")
    ).max("n")
    levels_k = max(1, int(np.ceil(np.log2(max(2, int(max_len))))))
    levels = _sparse_levels(base, levels_k, num_partitions)
    vert = _rmq(vert, levels, num_partitions)

    # ---- auxiliary graph --------------------------------------------------
    aux_parts = []
    # (b) tree edge (v = p(w), w), v non-root:
    pv = _t(vert, lambda t: pa.table({"pvid": t["vid"], "pe": t["entry"],
                                      "px": t["exitp"]}))
    jb2 = vert.join(
        pv, join_type="inner", num_partitions=num_partitions, on=("parent",),
        right_on=("pvid",),
    )
    ruleb = _t(
        jb2,
        lambda t: pa.table({"src": t["parent"], "dst": t["vid"]}).filter(
            pc.or_(pc.less(t["low"], t["pe"]), pc.greater(t["high"], t["px"]))
        ),
    )
    aux_parts.append(ruleb)
    # (a) non-tree edge with unrelated endpoints (root-incident pairs are
    # never unrelated — the root is everyone's ancestor — and roots carry
    # no aux node, so inner joins on vert drop them correctly):
    if have_nt:
        va = _t(vert, lambda t: pa.table({"av_": t["vid"], "ea": t["entry"],
                                          "xa": t["exitp"]}))
        vb = _t(vert, lambda t: pa.table({"bv_": t["vid"], "eb": t["entry"],
                                          "xb": t["exitp"]}))
        jnt = nontree.join(
            va, join_type="inner", num_partitions=num_partitions, on=("src",),
            right_on=("av_",),
        ).join(
            vb, join_type="inner", num_partitions=num_partitions, on=("dst",),
            right_on=("bv_",),
        )

        def unrel(t: pa.Table) -> pa.Table:
            ea = t["ea"].combine_chunks().to_numpy(zero_copy_only=False)
            xa = t["xa"].combine_chunks().to_numpy(zero_copy_only=False)
            eb = t["eb"].combine_chunks().to_numpy(zero_copy_only=False)
            xb = t["xb"].combine_chunks().to_numpy(zero_copy_only=False)
            a_anc = (ea <= eb) & (eb <= xa)
            b_anc = (eb <= ea) & (ea <= xb)
            keep = ~(a_anc | b_anc)
            return pa.table(
                {
                    "src": t["src"].combine_chunks().filter(pa.array(keep)),
                    "dst": t["dst"].combine_chunks().filter(pa.array(keep)),
                }
            )

        aux_parts.append(_t(jnt, unrel))

    aux_edges = aux_parts[0]
    for p in aux_parts[1:]:
        aux_edges = aux_edges.union(p)
    aux_edges = _t(
        aux_edges,
        lambda t: t.append_column(
            "w", pa.array(np.ones(t.num_rows, np.float64))
        ),
    ).materialize()
    aux_vertices = vert.select_columns(["vid"])
    if aux_edges.count() == 0:
        # pure-tree graph: every tree edge is its own biconnected component
        auxcc = _t(
            aux_vertices, lambda t: pa.table({"vid": t["vid"], "label": t["vid"]})
        ).materialize()
    else:
        auxcc, _ = connected_components(
            aux_edges, vertices_ds=aux_vertices, num_partitions=num_partitions
        )
        auxcc = auxcc.materialize()

    # ---- per-edge labels --------------------------------------------------
    ac = _t(auxcc, lambda t: pa.table({"cv": t["vid"], "comp": t["label"]}))
    # tree edge (parent(w), w) -> comp(w)
    tree_lab = _t(
        vert.join(
            ac, join_type="inner", num_partitions=num_partitions, on=("vid",),
            right_on=("cv",),
        ),
        lambda t: pa.table(
            {
                "src": pc.min_element_wise(t["vid"], t["parent"]),
                "dst": pc.max_element_wise(t["vid"], t["parent"]),
                "comp": t["comp"],
            }
        ),
    )
    parts = [tree_lab]
    if have_nt:
        # non-tree edge -> comp of the deeper endpoint (larger entry)
        ja = nontree.join(
            _t(ent_all, lambda t: pa.table({"v1": t["vid"], "e1": t["entry"]})),
            join_type="inner", num_partitions=num_partitions, on=("src",),
            right_on=("v1",),
        ).join(
            _t(ent_all, lambda t: pa.table({"v2": t["vid"], "e2": t["entry"]})),
            join_type="inner", num_partitions=num_partitions, on=("dst",),
            right_on=("v2",),
        )
        deep = _t(
            ja,
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "dv": pc.if_else(
                        pc.greater(t["e1"], t["e2"]), t["src"], t["dst"]
                    ),
                }
            ),
        )
        nt_lab = _t(
            deep.join(
                ac, join_type="inner", num_partitions=num_partitions, on=("dv",),
                right_on=("cv",),
            ),
            lambda t: pa.table(
                {"src": t["src"], "dst": t["dst"], "comp": t["comp"]}
            ),
        )
        parts.append(nt_lab)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    # the aux component label (min non-root vid whose parent tree edge is in
    # the component) is already canonical and UNIQUE per BCC — min *incident*
    # vid would collide at articulation vertices shared by two components
    return _t(
        out,
        lambda t: pa.table({"src": t["src"], "dst": t["dst"], "bcc": t["comp"]}),
    )


def articulation_points(edges_ds=None, num_partitions: int = 8, bcc_edges=None):
    """-> Dataset(vid): vertices incident to >= 2 biconnected components.
    Pass either the raw edge table or a precomputed bcc edge labeling."""
    if bcc_edges is None:
        bcc_edges = biconnected_components(edges_ds, num_partitions=num_partitions)

    def expl(t: pa.Table) -> pa.Table:
        vid = pa.concat_arrays(
            [t["src"].combine_chunks(), t["dst"].combine_chunks()]
        )
        b = pa.concat_arrays([t["bcc"].combine_chunks(), t["bcc"].combine_chunks()])
        return (
            pa.table({"vid": vid, "bcc": b}).group_by(["vid", "bcc"]).aggregate([])
        )

    pairs = (
        _t(bcc_edges, expl)
        .groupby(["vid", "bcc"], num_partitions=num_partitions)
        .count()
    )
    ncomp = _t(pairs, lambda t: pa.table({"vid": t["vid"]})).groupby(
        "vid", num_partitions=num_partitions
    ).count()
    out = _t(
        ncomp,
        lambda t: pa.table({"vid": t["vid"]}).filter(
            pc.greater(t["count()"], pa.scalar(1))
        ),
    ).materialize()
    if out.count() == 0:
        import ray.data

        return ray.data.from_arrow(pa.table({"vid": pa.array([], pa.int64())}))
    return out
