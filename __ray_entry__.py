"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in networkit_ray) calls ray.init()/ray.shutdown().

queries(): one entry per operator family from SURVEY.md §2 over the
testdata tables at sf_dir; oracle_sql(): the DuckDB-equivalent SQL.  The
graph operators run over two SQL-derivable graphs:

  customer–supplier graph: src=o_custkey, dst=l_suppkey+10000000,
      w = lineitem count   (pagerank / components / label propagation)
  supplier co-part graph: suppliers sharing a part
      (triangle counts — the customer-supplier graph is bipartite and
      triangle-free by construction)

Floating scores are rounded with FLOOR(x*1e6 + 0.5)/1e6 on BOTH sides so
the driver's value-hash comparison is insensitive to sub-1e-6 float
associativity (the north star's own tolerance — BASELINE.json:6).

Non-SQL-expressible operators (minhash-LSH, simhash, winnowing
fingerprints, IVF ANN, corpus extraction) are registered without oracles →
driver records rows-only checks; their value-level tests live in tests/.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

P = 4  # partitions for the sf0.01 correctness runs
PR_ITERS = 20
PLP_ITERS = 5
SUPPLIER_OFFSET = 10_000_000


def _round6(ds, col):
    def f(t: pa.Table) -> pa.Table:
        x = t[col].combine_chunks().to_numpy(zero_copy_only=False)
        r = np.floor(x * 1e6 + 0.5) / 1e6
        cols = {n: t[n] for n in t.schema.names}
        cols[col] = pa.array(r)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _edges(sf_dir):
    from networkit_ray.sources.tables import customer_supplier_edges

    return customer_supplier_edges(sf_dir, num_partitions=P)


def _supplier_edges(sf_dir):
    """Supplier co-part projection: canonical (src<dst, w=1) edges."""
    from networkit_ray.sources.tables import read_table

    ps = (
        read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
        .map_batches(
            lambda t: t.group_by(["l_partkey", "l_suppkey"]).aggregate([]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["l_partkey", "l_suppkey"], num_partitions=P)
        .count()
        .select_columns(["l_partkey", "l_suppkey"])
    )
    pairs = ps.join(
        ps,
        join_type="inner",
        num_partitions=P,
        on=("l_partkey",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def mk(t: pa.Table) -> pa.Table:
        a = t["l_suppkey_a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["l_suppkey_b"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = a < b
        out = pa.table(
            {
                "src": a[keep].astype(np.int64),
                "dst": b[keep].astype(np.int64),
            }
        )
        return out.group_by(["src", "dst"]).aggregate([])

    pairs = (
        pairs.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"], num_partitions=P)
        .count()
    )
    return pairs.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "w": pa.array(np.ones(t.num_rows, dtype=np.float64)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _suppliers(sf_dir):
    from networkit_ray.sources.tables import read_table

    return (
        read_table(sf_dir, "lineitem", columns=["l_suppkey"])
        .map_batches(
            lambda t: pa.table(
                {"vid": pc.unique(t["l_suppkey"].combine_chunks()).cast(pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("vid", num_partitions=P)
        .count()
        .select_columns(["vid"])
    )


def _docs(sf_dir):
    from networkit_ray.sources.tables import read_table

    return read_table(sf_dir, "documents")


def _emb(sf_dir):
    from networkit_ray.sources.tables import read_table

    return read_table(sf_dir, "embeddings")


# --------------------------------------------------------------------------
# query implementations
# --------------------------------------------------------------------------


def q_edges_build(sf_dir):
    return _edges(sf_dir)


def q_degrees(sf_dir):
    from networkit_ray.stages.graphops import out_degrees

    return out_degrees(_edges(sf_dir))


def q_pagerank(sf_dir):
    from networkit_ray.pipelines.pagerank import pagerank

    scores, _ = pagerank(
        _edges(sf_dir), fixed_iters=PR_ITERS, num_partitions=P, engine="actor"
    )
    return _round6(scores, "score")


def q_pagerank_top20(sf_dir):
    # tie-break on vid: rounded scores can collide at the rank-20 boundary
    return q_pagerank(sf_dir).sort(["score", "vid"], descending=[True, False]).limit(20)


def q_connected_components(sf_dir):
    from networkit_ray.pipelines.components import connected_components

    labels, _ = connected_components(_edges(sf_dir), num_partitions=P, engine="actor")
    return labels


def q_label_propagation(sf_dir):
    from networkit_ray.pipelines.labelprop import label_propagation

    labels, _ = label_propagation(
        _edges(sf_dir), fixed_iters=PLP_ITERS, num_partitions=P, engine="actor"
    )
    return labels


def q_dynamic_cc_replay(sf_dir):
    """Incremental CC under streaming inserts: the customer-supplier edges
    replay in 3 deterministic hash-batches through
    DynamicConnectedComponents; the final labeling must equal the
    batch-oblivious connected components (the CC SQL oracle)."""
    from networkit_ray.pipelines.dynamic import DynamicConnectedComponents

    edges = _edges(sf_dir).materialize()
    dyn = DynamicConnectedComponents(num_partitions=P)

    def chunk(k):
        def pick(t: pa.Table, _k=k) -> pa.Table:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            import pandas as pd

            h = pd.util.hash_array(s * np.int64(1000003) ^ d)
            return t.filter(pa.array(h % 3 == _k))

        return edges.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)

    labels = None
    for k in range(3):
        labels = dyn.update(chunk(k))
    return labels


def q_dynamic_bfs_replay(sf_dir):
    """Incremental BFS depths under streaming inserts (reference
    dynamics/DynBFS): the same 3 deterministic hash-batches replay through
    DynamicBFS warm-start relaxation; the final depth table must equal the
    batch-oblivious BFS (the recursive-CTE BFS SQL oracle)."""
    from networkit_ray.pipelines.dynamic import DynamicBFS

    edges = _edges(sf_dir).materialize()
    src = int(vertices_from_edges_min(edges))
    dyn = DynamicBFS([src], num_partitions=P)

    def chunk(k):
        def pick(t: pa.Table, _k=k) -> pa.Table:
            s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
            import pandas as pd

            h = pd.util.hash_array(s * np.int64(1000003) ^ d)
            return t.filter(pa.array(h % 3 == _k))

        return edges.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)

    depths = None
    for k in range(3):
        depths, _rounds = dyn.update(chunk(k))
    return depths


def vertices_from_edges_min(edges):
    from networkit_ray.stages.graphops import vertices_from_edges

    return vertices_from_edges(edges).min("vid")


def q_triangles(sf_dir):
    from networkit_ray.pipelines.triangles import triangle_counts

    return triangle_counts(
        _supplier_edges(sf_dir), _suppliers(sf_dir), num_partitions=P
    )


def q_degree_centrality(sf_dir):
    from networkit_ray.pipelines.centrality import degree_centrality

    return degree_centrality(_supplier_edges(sf_dir), _suppliers(sf_dir), num_partitions=P)


def q_katz(sf_dir):
    from networkit_ray.pipelines.centrality import katz_centrality

    out = katz_centrality(_edges(sf_dir), alpha=0.05, beta=1.0, iters=10, num_partitions=P)
    return _round6(out, "x")


def q_local_clustering(sf_dir):
    from networkit_ray.pipelines.centrality import local_clustering_coefficient

    out = local_clustering_coefficient(
        _supplier_edges(sf_dir), _suppliers(sf_dir), num_partitions=P
    )
    return _round6(out, "lcc")


def q_link_prediction(sf_dir):
    from networkit_ray.pipelines.linkpred import (
        katz_index_scores,
        link_prediction_scores,
    )

    out = link_prediction_scores(_supplier_edges(sf_dir), num_partitions=P)
    out = _round6(_round6(_round6(out, "jaccard"), "adamic_adar"), "resource_alloc")
    # KatzIndex rides the same slot: pairs with cn >= 1 have a 2-walk, so
    # the inner join keeps exactly the score table's pair set
    kz = _round6(
        katz_index_scores(
            _supplier_edges(sf_dir), beta=0.005, max_path=3, num_partitions=P
        ),
        "katz_index",
    ).materialize()
    cols = out.schema().names
    return out.materialize().join(
        kz, join_type="inner", num_partitions=P, on=("u", "v")
    ).map_batches(
        lambda t, cols=cols: pa.table(
            {**{c: t[c] for c in cols}, "katz_index": t["katz_index"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_hopping_windows(sf_dir):
    """Carrier for the per-user window family (SURVEY §2): tumbling
    (kind='tumbling', W=3600s) UNION sliding/hopping (kind='sliding',
    W=3600s hopping by S=900s) — one registry slot value-checks both."""
    from networkit_ray.pipelines.windows import sliding_window, tumbling_window
    from networkit_ray.sources.tables import read_table

    def tag(kind):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "kind": pa.array([kind] * len(t), pa.string()),
                    **{n: t[n] for n in t.schema.names},
                }
            )

        return f

    tw = tumbling_window(read_table(sf_dir, "events"), window_s=3600, num_partitions=P)
    sw = sliding_window(
        read_table(sf_dir, "events"), window_s=3600, step_s=900, num_partitions=P
    )
    out = tw.map_batches(tag("tumbling"), batch_format="pyarrow").union(
        sw.map_batches(tag("sliding"), batch_format="pyarrow")
    )
    return _round6(out, "sum_value")


def q_session_windows(sf_dir):
    from networkit_ray.pipelines.windows import session_windows
    from networkit_ray.sources.tables import read_table

    out = session_windows(read_table(sf_dir, "events"), gap_s=1800, num_partitions=P)
    return _round6(out, "sum_value")


def q_modularity(sf_dir):
    """PLP modularity + coarsening rider (driver-value-checks the public
    `contract_by_labels`/`project_labels` operators, SURVEY §2.3
    coarsening/): the PLP labeling contracts to its coarse graph —
    `coarse_edge_rows` (distinct canonical label pairs) and
    `coarse_selfloop_w` (intra-community weight folded into self-loops)
    are pinned by the SQL oracle's own label-pair aggregation — and the
    identity clustering of the coarse nodes projects back through
    `project_labels`, with the mismatch count vs the original labeling
    pinned to zero."""
    import ray.data
    from ray.data.aggregate import Max

    from networkit_ray.pipelines.coarsening import (
        contract_by_labels,
        project_labels,
    )
    from networkit_ray.pipelines.community import modularity
    from networkit_ray.pipelines.labelprop import label_propagation

    edges = _edges(sf_dir)
    labels, _ = label_propagation(
        edges, fixed_iters=PLP_ITERS, num_partitions=P, engine="actor"
    )
    labels = labels.materialize()
    q = float(
        modularity(edges, labels, num_partitions=P).take_all()[0]["modularity"]
    )

    coarse = contract_by_labels(edges, labels, num_partitions=P).materialize()
    coarse_rows = coarse.count()
    loops = coarse.filter(expr="src == dst")
    selfw = int(loops.sum("w") or 0) if loops.count() > 0 else 0

    # ClusteringProjector check: the identity clustering of the coarse
    # nodes, projected back to the fine graph, must reproduce `labels`.
    cl = (
        labels.groupby("label", num_partitions=P)
        .aggregate(Max("label", alias_name="l2"))
        .map_batches(
            lambda t: pa.table({"vid": t["label"], "label": t["l2"]}),
            batch_format="pyarrow",
        )
    )
    proj = project_labels(cl, labels, num_partitions=P).map_batches(
        lambda t: pa.table({"pvid": t["vid"], "plabel": t["label"]}),
        batch_format="pyarrow",
    )
    joined = labels.join(
        proj, join_type="inner", num_partitions=P, on=("vid",),
        right_on=("pvid",),
    ).map_batches(
        lambda t: pa.table({"label": t["label"], "plabel": t["plabel"]}),
        batch_format="pyarrow",
    )
    mism = joined.filter(expr="plabel != label").count()
    mism += labels.count() - joined.count()  # dropped vertices count too

    qr = float(np.floor(q * 1e6 + 0.5) / 1e6)
    return ray.data.from_arrow(
        pa.table(
            {
                "modularity": pa.array([qr], pa.float64()),
                "coarse_edge_rows": pa.array([coarse_rows], pa.int64()),
                "coarse_selfloop_w": pa.array([selfw], pa.int64()),
                "proj_mismatch": pa.array([int(mism)], pa.int64()),
            }
        )
    )


def q_text_stats(sf_dir):
    from networkit_ray.pipelines.textstats import text_stats

    out = text_stats(_docs(sf_dir))
    return _round6(_round6(out, "stop_ratio"), "quality_score")


def q_exact_dedup(sf_dir):
    from networkit_ray.pipelines.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir), num_partitions=P)


def q_jaccard_pairs(sf_dir):
    from networkit_ray.pipelines.dedup import jaccard_similar_pairs

    return _round6(
        jaccard_similar_pairs(_docs(sf_dir), threshold=0.8, num_partitions=P),
        "jaccard",
    )


def q_minhash_groups(sf_dir):
    from networkit_ray.pipelines.dedup import minhash_dedup_groups

    return minhash_dedup_groups(_docs(sf_dir), threshold=0.5, num_partitions=P)


def q_simhash_near_dups(sf_dir):
    from networkit_ray.pipelines.dedup import simhash_near_dups

    return simhash_near_dups(_docs(sf_dir), max_hamming=3, num_partitions=P)


def q_fingerprints(sf_dir):
    from networkit_ray.pipelines.textstats import fingerprints

    return fingerprints(_docs(sf_dir))


def q_knn_brute(sf_dir):
    from networkit_ray.pipelines.similarity import knn_brute

    emb = _emb(sf_dir)
    return _round6(knn_brute(emb, emb.limit(5), k=10), "sim")


def q_knn_ivf(sf_dir):
    from networkit_ray.pipelines.similarity import knn_ivf

    emb = _emb(sf_dir)
    return _round6(
        knn_ivf(emb, emb.limit(5), k=10, num_centroids=16, nprobe=4), "sim"
    )


def q_cosine_near_dups(sf_dir):
    from networkit_ray.pipelines.similarity import cosine_near_dup_pairs

    return _round6(cosine_near_dup_pairs(_emb(sf_dir), threshold=0.4), "sim")


def q_bfs_depths(sf_dir):
    """Undirected BFS depths on the customer-supplier graph from the
    minimum vid (depth -1 = unreached); capped at 30 rounds to mirror the
    recursive-CTE oracle's depth bound (graph diameter is far smaller).

    Also a carrier for PrunedLandmarkLabeling (r5): the ``pll_depth``
    column serves source->v for EVERY vertex from the 2-hop label index,
    and the oracle pins it equal to the BFS depth — the hash gate fails
    unless the whole labeling is a correct exact 2-hop cover."""
    from networkit_ray.pipelines.traversal import (
        bfs_depths,
        pll_distances,
        pruned_landmark_labels,
    )
    from networkit_ray.stages.graphops import vertices_from_edges

    edges = _edges(sf_dir)
    src = int(vertices_from_edges(edges).min("vid"))
    depths, _ = bfs_depths(
        edges, [src], num_partitions=P, undirected=True, max_depth=30
    )

    labels, _total = pruned_landmark_labels(edges, num_partitions=P)
    pairs = vertices_from_edges(edges).map_batches(
        lambda t, s=src: pa.table(
            {
                "source": pa.array(np.full(t.num_rows, s, np.int64)),
                "target": t["vid"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    served = pll_distances(labels, pairs).map_batches(
        lambda t: pa.table({"vid": t["target"], "pll_depth": t["dist"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    out = depths.join(served, join_type="inner", num_partitions=P, on=("vid",))
    return out.map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "depth": t["depth"], "pll_depth": t["pll_depth"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_partition_compare(sf_dir):
    """NMI / ARI / Rand / Jaccard between PLP labelings at 2 vs 5
    iterations (161 vs 2 communities at sf0.01 — both non-degenerate)."""
    from networkit_ray.pipelines.community import compare_partitions
    from networkit_ray.pipelines.labelprop import label_propagation

    edges = _edges(sf_dir)
    lb, _, la = label_propagation(
        edges,
        fixed_iters=PLP_ITERS,
        num_partitions=P,
        engine="actor",
        snapshot_at=2,
    )
    out = compare_partitions(la, lb, num_partitions=P)
    for c in ("nmi", "ari", "rand", "jaccard"):
        out = _round6(out, c)
    return out


def _forest_component_sizes(forest, sf_dir):
    """Forest edges -> (label, n_edges) per component, label = min vid."""
    from networkit_ray.pipelines.components import connected_components

    labels, _ = connected_components(forest, num_partitions=P)
    j = forest.join(
        labels,
        join_type="inner",
        num_partitions=P,
        on=("src",),
        right_on=("vid",),
    )
    out = (
        j.map_batches(
            lambda t: pa.table({"label": t["label"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("label", num_partitions=P)
        .count()
    )
    return out.map_batches(
        lambda t: pa.table(
            {"label": t["label"], "n_edges": pc.cast(t["count()"], pa.int64())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_spanning_forest(sf_dir):
    """Minimum spanning forest (Boruvka) of the customer-supplier graph;
    returns per-component (label=min vid, n_edges) — a spanning forest has
    exactly size-1 edges per component, which the recursive-CC SQL oracle
    value-checks."""
    from networkit_ray.pipelines.spanning import spanning_forest

    forest = spanning_forest(_edges(sf_dir), num_partitions=P).materialize()
    return _forest_component_sizes(forest, sf_dir)


def q_random_msf(sf_dir):
    """RandomMaximumSpanningForest: maximum forest under deterministic
    counter-hash edge weights; same (label, n_edges) invariant — the SQL
    oracle proves the output IS a spanning forest of every component."""
    from networkit_ray.pipelines.spanning import random_maximum_spanning_forest

    forest = random_maximum_spanning_forest(
        _edges(sf_dir), seed=7, num_partitions=P
    ).materialize()
    return _forest_component_sizes(forest, sf_dir)


def q_graph_matching(sf_dir):
    """Locally-dominant 1/2-approx maximum weight matching of the
    customer-supplier graph (reference matching/LocalMaxMatcher).  The
    fixpoint is iterative-removal-defined — not SQL-expressible; validity/
    maximality/approximation oracles live in tests/test_matching.py."""
    from networkit_ray.pipelines.matching import local_max_matching

    out = local_max_matching(_edges(sf_dir), num_partitions=P)
    return _round6(out, "w")


def q_matching_check(sf_dir):
    """Value-checkable slice of the matching contract (companion to the
    rows-only graph_matching, same pattern as luby_check): counts of
    (a) matched pairs that are not graph edges, (b) vertices in >1 matched
    edge, (c) maximality violations (graph edges with BOTH endpoints
    unmatched).  All three are invariants of ANY correct maximal matching;
    the SQL oracle pins them to 0, so the hash gate fails unless the
    returned matching is valid and maximal."""
    from networkit_ray.pipelines.matching import local_max_matching
    from networkit_ray.stages.graphops import canonicalize_undirected

    canon = canonicalize_undirected(_edges(sf_dir), weight="max").materialize()
    m = local_max_matching(canon, num_partitions=P).materialize()

    ends = m.map_batches(
        lambda t: pa.table(
            {
                "vid": pa.concat_arrays(
                    [
                        t["src"].combine_chunks().cast(pa.int64()),
                        t["dst"].combine_chunks().cast(pa.int64()),
                    ]
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    percnt = ends.groupby("vid", num_partitions=P).count()
    vertex_reuse = int(
        percnt.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [
                            int(
                                (
                                    t["count()"]
                                    .combine_chunks()
                                    .to_numpy(zero_copy_only=False)
                                    > 1
                                ).sum()
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("n")
        or 0
    )

    flag = m.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "in_m": pa.array(np.ones(t.num_rows, np.int8))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    joined = canon.join(
        flag,
        join_type="left_outer",
        num_partitions=P,
        on=("src", "dst"),
    ).materialize()
    nonedges = int(m.count()) - int(
        joined.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [int(pc.sum(pc.is_valid(t["in_m"])).as_py() or 0)],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("n")
        or 0
    )

    mv = percnt.select_columns(["vid"]).map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "mm": pa.array(np.ones(t.num_rows, np.int8))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    both = (
        canon.join(mv, join_type="left_outer", num_partitions=P, on=("src",), right_on=("vid",))
        .map_batches(
            lambda t: pa.table({"dst": t["dst"], "mm_s": t["mm"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .join(mv, join_type="left_outer", num_partitions=P, on=("dst",), right_on=("vid",))
    )
    not_maximal = int(
        both.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [
                            int(
                                pc.sum(
                                    pc.and_(
                                        pc.is_null(t["mm_s"]), pc.is_null(t["mm"])
                                    )
                                ).as_py()
                                or 0
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("n")
        or 0
    )

    # --- b-matching (b=2) invariants, same contract family (r5): any
    # correct maximal 2-matching has zero non-edges, zero vertices with
    # more than b matched edges, and zero unmatched graph edges whose
    # endpoints are BOTH unsaturated ---
    from networkit_ray.pipelines.matching import b_matching

    m2 = b_matching(_edges(sf_dir), b=2, num_partitions=P).materialize()
    ends2 = m2.map_batches(
        lambda t: pa.table(
            {
                "vid": pa.concat_arrays(
                    [
                        t["src"].combine_chunks().cast(pa.int64()),
                        t["dst"].combine_chunks().cast(pa.int64()),
                    ]
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cnt2 = ends2.groupby("vid", num_partitions=P).count().materialize()

    def _overcap(t: pa.Table) -> pa.Table:
        c = t["count()"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int((c > 2).sum())], pa.int64())})

    b2_overcap = int(
        cnt2.map_batches(_overcap, batch_format="pyarrow", zero_copy_batch=True).sum("n")
        or 0
    )

    flag2 = m2.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "in_m": pa.array(np.ones(t.num_rows, np.int8))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    joined2 = canon.join(
        flag2, join_type="left_outer", num_partitions=P, on=("src", "dst")
    ).materialize()

    def _valid_sum(t: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array([int(pc.sum(pc.is_valid(t["in_m"])).as_py() or 0)], pa.int64())}
        )

    b2_nonedges = int(m2.count()) - int(
        joined2.map_batches(_valid_sum, batch_format="pyarrow", zero_copy_batch=True).sum("n")
        or 0
    )

    def _sat2(t: pa.Table) -> pa.Table:
        c = t["count()"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = c >= 2
        return pa.table(
            {
                "vid": pa.array(v[keep], pa.int64()),
                "mm": pa.array(np.ones(int(keep.sum()), np.int8)),
            }
        )

    sat2 = cnt2.map_batches(_sat2, batch_format="pyarrow", zero_copy_batch=True).materialize()
    unmatched2 = joined2.map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["dst"], "flag": t["in_m"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if sat2.count() == 0:
        b2_not_maximal = int(
            unmatched2.map_batches(
                lambda t: pa.table(
                    {"n": pa.array([int(pc.sum(pc.is_null(t["flag"])).as_py() or 0)], pa.int64())}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).sum("n")
            or 0
        )
    else:
        both2 = (
            unmatched2.join(
                sat2, join_type="left_outer", num_partitions=P, on=("src",), right_on=("vid",)
            )
            .map_batches(
                lambda t: pa.table({"dst": t["dst"], "flag": t["flag"], "mm_s": t["mm"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .join(
                sat2, join_type="left_outer", num_partitions=P, on=("dst",), right_on=("vid",)
            )
        )
        b2_not_maximal = int(
            both2.map_batches(
                lambda t: pa.table(
                    {
                        "n": pa.array(
                            [
                                int(
                                    pc.sum(
                                        pc.and_(
                                            pc.is_null(t["flag"]),
                                            pc.and_(pc.is_null(t["mm_s"]), pc.is_null(t["mm"])),
                                        )
                                    ).as_py()
                                    or 0
                                )
                            ],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).sum("n")
            or 0
        )

    # --- PathGrowingMatcher invariants (r5): a valid matching (no vertex
    # reuse, only real graph edges) and the per-path-DP variant weighing
    # at least the base alternating variant — all SQL-pinned to 0 ---
    from networkit_ray.pipelines.matching import path_growing_matching

    pgm = path_growing_matching(_edges(sf_dir))
    pgm_alt = path_growing_matching(_edges(sf_dir), variant="alternate")
    pends = np.concatenate(
        [
            pgm["src"].combine_chunks().to_numpy(zero_copy_only=False),
            pgm["dst"].combine_chunks().to_numpy(zero_copy_only=False),
        ]
    )
    pgm_vertex_reuse = int(len(pends) - len(np.unique(pends)))
    pgm_dp_lt_alt = int(
        float(pc.sum(pgm["w"]).as_py() or 0.0)
        < float(pc.sum(pgm_alt["w"]).as_py() or 0.0) - 1e-9
    )

    import ray.data

    pflag = ray.data.from_arrow(
        pa.table(
            {
                "src": pgm["src"],
                "dst": pgm["dst"],
                "in_m": pa.array(np.ones(pgm.num_rows, np.int8)),
            }
        )
    ).materialize()
    pjoined = canon.join(
        pflag, join_type="left_outer", num_partitions=P, on=("src", "dst")
    )
    pgm_nonedges = int(pgm.num_rows) - int(
        pjoined.map_batches(
            _valid_sum, batch_format="pyarrow", zero_copy_batch=True
        ).sum("n")
        or 0
    )

    return ray.data.from_arrow(
        pa.table(
            {
                "nonedges": pa.array([nonedges], pa.int64()),
                "not_maximal": pa.array([not_maximal], pa.int64()),
                "vertex_reuse": pa.array([vertex_reuse], pa.int64()),
                "b2_nonedges": pa.array([b2_nonedges], pa.int64()),
                "b2_overcap": pa.array([b2_overcap], pa.int64()),
                "b2_not_maximal": pa.array([b2_not_maximal], pa.int64()),
                "pgm_nonedges": pa.array([pgm_nonedges], pa.int64()),
                "pgm_vertex_reuse": pa.array([pgm_vertex_reuse], pa.int64()),
                "pgm_dp_lt_alt": pa.array([pgm_dp_lt_alt], pa.int64()),
            }
        )
    )


def q_edge_switch_degrees(sf_dir):
    """Degree-preservation contract of the edge-switching null model: the
    randomized graph's per-vertex degrees must hash-equal the ORIGINAL
    graph's degrees, which the SQL oracle computes directly (the rewired
    edge set itself is hash-random -> invariant-checked, not row-checked;
    simplicity/mixing oracles in tests/test_randomization.py)."""
    from networkit_ray.pipelines.randomization import edge_switching
    from networkit_ray.stages.graphops import symmetrize

    rnd = edge_switching(
        _edges(sf_dir), rounds=2, seed=11, num_partitions=P
    ).materialize()
    return (
        symmetrize(rnd)
        .groupby("src", num_partitions=P)
        .count()
        .map_batches(
            lambda t: pa.table(
                {"vid": t["src"], "deg": pc.cast(t["count()"], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def q_degree_shuffle_degrees(sf_dir):
    """Identity contract of DegreePreservingShuffle: node ids permute only
    WITHIN equal-degree classes, so the shuffled graph's per-vertex degree
    table is bit-identical to the original's — which the degree-centrality
    SQL oracle computes on the un-shuffled graph.  Bijectivity/isomorphism
    oracles live in tests/test_randomization.py."""
    from networkit_ray.pipelines.centrality import degree_centrality
    from networkit_ray.pipelines.randomization import degree_preserving_shuffle

    rnd = degree_preserving_shuffle(
        _supplier_edges(sf_dir), seed=13, num_partitions=P
    ).materialize()
    return degree_centrality(rnd, _suppliers(sf_dir), num_partitions=P)


_EDGE_SWITCH_DEG_SQL = """
WITH edges AS ({edges}),
ue AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
SELECT src AS vid, COUNT(*) AS deg FROM ue GROUP BY 1
"""


def q_maximal_cliques(sf_dir):
    """Maximal cliques of the supplier co-purchase graph (ELS-shaped:
    oriented-neighborhood Bron–Kerbosch + distributed maximality filter).
    Clique enumeration is not SQL-expressible on general graphs ->
    rows-only; networkx-exact oracles in tests/test_cliques.py."""
    from networkit_ray.pipelines.cliques import maximal_cliques

    return maximal_cliques(_supplier_edges(sf_dir), num_partitions=P)


def q_cliques_bipartite(sf_dir):
    """Degenerate-case value check: the customer-supplier graph is
    bipartite (triangle-free), so its maximal cliques are EXACTLY its
    edges — the full pipeline (orientation, BK, maximality filter) is
    hash-checked against the edge list."""
    from networkit_ray.pipelines.cliques import maximal_cliques

    return maximal_cliques(_edges(sf_dir), num_partitions=P)


def q_gen_ws_ring(sf_dir):
    """Watts–Strogatz generator, p=0 path: the exact ring lattice is a
    closed-form SQL-checkable contract of the counter-based generator
    (the rewired path is hash-random; its invariants live in pytest)."""
    from networkit_ray.sources.generators import watts_strogatz_edges

    return watts_strogatz_edges(500, 6, 0.0, seed=2, parallelism=P)


_WS_RING_SQL = """
SELECT CAST(i // 3 AS BIGINT) AS src,
       CAST((i // 3 + i % 3 + 1) % 500 AS BIGINT) AS dst,
       1.0 AS w
FROM generate_series(0, 1499) t(i)
"""


def q_bicc_edges(sf_dir):
    """Biconnected components (Tarjan–Vishkin): every canonical edge of
    the customer-supplier graph labeled by its BCC.  Not SQL-expressible
    (spanning tree + Euler tour + auxiliary-graph CC); exact networkx
    oracles live in tests/test_biconnectivity.py."""
    from networkit_ray.pipelines.biconnectivity import biconnected_components

    return biconnected_components(_edges(sf_dir), num_partitions=P)


def q_articulation_check(sf_dir):
    """For the 20 highest-degree vertices (ties -> smaller vid): is the
    vertex an articulation point?  SQL oracle re-derives each answer by
    recursive reachability that avoids the candidate."""
    from networkit_ray.pipelines.biconnectivity import (
        articulation_points,
        biconnected_components,
    )
    from networkit_ray.stages.graphops import canonicalize_undirected, symmetrize

    edges = _edges(sf_dir)
    canon = canonicalize_undirected(edges, weight="one").materialize()
    deg = (
        symmetrize(canon)
        .groupby("src", num_partitions=P)
        .count()
        .map_batches(
            lambda t: pa.table(
                {"src": t["src"], "deg": pc.cast(t["count()"], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    top = deg.sort(["deg", "src"], descending=[True, False]).limit(20).materialize()
    bcc = biconnected_components(canon, num_partitions=P).materialize()
    aps = (
        articulation_points(bcc_edges=bcc, num_partitions=P)
        .map_batches(
            lambda t: pa.table(
                {"avid": t["vid"], "isap": pa.array(np.ones(t.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    if aps.count() == 0:  # empty join sides crash Ray 2.49 (compat.py)
        return top.map_batches(
            lambda t: pa.table(
                {
                    "vid": t["src"],
                    "is_articulation": pa.array(np.zeros(t.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    j = top.join(
        aps, join_type="left_outer", num_partitions=P, on=("src",),
        right_on=("avid",),
    )
    return j.map_batches(
        lambda t: pa.table(
            {
                "vid": t["src"],
                "is_articulation": pc.fill_null(t["isap"], 0),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_sssp_weighted(sf_dir):
    """Weighted shortest paths (delta-stepping) on the customer-supplier
    graph from the minimum vid; parallel edges collapse to min weight.
    Weights are lineitem counts (small ints), so the DuckDB oracle's
    bounded-dist recursive CTE stays tractable (true max dist is 4 at
    sf0.01; the cap of 12 is slack, not binding).

    A* rider (driver-value-checks `astar_distance`, SURVEY §2.3
    distance/AStar): the point-to-point A* distance min-vid -> max
    reachable vid is appended as a constant `astar_dist` column; the SQL
    oracle pins it to the recursive-CTE dist of that same target, so the
    gate fails unless A*'s early-stopped bucket order settles the target
    at the true shortest distance.  (The Johnson-potential heuristic path
    is pytest-checked against networkx in tests/test_landmarks.py.)"""
    from networkit_ray.pipelines.traversal import astar_distance, sssp_weighted
    from networkit_ray.stages.graphops import vertices_from_edges

    edges = _edges(sf_dir)
    src = vertices_from_edges(edges).min("vid")
    dist, _ = sssp_weighted(edges, [int(src)], num_partitions=P, undirected=True)
    dist = dist.materialize()
    target = int(dist.max("vid"))
    ad, _ = astar_distance(
        edges, int(src), target, num_partitions=P, undirected=True
    )
    a_val = float(ad.take_all()[0]["dist"])

    def attach(t: pa.Table) -> pa.Table:
        return t.append_column(
            "astar_dist", pa.array(np.full(len(t), a_val, dtype=np.float64))
        )

    return dist.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def q_closeness(sf_dir):
    """Exact closeness for the 4 smallest-vid suppliers of the co-part
    graph (sampled-source closeness; one graph build, one BFS per source)."""
    from networkit_ray.pipelines.traversal import closeness_sampled

    out = closeness_sampled(
        _supplier_edges(sf_dir), n_sources=4, num_partitions=P, undirected=True
    )
    return _round6(_round6(out, "closeness"), "harmonic")


def q_eigenvector(sf_dir):
    from networkit_ray.pipelines.centrality import eigenvector_centrality
    from networkit_ray.stages.graphops import symmetrize

    out = eigenvector_centrality(
        symmetrize(_edges(sf_dir)), iters=10, num_partitions=P
    )
    return _round6(out, "x")


def q_kcore(sf_dir):
    from networkit_ray.pipelines.structure import kcore_membership

    # no max_rounds: peel to the exact fixpoint (the SQL oracle iterates a
    # fixed 30 rounds, idempotent past the fixpoint)
    return kcore_membership(
        _supplier_edges(sf_dir), _suppliers(sf_dir), k=3, num_partitions=P
    )


def q_assortativity(sf_dir):
    from networkit_ray.pipelines.structure import degree_assortativity

    return _round6(
        degree_assortativity(_supplier_edges(sf_dir), num_partitions=P),
        "assortativity",
    )


def q_edge_triangle_scores(sf_dir):
    from networkit_ray.pipelines.structure import edge_triangle_scores

    return _round6(
        edge_triangle_scores(_supplier_edges(sf_dir), num_partitions=P), "score"
    )


def q_laplacian_centrality(sf_dir):
    from networkit_ray.pipelines.centrality import laplacian_centrality

    return laplacian_centrality(
        _supplier_edges(sf_dir), _suppliers(sf_dir), num_partitions=P
    )


def q_sfigality(sf_dir):
    from networkit_ray.pipelines.centrality import sfigality

    return _round6(
        sfigality(_supplier_edges(sf_dir), _suppliers(sf_dir), num_partitions=P),
        "sfigality",
    )


def q_scan_scores(sf_dir):
    from networkit_ray.pipelines.structure import scan_similarity_scores

    return _round6(
        scan_similarity_scores(_supplier_edges(sf_dir), num_partitions=P), "score"
    )


def q_local_degree_scores(sf_dir):
    from networkit_ray.pipelines.structure import local_degree_scores

    return _round6(
        local_degree_scores(_supplier_edges(sf_dir), num_partitions=P), "score"
    )


def _order_chain_edges(sf_dir):
    """Per-customer consecutive-order chains (ordered by o_orderdate then
    o_orderkey) as a DAG over o_orderkey vertices: the next pointer is the
    MIN composite key greater than mine among my customer's orders —
    a custkey self-join + one pre-combined min groupby, no per-group loop.
    Composite key = epoch_days * 10^7 + o_orderkey (asserted to fit)."""
    from ray.data.aggregate import Min

    from networkit_ray.sources.tables import read_table

    MUL = 10_000_000

    def keyed(t: pa.Table) -> pa.Table:
        # o_orderdate is timestamp[us] in the testdata; date32 also works
        micros = pc.cast(
            pc.cast(t["o_orderdate"], pa.timestamp("us")), pa.int64()
        ).combine_chunks().to_numpy(zero_copy_only=False)
        days = micros // 86_400_000_000
        okey = t["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        if okey.size and okey.max() >= MUL:
            raise ValueError("o_orderkey exceeds composite-key packing bound")
        return pa.table(
            {"cust": t["o_custkey"], "k": pa.array(days * MUL + okey)}
        )

    orders = (
        read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    pairs = orders.join(
        orders,
        join_type="inner",
        num_partitions=P,
        on=("cust",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def later(t: pa.Table) -> pa.Table:
        out = t.filter(pc.greater(t["k_b"], t["k_a"])).select(["k_a", "k_b"])
        # local pre-combine before the min shuffle
        return (
            out.group_by("k_a").aggregate([("k_b", "min")])
            .rename_columns(["k_a", "k_b"])
        )

    nxt = (
        pairs.map_batches(later, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k_a", num_partitions=P)
        .aggregate(Min("k_b", alias_name="k_b"))
    )
    def unpack(t: pa.Table) -> pa.Table:
        ka = t["k_a"].combine_chunks().to_numpy(zero_copy_only=False)
        kb = t["k_b"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": ka % MUL,
                "dst": kb % MUL,
                "w": np.ones(len(ka), dtype=np.float64),
            }
        )

    return nxt.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True)


def q_topological_levels(sf_dir):
    """Topological levels of the per-customer consecutive-order DAG —
    level(o) = position of the order in its customer's date-ordered chain
    (the SQL oracle is the equivalent window ROW_NUMBER)."""
    from networkit_ray.pipelines.traversal import topological_levels
    from networkit_ray.sources.tables import read_table

    verts = read_table(sf_dir, "orders", columns=["o_orderkey"]).map_batches(
        lambda t: pa.table({"vid": pc.cast(t["o_orderkey"], pa.int64())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    levels, _ = topological_levels(
        _order_chain_edges(sf_dir), vertices_ds=verts, num_partitions=P
    )
    return levels


def q_diameter(sf_dir):
    """Two-sweep diameter lower bound on the undirected customer-supplier
    graph (deterministic sweep: min vid, then farthest-tie-min)."""
    from networkit_ray.pipelines.traversal import diameter_bounds

    return diameter_bounds(_edges(sf_dir), num_partitions=P, undirected=True)


def q_partition_quality(sf_dir):
    """Coverage + edge cut of the PLP labeling on the customer-supplier
    graph (community quality measures beyond modularity)."""
    from networkit_ray.pipelines.community import partition_quality
    from networkit_ray.pipelines.labelprop import label_propagation

    edges = _edges(sf_dir)
    labels, _ = label_propagation(
        edges, fixed_iters=PLP_ITERS, num_partitions=P, engine="actor"
    )
    out = partition_quality(edges, labels, num_partitions=P)
    return _round6(_round6(out, "coverage"), "edge_cut")


def q_scc(sf_dir):
    """FW-BW-Trim strongly connected components on the DIRECTED
    customer-supplier graph (a bipartite DAG: all singletons, resolved by
    trimming alone — the trim/pivot machinery is exercised on cyclic
    digraphs in tests/)."""
    from networkit_ray.pipelines.components import strongly_connected_components

    labels, _stats = strongly_connected_components(_edges(sf_dir), num_partitions=P)
    return labels


def q_betweenness(sf_dir):
    """Sampled-source Brandes betweenness on the supplier co-part graph
    (4 deterministic sources, normalized by n/|sample|; the dependency
    accumulation is not SQL-expressible -> rows-only driver check; exact
    pure-Python Brandes oracle in tests/)."""
    from networkit_ray.pipelines.traversal import approx_betweenness

    out = approx_betweenness(
        _supplier_edges(sf_dir), n_sources=4, num_partitions=P, undirected=True
    )
    return _round6(out, "betweenness")


def q_louvain(sf_dir):
    """PLM/Louvain communities on the customer-supplier graph (labels are
    algorithm-defined, not SQL-expressible -> rows-only driver check;
    modularity-quality + determinism oracles live in tests/)."""
    from networkit_ray.pipelines.community import louvain

    return louvain(
        _edges(sf_dir), num_partitions=P, max_levels=2, move_rounds=2, colors=4
    )


def q_luby_mis(sf_dir):
    """Deterministic Luby maximal independent set on the supplier co-part
    graph (hash priorities are not SQL-expressible -> rows-only driver
    check; independence/maximality/determinism oracles in tests/)."""
    from networkit_ray.pipelines.independent import luby_mis

    return luby_mis(_supplier_edges(sf_dir), _suppliers(sf_dir), num_partitions=P)


def q_louvain_quality(sf_dir):
    """Value-checkable slice of the Louvain contract: returns PLP's
    modularity (recomputed exactly by the SQL oracle) plus the flag
    q_ge_plp = [modularity(louvain labels) >= modularity(PLP labels)].
    The oracle pins the flag to 1, so the hash gate FAILS unless Louvain
    actually reaches at least PLP quality on this graph."""
    from networkit_ray.pipelines.community import louvain, modularity
    from networkit_ray.pipelines.labelprop import label_propagation

    edges = _edges(sf_dir)
    lab_l = louvain(
        edges, num_partitions=P, max_levels=2, move_rounds=2, colors=4
    )
    q_l = float(
        modularity(edges, lab_l, num_partitions=P).to_pandas()["modularity"][0]
    )
    lab_p, _ = label_propagation(
        edges, fixed_iters=PLP_ITERS, num_partitions=P, engine="actor"
    )
    q_p = float(
        modularity(edges, lab_p, num_partitions=P).to_pandas()["modularity"][0]
    )
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "q_plp": pa.array([np.floor(q_p * 1e6 + 0.5) / 1e6]),
                "q_ge_plp": pa.array(
                    [np.int64(1 if q_l >= q_p - 1e-9 else 0)]
                ),
            }
        )
    )


def q_leiden_check(sf_dir):
    """Value-checkable slice of the Leiden contract (community/
    ParallelLeiden): q_plp (recomputed exactly by the SQL oracle),
    q_ge_plp = [modularity(leiden) >= modularity(PLP)] pinned to 1, and
    disconnected_comms — the count of returned communities whose induced
    subgraph is NOT connected — pinned to 0 (the Leiden guarantee; checked
    distributed by running the engine's own CC over intra-community edges
    and counting communities spanning >1 component)."""
    from networkit_ray.pipelines.community import leiden, modularity
    from networkit_ray.pipelines.components import connected_components
    from networkit_ray.pipelines.labelprop import label_propagation
    from networkit_ray.stages.graphops import canonicalize_undirected

    edges = _edges(sf_dir)
    lab = leiden(
        edges, num_partitions=P, max_levels=2, move_rounds=2,
        refine_rounds=2, colors=4,
    ).materialize()
    q_l = float(
        modularity(edges, lab, num_partitions=P).to_pandas()["modularity"][0]
    )
    lab_p, _ = label_propagation(
        edges, fixed_iters=PLP_ITERS, num_partitions=P, engine="actor"
    )
    q_p = float(
        modularity(edges, lab_p, num_partitions=P).to_pandas()["modularity"][0]
    )

    # intra-community edges of the leiden labeling
    canon = canonicalize_undirected(edges, weight="one").materialize()
    lr = lab.map_batches(
        lambda t: pa.table({"lvid": t["vid"], "lcomm": t["label"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    intra = (
        canon.join(
            lr, join_type="inner", num_partitions=P, on=("src",),
            right_on=("lvid",),
        )
        .map_batches(
            lambda t: pa.table(
                {"src": t["src"], "dst": t["dst"], "w": t["w"], "cs": t["lcomm"]}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .join(
            lr, join_type="inner", num_partitions=P, on=("dst",),
            right_on=("lvid",),
        )
        .map_batches(
            lambda t: pa.table(
                {"src": t["src"], "dst": t["dst"], "w": t["w"]}
            ).filter(pc.equal(t["cs"], t["lcomm"]).combine_chunks()),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    cc, _ = connected_components(
        intra,
        vertices_ds=lab.select_columns(["vid"]),
        num_partitions=P,
        engine="actor",
    )
    ccr = cc.map_batches(
        lambda t: pa.table({"vid": t["vid"], "cclab": t["label"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pieces = (
        lab.join(ccr, join_type="inner", num_partitions=P, on=("vid",))
        .groupby(["label", "cclab"], num_partitions=P)
        .count()
        .groupby("label", num_partitions=P)
        .count()
    )
    disconnected = int(
        pieces.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [
                            int(
                                (
                                    t["count()"]
                                    .combine_chunks()
                                    .to_numpy(zero_copy_only=False)
                                    > 1
                                ).sum()
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("n")
        or 0
    )

    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "q_plp": pa.array([np.floor(q_p * 1e6 + 0.5) / 1e6]),
                "q_ge_plp": pa.array([np.int64(1 if q_l >= q_p - 1e-9 else 0)]),
                "disconnected_comms": pa.array([np.int64(disconnected)]),
            }
        )
    )


def q_luby_check(sf_dir):
    """Value-checkable slice of the Luby MIS contract: counts of
    independence violations (edges inside the set) and uncovered vertices
    (outside the set with no neighbor inside).  The SQL oracle pins both
    to 0 — the hash gate FAILS unless the returned set is a true maximal
    independent set."""
    from networkit_ray.pipelines.independent import luby_mis
    from networkit_ray.stages.graphops import canonicalize_undirected, symmetrize

    edges = _supplier_edges(sf_dir)
    mis = luby_mis(edges, _suppliers(sf_dir), num_partitions=P).materialize()
    inset_s = mis.map_batches(
        lambda t: pa.table(
            {"msv": t["vid"], "ins_s": pa.array(np.ones(t.num_rows, np.int8))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    inset_d = mis.map_batches(
        lambda t: pa.table(
            {"mdv": t["vid"], "ins_d": pa.array(np.ones(t.num_rows, np.int8))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    sym = symmetrize(canonicalize_undirected(edges, weight="one")).materialize()
    j = sym.join(
        inset_s, join_type="inner", num_partitions=P, on=("src",),
        right_on=("msv",),
    ).map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    viol = (
        j.join(inset_d, join_type="inner", num_partitions=P, on=("dst",),
               right_on=("mdv",)).count()
        if j.count() > 0
        else 0
    )
    covered = (
        sym.join(
            inset_d, join_type="inner", num_partitions=P, on=("dst",),
            right_on=("mdv",),
        )
        .map_batches(
            lambda t: pa.table({"cv": t["src"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .union(mis.map_batches(
            lambda t: pa.table({"cv": t["vid"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ))
        .groupby("cv", num_partitions=P)
        .count()
    )
    n_cov = covered.count()
    n_all = _suppliers(sf_dir).count()
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "indep_violations": pa.array([np.int64(viol)]),
                "uncovered": pa.array([np.int64(n_all - n_cov)]),
            }
        )
    )


def q_random_walks(sf_dir):
    """Uniform random-walk corpus (deepwalk phase) on the supplier co-part
    graph — deterministic min-hash neighbor draws; not SQL-expressible ->
    rows-only driver check; validity/determinism oracles in tests/."""
    from networkit_ray.pipelines.walks import random_walks
    from networkit_ray.stages.graphops import symmetrize

    return random_walks(
        symmetrize(_supplier_edges(sf_dir)),
        walk_length=5,
        walks_per_node=1,
        num_partitions=P,
    )


def q_anf_sketch(sf_dir):
    """ANF neighborhood-function estimates on the supplier co-part graph
    (sketch values -> rows-only driver check; value oracle in tests/)."""
    from networkit_ray.pipelines.traversal import neighborhood_function

    ds, _eff = neighborhood_function(
        _supplier_edges(sf_dir), max_dist=4, registers=32, num_partitions=P
    )
    return ds


def q_corpus_extract(sf_dir):
    """North-star pipeline head on the synthetic corpus (input-hint shape):
    generate -> sha256 -> extract -> count edges per (src,dst) repo pair."""
    from networkit_ray.sources.corpus import corpus_dataset
    from networkit_ray.stages.extract import extract_edges
    from networkit_ray.stages.sha256 import with_sha256

    corpus = with_sha256(corpus_dataset(num_repos=100, seed=42, parallelism=4))
    ek = extract_edges(corpus, level="repo")
    counted = ek.groupby(["src_key", "dst_key"], num_partitions=P).count()
    return counted.map_batches(
        lambda t: pa.table(
            {"src_key": t["src_key"], "dst_key": t["dst_key"], "n": t["count()"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_corpus_pagerank(sf_dir):
    """Full north-star pipeline: corpus -> extract -> hashed vids -> dedup
    -> PageRank (actor engine) -> scores joined back to repo keys."""
    from networkit_ray.pipelines.pagerank import pagerank
    from networkit_ray.sources.corpus import corpus_dataset
    from networkit_ray.stages.extract import extract_edges
    from networkit_ray.stages.graphops import dedup_edges
    from networkit_ray.stages.ids import edge_keys_to_edges, vertex_table

    corpus = corpus_dataset(num_repos=100, seed=42, parallelism=4)
    ek = extract_edges(corpus, level="repo")
    edges = dedup_edges(edge_keys_to_edges(ek), weight="sum")
    verts = vertex_table(ek)
    scores, _ = pagerank(edges, verts, fixed_iters=PR_ITERS, num_partitions=P, engine="actor")
    out = scores.join(
        verts.materialize(), join_type="inner", num_partitions=P, on=("vid",)
    ).map_batches(
        # explicit projection: Ray 2.49 mis-plans Projects on join outputs
        lambda t: pa.table({"key": t["key"], "score": t["score"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _round6(out, "score")


def q_ppr_seed(sf_dir):
    """Personalized PageRank from one seed vertex (the PPR phase of the
    reference's scd/PageRankNibble): fixed-iteration power recursion over
    the undirected customer-supplier graph, SQL-mirrored (katz pattern)."""
    from networkit_ray.pipelines.scd import personalized_pagerank

    out = personalized_pagerank(
        _edges(sf_dir), seed_vid=1, alpha=0.15, iters=10, num_partitions=P
    )
    return _round6(out, "ppr")


def q_hits(sf_dir):
    """HITS hubs/authorities on the directed weighted customer->supplier
    edge table (centrality/HITS): fixed mutual power iterations, end-only
    L2 normalization, SQL-mirrored via unrolled chained CTEs."""
    from networkit_ray.pipelines.centrality import hits

    out = hits(_edges(sf_dir), iters=5, num_partitions=P)
    return _round6(_round6(out, "auth"), "hub")


def q_pagerank_nibble(sf_dir):
    """Seeded sweep-cut community (scd/PageRankNibble). Membership near the
    cut boundary is FP-tie-order-defined for automorphic vertices -> rows-only
    driver check; the sweep-optimality value oracle is tests/test_scd.py."""
    from networkit_ray.pipelines.scd import pagerank_nibble

    members, phi = pagerank_nibble(
        _edges(sf_dir), seed_vid=1, alpha=0.15, iters=10, max_size=50,
        num_partitions=P,
    )
    phi_r = float(np.floor(phi * 1e6 + 0.5) / 1e6)
    return members.map_batches(
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "phi": pa.array(np.full(t.num_rows, phi_r)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# --------------------------------------------------------------------------
# round-4 queries: exact distance suite on a closed-form fixture graph,
# link-prediction evaluation, walk validity, SNAP roundtrip
# --------------------------------------------------------------------------

FIX_N, FIX_C = 97, 7  # ring + sparse chords: asymmetric, diameter 16
FIX_K = 20  # unrolled walk levels in the SQL oracle (> diameter)


def _fixture_edges():
    """Deterministic ring+sparse-chords graph, SQL-closed-form: edges
    (i, i+1 mod N) for all i plus (i, i+C mod N) for i % 3 == 0 — NOT
    vertex-transitive, so betweenness/closeness vary across vertices."""
    import ray.data

    i = np.arange(FIX_N, dtype=np.int64)
    ring = np.stack([np.minimum(i, (i + 1) % FIX_N), np.maximum(i, (i + 1) % FIX_N)], 1)
    ci = i[i % 3 == 0]
    ch = np.stack(
        [np.minimum(ci, (ci + FIX_C) % FIX_N), np.maximum(ci, (ci + FIX_C) % FIX_N)], 1
    )
    e = np.unique(np.concatenate([ring, ch]), axis=0)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": e[:, 0],
                "dst": e[:, 1],
                "w": np.ones(len(e), dtype=np.float64),
            }
        )
    )


def q_betweenness_exact(sf_dir):
    """Exact all-sources Brandes betweenness (centrality/Betweenness) on
    the fixture graph, value-checked against the unrolled walk-count-CTE
    SQL oracle (sigma(s,v)*sigma(v,t)/sigma(s,t) pair sums) — carrier
    also joins exact per-vertex Eccentricity (distance/Eccentricity:
    MAX(d) + COUNT(*) per source over the same distance table) AND pins
    KadabraBetweenness (centrality/KadabraBetweenness, adaptive pair-
    sampling with the empirical-Bernstein stop): ``kadabra_ok`` asserts
    the fixed-seed KADABRA estimate is within eps=0.05 of the exact
    normalized value 2*betweenness/(n(n-1)) at EVERY vertex; the SQL
    oracle pins it TRUE."""
    from networkit_ray.pipelines.traversal import (
        betweenness_exact,
        eccentricity,
        kadabra_betweenness,
    )

    out = betweenness_exact(
        _fixture_edges(), num_partitions=P, undirected=True, batch=64
    )
    ecc = eccentricity(_fixture_edges(), num_partitions=P, batch=64)
    kad = kadabra_betweenness(
        _fixture_edges(),
        eps=0.05,
        delta=0.1,
        pairs_per_round=64,
        max_rounds=200,
        min_tau=512,
        seed=7,
        num_partitions=P,
    ).map_batches(
        lambda t: pa.table({"vid": t["vid"], "kadabra": t["betweenness"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    norm = 2.0 / (FIX_N * (FIX_N - 1))

    def attach(t: pa.Table) -> pa.Table:
        b = t["betweenness"].to_numpy(zero_copy_only=False)
        k = t["kadabra"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": t["vid"],
                "betweenness": t["betweenness"],
                "ecc": t["ecc"],
                "reached": t["reached"],
                "kadabra_ok": np.abs(k - b * norm) <= 0.05,
            }
        )

    joined = (
        out.join(ecc, join_type="inner", num_partitions=P, on=("vid",))
        .join(kad, join_type="inner", num_partitions=P, on=("vid",))
        .map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)
    )
    return _round6(joined, "betweenness")


def q_top_closeness(sf_dir):
    """Carrier for the farness family on the fixture graph: TopCloseness
    (k=10, degree-bound pruning; kind='topk', value=closeness) AND
    GroupCloseness (k=3 CELF-pruned exact greedy; kind='group_closeness',
    value=group farness after each pick).  The SQL oracle computes exact
    closenesses from the walk-CTE distance table for the top-10 and
    unrolls the identical 3-round greedy over LEAST()-folded distances."""
    from networkit_ray.pipelines.traversal import group_closeness, top_closeness

    top = top_closeness(
        _fixture_edges(), k=10, num_partitions=P, batch=64
    ).to_pandas()
    grp = group_closeness(
        _fixture_edges(), k=3, num_partitions=P, batch=64
    ).to_pandas()
    import ray.data

    tbl = pa.table(
        {
            "kind": pa.array(
                ["topk"] * len(top) + ["group_closeness"] * len(grp)
            ),
            "rank": pa.array(
                np.r_[
                    np.arange(len(top), dtype=np.int64),
                    grp["rank"].to_numpy(np.int64),
                ]
            ),
            "vid": pa.array(
                np.r_[
                    top["vid"].to_numpy(np.int64),
                    grp["vid"].to_numpy(np.int64),
                ]
            ),
            "value": pa.array(
                np.r_[
                    np.floor(top["closeness"].to_numpy() * 1e6 + 0.5) / 1e6,
                    grp["farness"].to_numpy(np.float64),
                ]
            ),
        }
    )
    return ray.data.from_arrow(tbl)


def q_hop_plot(sf_dir):
    """Exact hop plot / effective diameter (distance/EffectiveDiameter,
    HopPlotApproximation exact mode) on the fixture graph."""
    from networkit_ray.pipelines.traversal import hop_plot

    ds, _eff = hop_plot(_fixture_edges(), num_partitions=P, batch=64, q=0.9)
    return ds


def q_linkpred_auc(sf_dir):
    """Link-prediction evaluation harness (linkprediction/
    MissingLinksFinder + ROC/PR metrics): hash holdout, common-neighbor
    scores on the training graph, tie-averaged ROC-AUC + deterministic
    PR-AUC — every stage SQL-mirrored closed-form."""
    from networkit_ray.pipelines.linkpred import link_prediction_auc

    out = link_prediction_auc(
        _edges(sf_dir), holdout_mod=5, neg_per_vertex=8, seed=0,
        num_partitions=P,
    )
    return _round6(_round6(out, "auc_roc"), "auc_pr")


def q_walks_check(sf_dir):
    """Value-checkable contract of the BIASED node2vec walk corpus
    (embedding/Node2Vec): walk count and total rows are closed-form
    (symmetrized graph -> no sinks -> every walk completes), and every
    consecutive step must be a graph edge (invalid_transitions pinned 0
    by the SQL oracle).  The walk VALUES are hash-draw-defined ->
    distributional oracles live in tests/test_traversal_structure.py."""
    from networkit_ray.pipelines.walks import node2vec_walks
    from networkit_ray.stages.graphops import canonicalize_undirected, symmetrize

    sym = symmetrize(
        canonicalize_undirected(_edges(sf_dir), weight="one")
    ).materialize()
    walks = node2vec_walks(
        sym, walk_length=4, walks_per_node=1, p=0.5, q=2.0, seed=3,
        num_partitions=P,
    ).materialize()
    total = int(walks.count())
    n_walks = int(
        walks.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [int(pc.sum(pc.equal(t["step"], 0)).as_py() or 0)],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("n")
        or 0
    )
    nxt = walks.map_batches(
        lambda t: pa.table(
            {
                "walk_id": t["walk_id"],
                "step": pc.subtract(t["step"], 1),
                "nvid": t["vid"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    trans = walks.join(
        nxt, join_type="inner", num_partitions=P, on=("walk_id", "step")
    ).map_batches(
        lambda t: pa.table({"tv": t["vid"], "tn": t["nvid"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    flag = sym.map_batches(
        lambda t: pa.table(
            {
                "tv": t["src"],
                "tn": t["dst"],
                "ok": pa.array(np.ones(t.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    invalid = int(
        trans.join(flag, join_type="left_outer", num_partitions=P, on=("tv", "tn"))
        .map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [int(pc.sum(pc.is_null(t["ok"])).as_py() or 0)],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sum("n")
        or 0
    )
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "n_walks": pa.array([n_walks], pa.int64()),
                "total_rows": pa.array([total], pa.int64()),
                "invalid_transitions": pa.array([invalid], pa.int64()),
            }
        )
    )


def q_snap_roundtrip(sf_dir):
    """SNAP writer -> reader roundtrip identity (io/SNAPGraphReader):
    the customer-supplier edge pairs written as sharded SNAP text and
    streamed back must hash-equal the edge SQL."""
    import tempfile

    from networkit_ray.sources.io import read_snap, write_snap

    d = tempfile.mkdtemp(prefix="snaprt_", dir="/tmp")
    path = d + "/edges"
    write_snap(_edges(sf_dir), path)
    return read_snap(path).select_columns(["src", "dst"])


# --------------------------------------------------------------------------
# merged queries: one registry slot carries several operators so every
# SQL-oracled query fits in the driver's 50-slot correctness window
# --------------------------------------------------------------------------


def q_dynamic_replay(sf_dir):
    """DynConnectedComponents + DynBFS replay, joined on vid (one slot
    carries both dynamic operators; same per-op semantics as r3)."""
    cc = q_dynamic_cc_replay(sf_dir).map_batches(
        lambda t: pa.table({"vid": t["vid"], "cc_label": t["label"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    bf = q_dynamic_bfs_replay(sf_dir).materialize()
    return cc.join(bf, join_type="inner", num_partitions=P, on=("vid",)).map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "cc_label": t["cc_label"], "depth": t["depth"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_vertex_scores(sf_dir):
    """DegreeCentrality + LocalClusteringCoefficient + LaplacianCentrality
    + Sfigality on the supplier co-part graph, joined on vid."""
    out = q_degree_centrality(sf_dir).materialize()
    for other, col in (
        (q_local_clustering(sf_dir), "lcc"),
        (q_laplacian_centrality(sf_dir), "lc"),
        (q_sfigality(sf_dir), "sfigality"),
    ):
        prev_cols = out.schema().names
        out = out.join(
            other.materialize(), join_type="inner", num_partitions=P, on=("vid",)
        ).map_batches(
            lambda t, cols=prev_cols + [col]: pa.table(
                {c: t[c] for c in cols}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
    return out


def q_spectral_scores(sf_dir):
    """KatzCentrality + EigenvectorCentrality + HITS on the
    customer-supplier graph, joined on vid."""
    kz = q_katz(sf_dir).map_batches(
        lambda t: pa.table({"vid": t["vid"], "katz": t["x"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    ev = q_eigenvector(sf_dir).map_batches(
        lambda t: pa.table({"vid": t["vid"], "eigenvector": t["x"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    ht = q_hits(sf_dir).materialize()
    j = kz.join(ev, join_type="inner", num_partitions=P, on=("vid",)).map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "katz": t["katz"], "eigenvector": t["eigenvector"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    return j.join(ht, join_type="inner", num_partitions=P, on=("vid",)).map_batches(
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "katz": t["katz"],
                "eigenvector": t["eigenvector"],
                "auth": t["auth"],
                "hub": t["hub"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_edge_scores(sf_dir):
    """TriangleEdgeScore + SCANStructuralSimilarity + LocalDegreeScore +
    SimmelianOverlap + LocalSimilarity + PrefixJaccard on the supplier
    co-part graph, joined on (src, dst) — one carrier slot value-checks
    the whole sparsification/edgescores score family."""
    tri = q_edge_triangle_scores(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "cn": t["cn"],
                "triangle_score": t["score"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    sc = q_scan_scores(sf_dir).map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "scan_score": t["score"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    ld = q_local_degree_scores(sf_dir).map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "local_degree_score": t["score"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    from networkit_ray.pipelines.edgescores import prefix_jaccard_scores
    from networkit_ray.pipelines.structure import (
        local_similarity_scores,
        simmelian_overlap_scores,
    )

    pj = _round6(
        prefix_jaccard_scores(_supplier_edges(sf_dir), k=5, num_partitions=P),
        "score",
    ).map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "prefix_jaccard": t["score"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    sim = simmelian_overlap_scores(
        _supplier_edges(sf_dir), max_rank=5, num_partitions=P
    ).map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "simmelian_overlap": t["overlap"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    ls = _round6(
        local_similarity_scores(_supplier_edges(sf_dir), num_partitions=P), "score"
    ).map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "local_similarity_score": t["score"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    out = tri
    for other in (sc, ld, sim, ls, pj):
        prev_cols = out.schema().names
        new_col = [c for c in other.schema().names if c not in ("src", "dst")]
        out = out.join(
            other, join_type="inner", num_partitions=P, on=("src", "dst")
        ).map_batches(
            lambda t, cols=prev_cols + new_col: pa.table({c: t[c] for c in cols}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
    return out


def q_partition_metrics(sf_dir):
    """Coverage + EdgeCut + NMI/ARI/Rand/Jaccard in one row (both are
    1-row metric queries over PLP labelings), plus the
    LouvainMapEquation contract: its two-level codelength must beat BOTH
    trivial baselines (all-singletons and one-blob) — the SQL oracle pins
    both flags to 1, so the hash gate fails unless the map-equation
    optimizer actually compresses (community/LouvainMapEquation)."""
    import ray.data

    from networkit_ray.pipelines.community import (
        louvain_map_equation,
        map_equation_codelength,
    )
    from networkit_ray.stages.graphops import vertices_from_edges

    pq = q_partition_quality(sf_dir).to_pandas()
    pcm = q_partition_compare(sf_dir).to_pandas()

    edges = _edges(sf_dir)
    lab = louvain_map_equation(
        edges, num_partitions=P, max_levels=2, move_rounds=2, colors=2
    ).materialize()
    L_m = map_equation_codelength(edges, lab, num_partitions=P)
    verts = vertices_from_edges(edges)
    sing = verts.map_batches(
        lambda t: pa.table({"vid": t["vid"], "label": t["vid"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    one = verts.map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "label": pa.array(np.zeros(t.num_rows, np.int64))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    L_s = map_equation_codelength(edges, sing, num_partitions=P)
    L_1 = map_equation_codelength(edges, one, num_partitions=P)
    return ray.data.from_arrow(
        pa.table(
            {
                "coverage": pa.array([float(pq["coverage"][0])]),
                "edge_cut": pa.array([float(pq["edge_cut"][0])]),
                "nmi": pa.array([float(pcm["nmi"][0])]),
                "ari": pa.array([float(pcm["ari"][0])]),
                "rand": pa.array([float(pcm["rand"][0])]),
                "jaccard": pa.array([float(pcm["jaccard"][0])]),
                "mapeq_le_singletons": pa.array(
                    [np.int64(1 if L_m <= L_s + 1e-9 else 0)]
                ),
                "mapeq_le_oneblob": pa.array(
                    [np.int64(1 if L_m <= L_1 + 1e-9 else 0)]
                ),
            }
        )
    )


def q_spanning_forests(sf_dir):
    """SpanningForest + RandomMaximumSpanningForest per-component edge
    counts, joined on the component label (both must realize a spanning
    forest of every component — the SQL oracle derives the counts from
    connected-component sizes)."""
    sf = q_spanning_forest(sf_dir).materialize()
    rm = q_random_msf(sf_dir).map_batches(
        lambda t: pa.table({"label": t["label"], "n_edges_rand": t["n_edges"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    return sf.join(rm, join_type="inner", num_partitions=P, on=("label",)).map_batches(
        lambda t: pa.table(
            {
                "label": t["label"],
                "n_edges": t["n_edges"],
                "n_edges_rand": t["n_edges_rand"],
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _undirected_degrees(rnd_edges):
    from networkit_ray.stages.graphops import symmetrize

    return (
        symmetrize(rnd_edges)
        .groupby("src", num_partitions=P)
        .count()
        .map_batches(
            lambda t: pa.table(
                {"vid": t["src"], "deg": pc.cast(t["count()"], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def q_randomization_degrees(sf_dir):
    """Degree-preservation contracts of ALL THREE randomizers in one
    query: EdgeSwitching and GlobalCurveball preserve the per-vertex
    degree table of the customer-supplier graph EXACTLY; the
    DegreePreservingShuffle'd supplier graph keeps the original degree
    table.  The SQL oracle computes the original degrees directly."""
    from networkit_ray.pipelines.randomization import global_curveball

    def tag(ds, name):
        return ds.map_batches(
            lambda t, _n=name: pa.table(
                {
                    "method": pa.array([_n] * t.num_rows, pa.string()),
                    "vid": t["vid"],
                    "deg": t["deg"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    sw = tag(q_edge_switch_degrees(sf_dir), "switch")
    cb = tag(
        _undirected_degrees(
            global_curveball(_edges(sf_dir), rounds=2, seed=11, num_partitions=P)
        ),
        "curveball",
    )
    sh = tag(
        q_degree_shuffle_degrees(sf_dir).map_batches(
            lambda t: pa.table(
                {"vid": t["vid"], "deg": pc.cast(t["degree"], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "shuffle",
    )
    return sw.union(cb).union(sh)


def q_knn_search(sf_dir):
    """Brute-force + IVF ANN top-k in one slot, tagged by method."""

    def tag(ds, name):
        return ds.map_batches(
            lambda t, _n=name: pa.table(
                {
                    "method": pa.array([_n] * t.num_rows, pa.string()),
                    "query_id": t["query_id"],
                    "vec_id": t["vec_id"],
                    "sim": t["sim"],
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    return tag(q_knn_brute(sf_dir), "brute").union(tag(q_knn_ivf(sf_dir), "ivf"))


def entry() -> Any:
    """Flagship on sf0.001: build customer-supplier graph, PageRank via the
    BSP CSR actor engine, return the scored vertex table."""
    scores = q_pagerank("/root/testdata/sf0.001")
    return scores


def queries() -> dict[str, Callable[[str], Any]]:
    """EXACTLY 50 registered queries — the driver's correctness gate
    checks the first 50 registry slots, so every slot here gets a driver
    row every round: slots 1-45 are SQL-value-oracled, slots 46-50 are
    the only genuinely non-SQL-expressible pipelines (rows-only; their
    value oracles live in tests/, see FIXTURES.md §3).  Operators whose
    r3 queries were merged away keep full coverage through the carrier
    noted in SURVEY.md §2 (e.g. vertex_scores carries DegreeCentrality +
    LCC + LaplacianCentrality + Sfigality; randomization_degrees carries
    all three degree-preserving randomizers)."""
    return {
        "edges_build": q_edges_build,
        "degrees": q_degrees,
        "pagerank": q_pagerank,
        "pagerank_top20": q_pagerank_top20,
        "connected_components": q_connected_components,
        "label_propagation": q_label_propagation,
        "triangle_counts": q_triangles,
        "strongly_connected_components": q_scc,
        "topological_levels": q_topological_levels,
        "bfs_depths": q_bfs_depths,
        "sssp_weighted": q_sssp_weighted,
        "diameter_bounds": q_diameter,
        "closeness_sampled": q_closeness,
        "dynamic_replay": q_dynamic_replay,
        "vertex_scores": q_vertex_scores,
        "spectral_scores": q_spectral_scores,
        "betweenness_exact": q_betweenness_exact,
        "top_closeness": q_top_closeness,
        "hop_plot": q_hop_plot,
        "kcore_membership": q_kcore,
        "degree_assortativity": q_assortativity,
        "edge_scores": q_edge_scores,
        "modularity_plp": q_modularity,
        "louvain_quality": q_louvain_quality,
        "leiden_check": q_leiden_check,
        "partition_metrics": q_partition_metrics,
        "link_prediction": q_link_prediction,
        "linkpred_auc": q_linkpred_auc,
        "hopping_windows": q_hopping_windows,
        "session_windows": q_session_windows,
        "text_stats": q_text_stats,
        "exact_dedup": q_exact_dedup,
        "jaccard_similar_pairs": q_jaccard_pairs,
        "knn_search": q_knn_search,
        "cosine_near_dup_pairs": q_cosine_near_dups,
        "spanning_forests": q_spanning_forests,
        "articulation_check": q_articulation_check,
        "matching_check": q_matching_check,
        "luby_check": q_luby_check,
        "cliques_bipartite": q_cliques_bipartite,
        "randomization_degrees": q_randomization_degrees,
        "gen_ws_ring": q_gen_ws_ring,
        "walks_check": q_walks_check,
        "snap_roundtrip": q_snap_roundtrip,
        "ppr_seed": q_ppr_seed,
        # --- slots 46-50: algorithm-defined outputs, rows-only ---
        "minhash_dedup_groups": q_minhash_groups,
        "simhash_near_dups": q_simhash_near_dups,
        "fingerprints": q_fingerprints,
        "corpus_extract_edges": q_corpus_extract,
        "corpus_pagerank": q_corpus_pagerank,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_EDGES_SQL = f"""
SELECT o_custkey AS src, l_suppkey + {SUPPLIER_OFFSET} AS dst,
       CAST(COUNT(*) AS DOUBLE) AS w
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""

_GRAPH_PRELUDE = f"""
WITH RECURSIVE
edges AS ({_EDGES_SQL}),
verts AS (SELECT DISTINCT src AS vid FROM edges
          UNION SELECT DISTINCT dst FROM edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
wdeg AS (SELECT src AS vid, SUM(w) AS wd FROM edges GROUP BY 1)
"""


def _pagerank_sql(iters: int) -> str:
    return (
        _GRAPH_PRELUDE
        + f""",
trans AS (
  -- real transitions + dangling uniform fan-out + zero-weight self loops
  -- (the self loops guarantee every vertex receives >=1 message per
  -- iteration, so the recursion carries all vertices without a second
  -- reference to the recursive table)
  SELECT e.src, e.dst, e.w / d.wd AS frac
  FROM edges e JOIN wdeg d ON e.src = d.vid
  UNION ALL
  SELECT dg.vid AS src, v.vid AS dst, 1.0 / (SELECT n FROM nn) AS frac
  FROM (SELECT v2.vid FROM verts v2 LEFT JOIN wdeg d2 ON v2.vid = d2.vid
        WHERE d2.vid IS NULL) dg
  CROSS JOIN verts v
  UNION ALL
  SELECT vid, vid, 0.0 FROM verts
),
pr AS (
  SELECT 0 AS iter, vid, 1.0 / (SELECT n FROM nn) AS score FROM verts
  UNION ALL
  SELECT c.iter + 1, c.vid,
         0.15 / (SELECT n FROM nn) + 0.85 * c.c
  FROM (
    SELECT p.iter AS iter, t.dst AS vid, SUM(p.score * t.frac) AS c
    FROM pr p JOIN trans t ON p.vid = t.src
    WHERE p.iter < {iters}
    GROUP BY 1, 2
  ) c
)
SELECT vid, FLOOR(score * 1000000 + 0.5) / 1000000.0 AS score
FROM pr WHERE iter = {iters}
"""
    )


_CC_SQL = (
    _GRAPH_PRELUDE
    + """,
ue AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
reach AS (
  SELECT vid, vid AS root FROM verts
  UNION
  SELECT ue.dst AS vid, r.root
  FROM reach r JOIN ue ON ue.src = r.vid
)
SELECT vid, MIN(root) AS label FROM reach GROUP BY vid
"""
)


def _plp_sql(iters: int) -> str:
    return (
        _GRAPH_PRELUDE
        + f""",
ue AS (
  SELECT src, dst, w FROM edges
  UNION ALL SELECT dst, src, w FROM edges
  UNION ALL SELECT vid, vid, 0.0 FROM verts
),
plp AS (
  SELECT 0 AS iter, vid, vid AS label FROM verts
  UNION ALL
  SELECT iter + 1, vid, label FROM (
    SELECT l.iter AS iter, ue.dst AS vid, l.label AS label,
           ROW_NUMBER() OVER (
             PARTITION BY l.iter, ue.dst
             ORDER BY SUM(ue.w) DESC, l.label ASC
           ) AS rn
    FROM plp l JOIN ue ON ue.src = l.vid
    WHERE l.iter < {iters}
    GROUP BY l.iter, ue.dst, l.label
  ) WHERE rn = 1
)
SELECT vid, label FROM plp WHERE iter = {iters}
"""
    )


_TRIANGLES_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
ue AS (SELECT DISTINCT a.s AS src, b.s AS dst
       FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM ue e1
  JOIN ue e2 ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN ue e3 ON e3.src = e1.dst AND e3.dst = e2.dst
),
corners AS (
  SELECT a AS vid FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
verts AS (SELECT DISTINCT s AS vid FROM ps)
SELECT v.vid, COALESCE(c.cnt, 0) AS triangles
FROM verts v LEFT JOIN (SELECT vid, COUNT(*) AS cnt FROM corners GROUP BY 1) c
USING (vid)
"""

_TEXT_STATS_SQL = r"""
WITH t AS (
  SELECT doc_id, COALESCE(text, '') AS text FROM documents
),
tok AS (
  SELECT doc_id, text,
         CASE WHEN TRIM(text) = '' THEN []
              ELSE string_split_regex(TRIM(text), '\s+') END AS toks
  FROM t
),
base AS (
  SELECT doc_id,
         LEN(toks) AS n_tokens,
         LEN(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+'))
             AS bpe_tokens,
         LENGTH(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
         CAST(LEN(list_filter(toks,
              x -> x IN ('the','a','and','of','to'))) AS DOUBLE)
             / GREATEST(LEN(toks), 1) AS stop_ratio,
         LEN(list_filter(toks, x -> x IN ('the','a','and','of','to'))) AS en_c,
         LEN(list_filter(toks, x -> x IN ('el','la','de','y','en'))) AS es_c,
         LEN(list_filter(toks, x -> x IN ('der','die','und','ist','zu'))) AS de_c
  FROM tok
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(bpe_tokens AS BIGINT) AS bpe_tokens,
       CAST(n_nonspace AS BIGINT) AS n_nonspace,
       FLOOR(stop_ratio * 1000000 + 0.5) / 1000000.0 AS stop_ratio,
       FLOOR(LEAST(1.0, n_tokens / 100.0) * (1.0 - ABS(stop_ratio - 0.4))
             * 1000000 + 0.5) / 1000000.0 AS quality_score,
       CASE WHEN en_c > es_c AND en_c > de_c THEN 'en'
            WHEN es_c > en_c AND es_c > de_c THEN 'es'
            WHEN de_c > en_c AND de_c > es_c THEN 'de'
            ELSE 'und' END AS pred_lang
FROM base
"""

_EXACT_DEDUP_SQL = """
SELECT sha256(COALESCE(text, '')) AS sha, MIN(doc_id) AS doc_id
FROM documents GROUP BY 1
"""

_JACCARD_SQL = r"""
WITH t AS (
  SELECT doc_id,
         list_distinct(string_split_regex(TRIM(COALESCE(text,'')), '\s+')) AS toks
  FROM documents
  WHERE TRIM(COALESCE(text,'')) <> ''
)
SELECT a.doc_id AS a, b.doc_id AS b,
       FLOOR(CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / (LEN(a.toks) + LEN(b.toks) - LEN(list_intersect(a.toks, b.toks)))
             * 1000000 + 0.5) / 1000000.0 AS jaccard
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (LEN(a.toks) + LEN(b.toks) - LEN(list_intersect(a.toks, b.toks))) >= 0.8
"""

_KNN_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           ORDER BY vec_id LIMIT 5),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, vec_id,
       FLOOR(sim * 1000000 + 0.5) / 1000000.0 AS sim
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id ASC) AS rn
  FROM sims
) WHERE rn <= 10
"""

_COSINE_DUPS_SQL = """
SELECT a, b, FLOOR(sim * 1000000 + 0.5) / 1000000.0 AS sim
FROM (
  SELECT a.vec_id AS a, b.vec_id AS b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE sim >= 0.4
"""

_DEGREES_SQL = f"""
WITH edges AS ({_EDGES_SQL})
SELECT src AS vid, COUNT(*) AS out_deg, SUM(w) AS w_out_deg
FROM edges GROUP BY 1
"""




_SUPPLIER_PRELUDE = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
ue AS (SELECT DISTINCT a.s AS src, b.s AS dst
       FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
sym AS (SELECT src AS v, dst AS n FROM ue UNION ALL SELECT dst, src FROM ue),
sdeg AS (SELECT v, COUNT(*) AS d FROM sym GROUP BY 1),
sverts AS (SELECT DISTINCT s AS vid FROM ps)
"""

_DEGREE_CENTRALITY_SQL = (
    _SUPPLIER_PRELUDE
    + """
SELECT v.vid, COALESCE(d.d, 0) AS degree
FROM sverts v LEFT JOIN sdeg d ON v.vid = d.v
"""
)


def _katz_sql(iters: int, alpha: float, beta: float) -> str:
    return (
        _GRAPH_PRELUDE
        + f""",
trans AS (
  SELECT src, dst, w FROM edges
  UNION ALL SELECT vid, vid, 0.0 FROM verts
),
kz AS (
  SELECT 0 AS iter, vid, CAST({beta} AS DOUBLE) AS x FROM verts
  UNION ALL
  SELECT c.iter + 1, c.vid, {beta} + {alpha} * c.c
  FROM (
    SELECT k.iter AS iter, t.dst AS vid, SUM(k.x * t.w) AS c
    FROM kz k JOIN trans t ON k.vid = t.src
    WHERE k.iter < {iters}
    GROUP BY 1, 2
  ) c
)
SELECT vid, FLOOR(x * 1000000 + 0.5) / 1000000.0 AS x
FROM kz WHERE iter = {iters}
"""
    )


def _ppr_sql(seed: int, iters: int, alpha: float) -> str:
    """Fixed-iteration personalized PageRank (PageRankNibble PPR phase)
    over the undirected simple customer-supplier graph.  The iterations are
    UNROLLED as chained CTEs rather than a WITH RECURSIVE: DuckDB 1.0.0
    miscompiles the katz-style recursion when the anchor is a non-uniform
    indicator vector (verified: `x*w` inside the recursive term evaluates
    with a spurious additive term on a 3-vertex path), while each single
    join+groupby step evaluates correctly."""
    steps = []
    for i in range(iters):
        # one reference to x{i} per step + MATERIALIZED, else DuckDB's CTE
        # inlining re-evaluates the chain exponentially
        steps.append(
            f"""x{i + 1} AS MATERIALIZED (
  SELECT u.v AS vid,
         {1.0 - alpha} * COALESCE(SUM(p.x * t.w), 0.0)
         + CASE WHEN u.v = {seed} THEN {alpha} ELSE 0.0 END AS x
  FROM udeg u
  LEFT JOIN trans t ON t.dst = u.v
  LEFT JOIN x{i} p ON p.vid = t.src
  GROUP BY u.v
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH
e0 AS ({_EDGES_SQL}),
ue AS (SELECT DISTINCT src, dst FROM e0),
usym AS (SELECT src AS v, dst AS n FROM ue UNION ALL SELECT dst, src FROM ue),
udeg AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM usym GROUP BY 1),
trans AS MATERIALIZED (
  SELECT s.v AS src, s.n AS dst, 1.0 / sd.d AS w
  FROM usym s JOIN udeg sd ON sd.v = s.v
),
x0 AS (SELECT v AS vid,
              CASE WHEN v = {seed} THEN 1.0 ELSE 0.0 END AS x FROM udeg),
{chain}
SELECT vid, FLOOR(x * 1000000 + 0.5) / 1000000.0 AS ppr
FROM x{iters}
"""


def _hits_sql(iters: int) -> str:
    """HITS mutual power iterations unrolled as chained MATERIALIZED CTEs
    (same DuckDB-recursion avoidance as _ppr_sql), end-only L2 norms."""
    steps = []
    for i in range(iters):
        steps.append(
            f"""a{i + 1} AS MATERIALIZED (
  SELECT v.vid, COALESCE(SUM(e.w * h.x), 0.0) AS x
  FROM hverts v
  LEFT JOIN e0 e ON e.dst = v.vid
  LEFT JOIN h{i} h ON h.vid = e.src
  GROUP BY v.vid
)"""
        )
        steps.append(
            f"""h{i + 1} AS MATERIALIZED (
  SELECT v.vid, COALESCE(SUM(e.w * a.x), 0.0) AS x
  FROM hverts v
  LEFT JOIN e0 e ON e.src = v.vid
  LEFT JOIN a{i + 1} a ON a.vid = e.dst
  GROUP BY v.vid
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH
e0 AS ({_EDGES_SQL}),
hverts AS (SELECT DISTINCT src AS vid FROM e0
           UNION SELECT DISTINCT dst FROM e0),
h0 AS (SELECT vid, 1.0 AS x FROM hverts),
{chain},
na AS (SELECT CASE WHEN SUM(x * x) > 0 THEN SQRT(SUM(x * x))
              ELSE 1.0 END AS s FROM a{iters}),
nh AS (SELECT CASE WHEN SUM(x * x) > 0 THEN SQRT(SUM(x * x))
              ELSE 1.0 END AS s FROM h{iters})
SELECT a.vid,
       FLOOR(a.x / na.s * 1000000 + 0.5) / 1000000.0 AS auth,
       FLOOR(h.x / nh.s * 1000000 + 0.5) / 1000000.0 AS hub
FROM a{iters} a JOIN h{iters} h ON a.vid = h.vid, na, nh
"""


_LCC_SQL = (
    _SUPPLIER_PRELUDE
    + """,
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM ue e1
  JOIN ue e2 ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN ue e3 ON e3.src = e1.dst AND e3.dst = e2.dst
),
corners AS (
  SELECT a AS vid FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
tcnt AS (SELECT vid, COUNT(*) AS t FROM corners GROUP BY 1)
SELECT v.vid,
       FLOOR(CASE WHEN COALESCE(d.d, 0) >= 2
                  THEN 2.0 * COALESCE(t.t, 0) / (d.d * (d.d - 1))
                  ELSE 0.0 END * 1000000 + 0.5) / 1000000.0 AS lcc
FROM sverts v
LEFT JOIN sdeg d ON v.vid = d.v
LEFT JOIN tcnt t ON v.vid = t.vid
"""
)

_LINKPRED_SQL = (
    _SUPPLIER_PRELUDE
    + """,
wed AS (
  SELECT a.n AS u, b.n AS v, dp.d AS piv_d
  FROM sym a JOIN sym b ON a.v = b.v AND a.n < b.n
  JOIN sdeg dp ON dp.v = a.v
),
agg AS (
  SELECT u, v, COUNT(*) AS cn, SUM(1.0 / LN(piv_d)) AS aa,
         SUM(1.0 / piv_d) AS ra
  FROM wed GROUP BY 1, 2
)
SELECT agg.u, agg.v, agg.cn,
       FLOOR(CAST(agg.cn AS DOUBLE) / (du.d + dv.d - agg.cn)
             * 1000000 + 0.5) / 1000000.0 AS jaccard,
       FLOOR(agg.aa * 1000000 + 0.5) / 1000000.0 AS adamic_adar,
       FLOOR(agg.ra * 1000000 + 0.5) / 1000000.0 AS resource_alloc,
       CAST(du.d * dv.d AS BIGINT) AS pref_attach
FROM agg JOIN sdeg du ON du.v = agg.u JOIN sdeg dv ON dv.v = agg.v
"""
)

_WINDOWS_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts, value FROM events),
t AS (
  SELECT 'tumbling' AS kind, user_id,
         (ts // 3600000000) * 3600000000 AS window_start_us,
         COUNT(*) AS n_events,
         FLOOR(SUM(value) * 1000000 + 0.5) / 1000000.0 AS sum_value
  FROM e GROUP BY 2, 3
),
s AS (
  SELECT 'sliding' AS kind, user_id,
         (ts // 900000000) * 900000000 - h.h * 900000000 AS window_start_us,
         COUNT(*) AS n_events,
         FLOOR(SUM(value) * 1000000 + 0.5) / 1000000.0 AS sum_value
  FROM e CROSS JOIN (SELECT CAST(UNNEST([0, 1, 2, 3]) AS BIGINT) AS h) h
  GROUP BY 2, 3
)
SELECT * FROM t UNION ALL SELECT * FROM s
"""

_SESSION_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts, value FROM events),
m AS (
  SELECT *,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM e
),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id, MIN(ts) AS session_start_us, MAX(ts) AS session_end_us,
       COUNT(*) AS n_events,
       FLOOR(SUM(value) * 1000000 + 0.5) / 1000000.0 AS sum_value
FROM s GROUP BY user_id, sid
"""


def _modularity_sql(iters: int) -> str:
    return (
        _plp_sql(iters).replace(
            "SELECT vid, label FROM plp WHERE iter = " + str(iters),
            f""", lab AS (SELECT vid, label FROM plp WHERE iter = {iters}),
ww AS (SELECT SUM(w) AS W FROM edges),
w_c AS (
  SELECT a.label, SUM(e.w) AS w_in
  FROM edges e JOIN lab a ON a.vid = e.src JOIN lab b ON b.vid = e.dst
  WHERE a.label = b.label GROUP BY 1
),
vdeg AS (
  SELECT v, SUM(w) AS wd FROM (
    SELECT src AS v, w FROM edges UNION ALL SELECT dst, w FROM edges
  ) GROUP BY 1
),
s_c AS (
  SELECT l.label, SUM(d.wd) AS sc
  FROM vdeg d JOIN lab l ON l.vid = d.v GROUP BY 1
),
ce AS (
  SELECT LEAST(a.label, b.label) AS cs, GREATEST(a.label, b.label) AS cd,
         SUM(e.w) AS w
  FROM edges e JOIN lab a ON a.vid = e.src JOIN lab b ON b.vid = e.dst
  GROUP BY 1, 2
)
SELECT FLOOR(SUM(COALESCE(w.w_in, 0.0) / (SELECT W FROM ww)
             - (s.sc / (2 * (SELECT W FROM ww)))
               * (s.sc / (2 * (SELECT W FROM ww))))
       * 1000000 + 0.5) / 1000000.0 AS modularity,
       (SELECT COUNT(*) FROM ce) AS coarse_edge_rows,
       (SELECT CAST(COALESCE(SUM(w), 0) AS BIGINT) FROM ce WHERE cs = cd)
           AS coarse_selfloop_w,
       CAST(0 AS BIGINT) AS proj_mismatch
FROM s_c s LEFT JOIN w_c w ON s.label = w.label
""",
        )
    )


_BFS_SQL = (
    _GRAPH_PRELUDE
    + """,
ue AS (SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst FROM edges),
sue AS (SELECT src, dst FROM ue UNION SELECT dst, src FROM ue),
bfs AS (
  SELECT (SELECT MIN(vid) FROM verts) AS vid, 0 AS depth
  UNION
  SELECT e.dst, b.depth + 1
  FROM bfs b JOIN sue e ON e.src = b.vid
  WHERE b.depth < 30
),
md AS (SELECT vid, MIN(depth) AS depth FROM bfs GROUP BY 1)
SELECT v.vid, COALESCE(m.depth, -1) AS depth,
       COALESCE(m.depth, -1) AS pll_depth
FROM verts v LEFT JOIN md m ON v.vid = m.vid
"""
)

_SSSP_SQL = (
    _GRAPH_PRELUDE
    + """,
ue AS (SELECT LEAST(src, dst) AS s, GREATEST(src, dst) AS d,
              CAST(MIN(w) AS BIGINT) AS w
       FROM edges GROUP BY 1, 2),
sue AS (SELECT s, d, w FROM ue UNION ALL SELECT d, s, w FROM ue),
sp AS (
  SELECT (SELECT MIN(vid) FROM verts) AS vid, 0 AS dist
  UNION
  SELECT e.d, b.dist + e.w
  FROM sp b JOIN sue e ON e.s = b.vid
  WHERE b.dist + e.w < 12
),
spm AS (SELECT vid, CAST(MIN(dist) AS DOUBLE) AS dist FROM sp GROUP BY 1)
SELECT vid, dist,
       (SELECT dist FROM spm WHERE vid = (SELECT MAX(vid) FROM spm))
           AS astar_dist
FROM spm
"""
)

_SUPPLIER_RECURSIVE_PRELUDE = _SUPPLIER_PRELUDE.replace(
    "WITH ps", "WITH RECURSIVE ps", 1
)

_SCC_SQL = (
    _GRAPH_PRELUDE
    + """,
reach AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
mutual AS (
  SELECT r1.a AS v, r1.b AS w
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
)
SELECT v.vid, LEAST(v.vid, COALESCE(MIN(m.w), v.vid)) AS label
FROM verts v LEFT JOIN mutual m ON m.v = v.vid
GROUP BY v.vid
"""
)

_DIAMETER_SQL = (
    _GRAPH_PRELUDE
    + """,
ue0 AS (SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst FROM edges),
sue AS (SELECT src, dst FROM ue0 UNION SELECT dst, src FROM ue0),
b1 AS (
  SELECT (SELECT MIN(vid) FROM verts) AS vid, 0 AS depth
  UNION
  SELECT e.dst, b.depth + 1 FROM b1 b JOIN sue e ON e.src = b.vid
  WHERE b.depth < 30
),
m1 AS (SELECT vid, MIN(depth) AS d FROM b1 GROUP BY 1),
far AS (SELECT vid FROM m1 ORDER BY d DESC, vid ASC LIMIT 1),
b2 AS (
  SELECT (SELECT vid FROM far) AS vid, 0 AS depth
  UNION
  SELECT e.dst, b.depth + 1 FROM b2 b JOIN sue e ON e.src = b.vid
  WHERE b.depth < 30
),
m2 AS (SELECT vid, MIN(depth) AS d FROM b2 GROUP BY 1)
SELECT (SELECT MIN(vid) FROM verts) AS sweep_start,
       (SELECT vid FROM far) AS sweep_far,
       (SELECT MAX(d) FROM m2) AS diameter_lb
"""
)


def _partition_quality_sql(iters: int) -> str:
    return _plp_sql(iters).replace(
        "SELECT vid, label FROM plp WHERE iter = " + str(iters),
        f""", lab AS (SELECT vid, label FROM plp WHERE iter = {iters}),
ww AS (SELECT SUM(w) AS W FROM edges),
wi AS (
  SELECT SUM(e.w) AS w_in
  FROM edges e JOIN lab a ON a.vid = e.src JOIN lab b ON b.vid = e.dst
  WHERE a.label = b.label
)
SELECT FLOOR(COALESCE((SELECT w_in FROM wi), 0) / (SELECT W FROM ww)
             * 1000000 + 0.5) / 1000000.0 AS coverage,
       FLOOR(((SELECT W FROM ww) - COALESCE((SELECT w_in FROM wi), 0))
             * 1000000 + 0.5) / 1000000.0 AS edge_cut
""",
    )


_CLIQUES_BIPARTITE_SQL = f"""
WITH edges AS ({_EDGES_SQL})
SELECT CAST(src AS VARCHAR) || ',' || CAST(dst AS VARCHAR) AS clique,
       CAST(2 AS BIGINT) AS size
FROM edges
"""

_ARTICULATION_SQL = (
    _GRAPH_PRELUDE
    + """,
ue AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT src AS vid, COUNT(*) AS d FROM ue GROUP BY 1),
cand AS (SELECT vid FROM deg ORDER BY d DESC, vid ASC LIMIT 20),
reach AS (
  SELECT vid, vid AS root FROM verts
  UNION
  SELECT ue.dst AS vid, r.root FROM reach r JOIN ue ON ue.src = r.vid
),
lab AS (SELECT vid, MIN(root) AS label FROM reach GROUP BY vid),
csize AS (SELECT label, COUNT(*) AS n FROM lab GROUP BY label),
seed AS (
  SELECT c.vid AS cand, MIN(u.dst) AS v
  FROM cand c JOIN ue u ON u.src = c.vid AND u.dst <> c.vid GROUP BY 1
),
avoid AS (
  SELECT cand, v FROM seed
  UNION
  SELECT a.cand, u.dst FROM avoid a JOIN ue u ON u.src = a.v
  WHERE u.dst <> a.cand
),
cnt AS (SELECT cand, COUNT(*) AS n FROM avoid GROUP BY cand)
SELECT c.vid,
       CAST(CASE WHEN cnt.n < cs.n - 1 THEN 1 ELSE 0 END AS BIGINT)
           AS is_articulation
FROM cand c
JOIN lab ON lab.vid = c.vid
JOIN csize cs ON cs.label = lab.label
JOIN cnt ON cnt.cand = c.vid
"""
)

_SPANNING_SQL = _CC_SQL.replace(
    "SELECT vid, MIN(root) AS label FROM reach GROUP BY vid",
    """, lab AS (SELECT vid, MIN(root) AS label FROM reach GROUP BY vid)
SELECT label, CAST(COUNT(*) - 1 AS BIGINT) AS n_edges
FROM lab GROUP BY label HAVING COUNT(*) > 1
""",
)


def _partition_compare_sql(it_a: int, it_b: int) -> str:
    """NMI/ARI/Rand/Jaccard between PLP labelings at it_a vs it_b
    iterations; mirrors compare_partitions() (community.py)."""
    assert it_a < it_b
    return _plp_sql(it_b).replace(
        "SELECT vid, label FROM plp WHERE iter = " + str(it_b),
        f""", la AS (SELECT vid, label FROM plp WHERE iter = {it_a}),
lb AS (SELECT vid, label FROM plp WHERE iter = {it_b}),
cont AS (
  SELECT a.label AS x, b.label AS y, CAST(COUNT(*) AS DOUBLE) AS nij
  FROM la a JOIN lb b USING (vid) GROUP BY 1, 2
),
tot AS (SELECT SUM(nij) AS n FROM cont),
ai AS (SELECT x, SUM(nij) AS a FROM cont GROUP BY 1),
bj AS (SELECT y, SUM(nij) AS b FROM cont GROUP BY 1),
mi AS (
  SELECT SUM(c.nij / t.n * LN(t.n * c.nij / (ai.a * bj.b))) AS mi
  FROM cont c JOIN ai ON c.x = ai.x JOIN bj ON c.y = bj.y CROSS JOIN tot t
),
ha AS (SELECT -SUM(a / t.n * LN(a / t.n)) AS h FROM ai CROSS JOIN tot t),
hb AS (SELECT -SUM(b / t.n * LN(b / t.n)) AS h FROM bj CROSS JOIN tot t),
pc AS (
  SELECT (SELECT n * (n - 1) / 2.0 FROM tot) AS tt,
         (SELECT SUM(a * (a - 1) / 2.0) FROM ai) AS p,
         (SELECT SUM(b * (b - 1) / 2.0) FROM bj) AS q,
         (SELECT SUM(nij * (nij - 1) / 2.0) FROM cont) AS s
)
SELECT
  FLOOR((CASE WHEN ha.h + hb.h = 0 THEN 1.0
         ELSE 2.0 * mi.mi / (ha.h + hb.h) END) * 1000000 + 0.5)
      / 1000000.0 AS nmi,
  FLOOR((CASE WHEN (pc.p + pc.q) / 2.0 - pc.p * pc.q / pc.tt = 0 THEN 1.0
         ELSE (pc.s - pc.p * pc.q / pc.tt)
              / ((pc.p + pc.q) / 2.0 - pc.p * pc.q / pc.tt) END)
        * 1000000 + 0.5) / 1000000.0 AS ari,
  FLOOR((CASE WHEN pc.tt = 0 THEN 1.0
         ELSE (pc.tt + 2.0 * pc.s - pc.p - pc.q) / pc.tt END)
        * 1000000 + 0.5) / 1000000.0 AS rand,
  FLOOR((CASE WHEN pc.p + pc.q - pc.s = 0 THEN 1.0
         ELSE pc.s / (pc.p + pc.q - pc.s) END)
        * 1000000 + 0.5) / 1000000.0 AS jaccard
FROM mi, ha, hb, pc
""",
    )


_CLOSENESS_SQL = (
    _SUPPLIER_RECURSIVE_PRELUDE
    + """,
srcs AS (SELECT vid FROM sverts ORDER BY vid LIMIT 4),
bfs AS (
  SELECT vid AS s, vid AS v, 0 AS d FROM srcs
  UNION
  SELECT b.s, e.n, b.d + 1
  FROM bfs b JOIN sym e ON e.v = b.v
  WHERE b.d < 30
),
md AS (SELECT s, v, MIN(d) AS d FROM bfs GROUP BY 1, 2),
agg AS (
  SELECT s AS vid, COUNT(*) - 1 AS r1, SUM(d) AS sd,
         SUM(CASE WHEN d > 0 THEN 1.0 / d ELSE 0.0 END) AS hm
  FROM md GROUP BY 1
)
SELECT vid,
       FLOOR(CASE WHEN sd > 0 THEN CAST(r1 AS DOUBLE) / sd ELSE 0.0 END
             * 1000000 + 0.5) / 1000000.0 AS closeness,
       FLOOR(hm * 1000000 + 0.5) / 1000000.0 AS harmonic,
       CAST(r1 + 1 AS BIGINT) AS reached
FROM agg
"""
)


def _eigenvector_sql(iters: int) -> str:
    return (
        _GRAPH_PRELUDE
        + f""",
sym AS (
  SELECT src, dst, w FROM edges
  UNION ALL SELECT dst, src, w FROM edges
  UNION ALL SELECT vid, vid, 0.0 FROM verts
),
ev AS (
  SELECT 0 AS iter, vid, CAST(1.0 AS DOUBLE) AS x FROM verts
  UNION ALL
  SELECT c.iter + 1, c.vid, c.c
  FROM (
    SELECT e.iter AS iter, t.dst AS vid, SUM(e.x * t.w) AS c
    FROM ev e JOIN sym t ON e.vid = t.src
    WHERE e.iter < {iters}
    GROUP BY 1, 2
  ) c
),
fin AS (SELECT vid, x FROM ev WHERE iter = {iters}),
nrm AS (SELECT SQRT(SUM(x * x)) AS n FROM fin)
SELECT vid,
       FLOOR(x / (SELECT CASE WHEN n > 0 THEN n ELSE 1.0 END FROM nrm)
             * 1000000 + 0.5) / 1000000.0 AS x
FROM fin
"""
    )


def _kcore_sql(k: int, rounds: int) -> str:
    return (
        _SUPPLIER_RECURSIVE_PRELUDE
        + f""",
ks AS (
  SELECT 0 AS it, (SELECT LIST(vid) FROM sverts) AS vs
  UNION ALL
  SELECT it + 1,
         (SELECT LIST(v) FROM (
            SELECT e.v, COUNT(*) AS c FROM sym e
            WHERE list_contains(kk.vs, e.v) AND list_contains(kk.vs, e.n)
            GROUP BY e.v HAVING COUNT(*) >= {k}))
  FROM ks kk WHERE it < {rounds}
)
SELECT UNNEST(vs) AS vid FROM ks WHERE it = {rounds}
"""
    )


_ASSORTATIVITY_SQL = (
    _SUPPLIER_PRELUDE
    + """,
pairs AS (
  SELECT CAST(da.d AS DOUBLE) AS dx, CAST(db.d AS DOUBLE) AS dy
  FROM sym s JOIN sdeg da ON da.v = s.v JOIN sdeg db ON db.v = s.n
),
st AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(dx) AS sx, SUM(dy) AS sy,
         SUM(dx * dy) AS sxy, SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy
  FROM pairs
)
-- explicit Pearson sums with the zero-variance -> 0.0 convention, exactly
-- mirroring the Ray partial-sum combiner (corr() would yield NULL/NaN on
-- degree-regular graphs)
SELECT FLOOR(CASE WHEN (sxx - sx * sx / n) > 0 AND (syy - sy * sy / n) > 0
                  THEN (sxy - sx * sy / n)
                       / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n))
                  ELSE 0.0 END * 1000000 + 0.5) / 1000000.0 AS assortativity
FROM st
"""
)

_EDGE_TRI_SQL = (
    _SUPPLIER_PRELUDE
    + """,
wed AS (SELECT a.n AS u, b.n AS v FROM sym a JOIN sym b ON a.v = b.v AND a.n < b.n),
cnt AS (SELECT u, v, COUNT(*) AS cn FROM wed GROUP BY 1, 2)
SELECT e.src, e.dst, COALESCE(c.cn, 0) AS cn,
       FLOOR(CAST(COALESCE(c.cn, 0) AS DOUBLE)
             / GREATEST(du.d + dv.d - COALESCE(c.cn, 0), 1)
             * 1000000 + 0.5) / 1000000.0 AS score
FROM ue e
LEFT JOIN cnt c ON c.u = e.src AND c.v = e.dst
JOIN sdeg du ON du.v = e.src
JOIN sdeg dv ON dv.v = e.dst
"""
)

_LAPLACIAN_SQL = (
    _SUPPLIER_PRELUDE
    + """,
nd AS (SELECT s.v, SUM(dn.d) AS sn FROM sym s JOIN sdeg dn ON dn.v = s.n GROUP BY 1)
SELECT v.vid,
       CAST(COALESCE(d.d, 0) * COALESCE(d.d, 0) + COALESCE(d.d, 0)
            + 2 * COALESCE(nd.sn, 0) AS BIGINT) AS lc
FROM sverts v
LEFT JOIN sdeg d ON v.vid = d.v
LEFT JOIN nd ON nd.v = v.vid
"""
)

_SFIGALITY_SQL = (
    _SUPPLIER_PRELUDE
    + """,
hi AS (
  SELECT s.v, COUNT(*) AS h
  FROM sym s JOIN sdeg da ON da.v = s.v JOIN sdeg db ON db.v = s.n
  WHERE db.d > da.d GROUP BY 1
)
SELECT v.vid,
       FLOOR(CASE WHEN COALESCE(d.d, 0) > 0
                  THEN CAST(COALESCE(hi.h, 0) AS DOUBLE) / d.d
                  ELSE 0.0 END * 1000000 + 0.5) / 1000000.0 AS sfigality
FROM sverts v
LEFT JOIN sdeg d ON v.vid = d.v
LEFT JOIN hi ON hi.v = v.vid
"""
)

_SCAN_SQL = (
    _SUPPLIER_PRELUDE
    + """,
wed AS (SELECT a.n AS u, b.n AS v FROM sym a JOIN sym b ON a.v = b.v AND a.n < b.n),
cnt AS (SELECT u, v, COUNT(*) AS cn FROM wed GROUP BY 1, 2)
SELECT e.src, e.dst,
       FLOOR((COALESCE(c.cn, 0) + 2.0)
             / SQRT((du.d + 1.0) * (dv.d + 1.0))
             * 1000000 + 0.5) / 1000000.0 AS score
FROM ue e
LEFT JOIN cnt c ON c.u = e.src AND c.v = e.dst
JOIN sdeg du ON du.v = e.src
JOIN sdeg dv ON dv.v = e.dst
"""
)

_LOCAL_DEGREE_SQL = (
    _SUPPLIER_PRELUDE
    + """,
ranked AS (
  SELECT s.v, s.n, dv.d AS dsrc,
         ROW_NUMBER() OVER (PARTITION BY s.v ORDER BY dn.d DESC, s.n ASC) AS rnk
  FROM sym s JOIN sdeg dn ON dn.v = s.n JOIN sdeg dv ON dv.v = s.v
),
dirsc AS (
  SELECT LEAST(v, n) AS src, GREATEST(v, n) AS dst,
         CASE WHEN dsrc <= 1 OR rnk = 1 THEN 1.0
              ELSE 1.0 - LN(rnk) / LN(dsrc) END AS s
  FROM ranked
)
SELECT src, dst, FLOOR(MAX(s) * 1000000 + 0.5) / 1000000.0 AS score
FROM dirsc GROUP BY 1, 2
"""
)

_TOPO_LEVELS_SQL = """
SELECT o_orderkey AS vid,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) - 1
            AS BIGINT) AS level
FROM orders
"""

_KNN_IVF_SQL = """
WITH cent AS (
  SELECT embedding AS ce,
         ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      ORDER BY vec_id LIMIT 5),
assign AS (
  SELECT e.vec_id, e.embedding,
         (SELECT c.cidx FROM cent c
          ORDER BY list_cosine_similarity(CAST(c.ce AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])) DESC,
                   c.cidx ASC
          LIMIT 1) AS bucket
  FROM embeddings e
),
pr AS (
  SELECT query_id, cidx FROM (
    SELECT q.query_id, c.cidx,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(CAST(c.ce AS DOUBLE[]),
                                             CAST(q.qe AS DOUBLE[])) DESC,
                      c.cidx ASC
           ) AS rn
    FROM q CROSS JOIN cent c
  ) WHERE rn <= 4
),
sims AS (
  SELECT q.query_id, a.vec_id,
         list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                CAST(a.embedding AS DOUBLE[])) AS sim
  FROM q JOIN pr ON pr.query_id = q.query_id
  JOIN assign a ON a.bucket = pr.cidx
)
SELECT query_id, vec_id, FLOOR(sim * 1000000 + 0.5) / 1000000.0 AS sim
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id ASC) AS rn
  FROM sims
) WHERE rn <= 10
"""


# --- exact distance suite on the closed-form fixture graph -----------------
# walk-count unrolled CTEs: W_k = A^k as (s, v, count); dist(s,v) = first k
# with W_k[s,v] > 0 and sigma(s,v) = W_dist[s,v] (a minimal-length walk IS a
# shortest path), so Brandes' pair-dependency sum, closeness and the hop
# plot all derive from ONE chained-MATERIALIZED-CTE prelude (DuckDB 1.0's
# recursive-CTE re-aggregation bug is avoided the same way as _hits_sql).

_FIX_EDGES_SQL = f"""
SELECT DISTINCT LEAST(i, (i + 1) % {FIX_N}) AS src,
       GREATEST(i, (i + 1) % {FIX_N}) AS dst
FROM generate_series(0, {FIX_N - 1}) t(i)
UNION
SELECT DISTINCT LEAST(i, (i + {FIX_C}) % {FIX_N}) AS src,
       GREATEST(i, (i + {FIX_C}) % {FIX_N}) AS dst
FROM generate_series(0, {FIX_N - 1}) t(i) WHERE i % 3 = 0
"""


def _fix_walks_cte(k_max: int) -> str:
    parts = [
        f"fixe AS MATERIALIZED ({_FIX_EDGES_SQL})",
        "fsym AS MATERIALIZED (SELECT src, dst FROM fixe"
        " UNION ALL SELECT dst, src FROM fixe)",
        f"w0 AS MATERIALIZED (SELECT i AS s, i AS v, CAST(1 AS BIGINT) AS c"
        f" FROM generate_series(0, {FIX_N - 1}) t(i))",
    ]
    for k in range(1, k_max + 1):
        parts.append(
            f"w{k} AS MATERIALIZED (SELECT w.s, e.dst AS v, SUM(w.c) AS c"
            f" FROM w{k - 1} w JOIN fsym e ON w.v = e.src GROUP BY 1, 2)"
        )
    allw = " UNION ALL ".join(
        f"SELECT {k} AS k, s, v, c FROM w{k}" for k in range(k_max + 1)
    )
    parts.append(f"allw AS MATERIALIZED ({allw})")
    parts.append(
        "fdist AS MATERIALIZED (SELECT s, v, MIN(k) AS d FROM allw"
        " WHERE c > 0 GROUP BY 1, 2)"
    )
    parts.append(
        "fsigma AS MATERIALIZED (SELECT a.s, a.v, a.d, w.c AS sig"
        " FROM fdist a JOIN allw w ON w.k = a.d AND w.s = a.s AND w.v = a.v)"
    )
    return "WITH " + ",\n".join(parts)


_BETWEENNESS_SQL = (
    _fix_walks_cte(FIX_K)
    + """
, bet AS (
SELECT sv.v AS vid,
       FLOOR(0.5 * SUM(CAST(sv.sig AS DOUBLE) * vt.sig / st.sig)
             * 1000000 + 0.5) / 1000000.0 AS betweenness
FROM fsigma sv
JOIN fsigma vt ON vt.s = sv.v
JOIN fsigma st ON st.s = sv.s AND st.v = vt.v
WHERE sv.d + vt.d = st.d
  AND sv.s <> sv.v AND vt.v <> sv.v AND sv.s <> vt.v
GROUP BY 1
),
ecc AS (SELECT s AS vid, CAST(MAX(d) AS BIGINT) AS ecc,
               CAST(COUNT(*) AS BIGINT) AS reached
        FROM fdist GROUP BY 1)
SELECT b.vid, b.betweenness, e.ecc, e.reached, TRUE AS kadabra_ok
FROM bet b JOIN ecc e USING (vid)
"""
)

_TOP_CLOSENESS_SQL = (
    _fix_walks_cte(FIX_K)
    + """
, clo AS (SELECT s, COUNT(*) AS r, SUM(d) AS f FROM fdist GROUP BY s),
topk AS (
  SELECT 'topk' AS kind,
         ROW_NUMBER() OVER (ORDER BY (r - 1) * 1.0 / f DESC, s ASC) - 1
           AS rank,
         s AS vid,
         FLOOR((r - 1) * 1.0 / f * 1000000 + 0.5) / 1000000.0 AS value
  FROM clo ORDER BY (r - 1) * 1.0 / f DESC, s ASC LIMIT 10
),
-- 3-round greedy group closeness, unrolled: pick argmin of the folded
-- farness SUM(LEAST(dist_to_S, d(u, v))), ties -> smaller vid
g1 AS (SELECT s, CAST(SUM(d) AS DOUBLE) AS f FROM fdist GROUP BY s
       ORDER BY f, s LIMIT 1),
d1 AS (SELECT f.v, f.d FROM fdist f JOIN g1 ON f.s = g1.s),
far2 AS (SELECT f.s, CAST(SUM(LEAST(d1.d, f.d)) AS DOUBLE) AS f
         FROM fdist f JOIN d1 ON d1.v = f.v
         WHERE f.s NOT IN (SELECT s FROM g1) GROUP BY f.s),
g2 AS (SELECT s, f FROM far2 ORDER BY f, s LIMIT 1),
d2 AS (SELECT d1.v, LEAST(d1.d, f.d) AS d
       FROM d1 JOIN fdist f ON f.v = d1.v JOIN g2 ON f.s = g2.s),
far3 AS (SELECT f.s, CAST(SUM(LEAST(d2.d, f.d)) AS DOUBLE) AS f
         FROM fdist f JOIN d2 ON d2.v = f.v
         WHERE f.s NOT IN (SELECT s FROM g1 UNION SELECT s FROM g2)
         GROUP BY f.s),
g3 AS (SELECT s, f FROM far3 ORDER BY f, s LIMIT 1)
SELECT kind, rank, vid, value FROM topk
UNION ALL SELECT 'group_closeness', 0, s, f FROM g1
UNION ALL SELECT 'group_closeness', 1, s, f FROM g2
UNION ALL SELECT 'group_closeness', 2, s, f FROM g3
"""
)

_HOP_PLOT_SQL = (
    _fix_walks_cte(FIX_K)
    + """
, hist AS (SELECT d AS t, COUNT(*) AS pairs FROM fdist WHERE d > 0 GROUP BY 1),
cum AS (SELECT t, pairs, SUM(pairs) OVER (ORDER BY t) AS cum_pairs,
               SUM(pairs) OVER () AS total FROM hist)
SELECT CAST(t AS BIGINT) AS t, CAST(pairs AS BIGINT) AS pairs,
       CAST(cum_pairs AS BIGINT) AS cum_pairs,
       CAST((SELECT MIN(t) FROM cum c2 WHERE c2.cum_pairs >= 0.9 * c2.total)
            AS BIGINT) AS effective_diameter
FROM cum ORDER BY t
"""
)

# --- link-prediction evaluation: same closed forms as linkpred.py ----------

_LINKPRED_AUC_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
canon AS (SELECT src, dst FROM edges),
train AS (SELECT * FROM canon WHERE (src * 1000003 + dst * 7919 + 0) % 5 <> 0),
test AS (SELECT * FROM canon WHERE (src * 1000003 + dst * 7919 + 0) % 5 = 0),
verts AS (SELECT DISTINCT src AS vid FROM canon
          UNION SELECT DISTINCT dst FROM canon),
nmax AS (SELECT MAX(vid) + 1 AS m FROM verts),
draws AS (
  SELECT v0.vid AS u, (v0.vid * 1000003 + g.i * 40503 + 0) % m AS v
  FROM verts v0 CROSS JOIN nmax CROSS JOIN generate_series(0, 7) AS g(i)
),
negs AS (
  SELECT DISTINCT LEAST(d.u, d.v) AS u, GREATEST(d.u, d.v) AS v
  FROM draws d JOIN verts vv ON vv.vid = d.v
  WHERE d.u <> d.v
    AND NOT EXISTS (SELECT 1 FROM canon c
                    WHERE c.src = LEAST(d.u, d.v)
                      AND c.dst = GREATEST(d.u, d.v))
),
cands AS (SELECT src AS u, dst AS v, 1 AS lab FROM test
          UNION ALL SELECT u, v, 0 FROM negs),
tsym AS (SELECT src AS a, dst AS b FROM train
         UNION ALL SELECT dst, src FROM train),
cn AS (
  SELECT c.u, c.v, COUNT(*) AS cn
  FROM cands c
  JOIN tsym e1 ON e1.a = c.u
  JOIN tsym e2 ON e2.a = c.v AND e2.b = e1.b
  GROUP BY 1, 2
),
scored AS (
  SELECT c.u, c.v, c.lab, CAST(COALESCE(cn.cn, 0) AS DOUBLE) AS score
  FROM cands c LEFT JOIN cn ON cn.u = c.u AND cn.v = c.v
),
ranked AS (
  SELECT lab,
         AVG(rn) OVER (PARTITION BY score) AS avg_rank,
         ROW_NUMBER() OVER (ORDER BY score DESC, u, v) AS rnd,
         SUM(lab) OVER (ORDER BY score DESC, u, v
                        ROWS UNBOUNDED PRECEDING) AS cum_pos
  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY score) AS rn FROM scored)
),
agg AS (
  SELECT SUM(CASE WHEN lab = 1 THEN avg_rank END) AS srank,
         SUM(lab) AS npos, COUNT(*) AS tot,
         SUM(CASE WHEN lab = 1 THEN CAST(cum_pos AS DOUBLE) / rnd END) AS apsum
  FROM ranked
)
SELECT FLOOR((srank - npos * (npos + 1) / 2.0) / (npos * (tot - npos))
             * 1000000 + 0.5) / 1000000.0 AS auc_roc,
       FLOOR(apsum / npos * 1000000 + 0.5) / 1000000.0 AS auc_pr,
       CAST(npos AS BIGINT) AS n_pos,
       CAST(tot - npos AS BIGINT) AS n_neg
FROM agg
"""

_WALKS_CHECK_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
verts AS (SELECT DISTINCT src AS vid FROM edges
          UNION SELECT DISTINCT dst FROM edges)
SELECT CAST(COUNT(*) AS BIGINT) AS n_walks,
       CAST(5 * COUNT(*) AS BIGINT) AS total_rows,
       CAST(0 AS BIGINT) AS invalid_transitions
FROM verts
"""

_SNAP_RT_SQL = f"SELECT src, dst FROM ({_EDGES_SQL})"

# Simmelian overlap on the supplier co-part graph (deterministic
# (embeddedness DESC, vid ASC) ranking -> SQL ROW_NUMBER mirrorable)
_SIMMELIAN_SQL = (
    _SUPPLIER_PRELUDE
    + """,
wed AS (SELECT a.n AS u, b.n AS v FROM sym a JOIN sym b ON a.v = b.v AND a.n < b.n),
cnt AS (SELECT u, v, COUNT(*) AS cn FROM wed GROUP BY 1, 2),
ecn AS (SELECT e.src, e.dst, COALESCE(c.cn, 0) AS cn
        FROM ue e LEFT JOIN cnt c ON c.u = e.src AND c.v = e.dst),
dirv AS (SELECT src AS u, dst AS v, cn FROM ecn
         UNION ALL SELECT dst, src, cn FROM ecn),
rk AS (SELECT u, v,
              ROW_NUMBER() OVER (PARTITION BY u ORDER BY cn DESC, v ASC) AS r
       FROM dirv),
topk AS (SELECT u, v FROM rk WHERE r <= 5),
ov AS (SELECT e.src, e.dst, COUNT(*) AS overlap
       FROM ue e
       JOIN topk ta ON ta.u = e.src
       JOIN topk tb ON tb.u = e.dst AND tb.v = ta.v
       GROUP BY 1, 2)
SELECT e.src, e.dst, CAST(COALESCE(o.overlap, 0) AS BIGINT) AS overlap
FROM ue e LEFT JOIN ov o ON o.src = e.src AND o.dst = e.dst
"""
)

# PrefixJaccardScore: Jaccard of the two endpoints' top-k prefix neighbor
# sets under the same deterministic (cn DESC, v ASC) ranking Simmelian
# uses (engine rank "strictly-higher count < k" == ROW_NUMBER <= k under
# a strict total order)
_PREFIX_JACCARD_SQL = (
    _SUPPLIER_PRELUDE
    + """,
wed AS (SELECT a.n AS u, b.n AS v FROM sym a JOIN sym b ON a.v = b.v AND a.n < b.n),
cnt AS (SELECT u, v, COUNT(*) AS cn FROM wed GROUP BY 1, 2),
ecn AS (SELECT e.src, e.dst, COALESCE(c.cn, 0) AS cn
        FROM ue e LEFT JOIN cnt c ON c.u = e.src AND c.v = e.dst),
dirv AS (SELECT src AS u, dst AS v, cn FROM ecn
         UNION ALL SELECT dst, src, cn FROM ecn),
rk AS (SELECT u, v,
              ROW_NUMBER() OVER (PARTITION BY u ORDER BY cn DESC, v ASC) AS r
       FROM dirv),
topk AS (SELECT u, v FROM rk WHERE r <= 5),
szs AS (SELECT u, COUNT(*) AS sz FROM topk GROUP BY 1),
ov AS (SELECT e.src, e.dst, COUNT(*) AS inter
       FROM ue e
       JOIN topk ta ON ta.u = e.src
       JOIN topk tb ON tb.u = e.dst AND tb.v = ta.v
       GROUP BY 1, 2)
SELECT e.src, e.dst,
       FLOOR(CAST(COALESCE(o.inter, 0) AS DOUBLE)
             / (su.sz + sv.sz - COALESCE(o.inter, 0))
             * 1000000 + 0.5) / 1000000.0 AS prefix_jaccard
FROM ue e
JOIN szs su ON su.u = e.src
JOIN szs sv ON sv.u = e.dst
LEFT JOIN ov o ON o.src = e.src AND o.dst = e.dst
"""
)

# Local Similarity score: Jaccard-ranked neighbors, 1 - ln(rank)/ln(deg),
# max over both directions
_LOCAL_SIM_SQL = (
    _SUPPLIER_PRELUDE
    + """,
wed AS (SELECT a.n AS u, b.n AS v FROM sym a JOIN sym b ON a.v = b.v AND a.n < b.n),
cnt AS (SELECT u, v, COUNT(*) AS cn FROM wed GROUP BY 1, 2),
ej AS (SELECT e.src, e.dst,
              CAST(COALESCE(c.cn, 0) AS DOUBLE)
                / GREATEST(du.d + dv.d - COALESCE(c.cn, 0), 1) AS jac
       FROM ue e
       LEFT JOIN cnt c ON c.u = e.src AND c.v = e.dst
       JOIN sdeg du ON du.v = e.src
       JOIN sdeg dv ON dv.v = e.dst),
dirv AS (SELECT e.src AS u, e.dst AS v, e.jac, d.d FROM ej e JOIN sdeg d ON d.v = e.src
         UNION ALL
         SELECT e.dst, e.src, e.jac, d.d FROM ej e JOIN sdeg d ON d.v = e.dst),
rk AS (SELECT u, v, d,
              ROW_NUMBER() OVER (PARTITION BY u ORDER BY jac DESC, v ASC) AS r
       FROM dirv),
ds AS (SELECT LEAST(u, v) AS src, GREATEST(u, v) AS dst,
              CASE WHEN d <= 1 OR r = 1 THEN 1.0
                   ELSE 1.0 - LN(r) / LN(d) END AS s
       FROM rk)
SELECT src, dst, FLOOR(MAX(s) * 1000000 + 0.5) / 1000000.0 AS score
FROM ds GROUP BY 1, 2
"""
)

# KatzIndex: truncated walk-count polynomial over the supplier graph; the
# per-level counts are INTEGER MATERIALIZED CTEs and the polynomial uses
# the same literal expression order as the Ray side -> bit-identical
_KATZ_INDEX_SQL = (
    _SUPPLIER_PRELUDE.replace("WITH ", "WITH ")
    + """,
kw1 AS MATERIALIZED (SELECT v AS s, n AS t, CAST(1 AS BIGINT) AS c FROM sym),
kw2 AS MATERIALIZED (SELECT w.s, e.n AS t, SUM(w.c) AS c
                     FROM kw1 w JOIN sym e ON w.t = e.v GROUP BY 1, 2),
kw3 AS MATERIALIZED (SELECT w.s, e.n AS t, SUM(w.c) AS c
                     FROM kw2 w JOIN sym e ON w.t = e.v GROUP BY 1, 2),
kacc AS (
  SELECT s, t, SUM(c1) AS c1, SUM(c2) AS c2, SUM(c3) AS c3 FROM (
    SELECT s, t, c AS c1, 0 AS c2, 0 AS c3 FROM kw1
    UNION ALL SELECT s, t, 0, c, 0 FROM kw2
    UNION ALL SELECT s, t, 0, 0, c FROM kw3
  ) GROUP BY 1, 2
)
SELECT s AS u, t AS v,
       FLOOR((c1 * 0.005 + c2 * (0.005 * 0.005)
              + c3 * ((0.005 * 0.005) * 0.005)) * 1000000 + 0.5)
         / 1000000.0 AS katz_index
FROM kacc WHERE s < t
"""
)

# --- merged-slot oracles ----------------------------------------------------


def _merged_oracles() -> dict[str, str]:
    return {
        "dynamic_replay": (
            f"SELECT c.vid, c.label AS cc_label, b.depth "
            f"FROM ({_CC_SQL}) c JOIN ({_BFS_SQL}) b USING (vid)"
        ),
        "vertex_scores": (
            f"SELECT d.vid, d.degree, l.lcc, p.lc, s.sfigality "
            f"FROM ({_DEGREE_CENTRALITY_SQL}) d "
            f"JOIN ({_LCC_SQL}) l USING (vid) "
            f"JOIN ({_LAPLACIAN_SQL}) p USING (vid) "
            f"JOIN ({_SFIGALITY_SQL}) s USING (vid)"
        ),
        "spectral_scores": (
            f"SELECT k.vid, k.x AS katz, e.x AS eigenvector, h.auth, h.hub "
            f"FROM ({_katz_sql(10, 0.05, 1.0)}) k "
            f"JOIN ({_eigenvector_sql(10)}) e USING (vid) "
            f"JOIN ({_hits_sql(5)}) h USING (vid)"
        ),
        "edge_scores": (
            f"SELECT t.src, t.dst, t.cn, t.score AS triangle_score, "
            f"sc.score AS scan_score, ld.score AS local_degree_score, "
            f"so.overlap AS simmelian_overlap, "
            f"ls.score AS local_similarity_score, "
            f"pj.prefix_jaccard "
            f"FROM ({_EDGE_TRI_SQL}) t "
            f"JOIN ({_SCAN_SQL}) sc USING (src, dst) "
            f"JOIN ({_LOCAL_DEGREE_SQL}) ld USING (src, dst) "
            f"JOIN ({_SIMMELIAN_SQL}) so USING (src, dst) "
            f"JOIN ({_LOCAL_SIM_SQL}) ls USING (src, dst) "
            f"JOIN ({_PREFIX_JACCARD_SQL}) pj USING (src, dst)"
        ),
        "partition_metrics": (
            f"SELECT *, CAST(1 AS BIGINT) AS mapeq_le_singletons,"
            f" CAST(1 AS BIGINT) AS mapeq_le_oneblob "
            f"FROM ({_partition_quality_sql(PLP_ITERS)}) "
            f"CROSS JOIN ({_partition_compare_sql(2, PLP_ITERS)})"
        ),
        "spanning_forests": (
            f"SELECT label, n_edges, n_edges AS n_edges_rand "
            f"FROM ({_SPANNING_SQL})"
        ),
        "randomization_degrees": (
            f"SELECT 'switch' AS method, vid, deg "
            f"FROM ({_EDGE_SWITCH_DEG_SQL.format(edges=_EDGES_SQL)}) "
            f"UNION ALL SELECT 'curveball', vid, deg "
            f"FROM ({_EDGE_SWITCH_DEG_SQL.format(edges=_EDGES_SQL)}) "
            f"UNION ALL SELECT 'shuffle', vid, CAST(degree AS BIGINT) "
            f"FROM ({_DEGREE_CENTRALITY_SQL})"
        ),
        "knn_search": (
            f"SELECT 'brute' AS method, query_id, vec_id, sim FROM ({_KNN_SQL}) "
            f"UNION ALL "
            f"SELECT 'ivf' AS method, query_id, vec_id, sim FROM ({_KNN_IVF_SQL})"
        ),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "edges_build": _EDGES_SQL,
        "degrees": _DEGREES_SQL,
        "pagerank": _pagerank_sql(PR_ITERS),
        "pagerank_top20": _pagerank_sql(PR_ITERS)
        + " ORDER BY score DESC, vid ASC LIMIT 20",
        "connected_components": _CC_SQL,
        "label_propagation": _plp_sql(PLP_ITERS),
        "triangle_counts": _TRIANGLES_SQL,
        "link_prediction": (
            f"SELECT lp.*, kz.katz_index FROM ({_LINKPRED_SQL}) lp "
            f"JOIN ({_KATZ_INDEX_SQL}) kz USING (u, v)"
        ),
        "hopping_windows": _WINDOWS_SQL,
        "session_windows": _SESSION_SQL,
        "modularity_plp": _modularity_sql(PLP_ITERS),
        "text_stats": _TEXT_STATS_SQL,
        "exact_dedup": _EXACT_DEDUP_SQL,
        "jaccard_similar_pairs": _JACCARD_SQL,
        "cosine_near_dup_pairs": _COSINE_DUPS_SQL,
        "bfs_depths": _BFS_SQL,
        "sssp_weighted": _SSSP_SQL,
        "strongly_connected_components": _SCC_SQL,
        "diameter_bounds": _DIAMETER_SQL,
        "articulation_check": _ARTICULATION_SQL,
        "gen_ws_ring": _WS_RING_SQL,
        "betweenness_exact": _BETWEENNESS_SQL,
        "top_closeness": _TOP_CLOSENESS_SQL,
        "hop_plot": _HOP_PLOT_SQL,
        "linkpred_auc": _LINKPRED_AUC_SQL,
        "walks_check": _WALKS_CHECK_SQL,
        "snap_roundtrip": _SNAP_RT_SQL,
        **_merged_oracles(),
        # louvain_quality: q_plp is recomputed exactly; the oracle pins
        # q_ge_plp=1, so the hash gate fails unless Louvain's labeling
        # reaches PLP quality (labels themselves are algorithm-defined)
        "louvain_quality": (
            f"SELECT modularity AS q_plp, CAST(1 AS BIGINT) AS q_ge_plp "
            f"FROM ({_modularity_sql(PLP_ITERS)})"
        ),
        # leiden_check: q_plp recomputed; quality flag pinned to 1 and the
        # connectivity-violation count pinned to 0 (the Leiden guarantee)
        "leiden_check": (
            f"SELECT modularity AS q_plp, CAST(1 AS BIGINT) AS q_ge_plp,"
            f" CAST(0 AS BIGINT) AS disconnected_comms "
            f"FROM ({_modularity_sql(PLP_ITERS)})"
        ),
        # luby_check: the oracle pins both violation counts to zero — the
        # gate fails unless the returned set is a true MIS
        "luby_check": (
            "SELECT CAST(0 AS BIGINT) AS indep_violations,"
            " CAST(0 AS BIGINT) AS uncovered"
        ),
        # matching_check: same pattern — any correct maximal matching has
        # zero invalid pairs, zero reused vertices, zero uncovered edges;
        # the b2_* columns pin the b-matching (b=2) contract the same way
        "matching_check": (
            "SELECT CAST(0 AS BIGINT) AS nonedges,"
            " CAST(0 AS BIGINT) AS not_maximal,"
            " CAST(0 AS BIGINT) AS vertex_reuse,"
            " CAST(0 AS BIGINT) AS b2_nonedges,"
            " CAST(0 AS BIGINT) AS b2_overcap,"
            " CAST(0 AS BIGINT) AS b2_not_maximal,"
            " CAST(0 AS BIGINT) AS pgm_nonedges,"
            " CAST(0 AS BIGINT) AS pgm_vertex_reuse,"
            " CAST(0 AS BIGINT) AS pgm_dp_lt_alt"
        ),
        "cliques_bipartite": _CLIQUES_BIPARTITE_SQL,
        "closeness_sampled": _CLOSENESS_SQL,
        "kcore_membership": _kcore_sql(3, 30),
        "degree_assortativity": _ASSORTATIVITY_SQL,
        "topological_levels": _TOPO_LEVELS_SQL,
        "ppr_seed": _ppr_sql(1, 10, 0.15),
        # minhash_dedup_groups / simhash_near_dups / fingerprints /
        # corpus_* are not SQL-expressible (LSH banding, rolling hashes,
        # regex corpus extraction) -> rows-only checks; value-level
        # oracles live in tests/ (FIXTURES.md §3).
    }
