"""Graph-build layer: id assignment, dedup, degrees (FIXTURES.md §5.2.1)."""

import numpy as np
import pyarrow as pa

import ray.data

from networkit_ray.sources import corpus as corpus_mod
from networkit_ray.stages.extract import extract_edges
from networkit_ray.stages.graphops import (
    canonicalize_undirected,
    dedup_edges,
    out_degrees,
    symmetrize,
    vertices_from_edges,
)
from networkit_ray.stages.ids import (
    assert_no_vid_collisions,
    edge_keys_to_edges,
    key_to_vid,
    vertex_table,
)


def _edges(rows):
    src, dst, w = zip(*rows)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": np.array(src, dtype=np.int64),
                "dst": np.array(dst, dtype=np.int64),
                "w": np.array(w, dtype=np.float64),
            }
        )
    )


def test_key_to_vid_deterministic_and_distinct():
    assert key_to_vid("orgA/app") == key_to_vid("orgA/app")
    ks = [f"k{i}" for i in range(10000)]
    vids = {key_to_vid(k) for k in ks}
    assert len(vids) == len(ks)
    assert all(v >= 0 for v in vids)


def test_vertex_table_and_collision_check(ray_session):
    t = corpus_mod.corpus_table(num_repos=25, seed=42)
    ek = extract_edges(ray.data.from_arrow(t), level="repo")
    verts = vertex_table(ek)
    n = assert_no_vid_collisions(verts)
    rows = verts.take_all()
    assert n == len(rows)
    assert all(key_to_vid(r["key"]) == r["vid"] for r in rows)


def test_edge_keys_to_edges_matches_key_hash(ray_session):
    t = corpus_mod.corpus_table(num_repos=10, seed=42)
    ek = extract_edges(ray.data.from_arrow(t), level="repo")
    edges = edge_keys_to_edges(ek)
    kk = ek.take_all()
    ee = edges.take_all()
    assert len(kk) == len(ee)
    got = sorted((r["src"], r["dst"]) for r in ee)
    want = sorted((key_to_vid(r["src_key"]), key_to_vid(r["dst_key"])) for r in kk)
    assert got == want


def test_dedup_and_canonicalize(ray_session):
    e = _edges([(1, 2, 1.0), (2, 1, 1.0), (1, 2, 1.0), (3, 3, 5.0), (2, 3, 2.0)])
    canon = canonicalize_undirected(e, weight="sum").take_all()
    assert sorted((r["src"], r["dst"], r["w"]) for r in canon) == [
        (1, 2, 3.0),
        (2, 3, 2.0),
    ]
    canon1 = canonicalize_undirected(e, weight="one").take_all()
    assert sorted((r["src"], r["dst"], r["w"]) for r in canon1) == [
        (1, 2, 1.0),
        (2, 3, 1.0),
    ]
    dd = dedup_edges(e, weight="sum").take_all()
    assert sorted((r["src"], r["dst"], r["w"]) for r in dd) == [
        (1, 2, 2.0),
        (2, 1, 1.0),
        (2, 3, 2.0),
        (3, 3, 5.0),
    ]


def test_symmetrize_and_degrees(ray_session):
    e = _edges([(1, 2, 1.0), (2, 3, 2.0)])
    sym = symmetrize(e).take_all()
    assert sorted((r["src"], r["dst"]) for r in sym) == [
        (1, 2),
        (2, 1),
        (2, 3),
        (3, 2),
    ]
    deg = {r["vid"]: (r["out_deg"], r["w_out_deg"]) for r in out_degrees(e).take_all()}
    assert deg == {1: (1, 1.0), 2: (1, 2.0)}
    verts = sorted(r["vid"] for r in vertices_from_edges(e).take_all())
    assert verts == [1, 2, 3]


def test_partition_invariance_of_build(ray_session):
    """Same results regardless of input block count (FIXTURES.md §4)."""
    rows = [(i % 17, (i * 7) % 13, 1.0 + (i % 3)) for i in range(500)]
    for nblocks in (1, 2, 8):
        e = _edges(rows).repartition(nblocks)
        canon = sorted(
            (r["src"], r["dst"], r["w"])
            for r in canonicalize_undirected(e, weight="sum").take_all()
        )
        if nblocks == 1:
            first = canon
        else:
            assert canon == first


def test_graphtools_transpose_subgraph_toundirected(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from networkit_ray.stages.graphops import subgraph, to_undirected, transpose

    tbl = pa.table(
        {
            "src": np.array([0, 1, 2, 3, 0], dtype=np.int64),
            "dst": np.array([1, 2, 0, 0, 1], dtype=np.int64),
            "w": np.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        }
    )
    ds = ray.data.from_arrow(tbl)

    tr = transpose(ds).to_pandas().sort_values(["src", "dst", "w"]).reset_index(drop=True)
    assert tr["src"].tolist() == sorted([1, 2, 0, 0, 1])
    assert set(zip(tr["src"], tr["dst"], tr["w"])) == {
        (1, 0, 1.0), (2, 1, 2.0), (0, 2, 3.0), (0, 3, 4.0), (1, 0, 5.0)
    }

    und = to_undirected(ds).to_pandas()
    got = {(r["src"], r["dst"]): r["w"] for _, r in und.iterrows()}
    # (0,1): 1.0 + 5.0 summed; (1,2): 2.0; (0,2): 3.0; (0,3): 4.0
    assert got == {(0, 1): 6.0, (1, 2): 2.0, (0, 2): 3.0, (0, 3): 4.0}

    verts = ray.data.from_arrow(pa.table({"vid": np.array([0, 1, 2], dtype=np.int64)}))
    sub = subgraph(ds, verts, num_partitions=2).to_pandas()
    assert set(zip(sub["src"], sub["dst"])) == {(0, 1), (1, 2), (2, 0)}
    assert len(sub) == 4  # (0,1) twice: w 1.0 and 5.0 rows both kept


def test_weakly_connected_components(ray_session):
    import networkx as nx
    from tests.conftest import edges_dataset
    from networkit_ray.pipelines.components import weakly_connected_components

    D = nx.gnp_random_graph(80, 0.03, seed=3, directed=True)
    labels, _ = weakly_connected_components(
        edges_dataset(nx.Graph(D.edges())), num_partitions=3
    )
    got = labels.to_pandas().set_index("vid")["label"]
    for comp in nx.weakly_connected_components(D):
        comp = sorted(comp)
        want = min(comp)
        for v in comp:
            if int(v) in got.index:
                assert got[int(v)] == want
