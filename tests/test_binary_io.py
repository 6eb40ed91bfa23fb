"""Binary IO family (SURVEY §2.3 io/ binary rows): NKBR sharded binary
roundtrip + shard invariance, Thrill varint adjacency roundtrip (incl.
degree-0 vertices and multi-shard), graph-tool `gt` roundtrip (directed +
undirected, >255 vertices to force the 2-byte width), and the vectorized
varint/zigzag kernels themselves."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.sources.binary_io import (
    read_graphtool_binary,
    read_networkit_binary,
    read_thrill_binary,
    unzigzag,
    varint_decode,
    varint_encode,
    write_graphtool_binary,
    write_networkit_binary,
    write_thrill_binary,
    zigzag,
)

from tests.conftest import edges_dataset, fixture_graph, nx_to_edges_table


def _sorted_edge_df(ds):
    df = ds.to_pandas()
    return df.sort_values(["src", "dst", "w"]).reset_index(drop=True)


def test_varint_roundtrip_and_edges():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**40, 2**62, 5], np.int64)
    assert (varint_decode(varint_encode(vals)) == vals).all()
    # single-byte values stay single bytes
    assert len(varint_encode(np.array([0, 127], np.int64))) == 2
    with pytest.raises(ValueError):
        varint_encode(np.array([-1], np.int64))
    with pytest.raises(ValueError):
        varint_decode(np.array([0x80], np.uint8))  # truncated


def test_varint_random_fuzz():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**55, size=5000).astype(np.int64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def test_zigzag_roundtrip():
    v = np.array([0, -1, 1, -2, 2, 2**40, -(2**40)], np.int64)
    z = zigzag(v)
    assert (z >= 0).all()
    assert (unzigzag(z) == v).all()


def test_nkbr_roundtrip_weighted(ray_session, tmp_path):
    G = fixture_graph("er200")
    t = nx_to_edges_table(G)
    w = np.linspace(0.5, 3.5, t.num_rows)
    t = t.set_column(2, "w", pa.array(w, pa.float64()))
    ds = ray.data.from_arrow(t).repartition(4)
    out = str(tmp_path / "nkbr")
    manifest = write_networkit_binary(ds, out, directed=True, weighted=True)
    assert manifest.sum("edges") == t.num_rows
    back = read_networkit_binary(out)
    a = _sorted_edge_df(ray.data.from_arrow(t))
    b = _sorted_edge_df(back)
    assert a.equals(b)


def test_nkbr_shard_invariance(ray_session, tmp_path):
    G = fixture_graph("ba300")
    for k, parts in enumerate((1, 7)):
        out = str(tmp_path / f"nkbr{k}")
        write_networkit_binary(
            edges_dataset(G).repartition(parts), out, weighted=False
        )
        back = _sorted_edge_df(read_networkit_binary(out))
        if k == 0:
            first = back
        else:
            assert first.equals(back)


def test_thrill_roundtrip_with_isolated_vertices(ray_session, tmp_path):
    # vertex 3 has degree 0; ids implicit in stream order
    src = np.array([0, 0, 1, 2, 4], np.int64)
    dst = np.array([1, 2, 2, 4, 0], np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst, "w": np.ones(5, np.float64)})
    )
    p = str(tmp_path / "g.thrill")
    write_thrill_binary(ds, p, n=5)
    back = read_thrill_binary(p).to_pandas().sort_values(["src", "dst"])
    assert list(back["src"]) == [0, 0, 1, 2, 4]
    assert list(back["dst"]) == [1, 2, 2, 4, 0]


def test_thrill_multi_shard_matches_single(ray_session, tmp_path):
    G = fixture_graph("er200")
    ds = edges_dataset(G)
    single = str(tmp_path / "one.thrill")
    multi = str(tmp_path / "many")
    write_thrill_binary(ds, single, n=200)
    paths = write_thrill_binary(ds, multi, n=200, num_shards=3)
    assert len(paths) == 3
    a = read_thrill_binary(single).to_pandas().sort_values(["src", "dst"])
    b = read_thrill_binary(multi).to_pandas().sort_values(["src", "dst"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_gt_roundtrip_directed_wide_ids(ray_session, tmp_path):
    # 300 vertices forces the 2-byte uint width branch
    G = fixture_graph("ba300")
    ds = edges_dataset(G)
    p = str(tmp_path / "g.gt")
    write_graphtool_binary(ds, p, directed=True, comment="t€st")
    back, directed = read_graphtool_binary(p)
    assert directed
    a = _sorted_edge_df(ds)
    b = _sorted_edge_df(back)
    assert (a[["src", "dst"]].values == b[["src", "dst"]].values).all()


def test_gt_undirected_canonicalizes(ray_session, tmp_path):
    src = np.array([2, 0, 1], np.int64)
    dst = np.array([0, 1, 2], np.int64)
    ds = ray.data.from_arrow(
        pa.table({"src": src, "dst": dst, "w": np.ones(3, np.float64)})
    )
    p = str(tmp_path / "u.gt")
    write_graphtool_binary(ds, p, directed=False)
    back, directed = read_graphtool_binary(p)
    assert not directed
    df = back.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(df["src"]) == [0, 0, 1]
    assert list(df["dst"]) == [1, 2, 2]


def test_gt_rejects_bad_magic(tmp_path):
    p = str(tmp_path / "bad.gt")
    open(p, "wb").write(b"not a gt file")
    with pytest.raises(ValueError):
        read_graphtool_binary(p)
