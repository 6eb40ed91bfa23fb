"""io/ completeness family: Partition/Cover readers+writers (roundtrip
identity), DOT writer (Graphviz syntax), LineFileReader."""

import numpy as np

import ray.data
import pyarrow as pa

from networkit_ray.sources.io import (
    read_cover_file,
    read_line_file,
    read_partition_file,
    write_cover_file,
    write_dot,
    write_partition_file,
)


def _labels(labels):
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": np.arange(len(labels), dtype=np.int64),
                "label": np.asarray(labels, dtype=np.int64),
            }
        )
    )


def test_partition_roundtrip(ray_session, tmp_path):
    p = str(tmp_path / "part.txt")
    labels = [3, 1, 4, 1, 5, 9, 2, 6]
    write_partition_file(_labels(labels), p)
    assert open(p).read() == "".join(f"{x}\n" for x in labels)
    back = read_partition_file(p).to_pandas().sort_values("vid")
    assert list(back["label"]) == labels
    assert list(back["vid"]) == list(range(len(labels)))


def test_partition_writer_rejects_sparse_vids(ray_session, tmp_path):
    ds = ray.data.from_arrow(
        pa.table({"vid": np.array([0, 2], np.int64), "label": np.array([1, 1], np.int64)})
    )
    import pytest

    with pytest.raises(ValueError):
        write_partition_file(ds, str(tmp_path / "bad.txt"))


def test_cover_roundtrip(ray_session, tmp_path):
    p = str(tmp_path / "cover.txt")
    # subsets: {0,1,2}, {1,3}, {4}
    cov = ray.data.from_arrow(
        pa.table(
            {
                "vid": np.array([0, 1, 2, 1, 3, 4], np.int64),
                "subset": np.array([0, 0, 0, 1, 1, 2], np.int64),
            }
        )
    )
    write_cover_file(cov, p)
    assert open(p).read() == "1 2 3\n2 4\n5\n"
    back = read_cover_file(p).to_pandas()
    got = sorted(map(tuple, back[["vid", "subset"]].values.tolist()))
    assert got == [(0, 0), (1, 0), (1, 1), (2, 0), (3, 1), (4, 2)]


def test_write_dot(ray_session, tmp_path):
    p = str(tmp_path / "g.dot")
    eds = ray.data.from_arrow(
        pa.table(
            {
                "src": np.array([0, 1], np.int64),
                "dst": np.array([1, 2], np.int64),
            }
        )
    )
    write_dot(eds, p, name="K", directed=False)
    text = open(p).read()
    assert text.startswith("graph K {")
    assert "0 -- 1;" in text and "1 -- 2;" in text
    assert text.rstrip().endswith("}")
    write_dot(eds, p, directed=True)
    assert "0 -> 1;" in open(p).read()


def test_read_line_file(ray_session, tmp_path):
    p = str(tmp_path / "lines.txt")
    open(p, "w").write("alpha\nbeta\ngamma\n")
    got = sorted(r["text"] for r in read_line_file(p).take_all())
    assert got == ["alpha", "beta", "gamma"]
