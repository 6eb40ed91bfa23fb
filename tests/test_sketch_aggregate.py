"""BitwiseOrSketch AggregateFnV2 + dataset-native ANF (SURVEY §2.3
distance/ row: sketch unions as a native Ray aggregate)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from networkit_ray.functions.aggregates import BitwiseOrSketch
from networkit_ray.pipelines.traversal import (
    neighborhood_function,
    neighborhood_function_dataset,
)
from tests.conftest import edges_dataset, fixture_graph


def _fixed(vals: list[bytes]) -> pa.Array:
    return pa.Array.from_buffers(
        pa.binary(len(vals[0])), len(vals), [None, pa.py_buffer(b"".join(vals))]
    )


def test_bitwise_or_groupby(ray_session):
    a = np.uint64(0b0011).tobytes()
    b = np.uint64(0b0101).tobytes()
    c = np.uint64(0b1000).tobytes()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": np.array([1, 1, 2], np.int64),
                "sk": _fixed([a, b, c]),
            }
        )
    ).repartition(3)
    out = ds.groupby("g").aggregate(BitwiseOrSketch("sk", alias_name="sk"))
    rows = {r["g"]: np.frombuffer(r["sk"], np.uint64)[0] for r in out.take_all()}
    assert rows == {1: 0b0111, 2: 0b1000}


def test_matrix_rejects_ragged_and_odd_width():
    ragged = pa.array([b"12345678", b"1234"], pa.binary())
    with pytest.raises(ValueError):
        BitwiseOrSketch._matrix(ragged)
    odd = pa.array([b"123"], pa.binary())
    with pytest.raises(ValueError):
        BitwiseOrSketch._matrix(odd)


@pytest.mark.parametrize("name", ["karate", "er200"])
def test_dataset_anf_matches_bsp(ray_session, name):
    G = fixture_graph(name)
    ds1, eff1 = neighborhood_function(
        edges_dataset(G), max_dist=5, registers=32, seed=7, num_partitions=3
    )
    ds2, eff2 = neighborhood_function_dataset(
        edges_dataset(G), max_dist=5, registers=32, seed=7, num_partitions=3
    )
    a = ds1.to_pandas().sort_values("t")["est_pairs"].to_numpy()
    b = ds2.to_pandas().sort_values("t")["est_pairs"].to_numpy()
    assert np.allclose(a, b, rtol=1e-9)
    assert eff1 == eff2


def test_dataset_anf_partition_invariance(ray_session):
    G = fixture_graph("ba300")
    outs = []
    for parts in (1, 4):
        ds, _ = neighborhood_function_dataset(
            edges_dataset(G).repartition(parts),
            max_dist=4,
            registers=16,
            seed=3,
            num_partitions=parts + 1,
        )
        outs.append(ds.to_pandas().sort_values("t")["est_pairs"].to_numpy())
    assert np.allclose(outs[0], outs[1], rtol=1e-9)
