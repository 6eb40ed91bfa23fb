"""Public coarsening operators (coarsening/ParallelPartitionCoarsening +
ClusteringProjector): contract karate by its PLP labeling, check the
coarse graph against a pure-Python contraction, and project a coarse
clustering back to the fine vertices (r4 verdict ask #6)."""

import collections

import numpy as np
import pyarrow as pa
import ray.data

from conftest import edges_dataset, fixture_graph

from networkit_ray.pipelines.coarsening import contract_by_labels, project_labels
from networkit_ray.pipelines.labelprop import label_propagation


def _labels_of(ds):
    df = ds.to_pandas()
    return dict(zip(df["vid"].astype(int), df["label"].astype(int)))


def test_contract_by_labels_matches_brute(ray_session):
    G = fixture_graph("karate")
    eds = edges_dataset(G)
    labs_ds, _ = label_propagation(eds, fixed_iters=4, num_partitions=3)
    labs = _labels_of(labs_ds)

    got = contract_by_labels(eds, labs_ds, num_partitions=3).to_pandas()
    got_map = {
        (int(s), int(d)): float(w)
        for s, d, w in zip(got["src"], got["dst"], got["w"])
    }

    want = collections.defaultdict(float)
    for u, v, data in G.edges(data=True):
        a, b = labs[int(u)], labs[int(v)]
        want[(min(a, b), max(a, b))] += float(data.get("weight", 1.0))
    assert got_map == dict(want)


def test_project_labels_roundtrip_identity(ray_session):
    """Projecting the identity clustering of the coarse graph back
    through the contraction mapping returns the original labeling."""
    G = fixture_graph("karate")
    eds = edges_dataset(G)
    labs_ds, _ = label_propagation(eds, fixed_iters=4, num_partitions=3)
    labs_ds = labs_ds.materialize()
    labs = _labels_of(labs_ds)

    coarse_ids = np.array(sorted(set(labs.values())), dtype=np.int64)
    ident = ray.data.from_arrow(
        pa.table({"vid": coarse_ids, "label": coarse_ids})
    )
    back = project_labels(ident, labs_ds, num_partitions=3)
    assert _labels_of(back) == labs


def test_project_labels_merging_clusters(ray_session):
    """A coarse clustering that merges every coarse node into one
    cluster projects to a constant fine labeling."""
    G = fixture_graph("karate")
    eds = edges_dataset(G)
    labs_ds, _ = label_propagation(eds, fixed_iters=4, num_partitions=3)
    labs_ds = labs_ds.materialize()
    labs = _labels_of(labs_ds)

    coarse_ids = np.array(sorted(set(labs.values())), dtype=np.int64)
    one = ray.data.from_arrow(
        pa.table(
            {
                "vid": coarse_ids,
                "label": np.full(len(coarse_ids), int(coarse_ids.min()), np.int64),
            }
        )
    )
    back = _labels_of(project_labels(one, labs_ds, num_partitions=3))
    assert set(back.values()) == {int(coarse_ids.min())}
    assert set(back) == set(labs)


def test_plm_still_green_through_public_contract(ray_session):
    """PLM/Louvain now routes through the public operator — its quality
    gate is unchanged (labels form a valid partition, modularity > 0 on
    karate)."""
    from networkit_ray.pipelines.community import louvain, modularity

    G = fixture_graph("karate")
    eds = edges_dataset(G)
    labs = louvain(eds, num_partitions=3).materialize()
    df = labs.to_pandas()
    assert set(df["vid"].astype(int)) == {int(v) for v in G.nodes}
    q = float(modularity(eds, labs, num_partitions=3).to_pandas()["modularity"][0])
    assert q > 0.3
