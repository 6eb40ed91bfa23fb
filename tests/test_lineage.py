"""Checkpoint/resume lineage (FIXTURES.md §4): killed run resumed with
--resume must equal the uninterrupted run exactly (same arithmetic path)."""

import os
import shutil

import numpy as np
import pytest

from networkit_ray.pipelines.pagerank import pagerank
from networkit_ray.state import lineage

from tests.conftest import edges_dataset, fixture_graph, scores_to_dict


def test_manifest_roundtrip(tmp_path):
    import pyarrow as pa

    run = str(tmp_path / "run")
    t = pa.table({"vid": [1, 2], "score": [0.5, 0.5]})
    m = lineage.write_partition(run, 2, 0, t, "job1")
    assert m["rows"] == 2 and m["iter"] == 2 and m["part"] == 0
    # idempotent: rewriting a committed partition is a no-op returning the
    # original manifest (mid-iteration resume semantics)
    m2 = lineage.write_partition(run, 2, 0, pa.table({"vid": [9], "score": [1.0]}), "job1")
    assert m2["output_digest"] == m["output_digest"]
    with pytest.raises(RuntimeError):
        lineage.commit_iteration(run, 2, 2)
    lineage.write_partition(run, 2, 1, t, "job1")
    lineage.commit_iteration(run, 2, 2, {"dangling": 0.1})
    assert lineage.latest_complete_iter(run) == 2
    assert lineage.read_success_meta(run, 2)["dangling"] == 0.1
    assert lineage.load_partition(run, 2, 0).equals(t)


def test_pagerank_checkpoint_resume_equals_uninterrupted(ray_session, tmp_path):
    G = fixture_graph("ba300")
    run_dir = str(tmp_path / "ckpt")

    full, it_full = pagerank(
        edges_dataset(G), fixed_iters=12, num_partitions=3, engine="actor"
    )
    full_scores = scores_to_dict(full)

    # run that "dies" after iteration 6 (checkpoint every 3)
    partial, _ = pagerank(
        edges_dataset(G),
        fixed_iters=6,
        num_partitions=3,
        engine="actor",
        checkpoint={"dir": run_dir, "every": 3, "job_id": "t1"},
    )
    assert lineage.latest_complete_iter(run_dir) == 6

    # simulate a mid-iteration partial commit of iteration 9: partition 0
    # checkpointed, no _SUCCESS -> resume must complete the iteration
    resumed, it_res = pagerank(
        edges_dataset(G),
        fixed_iters=12,
        num_partitions=3,
        engine="actor",
        checkpoint={"dir": run_dir, "every": 3, "job_id": "t1", "resume": True},
    )
    assert it_res == 12
    res_scores = scores_to_dict(resumed)
    vids = sorted(full_scores)
    np.testing.assert_allclose(
        [res_scores[v] for v in vids],
        [full_scores[v] for v in vids],
        atol=1e-12,
        rtol=0,
    )
    assert lineage.latest_complete_iter(run_dir) == 12
