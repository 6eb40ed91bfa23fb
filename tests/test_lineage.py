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


def test_grouped_exchange_checkpoint_resume(ray_session, tmp_path):
    """The SCALE-PATH exchange (grouped hierarchical bundles) must deliver
    checkpoint-resume in the SAME run as its scaling win (north rule:
    resumable from checkpoint with per-partition lineage AND >=0.8 scaling
    efficiency).  Kill-after-6 + resume-to-12 on exchange="grouped" equals
    the uninterrupted grouped run exactly, and matches pairwise."""
    G = fixture_graph("ba300")
    run_dir = str(tmp_path / "ckpt_g")

    full, it_full = pagerank(
        edges_dataset(G), fixed_iters=12, num_partitions=4, engine="actor",
        exchange="grouped",
    )
    assert it_full == 12
    full_scores = scores_to_dict(full)

    partial, _ = pagerank(
        edges_dataset(G),
        fixed_iters=6,
        num_partitions=4,
        engine="actor",
        exchange="grouped",
        checkpoint={"dir": run_dir, "every": 3, "job_id": "tg"},
    )
    assert lineage.latest_complete_iter(run_dir) == 6

    resumed, it_res = pagerank(
        edges_dataset(G),
        fixed_iters=12,
        num_partitions=4,
        engine="actor",
        exchange="grouped",
        checkpoint={"dir": run_dir, "every": 3, "job_id": "tg", "resume": True},
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

    # grouped apply is bit-identical to pairwise: cross-exchange equality
    pw, _ = pagerank(
        edges_dataset(G), fixed_iters=12, num_partitions=4, engine="actor",
        exchange="pairwise",
    )
    pw_scores = scores_to_dict(pw)
    np.testing.assert_allclose(
        [res_scores[v] for v in vids],
        [pw_scores[v] for v in vids],
        atol=0,
        rtol=0,
    )


def test_grouped_auto_no_longer_downgrades_with_checkpoint(ray_session, tmp_path):
    """exchange="auto" with a checkpoint dir must stay on the grouped
    scale path (r4 verdict ask #1) — convergence mode, resume mid-way."""
    G = fixture_graph("er200")
    run_dir = str(tmp_path / "ckpt_auto")
    full, it_full = pagerank(
        edges_dataset(G), num_partitions=4, engine="actor", tol=1e-10,
    )
    full_scores = scores_to_dict(full)

    pagerank(
        edges_dataset(G),
        fixed_iters=8,
        num_partitions=4,
        engine="actor",
        checkpoint={"dir": run_dir, "every": 4, "job_id": "ta"},
    )
    assert lineage.latest_complete_iter(run_dir) == 8
    resumed, it_res = pagerank(
        edges_dataset(G),
        num_partitions=4,
        engine="actor",
        tol=1e-10,
        checkpoint={"dir": run_dir, "every": 4, "job_id": "ta", "resume": True},
    )
    res_scores = scores_to_dict(resumed)
    vids = sorted(full_scores)
    np.testing.assert_allclose(
        [res_scores[v] for v in vids],
        [full_scores[v] for v in vids],
        atol=1e-9,
        rtol=0,
    )
