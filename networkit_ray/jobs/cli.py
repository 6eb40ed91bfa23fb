"""Job entry points — the `ray job submit` surface (SURVEY.md §3.2).

    python -m networkit_ray.jobs.cli <algo> --input <corpus_dir> \
        --output <run_dir> [--partitions P] [--checkpoint-every K] [--resume]

<algo> in {build, pagerank, components, labelprop, triangles}.  ``build``
ingests the corpus (sha256 -> extract -> ids -> dedup) and persists
edges/vertices/degrees parquet; the algorithm jobs read those artifacts (or
build them on the fly from --input) and write partitioned results + a
metrics JSON.  These entry points OWN the Ray session (guarded init) —
unlike library code and __ray_entry__.py, which never init.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, logging_level="ERROR"
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def build_graph(corpus_path: str, out_dir: str, level: str, num_partitions: int):
    from networkit_ray.sources.corpus import read_corpus
    from networkit_ray.stages.extract import extract_edges
    from networkit_ray.stages.graphops import dedup_edges, out_degrees
    from networkit_ray.stages.ids import (
        assert_no_vid_collisions,
        edge_keys_to_edges,
        vertex_table,
    )
    from networkit_ray.stages.sha256 import with_sha256

    corpus = with_sha256(read_corpus(corpus_path))
    ek = extract_edges(corpus, level=level)
    edges = dedup_edges(edge_keys_to_edges(ek), weight="sum")
    verts = vertex_table(ek)
    n = assert_no_vid_collisions(verts)
    edges.write_parquet(os.path.join(out_dir, "edges"))
    verts.write_parquet(os.path.join(out_dir, "vertices"))
    out_degrees(edges).write_parquet(os.path.join(out_dir, "degrees"))
    return n


def _load_graph(args):
    import ray.data

    edges_dir = os.path.join(args.output, "edges")
    if not os.path.isdir(edges_dir):
        build_graph(args.input, args.output, args.level, args.partitions)
    edges = ray.data.read_parquet(edges_dir)
    verts = ray.data.read_parquet(os.path.join(args.output, "vertices"))
    return edges, verts


def main(argv=None):
    p = argparse.ArgumentParser(prog="networkit_ray.jobs")
    p.add_argument("algo", choices=["build", "pagerank", "components", "labelprop", "triangles"])
    p.add_argument("--input", required=True, help="corpus parquet dir")
    p.add_argument("--output", required=True, help="run dir (artifacts + results)")
    p.add_argument("--level", default="repo", choices=["repo", "file"])
    p.add_argument("--partitions", type=int, default=8)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--tol", type=float, default=1e-10)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    _init_ray(args.num_cpus)
    t0 = time.perf_counter()
    metrics: dict = {"algo": args.algo, "partitions": args.partitions}

    if args.algo == "build":
        metrics["vertices"] = build_graph(
            args.input, args.output, args.level, args.partitions
        )
    else:
        edges, verts = _load_graph(args)
        n_edges = edges.count()
        metrics["edges"] = n_edges
        if args.algo == "pagerank":
            from networkit_ray.pipelines.pagerank import pagerank

            stats: dict = {}
            ckpt = None
            if args.checkpoint_every:
                ckpt = {
                    "dir": os.path.join(args.output, "checkpoints"),
                    "every": args.checkpoint_every,
                    "job_id": "pagerank",
                    "resume": args.resume,
                }
            from networkit_ray.state.csr import bsp_pagerank

            scores, iters = bsp_pagerank(
                edges,
                verts,
                damping=args.damping,
                tol=args.tol,
                max_iter=args.max_iter,
                num_partitions=args.partitions,
                checkpoint=ckpt,
                stats=stats,
            )
            scores.write_parquet(os.path.join(args.output, "scores"))
            iter_wall = sum(stats.get("iter_wall_s", [])) or 1e-9
            metrics.update(
                iters=iters,
                iter_wall_s=round(iter_wall, 4),
                edges_per_sec=round(n_edges * iters / iter_wall),
            )
        elif args.algo == "components":
            from networkit_ray.pipelines.components import connected_components

            labels, rounds = connected_components(
                edges, verts, num_partitions=args.partitions, engine="actor"
            )
            labels.write_parquet(os.path.join(args.output, "components"))
            metrics["rounds"] = rounds
        elif args.algo == "labelprop":
            from networkit_ray.pipelines.labelprop import label_propagation

            labels, rounds = label_propagation(
                edges,
                verts,
                max_iter=args.max_iter,
                num_partitions=args.partitions,
                engine="actor",
            )
            labels.write_parquet(os.path.join(args.output, "labels"))
            metrics["rounds"] = rounds
        elif args.algo == "triangles":
            from networkit_ray.pipelines.triangles import triangle_counts

            tri = triangle_counts(edges, verts, num_partitions=args.partitions)
            tri.write_parquet(os.path.join(args.output, "triangles"))

    metrics["wall_s"] = round(time.perf_counter() - t0, 3)
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, f"metrics_{args.algo}.json"), "w") as f:
        json.dump(metrics, f)
    print(json.dumps(metrics))

    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
