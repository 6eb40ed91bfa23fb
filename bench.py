"""Benchmark harness (driver contract + BASELINE.md protocol).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and print ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

--scaling: run the scaled PageRank workload twice in fresh processes
(num_cpus=8 then 32) on the same input and print throughput at both plus
scaling efficiency = (T32/T8)/(32/8)  [T = edges/sec] — the sandbox stand-in
for the N vs 4N cluster criterion (BASELINE.md).

The scaled workload derives deterministically from the sf input: the
customer-supplier edge table replicated SCALE_COPIES times with disjoint
vid offsets (hash partitioning still mixes copies across partitions, so
every iteration remains an all-to-all message exchange).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SCALE_COPIES = int(os.environ.get("GRAFT_SCALE_COPIES", "48"))
COPY_OFFSET = 100_000_000


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _edges(num_partitions):
    from networkit_ray.sources.tables import customer_supplier_edges

    return customer_supplier_edges(SF_DIR, num_partitions=num_partitions)


def _scaled_edges(num_partitions):
    """edges x SCALE_COPIES with disjoint vid offsets (deterministic)."""
    base = _edges(num_partitions).materialize()

    def replicate(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        w = t["w"].combine_chunks().to_numpy(zero_copy_only=False)
        outs = []
        for k in range(SCALE_COPIES):
            off = np.int64(k) * COPY_OFFSET
            outs.append(pa.table({"src": src + off, "dst": dst + off, "w": w}))
        return pa.concat_tables(outs)

    return base.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)


def bench_pagerank_scaled(P):
    from networkit_ray.pipelines.pagerank import pagerank

    stats = {}
    t0 = time.perf_counter()
    scores, iters = pagerank(
        _scaled_edges(P),
        tol=1e-10,
        max_iter=60,
        num_partitions=P,
        engine="actor",
    )
    n = scores.count()
    wall = time.perf_counter() - t0
    return wall, iters, n


def run_headline():
    _init_ray()
    import ray

    from networkit_ray.pipelines.components import connected_components
    from networkit_ray.pipelines.dedup import exact_dedup, minhash_dedup_groups
    from networkit_ray.pipelines.labelprop import label_propagation
    from networkit_ray.pipelines.pagerank import pagerank
    from networkit_ray.pipelines.similarity import knn_brute
    from networkit_ray.pipelines.textstats import text_stats
    from networkit_ray.pipelines.triangles import triangle_counts
    from networkit_ray.sources.tables import read_table

    P = min(16, max(4, NUM_CPUS // 2))
    q: dict[str, float] = {}
    extra: dict[str, object] = {}

    # warm the page cache so we measure compute+shuffle, not first disk read
    edges = _edges(P).materialize()
    n_edges = edges.count()

    t0 = time.perf_counter()
    iter_stats: dict = {}
    from networkit_ray.state.csr import bsp_pagerank

    scores, iters = bsp_pagerank(
        edges, tol=1e-10, max_iter=100, num_partitions=P, stats=iter_stats,
        actor_num_cpus=1,
    )
    scores.count()
    q["pagerank"] = time.perf_counter() - t0
    iter_wall = sum(iter_stats.get("iter_wall_s", [])) or q["pagerank"]
    extra["pagerank_iters"] = iters
    extra["pagerank_edges_per_sec"] = round(n_edges * iters / iter_wall)
    extra["n_edges"] = n_edges

    t0 = time.perf_counter()
    labels, rounds = connected_components(edges, num_partitions=P, engine="actor")
    labels.count()
    q["connected_components"] = time.perf_counter() - t0
    extra["cc_rounds"] = rounds

    t0 = time.perf_counter()
    labels, rounds = label_propagation(
        edges, fixed_iters=10, num_partitions=P, engine="actor"
    )
    labels.count()
    q["label_propagation"] = time.perf_counter() - t0

    # triangles + extraction: the north-star corpus pipeline (the supplier
    # co-part projection of TPC-H is near-complete at sf0.1 — counting its
    # triangles measures nothing).  Corpus generation + sha256 + regex
    # extraction + hashed ids + dedup is itself a headline stage.
    from networkit_ray.sources.corpus import corpus_dataset
    from networkit_ray.stages.extract import extract_edges
    from networkit_ray.stages.graphops import dedup_edges
    from networkit_ray.stages.ids import edge_keys_to_edges
    from networkit_ray.stages.sha256 import with_sha256

    t0 = time.perf_counter()
    corpus = with_sha256(corpus_dataset(num_repos=2000, seed=42, parallelism=P))
    repo_edges = dedup_edges(
        edge_keys_to_edges(extract_edges(corpus, level="repo")), weight="sum"
    ).materialize()
    q["corpus_extract_build"] = time.perf_counter() - t0
    extra["corpus_edges"] = repo_edges.count()

    t0 = time.perf_counter()
    tri = triangle_counts(repo_edges, num_partitions=P)
    tri.count()
    q["triangle_counts"] = time.perf_counter() - t0

    docs = read_table(SF_DIR, "documents")
    t0 = time.perf_counter()
    text_stats(docs, concurrency=max(2, NUM_CPUS // 4)).count()
    q["text_stats"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    exact_dedup(docs, num_partitions=P).count()
    q["exact_dedup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    minhash_dedup_groups(docs, threshold=0.7, num_partitions=P).count()
    q["minhash_dedup"] = time.perf_counter() - t0

    emb = read_table(SF_DIR, "embeddings")
    t0 = time.perf_counter()
    knn_brute(emb, emb.limit(100), k=10).count()
    q["knn_brute"] = time.perf_counter() - t0

    out = {
        "metric": "headline pipelines wall time (sf tables)",
        "value": round(sum(q.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in q.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        **extra,
    }
    print(json.dumps(out))
    ray.shutdown()


def run_scale_probe():
    """Single scaled-PageRank run; prints one JSON line (used by --scaling)."""
    _init_ray()
    import ray

    P = min(32, max(4, NUM_CPUS))
    wall, iters, n = bench_pagerank_scaled(P)
    # steady-state throughput excludes graph build: time per iteration from
    # the BSP loop only
    print(
        json.dumps(
            {
                "metric": "scaled pagerank",
                "value": round(wall, 3),
                "unit": "sec",
                "iters": iters,
                "vertices": n,
                "num_cpus": NUM_CPUS,
                "copies": SCALE_COPIES,
            }
        )
    )
    ray.shutdown()


def run_scaling():
    def run(ncpu):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=SF_DIR,
            GRAFT_SCALE_COPIES=str(SCALE_COPIES),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scale-probe"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (8 vs 32 cpus, scaled pagerank)",
                "sec_8": t_lo,
                "sec_32": t_hi,
                "iters": r_lo["iters"],
                "copies": SCALE_COPIES,
                "scaling_efficiency": round(eff, 3),
                "pass": eff >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--scale-probe" in sys.argv:
        run_scale_probe()
    else:
        run_headline()
