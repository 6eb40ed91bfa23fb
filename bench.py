"""Benchmark harness (driver contract + BASELINE.md protocol).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and print ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

--scaling: run the scaled PageRank workload twice in fresh CPU-pinned
processes (2 then 8 cpus by default; GRAFT_SCALE_CPUS_LO/HI) on the same
input with the SAME fixed partition count, and print throughput at both
plus steady-state scaling efficiency — the sandbox stand-in for the
N vs 4N cluster criterion (BASELINE.md).

The scaled workload derives deterministically from the sf input: the
customer-supplier edge table replicated SCALE_COPIES times with disjoint
vid offsets, generated actor-locally (BSPGraph.from_replicated).  Hash
partitioning mixes copies across partitions, so every iteration remains a
genuine all-to-all message exchange.
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
SCALE_COPIES = int(os.environ.get("GRAFT_SCALE_COPIES", "192"))
SCALE_P = int(os.environ.get("GRAFT_SCALE_P", "8"))
COPY_OFFSET = 100_000_000


def _proc_stat():
    """(steal_jiffies, total_jiffies) from /proc/stat's aggregate cpu line."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return (vals[7] if len(vals) > 7 else 0, sum(vals))
    except Exception:
        return (0, 0)


def _steal_pct(before, after) -> float:
    """CPU-steal share of elapsed host time between two _proc_stat snaps.
    >5% means a noisy virtualized host is eating our cores mid-measurement
    (this VM has shown 3-38% bursts); reported so BENCH json carries the
    noise evidence alongside the timings it distorts."""
    ds, dt = after[0] - before[0], after[1] - before[1]
    return round(100.0 * ds / dt, 1) if dt > 0 else 0.0


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


def bench_pagerank_scaled(P):
    """Scaled PageRank: base edge table (from the sf input) replicated
    SCALE_COPIES times with disjoint vid offsets, ingested actor-locally.
    The job (P partitions) is FIXED; only the cluster CPU count varies
    between the two --scaling runs (the N vs 4N criterion)."""
    import ray

    from networkit_ray.state.csr import BSPGraph

    base = _edges(min(4, P)).materialize()
    base_tbl = pa.concat_tables(ray.get(base.to_arrow_refs()))
    stats: dict = {}
    t0 = time.perf_counter()
    g = BSPGraph.from_replicated(
        base_tbl, SCALE_COPIES, COPY_OFFSET, P, actor_num_cpus=0.1
    )
    stats["build_s"] = round(time.perf_counter() - t0, 3)
    try:
        scores, iters = g.pagerank(tol=1e-10, max_iter=60, stats=stats)
        t1 = time.perf_counter()
        n = scores.count()
        stats["collect_s"] = round(time.perf_counter() - t1, 3)
    finally:
        g.shutdown()
    wall = time.perf_counter() - t0
    iter_wall = sum(stats.get("iter_wall_s", [])) or wall
    return wall, iter_wall, iters, n, base_tbl.num_rows, stats


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
    stat0 = _proc_stat()

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

    from networkit_ray.pipelines.similarity import knn_ivf

    t0 = time.perf_counter()
    knn_ivf(emb, emb.limit(100), k=10, num_centroids=64, nprobe=8).count()
    q["knn_ivf"] = time.perf_counter() - t0

    extra["host_steal_pct"] = _steal_pct(stat0, _proc_stat())
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
    """Single scaled-PageRank run; prints one JSON line (used by --scaling).

    Pins the process (and every Ray worker forked under it) to NUM_CPUS
    physical cores: ray.init(num_cpus=N) alone only bounds the scheduler's
    bookkeeping, not OS parallelism, so without affinity the "small
    cluster" run would still use every core and the comparison would be
    meaningless.
    """
    try:
        os.sched_setaffinity(0, set(range(NUM_CPUS)))
    except (AttributeError, OSError):
        pass
    _init_ray()
    import ray

    P = SCALE_P
    stat0 = _proc_stat()
    wall, iter_wall, iters, n, base_edges, st = bench_pagerank_scaled(P)
    print(
        json.dumps(
            {
                "metric": "scaled pagerank",
                "value": round(wall, 3),
                "unit": "sec",
                "iter_wall_s": round(iter_wall, 3),
                "iters": iters,
                "vertices": n,
                "build_s": st.get("build_s"),
                "collect_s": st.get("collect_s"),
                "edges": base_edges * SCALE_COPIES,
                "num_cpus": NUM_CPUS,
                "partitions": P,
                "copies": SCALE_COPIES,
                "host_steal_pct": _steal_pct(stat0, _proc_stat()),
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

    lo = int(os.environ.get("GRAFT_SCALE_CPUS_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALE_CPUS_HI", "8"))
    # best-of-N legs with cooldowns: the sandbox VM shows nonzero CPU
    # steal (virtualized host), which randomly inflates one leg and makes
    # a single lo/hi pair meaningless; min-per-leg removes the transient
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "2"))

    def best(ncpu):
        rs = []
        for _ in range(reps):
            rs.append(run(ncpu))
            time.sleep(10)
        return min(rs, key=lambda r: r["iter_wall_s"])

    r_lo = best(lo)
    r_hi = best(hi)
    # steady-state criterion (BASELINE.md): per-iteration throughput ratio,
    # graph build reported separately via total wall
    eff_iter = (r_lo["iter_wall_s"] / r_hi["iter_wall_s"]) / (hi / lo)
    eff_total = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency ({lo} vs {hi} cpus, fixed P={SCALE_P} scaled pagerank)",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "iter_sec_lo": r_lo["iter_wall_s"],
                "iter_sec_hi": r_hi["iter_wall_s"],
                "edges": r_lo.get("edges"),
                "iters": r_lo["iters"],
                "copies": SCALE_COPIES,
                "reps_per_leg": reps,
                "host_steal_pct_lo": r_lo.get("host_steal_pct"),
                "host_steal_pct_hi": r_hi.get("host_steal_pct"),
                "scaling_efficiency": round(eff_iter, 3),
                "scaling_efficiency_total": round(eff_total, 3),
                "pass": eff_iter >= 0.8,
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
