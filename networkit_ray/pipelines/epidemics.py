"""EpidemicSimulationSEIR (reference simulation/EpidemicSimulationSEIR —
SURVEY.md §2.3 `simulation/`; reference dir is empty, semantics pinned to
the standard discrete-time network SEIR model and the pure-Python replay
oracle in tests/test_epidemics.py).

Model, per synchronous step: timers advance (E->I after e_time steps,
I->R after i_time), then every susceptible vertex with c infectious
neighbors (PRE-step set) becomes exposed with probability
1 - (1 - trans_p)^c.  Randomness is a counter hash of (vid, t, seed) —
partition-invariant, replayable, and resumable like every other kernel
here.  One BSP exchange per step (per-target bincounts of infectious
out-neighbors); the driver sees only the 4-tuple state counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from networkit_ray.stages.graphops import canonicalize_undirected, symmetrize


def seir_simulation(
    edges_ds,
    zero_vids,
    t_max: int = 100,
    e_time: int = 2,
    i_time: int = 3,
    trans_p: float = 0.3,
    seed: int = 42,
    num_partitions: int = 8,
):
    """-> Dataset(t, s, e, i, r): the state-count trajectory (row 0 = the
    seeded initial state; stops early once no exposed/infectious remain).
    ``e_time``/``i_time`` must be >= 1."""
    import ray.data

    from networkit_ray.state.csr import BSPGraph

    if e_time < 1 or i_time < 1:
        raise ValueError("e_time and i_time must be >= 1")
    sym = symmetrize(
        canonicalize_undirected(edges_ds, weight="one")
    ).materialize()
    g = BSPGraph(sym, None, num_partitions)
    try:
        traj = g.seir_run(
            np.asarray(list(zero_vids), np.int64),
            t_max, e_time, i_time, trans_p, seed,
        )
    finally:
        g.shutdown()
    return ray.data.from_arrow(
        pa.table(
            {
                "t": np.arange(len(traj), dtype=np.int64),
                "s": traj[:, 0],
                "e": traj[:, 1],
                "i": traj[:, 2],
                "r": traj[:, 3],
            }
        )
    )
