"""SEIR epidemic simulation: exact replication against a sequential
pure-Python replay using the same counter-hash draws."""

import numpy as np
import pandas as pd
import pytest

from conftest import edges_dataset, fixture_graph

from networkit_ray.pipelines.epidemics import seir_simulation

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _brute_seir(G, zero, t_max, e_time, i_time, p, seed):
    state = {v: 0 for v in G.nodes()}
    timer = {v: 0 for v in G.nodes()}
    for z in zero:
        state[z] = 2
        timer[z] = i_time

    def counts():
        return [sum(1 for s in state.values() if s == k) for k in range(4)]

    traj = [counts()]
    for t in range(1, t_max + 1):
        if traj[-1][1] + traj[-1][2] == 0:
            break
        infectious = {v for v, s in state.items() if s == 2}
        for v in list(state):
            if state[v] in (1, 2):
                timer[v] -= 1
                if timer[v] <= 0:
                    if state[v] == 1:
                        state[v] = 2
                        timer[v] = i_time
                    else:
                        state[v] = 3
        for v in list(state):
            if state[v] != 0:
                continue
            c = sum(1 for u in G.neighbors(v) if u in infectious)
            if c == 0:
                continue
            key = np.uint64(v) * _MIX + np.uint64(t) * np.uint64(
                2654435761
            ) + np.uint64(seed)
            u01 = float(
                (pd.util.hash_array(key.reshape(1).view(np.int64))[0]
                 >> np.uint64(11)) * (2.0**-53)
            )
            if u01 < 1.0 - (1.0 - p) ** c:
                state[v] = 1
                timer[v] = e_time
        traj.append(counts())
    return traj


@pytest.mark.parametrize("par", [2, 4])
def test_seir_matches_sequential_replay(ray_session, par):
    G = fixture_graph("karate")
    want = _brute_seir(G, [0], 40, 2, 3, 0.3, seed=9)
    got = seir_simulation(
        edges_dataset(G), [0], t_max=40, e_time=2, i_time=3,
        trans_p=0.3, seed=9, num_partitions=par,
    ).to_pandas()
    assert len(got) == len(want)
    for t, row in enumerate(want):
        assert list(got.iloc[t][["s", "e", "i", "r"]]) == row, t


def test_seir_conservation_and_monotone_r(ray_session):
    G = fixture_graph("er200")
    got = seir_simulation(
        edges_dataset(G), [0, 1, 2], t_max=60, trans_p=0.2,
        num_partitions=3,
    ).to_pandas()
    n = G.number_of_nodes()
    assert ((got["s"] + got["e"] + got["i"] + got["r"]) == n).all()
    assert (np.diff(got["r"]) >= 0).all()
    assert (np.diff(got["s"]) <= 0).all()
    with pytest.raises(ValueError):
        seir_simulation(edges_dataset(G), [0], e_time=0)
