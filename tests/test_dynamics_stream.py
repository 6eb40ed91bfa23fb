"""Dynamic event-stream generators, snapshot fold, DGS roundtrip.

Oracle: a sequential pandas replay of the same event stream (dict fold,
last event wins) — the distributed groupby-max fold must agree exactly.
"""

import numpy as np
import pyarrow as pa
import pytest

from networkit_ray.sources.dynamics import (
    _events_table,
    dynamic_barabasi_albert_events,
    dynamic_erdos_renyi_events,
    dynamic_path_events,
    events_to_snapshot,
    read_dgs,
    write_dgs,
)


def _replay(events_pdf, t=None, directed=False):
    """Sequential oracle: fold events in seq order."""
    ev = events_pdf.sort_values("seq")
    if t is not None:
        ev = ev[ev["t"] <= t]
    edges = {}
    for r in ev.itertuples(index=False):
        if r.type in ("edge_add", "weight_update", "edge_del"):
            k = (r.u, r.v) if directed else (min(r.u, r.v), max(r.u, r.v))
            if r.type == "edge_del":
                edges.pop(k, None)
            else:
                edges[k] = r.w
        elif r.type == "node_del":
            for k in [k for k in edges if r.u in k]:
                del edges[k]
    return edges


def _snap_set(ds):
    pdf = ds.to_pandas()
    return {(int(r.src), int(r.dst)): float(r.w)
            for r in pdf.itertuples(index=False)}


def test_dynamic_path_events_snapshot(ray_session):
    ev = dynamic_path_events(20, parallelism=3)
    snap = _snap_set(events_to_snapshot(ev, num_partitions=2))
    assert snap == {(i - 1, i): 1.0 for i in range(1, 20)}
    # prefix snapshot: only edges that have arrived by t=10
    snap10 = _snap_set(events_to_snapshot(ev, t=10, num_partitions=2))
    assert snap10 == {(i - 1, i): 1.0 for i in range(1, 11)}


def test_dynamic_ba_matches_static_generator(ray_session):
    from networkit_ray.sources.generators import barabasi_albert_edges

    n, k = 60, 3
    ev = dynamic_barabasi_albert_events(n, k, seed=7, parallelism=4)
    assert ev.count() == n * (k + 1)
    snap = set(_snap_set(events_to_snapshot(ev, num_partitions=3)))
    static = barabasi_albert_edges(n, k, seed=7, parallelism=2).to_pandas()
    want = {
        (min(int(s), int(d)), max(int(s), int(d)))
        for s, d in zip(static["src"], static["dst"])
    }
    assert snap == want


@pytest.mark.parametrize("par", [2, 5])
def test_dynamic_er_churn_matches_sequential_replay(ray_session, par):
    ev = dynamic_erdos_renyi_events(
        40, steps=12, adds_per_step=15, del_frac=0.4, seed=3,
        parallelism=par,
    )
    pdf = ev.to_pandas()
    want = _replay(pdf)
    got = _snap_set(events_to_snapshot(ev, num_partitions=3))
    assert got == want
    # deletions actually happened (the stream isn't add-only)
    assert (pdf["type"] == "edge_del").sum() > 0
    mid = 6
    assert _snap_set(events_to_snapshot(ev, t=mid, num_partitions=3)) == \
        _replay(pdf, t=mid)


def test_node_del_removes_incident_edges_and_readd_resurrects(ray_session):
    import ray.data

    ev = ray.data.from_arrow(
        _events_table(
            seq=[0, 1, 2, 3, 4, 5, 6],
            t=[0, 0, 0, 1, 2, 3, 4],
            typ=["node_add", "edge_add", "edge_add", "node_del",
                 "edge_add", "weight_update", "edge_del"],
            u=[1, 1, 2, 1, 1, 2, 2],
            v=[-1, 2, 3, -1, 2, 3, 3],
            w=[1, 1, 1, 1, 1, 9.5, 1],
        )
    )
    got = _snap_set(events_to_snapshot(ev, num_partitions=2))
    # (1,2) deleted by node_del@seq3 then re-added@seq4 -> alive;
    # (2,3) weight_update@seq5 then edge_del@seq6 -> gone
    assert got == {(1, 2): 1.0}
    # prefix t<=1: node_del kills (1,2); (2,3) still at its original weight
    got1 = _snap_set(events_to_snapshot(ev, t=1, num_partitions=2))
    assert got1 == {(2, 3): 1.0}
    # prefix t<=3: (1,2) resurrected, (2,3) reweighted but not yet deleted
    got3 = _snap_set(events_to_snapshot(ev, t=3, num_partitions=2))
    assert got3 == {(1, 2): 1.0, (2, 3): 9.5}


def test_dgs_roundtrip(ray_session, tmp_path):
    ev = dynamic_erdos_renyi_events(
        25, steps=6, adds_per_step=8, del_frac=0.3, seed=5, parallelism=2
    )
    p = str(tmp_path / "stream.dgs")
    write_dgs(ev, p)
    back = read_dgs(p).to_pandas().sort_values("seq").reset_index(drop=True)
    orig = ev.to_pandas().sort_values("seq").reset_index(drop=True)
    # seq is re-assigned from line order; the (t, type, u, v, w) sequence
    # must survive byte-exactly in order
    for col in ("t", "type", "u", "v", "w"):
        assert list(back[col]) == list(orig[col]), col
    # and the folded snapshots agree
    assert _snap_set(events_to_snapshot(read_dgs(p))) == _snap_set(
        events_to_snapshot(ev)
    )


def test_dgs_parses_named_nodes_and_directed_arrows(ray_session, tmp_path):
    p = str(tmp_path / "named.dgs")
    with open(p, "w") as f:
        f.write("DGS004\nnamed 0 0\n")
        f.write("st 0\nan alice\nan bob\nae e1 alice > bob weight=2.5\n")
        f.write("st 1\nde e1\nae e2 bob carol\n")
    ev = read_dgs(p).to_pandas()
    assert list(ev["type"]) == [
        "node_add", "node_add", "edge_add", "edge_del", "edge_add",
    ]
    # alice=0 bob=1 carol=2 by first appearance
    assert list(ev["u"]) == [0, 1, 0, 0, 1]
    assert list(ev["v"]) == [-1, -1, 1, 1, 2]
    assert float(ev["w"][2]) == 2.5
