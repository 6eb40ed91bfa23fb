import networkx as nx
import numpy as np
import pytest
import pyarrow as pa


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


def nx_to_edges_table(G, weight_default: float = 1.0) -> pa.Table:
    """networkx graph -> directed edge table (one row per nx edge)."""
    src, dst, w = [], [], []
    for u, v, data in G.edges(data=True):
        src.append(int(u))
        dst.append(int(v))
        w.append(float(data.get("weight", weight_default)))
    return pa.table(
        {
            "src": np.asarray(src, dtype=np.int64),
            "dst": np.asarray(dst, dtype=np.int64),
            "w": np.asarray(w, dtype=np.float64),
        }
    )


def edges_dataset(G):
    import ray.data

    return ray.data.from_arrow(nx_to_edges_table(G))


def fixture_graph(name: str):
    """Deterministic fixture graphs (FIXTURES.md §2)."""
    if name == "karate":
        return nx.karate_club_graph()
    if name == "er200":
        return nx.gnp_random_graph(200, 0.05, seed=42)
    if name == "ba300":
        return nx.barabasi_albert_graph(300, 5, seed=42)
    if name == "ba1000":
        return nx.barabasi_albert_graph(1000, 5, seed=42)
    if name == "star50":
        return nx.star_graph(50)
    if name == "path100":
        return nx.path_graph(100)
    if name == "multicomp":
        rng = np.random.default_rng(42)
        G = nx.Graph()
        offset = 0
        for i in range(5):
            B = nx.gnp_random_graph(30, 0.15, seed=100 + i)
            G.update(nx.relabel_nodes(B, {n: n + offset for n in B.nodes}))
            offset += 30
        for i in range(10):  # isolated vertices
            G.add_node(offset + i)
        return G
    raise KeyError(name)


def scores_to_dict(result_ds) -> dict:
    tbl = result_ds.to_pandas()
    cols = [c for c in tbl.columns if c != "vid"]
    assert len(cols) == 1
    return dict(zip(tbl["vid"].astype(int), tbl[cols[0]]))


def canonical_partition(labels: dict) -> set:
    """Partition as a frozenset of frozensets (id-independent equality)."""
    groups = {}
    for v, lab in labels.items():
        groups.setdefault(lab, set()).add(v)
    return {frozenset(g) for g in groups.values()}
