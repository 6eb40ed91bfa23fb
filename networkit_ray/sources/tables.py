"""Edge tables derived from the driver testdata (TESTDATA.md).

The driver's correctness gate runs queries() against DuckDB oracles on the
TPC-H-ish parquet tables at a given sf_dir, so these derivations are pinned,
SQL-expressible transforms:

customer–supplier graph (the standard link graph over the star schema):
    src = o_custkey
    dst = l_suppkey + SUPPLIER_OFFSET     (disjoint id spaces)
    w   = count of lineitems customer bought from supplier

Reads prune to exactly the needed columns (SURVEY.md: prune at the read).
"""

from __future__ import annotations

import os

import pyarrow as pa

SUPPLIER_OFFSET = 10_000_000


def read_table(sf_dir: str, name: str, columns=None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns
    )


def customer_supplier_edges(sf_dir: str, num_partitions: int = 8):
    """lineitem ⋈ orders -> edges(src=custkey, dst=offset+suppkey, w=count).

    One hash join on orderkey + one pre-combined groupby dedup.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j = li.join(
        orders,
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def mk(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "src": pc.cast(t["o_custkey"], pa.int64()),
                "dst": pc.add(
                    pc.cast(t["l_suppkey"], pa.int64()), SUPPLIER_OFFSET
                ),
            }
        )
        g = out.group_by(["src", "dst"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "src": g["src"],
                "dst": g["dst"],
                "w": pc.cast(g["count_all"], pa.float64()),
            }
        )

    e = j.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)
    return (
        e.groupby(["src", "dst"], num_partitions=num_partitions)
        .aggregate(Sum("w", alias_name="w"))
    )


CUSTOMER_SUPPLIER_EDGES_SQL = f"""
SELECT o_custkey AS src,
       l_suppkey + {SUPPLIER_OFFSET} AS dst,
       CAST(COUNT(*) AS DOUBLE) AS w
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""
