"""Windowed aggregates over the events log — the stream-shaped operator
family (driver guide: treat the input as an ordered, partitioned log;
windows = groupby(key) + per-group ordered computation).

- ``tumbling_window``: fixed-size event-time windows per user — one
  pre-combined groupby; fully vectorized (window key is arithmetic on the
  timestamp, no per-row Python).
- ``session_windows``: gap-based sessionization per user —
  groupby(user).map_groups over ts-sorted groups (the documented ordering
  assumption: events of one user are materialized into one group; Ray's
  sort-based groupby guarantees it).  SQL oracle: LAG + cumulative-flag
  window functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum


def tumbling_window(events_ds, window_s: int = 3600, num_partitions: int = 8):
    """-> (user_id, window_start_us, n_events, sum_value) per user/window."""
    us = np.int64(window_s) * 1_000_000

    def pre(t: pa.Table) -> pa.Table:
        col = t["ts"].combine_chunks()
        if pa.types.is_timestamp(col.type):
            # normalize to microsecond ticks regardless of the writer's
            # resolution (ns-typed parquet would silently shrink windows
            # 1000x if raw ticks were used)
            col = col.cast(pa.timestamp("us"))
        ts = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // us) * us
        out = pa.table(
            {
                "user_id": t["user_id"],
                "window_start_us": win,
                "n": np.ones(len(win), dtype=np.int64),
                "v": t["value"],
            }
        )
        return (
            out.group_by(["user_id", "window_start_us"])
            .aggregate([("n", "sum"), ("v", "sum")])
            .rename_columns(["user_id", "window_start_us", "n", "v"])
        )

    return (
        events_ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "window_start_us"], num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n_events"), Sum("v", alias_name="sum_value"))
    )


def session_windows(events_ds, gap_s: int = 1800, num_partitions: int = 8):
    """-> (user_id, session_start_us, session_end_us, n_events, sum_value):
    sessions split where the gap between consecutive events > gap_s."""
    gap_us = np.int64(gap_s) * 1_000_000

    def sess(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("ts").reset_index(drop=True)
        ts_col = df["ts"]
        if pd.api.types.is_datetime64_any_dtype(ts_col):
            # microsecond ticks independent of the stored resolution
            ts_col = ts_col.dt.as_unit("us")
        ts = ts_col.astype("int64").to_numpy()
        new_sess = np.ones(len(ts), dtype=bool)
        new_sess[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_sess) - 1
        g = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "sid": sid,
                "ts": ts,
                "value": df["value"].to_numpy(),
            }
        ).groupby("sid", sort=True)
        out = g.agg(
            user_id=("user_id", "first"),
            session_start_us=("ts", "min"),
            session_end_us=("ts", "max"),
            n_events=("ts", "size"),
            sum_value=("value", "sum"),
        ).reset_index(drop=True)
        return out[
            ["user_id", "session_start_us", "session_end_us", "n_events", "sum_value"]
        ]

    return events_ds.select_columns(["user_id", "ts", "value"]).groupby(
        "user_id", num_partitions=num_partitions
    ).map_groups(sess, batch_format="pandas")


def sliding_window(
    events_ds, window_s: int = 3600, step_s: int = 900,
    num_partitions: int = 8,
):
    """Hopping/sliding event-time windows per user: window W sliding by
    step S (W %% S == 0 required) — each event lands in W/S hop windows.

    Vectorized replicate-then-combine: per batch, rows fan out to their
    hop window starts with a numpy repeat/arange (no per-row Python),
    pre-combine by (user, window) BEFORE the one global groupby, so the
    shuffle volume is the combined key count, not rows x hops.
    -> (user_id, window_start_us, n_events, sum_value), windows that
    contain at least one event only."""
    if window_s % step_s != 0:
        raise ValueError("window_s must be a multiple of step_s")
    us_w = np.int64(window_s) * 1_000_000
    us_s = np.int64(step_s) * 1_000_000
    hops = int(window_s // step_s)

    def pre(t: pa.Table) -> pa.Table:
        col = t["ts"].combine_chunks()
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.timestamp("us"))
        ts = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        # last hop window containing ts starts at floor(ts/S)*S; the
        # containing windows start there and walk back hops-1 steps
        last = (ts // us_s) * us_s
        starts = last[:, None] - us_s * np.arange(hops, dtype=np.int64)[None, :]
        # a window only contains ts if ts < start + W (always true here:
        # start >= last - (hops-1)S = floor(ts/S)S - W + S > ts - W)
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        val = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        out = pa.table(
            {
                "user_id": np.repeat(uid, hops),
                "window_start_us": starts.ravel(),
                "n": np.ones(len(ts) * hops, dtype=np.int64),
                "v": np.repeat(val, hops),
            }
        )
        return (
            out.group_by(["user_id", "window_start_us"])
            .aggregate([("n", "sum"), ("v", "sum")])
            .rename_columns(["user_id", "window_start_us", "n", "v"])
        )

    return (
        events_ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "window_start_us"], num_partitions=num_partitions)
        .aggregate(Sum("n", alias_name="n_events"), Sum("v", alias_name="sum_value"))
    )
