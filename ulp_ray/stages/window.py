"""Windowed aggregates over an event-time column.

Ray Data is a batch engine — no watermarks or event-time streaming — so
windows are expressed batch-style (the reference has no streaming
constructs either, SURVEY.md §2.9):

- :func:`tumbling_counts` — floor the timestamp to the window size inside
  ``map_batches`` (vectorized) and run the two-phase count rollup. SQL
  oracle: ``date_trunc``/``time_bucket``.
- :func:`sliding_counts` — each row explodes into the ``size/slide``
  windows that contain it (flat explode inside ``map_batches``), then the
  same rollup.
- :func:`session_windows` — per-key sessionization: ``groupby(key)``,
  sort the group by ts, split where the gap exceeds ``gap``; emits one
  row per session with start/end/count. Ordering assumption: within a
  group, sessionization sorts by ``ts`` (the shuffle may deliver rows in
  any order); a key's whole history must fit one group (documented
  partitioning assumption — salt long-lived keys by day first if not).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .._env import remote_env
from .aggregate import count_rollup

__all__ = ["tumbling_counts", "sliding_counts", "session_windows"]


def tumbling_counts(ds, keys: list[str], ts_col: str = "ts", unit: str = "hour"):
    """Tumbling windows via floor_temporal: keys + window_start counts."""

    def add_window(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_col], unit=unit)
        return batch.append_column("window_start", w).drop_columns([ts_col])

    out = ds.map_batches(add_window, batch_format="pyarrow", **remote_env())
    return count_rollup(out, keys + ["window_start"])


def sliding_counts(
    ds,
    keys: list[str],
    ts_col: str = "ts",
    size_s: int = 3600,
    slide_s: int = 900,
):
    """Sliding windows: each row lands in ``ceil(size/slide)`` windows;
    the explode is vectorized (repeat + offset arithmetic in numpy)."""
    n_windows = (size_s + slide_s - 1) // slide_s

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)  # µs
        slide_us = slide_s * 1_000_000
        last_start = (ts // slide_us) * slide_us
        offsets = np.arange(n_windows, dtype=np.int64) * slide_us
        starts = last_start[:, None] - offsets[None, :]  # (n, n_windows)
        valid = ts[:, None] < starts + size_s * 1_000_000
        idx = np.repeat(np.arange(len(ts)), n_windows)[valid.reshape(-1)]
        win = starts.reshape(-1)[valid.reshape(-1)]
        taken = batch.take(pa.array(idx))
        out = taken.append_column(
            "window_start",
            pa.array(win, pa.int64()).cast(pa.timestamp("us")),
        )
        return out.drop_columns([ts_col])

    out = ds.map_batches(explode, batch_format="pyarrow", **remote_env())
    return count_rollup(out, keys + ["window_start"])


def session_windows(ds, key: str, ts_col: str = "ts", gap_s: int = 1800):
    """Per-key sessions (gap-based): one output row per session with
    ``session_start``, ``session_end``, ``n_events``."""
    gap = np.timedelta64(gap_s, "s")

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].to_numpy()
        new_session = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new_session[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new_session) - 1
        out = (
            pd.DataFrame({key: g[key].to_numpy(), "sid": sid, ts_col: ts})
            .groupby([key, "sid"], sort=True, dropna=False)
            .agg(
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
                n_events=(ts_col, "size"),
            )
            .reset_index()
            .drop(columns="sid")
        )
        return out

    return ds.groupby(key).map_groups(sessionize, batch_format="pandas", **remote_env())
