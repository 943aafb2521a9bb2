"""Conversation-level operators over the transcript contract table —
the transcript-domain transforms a training-data pipeline needs beyond
the reference's per-record model (ulp has no grouped/windowed compute).

- :func:`conversation_stats` — one row per conv_id: turn count, tool-turn
  count, start/end ts, duration. Partial-per-block (count/min/max are
  associative) + fold, so a hot conv_id never concentrates raw turns.
- :func:`turn_gaps` — per-conversation inter-turn latency (ts delta to
  the previous turn under (conv_id, turn_idx) order). Order-dependent ⇒
  per-group compute: a conversation's turns must co-locate, so a single
  conv_id holding a large fraction of all turns WILL straggle one task —
  the documented hot-key hazard for order-dependent ops (mitigate
  upstream by capping conversation length at ingest).
- :func:`assemble_conversations` — 1 row per conversation with its turns
  as a sorted list<struct> (the training-data export shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._env import remote_env

__all__ = ["conversation_stats", "turn_gaps", "assemble_conversations"]


def conversation_stats(ds, driver_fold_max_rows: int = 2_000_000):
    """Per-conversation rollup: ``conv_id, n_turns, n_tool_turns,
    t_start, t_end, duration_s`` via associative per-block partials."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_tool = pc.cast(pc.equal(batch["role"], "tool"), pa.int64())
        b = batch.append_column("is_tool", is_tool)
        g = b.group_by(["conv_id"]).aggregate(
            [([], "count_all"), ("is_tool", "sum"), ("ts", "min"), ("ts", "max")]
        )
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "n_turns": g["count_all"],
                "n_tool_turns": g["is_tool_sum"],
                "t_start": g["ts_min"],
                "t_end": g["ts_max"],
            }
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, **remote_env()
    ).materialize()

    def finalize(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = tbl.group_by(["conv_id"]).aggregate(
            [
                ("n_turns", "sum"),
                ("n_tool_turns", "sum"),
                ("t_start", "min"),
                ("t_end", "max"),
            ]
        )
        dur = pc.divide(
            pc.cast(
                pc.subtract(
                    pc.cast(g["t_end_max"], pa.int64()),
                    pc.cast(g["t_start_min"], pa.int64()),
                ),
                pa.float64(),
            ),
            1_000_000.0,
        )
        return pa.table(
            {
                "conv_id": g["conv_id"],
                "n_turns": g["n_turns_sum"],
                "n_tool_turns": g["n_tool_turns_sum"],
                "t_start": g["t_start_min"],
                "t_end": g["t_end_max"],
                "duration_s": dur,
            }
        )

    if partials.count() <= driver_fold_max_rows:
        import ray

        batches = list(partials.iter_batches(batch_format="pyarrow", batch_size=None))
        if not batches:
            empty = pa.schema(
                [
                    ("conv_id", pa.string()),
                    ("n_turns", pa.int64()),
                    ("n_tool_turns", pa.int64()),
                    ("t_start", pa.timestamp("us")),
                    ("t_end", pa.timestamp("us")),
                    ("duration_s", pa.float64()),
                ]
            ).empty_table()
            return ray.data.from_arrow(empty)
        return ray.data.from_arrow(finalize(pa.concat_tables(batches)))
    # distributed fold: group the partials themselves (still pre-combined
    # per block, so a hot conv contributes ≤ #blocks partial rows)
    return partials.groupby("conv_id").map_groups(
        lambda g: finalize(g), batch_format="pyarrow", **remote_env()
    )


def turn_gaps(ds):
    """Per-turn latency: ``conv_id, turn_idx, gap_s`` (ts delta to the
    previous turn; first turn → null). Order established per group."""

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx")
        dt = g["ts"].diff().dt.total_seconds()
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"].to_numpy(),
                "turn_idx": g["turn_idx"].to_numpy(),
                "gap_s": dt.to_numpy(),
            }
        )

    return ds.groupby("conv_id").map_groups(
        gaps, batch_format="pandas", **remote_env()
    )


def assemble_conversations(ds):
    """Reassemble turns into one row per conversation:
    ``conv_id, n_turns, turns: list<struct{turn_idx, role, text, tool}>``
    sorted by turn_idx — the export shape for conversation-level training
    data."""

    turns_type = pa.list_(
        pa.struct(
            [
                ("turn_idx", pa.int64()),
                ("role", pa.string()),
                ("text", pa.string()),
                ("tool", pa.string()),
            ]
        )
    )

    def assemble(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("turn_idx")
        # explicit type: per-group inference would give a null-typed
        # struct field for conversations where e.g. every tool is null
        turns = pa.array(
            [g[["turn_idx", "role", "text", "tool"]].to_dict("records")],
            type=turns_type,
        )
        return pa.table(
            {
                "conv_id": pa.array([g["conv_id"].iloc[0]], pa.string()),
                "n_turns": pa.array([len(g)], pa.int64()),
                "turns": turns,
            }
        )

    return ds.groupby("conv_id").map_groups(
        assemble, batch_format="pandas", **remote_env()
    )
