"""Conversation-level operators over the transcript contract table —
the transcript-domain transforms a training-data pipeline needs beyond
the reference's per-record model (ulp has no grouped/windowed compute).

- :func:`conversation_stats` — one row per conv_id: turn count, tool-turn
  count, start/end ts, duration. Partial-per-block (count/min/max are
  associative) + fold, so a hot conv_id never concentrates raw turns.
- :func:`turn_gaps` — per-conversation inter-turn latency (ts delta to
  the previous turn under (conv_id, turn_idx) order). Order-dependent ⇒
  conversations must co-locate — done by ``hash(conv_id) % buckets``
  co-grouping (one Python callback per BUCKET; the in-bucket body is a
  single vectorized sort + diff + boundary mask over all of the bucket's
  conversations). A single conv_id holding a large fraction of all turns
  still concentrates its bucket — the documented hot-key hazard for
  order-dependent ops (mitigate upstream by capping conversation length
  at ingest).
- :func:`assemble_conversations` — 1 row per conversation with its turns
  as a sorted list<struct> (the training-data export shape); same bucket
  co-grouping, with the list column built by offset slicing
  (``pa.ListArray.from_arrays``) — no per-conversation Python.
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
    # distributed fold: co-group the partials by hash bucket (a hot conv
    # contributes ≤ #blocks partial rows; finalize's pyarrow group_by is
    # C-level over the whole bucket — no per-conv Python)
    from ._bucket import with_bucket

    return (
        with_bucket(partials, ["conv_id"], 256)
        .groupby("__bucket")
        .map_groups(
            lambda g: finalize(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
            **remote_env(),
        )
    )


def turn_gaps(ds, buckets: int | None = None):
    """Per-turn latency: ``conv_id, turn_idx, gap_s`` (ts delta to the
    previous turn; first turn → null). Order established per bucket by a
    single (conv_id, turn_idx) sort; conversation boundaries mask the
    cross-conversation diffs."""
    from ._bucket import with_bucket

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        conv = g["conv_id"].to_numpy()
        dt = g["ts"].diff().dt.total_seconds().to_numpy()
        first = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            first[1:] = conv[1:] != conv[:-1]
        dt[first] = np.nan
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": g["turn_idx"].to_numpy(),
                "gap_s": dt,
            }
        )

    return (
        with_bucket(ds, ["conv_id"], buckets)
        .groupby("__bucket")
        .map_groups(gaps, batch_format="pandas", **remote_env())
    )


def assemble_conversations(ds, buckets: int | None = None):
    """Reassemble turns into one row per conversation:
    ``conv_id, n_turns, turns: list<struct{turn_idx, role, text, tool}>``
    sorted by turn_idx — the export shape for conversation-level training
    data."""
    from ._bucket import resolve_buckets

    # resolve HERE so the overflow guard below can report the actual count
    buckets = resolve_buckets(buckets, ds)

    struct_type = pa.struct(
        [
            ("turn_idx", pa.int64()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
        ]
    )
    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_turns", pa.int64()),
            ("turns", pa.list_(struct_type)),
        ]
    )

    from ._bucket import with_bucket

    def assemble(g: pd.DataFrame) -> pa.Table:
        # one bucket = many conversations: sort once, then slice the
        # struct array into per-conversation lists via run-boundary
        # offsets — zero per-conversation Python
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        n = len(g)
        if n == 0:
            return out_schema.empty_table()
        conv = g["conv_id"].to_numpy()
        change = np.ones(n, dtype=bool)
        change[1:] = conv[1:] != conv[:-1]
        starts = np.flatnonzero(change)
        # list<> offsets are int32: a silent astype would WRAP past 2^31
        # rows per bucket and corrupt the turns column. Guard loudly —
        # the fix is more buckets, not a schema change (the contract
        # pins list<struct>, not large_list).
        if n >= 2**31:
            raise ValueError(
                f"bucket holds {n} turns, over the int32 list-offset "
                f"limit; raise buckets= (currently {buckets}) so each "
                "hash bucket stays under 2^31 rows"
            )
        offsets = np.concatenate([starts, [n]]).astype(np.int32)
        # explicit field types: pandas inference would give a null-typed
        # field when e.g. every tool in the bucket is null
        fields = [
            pa.Array.from_pandas(g["turn_idx"]).cast(pa.int64(), safe=False),
            pa.Array.from_pandas(g["role"]).cast(pa.string()),
            pa.Array.from_pandas(g["text"]).cast(pa.string()),
            pa.Array.from_pandas(g["tool"]).cast(pa.string()),
        ]
        struct = pa.StructArray.from_arrays(
            fields, fields=list(struct_type)
        )
        turns = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
        return pa.table(
            {
                "conv_id": pa.array(conv[starts], pa.string()),
                "n_turns": pa.array(
                    np.diff(offsets).astype(np.int64), pa.int64()
                ),
                "turns": turns,
            },
            schema=out_schema,
        )

    return (
        with_bucket(ds, ["conv_id"], buckets)
        .groupby("__bucket")
        .map_groups(assemble, batch_format="pandas", **remote_env())
    )
