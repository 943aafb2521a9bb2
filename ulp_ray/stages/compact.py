"""Sink compaction: merge the small files a routed fan-out accumulates.

At scale, ``write_parquet(partition_cols=["route"])`` across many
checkpoint partitions leaves each route with one small file per write
task — a metadata and read-amplification tax (the classic small-files
problem; the reference's per-task NDJSON files have it worse,
``/root/reference/src/evtx.rs:28-34``). ``compact_route`` rewrites one
route's files into ~``target_rows``-row files; ``compact_run`` walks a
finished run's sinks. Compaction is idempotent and crash-safe: the
compacted output goes to a temp dir that atomically replaces the route
dir only after the row count is verified."""

from __future__ import annotations

import glob as globmod
import os
import shutil

import pyarrow.parquet as pq

__all__ = ["compact_route", "compact_run"]


def compact_route(route_dir: str, target_rows: int = 1_000_000) -> int:
    """Rewrite one ``route=<x>`` directory into ≥1 files of up to
    ``target_rows`` rows. Returns the resulting file count."""
    backup = route_dir + ".pre-compact"
    tmp = route_dir + ".compact.tmp"
    # recover from a prior crash: mid-swap (route_dir gone, backup holds
    # the data) → restore; post-swap (both exist) → drop the backup;
    # stale tmp → drop
    if os.path.isdir(backup):
        if not os.path.isdir(route_dir):
            os.replace(backup, route_dir)
        else:
            shutil.rmtree(backup)
    shutil.rmtree(tmp, ignore_errors=True)

    files = sorted(globmod.glob(os.path.join(route_dir, "*.parquet")))
    if len(files) <= 1:
        return len(files)
    total = sum(pq.read_metadata(f).num_rows for f in files)
    os.makedirs(tmp)
    writer = None
    out_idx = 0
    rows_in_file = 0
    written = 0
    try:
        for f in files:
            pf = pq.ParquetFile(f)
            for batch in pf.iter_batches():
                if writer is None or rows_in_file >= target_rows:
                    if writer is not None:
                        writer.close()
                        out_idx += 1
                    writer = pq.ParquetWriter(
                        os.path.join(tmp, f"compacted-{out_idx:05d}.parquet"),
                        batch.schema,
                    )
                    rows_in_file = 0
                writer.write_batch(batch)
                rows_in_file += batch.num_rows
                written += batch.num_rows
    finally:
        if writer is not None:
            writer.close()
    if written != total:  # refuse to replace on a partial compaction
        shutil.rmtree(tmp)
        raise RuntimeError(f"compaction row mismatch: {written} != {total}")
    # keep sidecars (e.g. _schema.json)
    for side in globmod.glob(os.path.join(route_dir, "_*")):
        shutil.copy(side, tmp)
    os.replace(route_dir, backup)
    os.replace(tmp, route_dir)
    shutil.rmtree(backup)
    return out_idx + 1


def compact_run(run_dir: str, target_rows: int = 1_000_000) -> dict[str, int]:
    """Compact every route directory of a run — both the flagship layout
    (``sinks/partition=*/route=*``) and the ingest layout
    (``sinks/route=*``)."""
    patterns = [
        os.path.join(run_dir, "sinks", "partition=*", "route=*"),
        os.path.join(run_dir, "sinks", "route=*"),
    ]
    out: dict[str, int] = {}
    # recover mid-swap crashes FIRST: a crash between the two os.replace
    # calls leaves only route=<x>.pre-compact (the live dir is gone), and
    # the loop below never visits the missing route dir — restore it here
    for pat in patterns:
        for backup in sorted(globmod.glob(pat + ".pre-compact")):
            live = backup[: -len(".pre-compact")]
            if not os.path.isdir(live):
                os.replace(backup, live)
    for route_dir in sorted(d for pat in patterns for d in globmod.glob(pat)):
        # skip crash debris (handled inside compact_route's recovery)
        if route_dir.endswith(".pre-compact") or route_dir.endswith(".compact.tmp"):
            continue
        out[os.path.relpath(route_dir, run_dir)] = compact_route(
            route_dir, target_rows
        )
    return out
