"""Route fan-out: per-rule Parquet sinks.

The analog of the reference's per-route Elasticsearch indices
(``/root/reference/src/elastic.rs:76-154``): rows fan out to one Parquet
dataset per sanitized ``route`` value via a single partitioned write
(``write_parquet(partition_cols=["route"])``) — one pass over the data, no
per-sink filter scans. Each sink also gets a ``_schema.json`` sidecar, the
analog of the ES index mapping PUT (``src/elastic.rs:11-66``).

Retries/idempotency: the reference re-ingests with fresh uuids, duplicating
documents on re-run (``src/elastic.rs:108``). Here partition output
directories are deterministic functions of (input partition, registry
version); a re-run overwrites the same paths (see
``ulp_ray.pipelines.flagship``).
"""

from __future__ import annotations

__all__ = ["write_routed"]


def write_routed(ds, out_dir: str, route_col: str = "route") -> None:
    """Partitioned write: ``out_dir/route=<value>/*.parquet``.

    Schema sidecars are written by the pipelines from the merged
    per-route TypeNodes (``flagship._write_merged_schemas`` /
    ``ingest.ingest_ndjson``) — each route's ``_schema.json`` reflects
    that route's own captures."""
    from .._env import remote_env

    ds.write_parquet(
        out_dir, partition_cols=[route_col], ray_remote_args=remote_env()
    )
