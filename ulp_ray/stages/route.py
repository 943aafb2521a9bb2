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

import json
import os

import pyarrow as pa

from ..functions.schema_merge import arrow_schema_to_json

__all__ = ["write_routed", "write_sink_schemas"]


def write_routed(ds, out_dir: str, route_col: str = "route") -> None:
    """Partitioned write: ``out_dir/route=<value>/*.parquet``."""
    ds.write_parquet(out_dir, partition_cols=[route_col])


def write_sink_schemas(out_dir: str, schema: pa.Schema, routes: list[str]) -> None:
    """Write each sink's Arrow schema sidecar (ES-mapping analog).

    The routed files share one physical schema (the parse stage emits the
    union capture schema; absent captures are null) — the sidecar records
    it per route so downstream consumers of a single sink need not list
    the others."""
    payload = arrow_schema_to_json(schema)
    for route in routes:
        d = os.path.join(out_dir, f"route={route}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "_schema.json"), "w") as f:
            f.write(payload)
