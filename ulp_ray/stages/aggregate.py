"""Aggregation: partial-per-batch (combiner) + small final groupby.

The reference folds every record into one mutex-guarded job-global
``Mapping`` (``/root/reference/src/type_map.rs:156-173`` under
``src/job.rs:16``'s ``Arc<Mutex<_>>``) — its scalability ceiling. Here the
same rollups are monoid folds done partial-per-batch inside ``map_batches``
(one row per key per batch) followed by a ``groupby().aggregate(Sum)`` over
the tiny partials — the all-to-all shuffle only ever moves pre-aggregated
key rows, so dominant-rule / hot-conv_id skew cannot concentrate raw rows
on one reducer (this pre-combine is the salted-repartition equivalent: the
"salt" is the batch id, dropped at the final fold).

Also provides the grouped schema rollup (per-route dynamic schema — the
analog of ``Mapping.index_pattern_mappings``) as a mergeable per-batch
partial using the §P3 lattice.
"""

from __future__ import annotations

import json
from typing import Sequence

import pyarrow as pa

from ..functions.schema_merge import (
    TypeNode,
    merge_types,
    infer_type,
)

__all__ = ["count_rollup", "partial_counts_fn", "schema_rollup_partials"]


def partial_counts_fn(keys: Sequence[str]):
    """Batch fn: collapse a batch to one row per distinct key tuple with a
    partial count column ``n`` (Arrow hash-aggregate, vectorized)."""

    key_list = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(key_list).aggregate([([], "count_all")])
        cols = {k: g[k] for k in key_list}
        cols["n"] = g["count_all"]
        return pa.table(cols)

    return partial


def count_rollup(ds, keys: Sequence[str]):
    """Two-phase distributed count rollup: per-batch partials → shuffle of
    partials only → final Sum. Returns a Dataset with ``keys + [n]``."""
    from ray.data.aggregate import Sum

    from .._env import remote_env

    partials = ds.map_batches(
        partial_counts_fn(keys), batch_format="pyarrow", batch_size=None, **remote_env()
    )
    out = partials.groupby(list(keys)).aggregate(Sum("n", alias_name="n"))
    return out


def schema_rollup_partials(ds, route_col: str = "route", sample_per_batch: int = 64):
    """Per-route dynamic-schema rollup (``index_pattern_mappings`` analog).

    Each batch contributes one (route, serialized TypeNode) partial inferred
    from a bounded sample of rows; partials merge associatively on the
    driver via the §P3 lattice. Returns ``dict[route, TypeNode]``.

    The sample bound keeps this metadata fold O(routes) not O(rows) — the
    physical Arrow schema is exact regardless; the dynamic tree only feeds
    the per-sink ``_schema.json`` sidecar.
    """

    def partial(batch: pa.Table) -> pa.Table:
        routes: list[str] = []
        nodes: list[str] = []
        for route_val in batch[route_col].unique().to_pylist():
            mask = pa.compute.equal(batch[route_col], route_val)
            sub = batch.filter(mask).slice(0, sample_per_batch)
            node: TypeNode | None = None
            for row in sub.to_pylist():
                t = infer_type(row)
                node = t if node is None else merge_types(node, t)
            routes.append(route_val)
            nodes.append(_dump_node(node))
        return pa.table({"route": pa.array(routes, pa.string()),
                         "node": pa.array(nodes, pa.string())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged: dict[str, TypeNode] = {}
    for row in partials.take_all():  # tiny: one row per (route, batch)
        node = _load_node(row["node"])
        r = row["route"]
        merged[r] = merge_types(merged[r], node) if r in merged else node
    return merged


def _dump_node(node) -> str:
    from ..functions.casts import SemType
    from ..functions.schema_merge import ListNode, ObjectNode

    def enc(n):
        if isinstance(n, SemType):
            return n.value
        if isinstance(n, ListNode):
            return {"__list__": {str(k): enc(v) for k, v in n.items()}}
        if isinstance(n, ObjectNode):
            return {"__obj__": {k: enc(v) for k, v in n.items()}}
        raise TypeError(n)

    return json.dumps(enc(node))


def _load_node(s: str):
    from ..functions.casts import SemType
    from ..functions.schema_merge import ListNode, ObjectNode

    def dec(n):
        if isinstance(n, str):
            return SemType(n)
        if "__list__" in n:
            return ListNode({int(k): dec(v) for k, v in n["__list__"].items()})
        return ObjectNode({k: dec(v) for k, v in n["__obj__"].items()})

    return dec(json.loads(s))
