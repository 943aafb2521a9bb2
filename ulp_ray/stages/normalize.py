"""Normalize: cast a dataset to a target schema (the reference's phase-2
"normalise" step — ``cast_json`` against the merged type map,
``/root/reference/src/type_map.rs:174-198`` + ``type_casting/src/lib.rs:
318-437`` — as a vectorized Ray stage).

Per-column behavior:
- same type → passthrough;
- Arrow-castable (int↔float, numeric→string, …) → ``pc.cast`` fast path,
  with the reference's quirky semantics preserved where they differ
  (int64→float64 saturates at i32 bounds; float→int rounds half-away);
- column missing from the batch → null column of the target type. The
  reference *errors* on unknown keys (``lib.rs:392-397``) — safe there
  because its map came from the same records; here the explicit
  ``strict=True`` reproduces that error behavior when wanted.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .._env import remote_env
from ..functions import casts

__all__ = ["normalize_to_schema", "cast_column"]

_I32_MAX = float(2**31 - 1)
_I32_MIN = float(-(2**31))


def cast_column(
    col: pa.ChunkedArray | pa.Array,
    target: pa.DataType,
    reference_quirks: bool = True,
) -> pa.Array:
    """Cast one column with the reference's conversion matrix semantics.

    ``reference_quirks=False`` drops the reference's lossy corner cases
    (the int→float i32 saturation) for callers where they would be data
    corruption rather than conformance — e.g. the schema-evolution
    Parquet reader widening an int64 column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    src = col.type
    if src == target:
        return col
    if pa.types.is_integer(src) and pa.types.is_floating(target):
        if not reference_quirks:
            return pc.cast(col, target)
        # i32 saturation quirk (types.rs:109-121)
        f = pc.cast(col, pa.float64())
        f = pc.min_element_wise(f, _I32_MAX)
        f = pc.max_element_wise(f, _I32_MIN)
        return pc.cast(f, target)
    if pa.types.is_floating(src) and pa.types.is_integer(target):
        # round half away from zero (Rust f64::round, types.rs:141-143);
        # NaN/±inf → null (the scalar matrix raises CastError there —
        # safe=False would otherwise emit INT64_MIN garbage)
        sign = pc.sign(col)
        shifted = pc.add(pc.abs(col), 0.5)
        rounded = pc.multiply(pc.floor(shifted), pc.cast(sign, pa.float64()))
        rounded = pc.if_else(
            pc.is_finite(col), rounded, pa.scalar(None, pa.float64())
        )
        return pc.cast(rounded, target, safe=False)
    if pa.types.is_boolean(src) and pa.types.is_string(target):
        return pc.if_else(col, "true", "false")
    if pa.types.is_string(src) and pa.types.is_boolean(target):
        lowered = pc.utf8_lower(pc.utf8_trim_whitespace(col))
        t = pc.is_in(lowered, value_set=pa.array(["true", "1"]))
        f = pc.is_in(lowered, value_set=pa.array(["false", "0"]))
        fast = pc.if_else(pc.or_(t, f), t, pa.scalar(None, pa.bool_()))
        # values the fast path can't classify may still cast via the full
        # str_bool matrix (hex '0x1', '+1', ... — types.rs:157-167)
        unresolved = pc.and_(pc.is_valid(col), pc.invert(pc.or_(t, f)))
        if not pc.any(unresolved).as_py():
            return fast
        out = []
        for v in col.to_pylist():
            if v is None:
                out.append(None)
                continue
            try:
                out.append(casts.str_bool(v))
            except casts.CastError:
                out.append(None)
        return pa.array(out, type=pa.bool_())
    try:
        return pc.cast(col, target)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        # scalar-function fallback via the conformance-tested matrix
        sem = {
            pa.bool_(): casts.SemType.BOOL,
            pa.int64(): casts.SemType.INT,
            pa.float64(): casts.SemType.FLOAT,
            pa.string(): casts.SemType.STR,
        }.get(target)
        if sem is None:
            raise
        out = []
        for v in col.to_pylist():
            try:
                out.append(casts.cast_value(v, sem))
            except casts.CastError:
                out.append(None)
        return pa.array(out, type=target)


def normalize_to_schema(
    ds, schema: pa.Schema, strict: bool = False, reference_quirks: bool = True
):
    """Cast every batch to ``schema`` (column order included).

    ``strict=True`` reproduces the reference's error-on-unknown-key
    behavior: a batch column absent from the target schema raises instead
    of being dropped. ``reference_quirks=False`` disables the lossy
    conformance corners (see :func:`cast_column`)."""

    def norm(batch: pa.Table) -> pa.Table:
        if strict:
            unknown = set(batch.column_names) - set(schema.names)
            if unknown:
                raise KeyError(
                    f"columns {sorted(unknown)} not present in target schema"
                )
        cols = {}
        for field in schema:
            if field.name in batch.column_names:
                cols[field.name] = cast_column(
                    batch[field.name], field.type, reference_quirks
                )
            else:
                cols[field.name] = pa.nulls(len(batch), type=field.type)
        return pa.table(cols)

    return ds.map_batches(norm, batch_format="pyarrow", **remote_env())
