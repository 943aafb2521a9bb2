"""Source/sink helpers.

Parity map to the reference (SURVEY.md §2.1):
- glob source discovery (``Job::from_glob``, ``src/job.rs:52-73``) →
  :func:`expand_glob` + ``ray.data.read_parquet`` (globs built in);
- NDJSON per-task sink / re-reader (``src/evtx.rs:52-53``,
  ``src/elastic.rs:68-74``) → :func:`write_ndjson` / :func:`read_ndjson`
  (Ray's json reader); the engine's *durable* intermediate is Parquet —
  NDJSON exists for interop with ulp-style artifacts;
- the transcript contract read prunes columns at the source.
"""

from __future__ import annotations

import glob as globmod
import os

__all__ = [
    "expand_glob",
    "DeterministicFilenames",
    "overwrite_sink_args",
    "read_transcripts",
    "read_ndjson",
    "write_ndjson",
    "read_parquet_evolved",
]

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def expand_glob(pattern: str) -> list[str]:
    """Deterministic (sorted) file list from a glob or directory."""
    if os.path.isdir(pattern):
        return sorted(globmod.glob(os.path.join(pattern, "*.parquet")))
    return sorted(globmod.glob(pattern))


def read_transcripts(path_or_glob: str, columns: list[str] | None = None):
    """Read the transcript contract table, pruned to ``columns``
    (default: the full contract — pass fewer for narrow stages)."""
    import ray

    files = expand_glob(path_or_glob)
    if not files:
        raise FileNotFoundError(path_or_glob)
    return ray.data.read_parquet(
        files,
        columns=columns or TRANSCRIPT_COLUMNS,
        override_num_blocks=len(files),
    )


_NDJSON_EXTS = (".data", ".json", ".jsonl", ".ndjson")


def read_ndjson(path_or_glob: str):
    """Line-delimited JSON source (ulp's intermediate format).

    A directory reads only NDJSON-suffixed files (incl. ulp's ``.data``,
    ``src/evtx.rs:28-34`` — stray lock/sidecar files must not pollute the
    schema fold); an explicit glob is taken verbatim (the user named the
    files). Ray's own json extension filter is off either way — it would
    reject ``.data``."""
    import ray

    if os.path.isdir(path_or_glob):
        files = sorted(
            f
            for f in globmod.glob(os.path.join(path_or_glob, "*"))
            if f.endswith(_NDJSON_EXTS)
        )
    else:
        files = sorted(globmod.glob(path_or_glob))
    if not files:
        raise FileNotFoundError(path_or_glob)
    return ray.data.read_json(files, file_extensions=None)


def write_ndjson(ds, out_dir: str) -> None:
    """NDJSON sink (one file per block, like ulp's per-task .data files)."""
    ds.write_json(out_dir)


def read_parquet_evolved(path_or_glob: str, columns: list[str] | None = None):
    """Read Parquet files whose schemas DRIFTED over time (columns added,
    numerics widened) as one dataset under the unified widened schema —
    the engine's dynamic-schema story (§P3 lattice) applied at the read:
    a plain multi-file ``read_parquet`` errors (or silently misbinds) on
    schema conflicts.

    Metadata-only planning: every file's footer schema is unified with
    :func:`ulp_ray.functions.schema_merge.unify_arrow_schemas` (missing
    columns → null, int64+float64 → float64, conflicts → string); each
    batch then normalizes to the unified schema via the §P4 cast matrix.
    One streaming pass over the data."""
    import pyarrow.parquet as pq
    import ray

    from ..functions.schema_merge import unify_arrow_schemas
    from ..stages.normalize import normalize_to_schema

    import pyarrow as pa

    files = expand_glob(path_or_glob)
    if not files:
        raise FileNotFoundError(path_or_glob)
    # one footer read per file; metadata stripped so logically-identical
    # schemas group together even when writers differ (pandas blob etc.)
    schemas = [pq.read_schema(f).remove_metadata() for f in files]
    unified = unify_arrow_schemas(schemas)
    if columns:
        fields = []
        for c in columns:
            # a column absent from EVERY file is still a legal request —
            # the evolution contract says missing columns become null
            idx = unified.get_field_index(c)
            fields.append(
                unified.field(idx) if idx >= 0 else pa.field(c, pa.null())
            )
        unified = pa.schema(fields)
    # one dataset per distinct file schema (files sharing a schema read
    # together), normalized to the unified schema, then unioned — the
    # union is planning-only; execution stays one streaming pass
    by_schema: dict[str, tuple[pa.Schema, list[str]]] = {}
    for f, s in zip(files, schemas):
        by_schema.setdefault(str(s), (s, []))[1].append(f)
    want = [f.name for f in unified]
    parts = []
    for fschema, group in by_schema.values():
        present = set(fschema.names)
        cols = [c for c in want if c in present]  # prune at the read
        if not cols:
            # no requested column exists in this generation: read one
            # NARROW anchor column for the row count — prefer a
            # fixed-width field over a potentially huge string/binary one
            anchor = min(
                fschema,
                key=lambda f: 0
                if pa.types.is_primitive(f.type)
                and not (
                    pa.types.is_string(f.type)
                    or pa.types.is_large_string(f.type)
                    or pa.types.is_binary(f.type)
                    or pa.types.is_large_binary(f.type)
                )
                else 1,
            )
            cols = [anchor.name]
        ds = ray.data.read_parquet(
            group, columns=cols, override_num_blocks=len(group)
        )
        # reference_quirks=False: the cast matrix's i32 saturation is
        # conformance behavior for log parsing — here it would corrupt
        # int64 values > 2^31 during the int→float widening
        parts.append(normalize_to_schema(ds, unified, reference_quirks=False))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


class DeterministicFilenames:
    """FilenameProvider: output names are a function of (task, block)
    only — no per-execution UUIDs — so a re-run of the same write
    overwrites the same paths byte-for-byte (resume idempotency,
    SURVEY.md §7.4; the fix for the reference's duplicate-on-reingest,
    ``src/elastic.rs:108``)."""

    def get_filename_for_block(self, block, write_uuid, task_index, block_index) -> str:
        return f"part-{task_index:06d}-{block_index:06d}.parquet"

    def get_filename_for_row(
        self, row, write_uuid, task_index, block_index, row_index
    ) -> str:  # pragma: no cover - parquet writes are block-level
        return f"part-{task_index:06d}-{block_index:06d}-{row_index:09d}.parquet"


def overwrite_sink_args() -> dict:
    """kwargs for a deterministic-overwrite ``write_parquet``: stable
    filenames + SaveMode.OVERWRITE (APPEND would reject reused names).

    SaveMode is private in Ray 2.49 (no public path exists); a Ray
    upgrade that moves it should fail loudly here, not corrupt outputs.
    """
    try:
        from ray.data._internal.savemode import SaveMode
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "ray.data SaveMode moved — update overwrite_sink_args() in "
            "ulp_ray/sources/io.py for this Ray version"
        ) from e
    return {"filename_provider": DeterministicFilenames(), "mode": SaveMode.OVERWRITE}
