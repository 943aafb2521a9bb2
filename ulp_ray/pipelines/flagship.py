"""Flagship pipeline: parse → enrich → route → aggregate, with lineage and
resume-from-checkpoint.

Ray-Data lifecycle (SURVEY.md §3.4), replacing the reference's
orchestrator/worker-thread design (``/root/reference/src/workerpool.rs``):

    read_parquet(fragments)                        # pruned, many blocks
      → map_batches(parse_fn, pyarrow, zero-copy)  # rule registry
      → map_batches(enrich)                        # broadcast taxonomy;
        # default = stateless tasks w/ per-worker broadcast cache (fuses
        # with parse, elastic); ``enrich_compute="actors"`` selects the
        # Enricher actor pool (for heavy per-actor state)
      → write_parquet(sinks/partition=i, partition_cols=["route"])
    counts  = read_parquet(sinks/partition=i, columns=[rule,tool,role])
              |> per-batch partial counts |> groupby.Sum    # tiny shuffle
    manifest/partition=i.json                      # atomic, after durable

The input fragment list is split into ``partitions`` deterministic groups
(the checkpoint/resume granularity — the analog of ulp's per-job two-phase
boundary, ``src/workerpool.rs:81-101``); each group streams end-to-end
under Ray's streaming executor with backpressure. Aggregate counts are
computed from the *durable* routed files (columnar read of three small
columns), so the rollup doubles as a write-verification, and a partition is
only marked complete after both its sinks and its partial counts exist.

Scale notes (100 TB / multi-node):
- parse+enrich are embarrassingly parallel map stages — no barrier;
- the only all-to-all is the final Sum over pre-aggregated partials
  (O(routes × batches) rows, not O(turns));
- partition groups bound the blast radius of a failure: a re-run
  recomputes only incomplete groups, and outputs are deterministic
  overwrite-in-place (fixes the reference's duplicate-on-reingest flaw,
  ``src/elastic.rs:108``).
"""

from __future__ import annotations

import glob as globmod
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from .._env import remote_env
from ..rules import RuleRegistry, default_transcript_registry
from ..sources.io import overwrite_sink_args
from ..stages.aggregate import count_rollup
from ..stages.enrich import Enricher, make_enrich_fn, put_taxonomy
from ..stages.parse import make_parse_fn
from ..state.manifest import (
    PartitionManifest,
    RunManifest,
    counts_sha256,
    load_completed,
)

__all__ = ["PipelineResult", "run_pipeline", "run_streaming_counts"]

AGG_KEYS = ["rule", "tool", "role"]


@dataclass
class PipelineResult:
    run_dir: str
    rows_in: int
    rows_routed: int
    counts: "pa.Table"
    partitions_run: int
    partitions_skipped: int
    manifests: list[PartitionManifest] = field(default_factory=list)


def _hash_fragment(path: str) -> tuple[str, str]:
    """(path, sha256) of one input fragment — runs as a Ray task so a
    partition's fragments hash in parallel."""
    from ..state.manifest import file_sha256

    return path, file_sha256(path)


def _expand_inputs(inputs: str | list[str]) -> list[str]:
    if isinstance(inputs, str):
        if os.path.isdir(inputs):
            files = sorted(globmod.glob(os.path.join(inputs, "*.parquet")))
        else:
            files = sorted(globmod.glob(inputs))
    else:
        files = sorted(inputs)
    if not files:
        raise FileNotFoundError(f"no parquet inputs under {inputs!r}")
    return files


def run_pipeline(
    inputs: str | list[str],
    out_dir: str,
    registry: RuleRegistry | None = None,
    taxonomy: dict | None = None,
    partitions: int = 8,
    resume: bool = True,
    batch_size: int | None = None,
    enrich_compute: str = "tasks",
    enrich_concurrency: tuple[int, int] | int | None = None,
    text_col: str = "text",
    pre_fn=None,
    hash_inputs: bool = True,
    sink_max_retries: int | None = None,
    sink_retry_exceptions: bool | list | None = None,
) -> PipelineResult:
    """Run (or resume) the flagship pipeline over Parquet transcript files.

    ``hash_inputs`` records a sha256 per input fragment in the partition
    manifest (the reference's per-file ``ParsedFileStats`` lineage,
    ``type_map.rs:100-155``) — ``audit_run`` then detects a tampered
    input artifact, not just a tampered output. Hashing runs as parallel
    Ray tasks launched at partition start, overlapping the partition's
    own read/parse/write, and is awaited only when the manifest is
    written; set False to skip the extra read entirely.

    ``text_col`` selects the column the rule registry parses (part of the
    checkpoint fingerprint — a resume with a different column recomputes);
    ``pre_fn`` (optional pyarrow batch fn) runs right after the read —
    e.g. to derive the ``role``/``tool`` columns the enrich stage expects
    from a non-transcript table. Note: ``pre_fn`` is NOT fingerprintable
    (it's an arbitrary callable) — changing it between runs of the same
    out_dir requires ``resume=False``.

    ``sink_max_retries`` / ``sink_retry_exceptions`` surface Ray's task
    retry policy on the sink write stage (the analog of the reference's
    ES bulk-rejection retry loop, ``src/elastic.rs:124-151`` — which
    retries forever; here the knob is bounded and explicit). Ray's
    default already retries worker/node deaths; pass
    ``sink_retry_exceptions=True`` (or a list of exception types) to
    also retry application-level write errors — transient filesystem /
    object-store hiccups — ``sink_max_retries`` times. Retrying is safe
    because the sink layout is idempotent: deterministic filenames +
    OVERWRITE semantics mean a re-executed write task replaces its own
    partial output. A POISONED input (deterministic parse/read error)
    exhausts its retries and fails the partition loudly; completed
    partitions keep their manifests, so the rerun after fixing the bad
    fragment recomputes only the failed partition (fault-injection test
    in tests/test_resume.py).

    ``out_dir`` layout is the durable contract (SURVEY.md §7.5)::

        out_dir/
          sinks/partition=<i>/route=<route>/*.parquet
          rollup_partials/partition=<i>.parquet
          rollup/agg_counts.parquet
          _manifest/partition=<i>.json , _manifest/run.json
          _schemas_partials/partition=<i>.json  (per-route TypeNode partials)
          _schemas/route=<r>/_schema.json       (per-route merged dynamic schema)
          _schemas/global.json                  (all-route merged schema)
    """
    import ray

    registry = registry or default_transcript_registry()
    files = _expand_inputs(inputs)

    def _outputs_exist(i: int, m) -> bool:
        # a manifest is only trustworthy if the durable outputs it
        # describes still exist (partials feed the final rollup; a
        # deleted sink dir is legal only for a zero-row partition)
        partial_ok = os.path.isfile(
            os.path.join(out_dir, "rollup_partials", f"partition={i}.parquet")
        )
        schema_ok = os.path.isfile(
            os.path.join(out_dir, "_schemas_partials", f"partition={i}.json")
        )
        sink_ok = m.rows_routed == 0 or os.path.isdir(
            os.path.join(out_dir, "sinks", f"partition={i}")
        )
        return partial_ok and schema_ok and sink_ok

    # a checkpoint is valid if the registry/text_col are unchanged, its
    # durable outputs exist, and its input fragment set is still a
    # subset of the current inputs. Append-aware resume: valid
    # partitions keep their EXACT file groups (indices preserved), and
    # only uncovered files stripe into fresh partition indices — so
    # appending new input files to a finished run recomputes nothing
    # (the incremental-ingest shape a standing 100 TB pipeline needs;
    # the reference instead duplicates docs on re-ingest,
    # src/elastic.rs:108).
    completed_raw = load_completed(out_dir) if resume else {}
    file_set = set(files)
    valid = {
        i: m
        for i, m in completed_raw.items()
        if m.registry_version == registry.version
        and m.text_col == text_col
        and set(m.input_fragments) <= file_set
        and _outputs_exist(i, m)
    }
    # disjointness guard: no file may be claimed by two manifests (a
    # crashed run that changed `partitions` mid-way could overlap) —
    # keep the lowest-index claimant, recompute the rest
    claimed: set[str] = set()
    completed: dict[int, PartitionManifest] = {}
    for i in sorted(valid):
        frags = set(valid[i].input_fragments)
        if frags & claimed:
            continue
        claimed |= frags
        completed[i] = valid[i]
    new_files = [f for f in files if f not in claimed]
    groups: dict[int, list[str]]
    if completed:
        groups = {i: list(m.input_fragments) for i, m in completed.items()}
        if new_files:
            # size new partitions to the run's existing granularity
            # (files per completed partition), capped by `partitions`
            # per increment — appended files get the same checkpoint
            # grain as the original run
            sizes = [len(g) for g in groups.values()]
            target = max(1, round(sum(sizes) / len(sizes)))
            n_new = max(1, min(partitions, -(-len(new_files) // target)))
            next_i = max(completed) + 1
            for j in range(n_new):
                groups[next_i + j] = new_files[j::n_new]
    else:
        n = max(1, min(partitions, len(files)))
        groups = {i: files[i::n] for i in range(n)}
    _prune_stale_outputs(out_dir, set(groups))

    taxonomy_ref = put_taxonomy(taxonomy)
    parse_fn = make_parse_fn(registry, text_col=text_col)
    cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
    if enrich_concurrency is None:
        # at most half the cluster: a wider pool starves the read stage
        enrich_concurrency = (1, max(2, cluster_cpus // 2))

    manifests: list[PartitionManifest] = []
    ran = 0
    for pi, group in sorted(groups.items()):
        if pi in completed:
            manifests.append(completed[pi])
            continue
        t0 = time.monotonic()
        rows_in = sum(pq.read_metadata(f).num_rows for f in group)
        in_bytes = sum(os.path.getsize(f) for f in group)

        if hash_inputs:
            # launch per-fragment sha256 tasks NOW so they overlap the
            # partition's own read/parse/write below (measured: resolving
            # them serially after the sink cost ~0.3-0.5 s per 4-partition
            # 1M-row run; overlapped they hide entirely). num_cpus=0.25 —
            # the work is I/O, not compute
            hash_task = ray.remote(_hash_fragment).options(
                num_cpus=0.25, **remote_env()
            )
            hash_futs = [hash_task.remote(p) for p in group]

        sink_dir = os.path.join(out_dir, "sinks", f"partition={pi}")
        if os.path.isdir(sink_dir):
            shutil.rmtree(sink_dir)  # deterministic overwrite on retry

        # the retry policy applies to the WHOLE partition pipeline, not
        # just the final write: read→parse→enrich→write fuse into one
        # task per file, so per-stage args must agree for the fusion to
        # hold and for a retry to re-run the fused task end to end
        # (idempotent: deterministic filenames + OVERWRITE)
        stage_args = remote_env()
        if sink_max_retries is not None:
            stage_args["max_retries"] = sink_max_retries
        if sink_retry_exceptions is not None:
            stage_args["retry_exceptions"] = sink_retry_exceptions

        # 1 block per input file: keeps read→parse→enrich fused into a
        # single task per file (no intermediate plasma hop); file sizing is
        # the fixture/ingest side's job (~64k-512k rows per file)
        ds = ray.data.read_parquet(group, override_num_blocks=len(group))
        if pre_fn is not None:
            ds = ds.map_batches(pre_fn, batch_format="pyarrow", **stage_args)
        ds = ds.map_batches(
            parse_fn,
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            **stage_args,
        )
        if enrich_compute == "actors":
            # actor pools don't take task retry args (`max_retries` is a
            # task option; actors restart via their own policy) — the
            # actor stage keeps Ray's actor-restart defaults and the
            # retry knobs apply to the surrounding task stages
            ds = ds.map_batches(
                Enricher,
                fn_constructor_kwargs={"taxonomy_ref": taxonomy_ref},
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=enrich_concurrency,
                **remote_env(),
            )
        else:  # stateless tasks + per-worker broadcast cache (default)
            ds = ds.map_batches(
                make_enrich_fn(taxonomy_ref),
                batch_format="pyarrow",
                batch_size=batch_size,
                **stage_args,
            )
        ds.write_parquet(
            sink_dir,
            partition_cols=["route"],
            ray_remote_args=dict(stage_args),
            **overwrite_sink_args(),
        )

        # partial rollup from the durable sink (columnar, 3 cols only).
        # Small partitions: one driver-side pyarrow read+fold (~ms) instead
        # of a full Ray execution (~1s fixed cost); big partitions (real
        # scale) keep the distributed path.
        sink_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(sink_dir)
            for f in fs
        )
        if sink_bytes < 256 * 1024 * 1024:
            counts_tbl = _local_sink_counts(sink_dir)
        else:
            routed = ray.data.read_parquet(sink_dir, columns=AGG_KEYS)
            counts_tbl = _counts_to_table(count_rollup(routed, AGG_KEYS))
        partial_dir = os.path.join(out_dir, "rollup_partials")
        os.makedirs(partial_dir, exist_ok=True)
        partial_path = os.path.join(partial_dir, f"partition={pi}.parquet")
        pq.write_table(counts_tbl, partial_path + ".tmp")
        # fsync before the rename: a torn partial would fail the next
        # run's final-rollup read instead of being recomputed
        with open(partial_path + ".tmp", "rb") as pf:
            os.fsync(pf.fileno())
        os.replace(partial_path + ".tmp", partial_path)  # atomic

        # per-route dynamic-schema partial (index_pattern_mappings analog,
        # type_map.rs:160-172): bounded row sample per route dir, merged
        # across partitions at the end via the §P3 lattice
        _write_schema_partial(out_dir, pi, _route_schema_partial(sink_dir))

        input_sha = dict(ray.get(hash_futs)) if hash_inputs else {}

        rows_routed = int(pa.compute.sum(counts_tbl["n"]).as_py() or 0)
        m = PartitionManifest(
            partition=pi,
            input_fragments=group,
            input_bytes=in_bytes,
            rows_in=rows_in,
            rows_routed=rows_routed,
            counts_sha256=counts_sha256(
                [tuple(r.values()) for r in counts_tbl.to_pylist()]
            ),
            duration_s=round(time.monotonic() - t0, 3),
            registry_version=registry.version,
            text_col=text_col,
            input_sha256=input_sha,
        )
        m.write(out_dir)
        manifests.append(m)
        ran += 1

    # final rollup: sum the per-partition partials (tiny)
    partial_files = sorted(
        globmod.glob(os.path.join(out_dir, "rollup_partials", "*.parquet"))
    )
    if partial_files:
        partials = pa.concat_tables([pq.read_table(f) for f in partial_files])
    else:
        partials = _COUNTS_SCHEMA.empty_table()
    final = partials.group_by(AGG_KEYS).aggregate([("n", "sum")])
    final = pa.table(
        {**{k: final[k] for k in AGG_KEYS}, "n": final["n_sum"]}
    ).sort_by([(k, "ascending") for k in AGG_KEYS])
    rollup_dir = os.path.join(out_dir, "rollup")
    os.makedirs(rollup_dir, exist_ok=True)
    pq.write_table(final, os.path.join(rollup_dir, "agg_counts.parquet"))

    # per-route dynamic schema sidecars (ES-mapping analog): merge every
    # partition's (route → TypeNode) partial with the widening lattice and
    # render one _schema.json per route — each sidecar reflects THAT
    # route's captures (absent captures stay Null-typed), replacing the
    # round-1 single sampled sidecar. Routes come from the sink dirs (the
    # sanitized route VALUES — rule "_unmatched" lands in "route=unmatched")
    _write_merged_schemas(out_dir)

    rows_in_total = sum(m.rows_in for m in manifests)
    rows_routed_total = sum(m.rows_routed for m in manifests)
    RunManifest(
        run_id=os.path.basename(out_dir.rstrip("/")) or uuid.uuid4().hex[:8],
        registry_version=registry.version,
        n_partitions=len(groups),
        completed=len(manifests),
        rows_in=rows_in_total,
        rows_routed=rows_routed_total,
        config={"batch_size": batch_size, "files": len(files)},
    ).write(out_dir)

    return PipelineResult(
        run_dir=out_dir,
        rows_in=rows_in_total,
        rows_routed=rows_routed_total,
        counts=final,
        partitions_run=ran,
        partitions_skipped=len(manifests) - ran,
        manifests=manifests,
    )


def run_streaming_counts(
    inputs: str | list[str],
    registry: RuleRegistry | None = None,
    taxonomy: dict | None = None,
    batch_size: int | None = None,
    enrich_compute: str = "tasks",
    enrich_concurrency: tuple[int, int] | int | None = None,
) -> pa.Table:
    """Single-pass streaming job: read → parse → enrich → (rule, tool,
    role) count rollup. No sinks, no checkpoint loop — the pure
    parse-throughput path used by ``bench.py --scaling`` (the north rule's
    scaling criterion is *parse* throughput; the Parquet sink write is
    storage-bandwidth-bound on a single box and is exercised by the
    checkpointed ``run_pipeline`` instead)."""
    import ray

    from ..stages.aggregate import count_rollup

    registry = registry or default_transcript_registry()
    files = _expand_inputs(inputs)
    taxonomy_ref = put_taxonomy(taxonomy)
    cluster_cpus = int(ray.cluster_resources().get("CPU", 8))
    if enrich_concurrency is None:
        enrich_concurrency = (2, max(2, cluster_cpus // 2))

    ds = ray.data.read_parquet(files, override_num_blocks=len(files))
    ds = ds.map_batches(
        make_parse_fn(registry),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        **remote_env(),
    )
    if enrich_compute == "actors":
        ds = ds.map_batches(
            Enricher,
            fn_constructor_kwargs={"taxonomy_ref": taxonomy_ref},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=enrich_concurrency,
            **remote_env(),
        )
    else:
        ds = ds.map_batches(
            make_enrich_fn(taxonomy_ref),
            batch_format="pyarrow",
            batch_size=batch_size,
            **remote_env(),
        )
    counts = count_rollup(ds, AGG_KEYS)
    return _counts_to_table(counts)


_COUNTS_SCHEMA = pa.schema(
    [
        ("rule", pa.string()),
        ("tool", pa.string()),
        ("role", pa.string()),
        ("n", pa.int64()),
    ]
)


def _prune_stale_outputs(out_dir: str, keep: set[int]) -> None:
    """Remove partials/sinks/manifests whose partition index is not in
    the current plan — a previous run with a different partitioning
    would otherwise leak stale partials into the final rollup
    (double-counting)."""
    import re as _re

    for sub, pat in (
        ("rollup_partials", r"partition=(\d+)\.parquet$"),
        ("_manifest", r"partition=(\d+)\.json$"),
        ("_schemas_partials", r"partition=(\d+)\.json$"),
        ("sinks", r"partition=(\d+)$"),
    ):
        d = os.path.join(out_dir, sub)
        if not os.path.isdir(d):
            continue
        for name in os.listdir(d):
            m = _re.match(pat, name)
            if m and int(m.group(1)) not in keep:
                path = os.path.join(d, name)
                shutil.rmtree(path) if os.path.isdir(path) else os.remove(path)


def _local_sink_counts(sink_dir: str) -> pa.Table:
    """Driver-side (rule, tool, role) counts from a hive-partitioned sink
    (columns pruned at the read; 'route' is the partition dir)."""
    import pyarrow.dataset as pads

    if not os.path.isdir(sink_dir):
        # a zero-row partition writes no sink dir at all — legal input
        # (empty shard files happen in real corpora)
        return _COUNTS_SCHEMA.empty_table()
    dataset = pads.dataset(sink_dir, format="parquet", partitioning="hive")
    tbl = dataset.to_table(columns=AGG_KEYS)
    if tbl.num_rows == 0:
        return _COUNTS_SCHEMA.empty_table()
    g = tbl.group_by(AGG_KEYS).aggregate([([], "count_all")])
    cols = {k: g[k] for k in AGG_KEYS}
    cols["n"] = g["count_all"]
    return pa.table(cols).cast(_COUNTS_SCHEMA)


def _counts_to_table(counts_ds) -> pa.Table:
    tbl = pa.Table.from_pylist(counts_ds.take_all())
    if tbl.num_rows == 0:
        return pa.table(
            {
                "rule": pa.array([], pa.string()),
                "tool": pa.array([], pa.string()),
                "role": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    return tbl.select(AGG_KEYS + ["n"]).cast(
        pa.schema(
            [
                ("rule", pa.string()),
                ("tool", pa.string()),
                ("role", pa.string()),
                ("n", pa.int64()),
            ]
        )
    )


def _route_schema_partial(sink_dir: str, sample_rows: int = 16) -> dict[str, str]:
    """One partition's (route → serialized TypeNode) map, inferred from a
    bounded row sample of each route's first sink file. O(routes) work per
    partition — the dynamic tree feeds only the sidecar metadata; the
    physical Arrow schema is exact regardless (same bound as
    ``schema_rollup_partials``, ``stages/aggregate.py``)."""
    from ..functions.schema_merge import infer_type, merge_types
    from ..stages.aggregate import _dump_node

    out: dict[str, str] = {}
    if not os.path.isdir(sink_dir):
        return out
    for rd in sorted(os.listdir(sink_dir)):
        if not rd.startswith("route="):
            continue
        files = sorted(globmod.glob(os.path.join(sink_dir, rd, "*.parquet")))
        if not files:
            continue
        pf = pq.ParquetFile(files[0])
        try:
            batch = next(pf.iter_batches(batch_size=sample_rows))
        except StopIteration:
            continue
        node = None
        for row in pa.Table.from_batches([batch]).to_pylist():
            t = infer_type(row)
            node = t if node is None else merge_types(node, t)
        if node is not None:
            out[rd.split("=", 1)[1]] = _dump_node(node)
    return out


def _write_schema_partial(out_dir: str, pi: int, partial: dict[str, str]) -> None:
    import json

    d = os.path.join(out_dir, "_schemas_partials")
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"partition={pi}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(partial, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def _write_merged_schemas(out_dir: str) -> None:
    """Fold all partitions' (route → TypeNode) partials and write the
    per-route + global ``_schema.json`` sidecars."""
    import json

    from ..functions.schema_merge import (
        arrow_schema_to_json,
        merge_types,
        type_node_to_arrow,
    )
    from ..stages.aggregate import _load_node

    merged: dict = {}
    for f in sorted(
        globmod.glob(os.path.join(out_dir, "_schemas_partials", "partition=*.json"))
    ):
        with open(f) as fh:
            partial = json.load(fh)
        for route, node_json in partial.items():
            node = _load_node(node_json)
            merged[route] = merge_types(merged[route], node) if route in merged else node
    if not merged:
        return
    # _schemas is derived data, rebuilt wholesale from the partials — a
    # re-run whose route set shrank must not leave stale route sidecars
    schema_dir = os.path.join(out_dir, "_schemas")
    shutil.rmtree(schema_dir, ignore_errors=True)
    global_node = None
    for route, node in sorted(merged.items()):
        struct = type_node_to_arrow(node)
        schema = pa.schema(list(struct))
        d = os.path.join(schema_dir, f"route={route}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "_schema.json"), "w") as fh:
            fh.write(arrow_schema_to_json(schema))
        global_node = node if global_node is None else merge_types(global_node, node)
    with open(os.path.join(schema_dir, "global.json"), "w") as fh:
        fh.write(arrow_schema_to_json(pa.schema(list(type_node_to_arrow(global_node)))))
