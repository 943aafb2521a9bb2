"""CLI entry points — the replacement for the reference's HTTP API
(``/root/reference/src/api.rs``: ``POST /job <glob>`` → parse phase,
``POST /elastic <uuid>`` → resumable ingest phase). Here both phases are
one resumable command, suitable for ``ray job submit``:

    python -m ulp_ray run    --input '<dir-or-glob>' --out /path/run1
    python -m ulp_ray resume --out /path/run1 --input '<dir-or-glob>'
    python -m ulp_ray counts --out /path/run1        # print the rollup
    python -m ulp_ray ingest --input 'job/*.data' --out /path/ingest1 \
        --route-template 'evt_{{kind}}'              # ulp NDJSON interop
    python -m ulp_ray compact --out /path/run1       # merge small sink files
    python -m ulp_ray status  --out /path/run1       # GET /job analog
    python -m ulp_ray clean   --out /path/run1       # DELETE /job analog

``resume`` is ``run`` with the checkpoint scan enabled by default —
completed partitions (per ``_manifest/partition=<i>.json``) are skipped;
a changed rule registry invalidates old checkpoints automatically.

This module OWNS its Ray session (guarded init) — library code never
calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"num_cpus": num_cpus} if num_cpus else {}
        # respect an existing cluster (ray job submit sets RAY_ADDRESS);
        # fall back to a fresh local instance otherwise
        address = os.environ.get("RAY_ADDRESS", "local")
        if address != "local":
            kwargs = {}  # num_cpus is a local-instance knob only
        ray.init(
            address=address,
            include_dashboard=False,
            logging_level="ERROR",
            **kwargs,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _parse_token_budget(value: str | None) -> tuple | None:
    """Parse --token-budget GROUP:N with a flag-naming error instead of
    an anonymous TypeError/ValueError traceback."""
    if not value:
        return None
    group, sep, n = value.rpartition(":")
    if not sep or not group or not n.lstrip("-").isdigit():
        raise SystemExit(
            f"--token-budget expects GROUP:N (e.g. lang:200000), got {value!r}"
        )
    return (group, int(n))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ulp_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_common(sp):
        sp.add_argument("--input", required=True, help="parquet dir or glob")
        sp.add_argument("--out", required=True, help="run output directory")
        sp.add_argument("--partitions", type=int, default=8)
        sp.add_argument("--num-cpus", type=int, default=None)
        sp.add_argument(
            "--enrich-compute", choices=["tasks", "actors"], default="tasks"
        )
        sp.add_argument(
            "--rules",
            default=None,
            help="JSON rule-registry file (default: built-in transcript rules)",
        )
        sp.add_argument(
            "--text-col", default="text", help="column the rules parse"
        )
        sp.add_argument(
            "--sink-retries",
            type=int,
            default=None,
            help="Ray task retries for the fused partition pipeline "
            "(idempotent: deterministic filenames + overwrite)",
        )
        sp.add_argument(
            "--retry-app-errors",
            action="store_true",
            help="also retry application-level errors (transient "
            "filesystem/object-store faults), not just worker deaths",
        )

    add_common(sub.add_parser("run", help="run the flagship pipeline (fresh)"))
    add_common(sub.add_parser("resume", help="resume, skipping completed partitions"))
    sp = sub.add_parser("counts", help="print the rollup of a finished run")
    sp.add_argument("--out", required=True)
    sp = sub.add_parser("audit", help="verify a run's lineage reconciles")
    sp.add_argument("--out", required=True)
    sp = sub.add_parser(
        "ingest", help="two-phase NDJSON ingest (ulp .data interop)"
    )
    sp.add_argument("--input", required=True, help="NDJSON dir or glob")
    sp.add_argument("--out", required=True, help="ingest output directory")
    sp.add_argument(
        "--route-template",
        required=True,
        help="index-pattern route template, e.g. 'evt_{{kind}}'",
    )
    sp.add_argument("--num-cpus", type=int, default=None)
    sp = sub.add_parser(
        "status", help="print a run directory's manifest state (GET /job analog)"
    )
    sp.add_argument("--out", required=True)
    sp.add_argument(
        "--partitions",
        dest="show_partitions",
        action="store_true",
        help="include the per-partition table (can be long)",
    )
    sp = sub.add_parser(
        "clean", help="delete a run directory safely (DELETE /job analog)"
    )
    sp.add_argument("--out", required=True)
    sp.add_argument(
        "--force",
        action="store_true",
        help="delete even if --out lacks a run marker (DANGEROUS)",
    )
    sp = sub.add_parser("compact", help="merge a finished run's small sink files")
    sp.add_argument("--out", required=True)
    sp.add_argument("--target-rows", type=int, default=1_000_000)
    sp = sub.add_parser(
        "curate", help="corpus curation: analyze→filter→dedup→near-dup→splits"
    )
    sp.add_argument("--input", required=True, help="documents parquet dir/glob")
    sp.add_argument("--out", required=True, help="curation output directory")
    sp.add_argument("--min-quality", type=float, default=0.3)
    sp.add_argument("--jaccard-threshold", type=float, default=0.8)
    sp.add_argument("--no-near-dup", action="store_true")
    sp.add_argument(
        "--near-dup-method",
        choices=["minhash", "exact_ngram"],
        default="minhash",
        help="near-dup pair finder: minhash LSH sketch (default) or "
        "exact prefix-filtered n-gram Jaccard",
    )
    sp.add_argument(
        "--near-dup-scope",
        choices=["pairs", "component"],
        default="pairs",
        help="survivor semantics: drop the higher id of each verified "
        "pair (pairs, default) or keep one min-id representative per "
        "connected component of the pair graph (component — transitive "
        "cluster dedup)",
    )
    sp.add_argument(
        "--max-dup-line-frac",
        type=float,
        default=None,
        help="drop docs whose duplicate-line fraction exceeds this",
    )
    sp.add_argument(
        "--probes-file",
        default=None,
        help="newline-delimited benchmark probe strings (decontamination)",
    )
    sp.add_argument(
        "--min-logprob",
        type=float,
        default=None,
        help="drop docs whose corpus-bigram avg log-prob is below this "
        "(perplexity-style fluency filter, runs after exact dedup)",
    )
    sp.add_argument(
        "--token-budget",
        default=None,
        metavar="GROUP:N",
        help="final mixing stage: per GROUP column (lang/source/"
        "lang_pred), keep docs in hash order up to N total tokens",
    )
    sp.add_argument(
        "--splits",
        default=None,
        help='JSON fractions, e.g. \'{"train": 0.95, "val": 0.05}\'',
    )
    sp.add_argument(
        "--checkpoint-dir",
        default=None,
        help="stage-level checkpoint dir: a re-run with identical "
        "parameters resumes from the last completed stage",
    )
    sp.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "status":
        from ulp_ray.state.jobs import run_status

        try:
            report = run_status(args.out)
        except (FileNotFoundError, ValueError) as e:
            print(json.dumps({"error": str(e)}), file=sys.stderr)
            return 2
        if not args.show_partitions:
            report.pop("partitions")
        print(json.dumps(report))
        return 0

    if args.cmd == "clean":
        from ulp_ray.state.jobs import clean_run

        try:
            report = clean_run(args.out, force=args.force)
        except (FileNotFoundError, ValueError) as e:
            print(json.dumps({"error": str(e)}), file=sys.stderr)
            return 2
        print(json.dumps(report))
        return 0

    if args.cmd == "compact":
        from ulp_ray.stages.compact import compact_run

        print(json.dumps(compact_run(args.out, target_rows=args.target_rows)))
        return 0

    if args.cmd == "curate":
        _init_ray(args.num_cpus)
        import ray
        import ray.data

        from ulp_ray.pipelines.curation import curate_documents

        probes = None
        if args.probes_file:
            with open(args.probes_file) as f:
                probes = [line.rstrip("\n") for line in f if line.strip()]
        splits = json.loads(args.splits) if args.splits else None
        ds = ray.data.read_parquet(args.input)
        _, report, _ = curate_documents(
            ds,
            out_dir=args.out,
            min_quality=args.min_quality,
            jaccard_threshold=args.jaccard_threshold,
            near_dup=not args.no_near_dup,
            near_dup_method=args.near_dup_method,
            near_dup_scope=args.near_dup_scope,
            probes=probes,
            max_dup_line_frac=args.max_dup_line_frac,
            splits=splits,
            checkpoint_dir=args.checkpoint_dir,
            min_logprob=args.min_logprob,
            token_budget=_parse_token_budget(args.token_budget),
        )
        from dataclasses import asdict

        print(json.dumps(asdict(report)))
        ray.shutdown()
        return 0

    if args.cmd == "ingest":
        _init_ray(args.num_cpus)
        from ulp_ray.pipelines.ingest import ingest_ndjson

        out_ds = ingest_ndjson(args.input, args.out, args.route_template)
        print(json.dumps({"out_dir": args.out, "rows": out_ds.count()}))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "audit":
        from ulp_ray.state.audit import audit_run

        report = audit_run(args.out, strict=False)
        print(json.dumps(report))
        return 0 if report["ok"] else 1

    if args.cmd == "counts":
        import pyarrow.parquet as pq

        tbl = pq.read_table(f"{args.out}/rollup/agg_counts.parquet")
        try:
            for row in tbl.to_pylist():
                print(json.dumps(row))
        except BrokenPipeError:  # e.g. piped into head
            pass
        return 0

    _init_ray(args.num_cpus)
    from ulp_ray.pipelines.flagship import run_pipeline
    from ulp_ray.rules import RuleRegistry

    registry = None
    if args.rules:
        with open(args.rules) as f:
            registry = RuleRegistry.from_json(f.read())

    res = run_pipeline(
        args.input,
        args.out,
        registry=registry,
        partitions=args.partitions,
        resume=(args.cmd == "resume"),
        enrich_compute=args.enrich_compute,
        text_col=args.text_col,
        sink_max_retries=args.sink_retries,
        sink_retry_exceptions=args.retry_app_errors or None,
    )
    print(
        json.dumps(
            {
                "run_dir": res.run_dir,
                "rows_in": res.rows_in,
                "rows_routed": res.rows_routed,
                "partitions_run": res.partitions_run,
                "partitions_skipped": res.partitions_skipped,
            }
        )
    )
    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
