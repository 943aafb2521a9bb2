"""CLI surface (python -m ulp_ray): run → resume → counts in a real
subprocess (its own Ray session, as ray job submit would)."""

import json
import os
import subprocess
import sys

import pytest

from ulp_ray.fixtures import write_transcripts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*args: str) -> str:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # force the local-instance path
    out = subprocess.run(
        [sys.executable, "-m", "ulp_ray", *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.strip().splitlines()[-1]


@pytest.mark.slow
def test_cli_run_resume_counts(tmp_path):
    data = str(tmp_path / "in")
    write_transcripts(data, 1_500, n_files=3)
    out_dir = str(tmp_path / "run")

    r1 = json.loads(_cli("run", "--input", data, "--out", out_dir,
                         "--partitions", "3", "--num-cpus", "2"))
    assert r1["rows_routed"] == 1_500 and r1["partitions_run"] == 3

    r2 = json.loads(_cli("resume", "--input", data, "--out", out_dir,
                         "--partitions", "3", "--num-cpus", "2"))
    assert r2["partitions_skipped"] == 3 and r2["partitions_run"] == 0

    counts_out = subprocess.run(
        [sys.executable, "-m", "ulp_ray", "counts", "--out", out_dir],
        cwd=REPO, capture_output=True, text=True, timeout=60,
    )
    rows = [json.loads(l) for l in counts_out.stdout.strip().splitlines()]
    assert sum(r["n"] for r in rows) == 1_500


@pytest.mark.slow
def test_cli_ingest_and_compact(tmp_path):
    """ingest (ulp NDJSON interop) and compact subcommands end-to-end in
    a real subprocess."""
    nd = tmp_path / "job"
    nd.mkdir()
    with open(nd / "task-0.data", "w") as f:
        f.write('{"id": 1, "kind": "alpha", "code": "0x10"}\n')
        f.write('{"id": 2, "kind": "beta", "code": "7"}\n')
    out_dir = str(tmp_path / "ingest_out")
    r = json.loads(
        _cli(
            "ingest", "--input", str(nd), "--out", out_dir,
            "--route-template", "evt_{{kind}}", "--num-cpus", "2",
        )
    )
    assert r["rows"] == 2
    assert os.path.isdir(os.path.join(out_dir, "sinks", "route=evt_alpha"))

    # compact understands the ingest layout too (sinks/route=* without a
    # partition level)
    rep = json.loads(_cli("compact", "--out", out_dir))
    assert os.path.join("sinks", "route=evt_alpha") in rep

    # compact is a no-op shape check here (flagship layout), just verify
    # the subcommand runs and reports
    run_dir = tmp_path / "run"
    route = run_dir / "sinks" / "partition=0" / "route=x"
    route.mkdir(parents=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i in range(3):
        pq.write_table(pa.table({"a": [i]}), route / f"p{i}.parquet")
    rep = json.loads(_cli("compact", "--out", str(run_dir), "--target-rows", "10"))
    assert rep == {os.path.join("sinks", "partition=0", "route=x"): 1}


def test_cli_status_and_clean(tmp_path):
    """status/clean — the GET/DELETE /job analog (reference
    src/api.rs:21-46). No Ray session needed: both read/delete only the
    run directory. `clean` must refuse a directory without a run marker
    so a mistyped --out can't delete a data directory."""
    from ulp_ray.state.manifest import PartitionManifest, RunManifest

    run_dir = str(tmp_path / "run1")
    os.makedirs(run_dir)
    for i in range(2):
        PartitionManifest(
            partition=i, input_fragments=[f"/in/f{i}.parquet"],
            input_bytes=10, rows_in=100, rows_routed=100,
            counts_sha256="x", duration_s=0.5, registry_version="v1",
        ).write(run_dir)
    # unfinished run: no run.json yet
    st = json.loads(_cli("status", "--out", run_dir))
    assert st["finished"] is False and st["partitions_completed"] == 2
    assert st["rows_routed"] == 200 and "partitions" not in st

    RunManifest(
        run_id="r", registry_version="v1", n_partitions=2, completed=2,
        rows_in=200, rows_routed=200,
    ).write(run_dir)
    st = json.loads(_cli("status", "--out", run_dir, "--partitions"))
    assert st["finished"] is True and len(st["partitions"]) == 2
    assert st["disk_files"] >= 3 and st["disk_bytes"] > 0

    # clean refuses a non-run directory (exit 2, dir untouched) ...
    not_a_run = tmp_path / "precious_data"
    not_a_run.mkdir()
    (not_a_run / "keep.txt").write_text("do not delete")
    r = subprocess.run(
        [sys.executable, "-m", "ulp_ray", "clean", "--out", str(not_a_run)],
        cwd=REPO, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 2 and "refusing" in r.stderr
    assert (not_a_run / "keep.txt").exists()
    # ... unless forced
    rep = json.loads(_cli("clean", "--out", str(not_a_run), "--force"))
    assert rep["deleted"] and not not_a_run.exists()

    # clean deletes a real run dir and status then 404s
    rep = json.loads(_cli("clean", "--out", run_dir))
    assert rep["deleted"] and rep["disk_files"] >= 3
    assert not os.path.exists(run_dir)
    r = subprocess.run(
        [sys.executable, "-m", "ulp_ray", "status", "--out", run_dir],
        cwd=REPO, capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 2 and "no such run" in r.stderr


def test_cli_curate_subprocess(tmp_path):
    """The curate subcommand runs the curation pipeline end-to-end in a
    fresh process (own Ray session) and writes curated/ + report.json."""
    import json
    import subprocess
    import sys

    out = tmp_path / "curation"
    r = subprocess.run(
        [
            sys.executable, "-m", "ulp_ray", "curate",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out),
            "--min-quality", "0.2",
            "--no-near-dup",
            "--near-dup-scope", "component",
            "--num-cpus", "4",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["rows_in"] == 500
    assert report["rows_out"] == report["rows_after_exact_dedup"]
    assert report["near_dup_scope"] == "component"  # flag plumbed through
    assert (out / "report.json").exists()
    assert any((out / "curated").iterdir())
    # status understands the curation layout: report.json is its
    # run-level record
    st = json.loads(_cli("status", "--out", str(out)))
    assert st["finished"] is True
    assert st["curation_report"]["rows_in"] == 500
