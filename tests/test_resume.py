"""Resume-from-checkpoint: a run interrupted after k<P partitions resumes
without recomputing completed partitions and produces identical outputs
(the fix for the reference's duplicate-on-reingest flaw,
src/elastic.rs:108)."""

import glob
import hashlib
import json
import os
import shutil

import pytest

from ulp_ray.fixtures import write_transcripts
from ulp_ray.pipelines.flagship import run_pipeline
from ulp_ray.rules import Rule, RuleRegistry, default_transcript_registry

N_TURNS = 4_000
P = 8


def _digest_tree(root: str) -> dict[str, str]:
    out = {}
    for f in sorted(glob.glob(os.path.join(root, "**", "*"), recursive=True)):
        if os.path.isfile(f):
            out[os.path.relpath(f, root)] = hashlib.sha256(
                open(f, "rb").read()
            ).hexdigest()
    return out


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("transcripts"))
    write_transcripts(d, N_TURNS, n_files=P)
    return d


def test_resume_skips_completed_partitions(ray_session, data_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    res1 = run_pipeline(data_dir, out, partitions=P)
    assert res1.partitions_run == P
    full_rollup = _digest_tree(os.path.join(out, "rollup"))
    sink_digests = _digest_tree(os.path.join(out, "sinks"))

    # simulate a crash after 5 of 8 partitions: destroy 3 partitions'
    # manifests + sinks + partials
    for pi in (5, 6, 7):
        os.remove(os.path.join(out, "_manifest", f"partition={pi}.json"))
        shutil.rmtree(os.path.join(out, "sinks", f"partition={pi}"))
        os.remove(os.path.join(out, "rollup_partials", f"partition={pi}.parquet"))

    res2 = run_pipeline(data_dir, out, partitions=P)
    assert res2.partitions_run == 3
    assert res2.partitions_skipped == 5
    # rollup identical byte-for-byte; all sinks byte-identical
    assert _digest_tree(os.path.join(out, "rollup")) == full_rollup
    assert _digest_tree(os.path.join(out, "sinks")) == sink_digests
    assert res2.rows_routed == res1.rows_routed


def test_registry_change_invalidates_checkpoints(ray_session, data_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    run_pipeline(data_dir, out, partitions=4)
    # different registry version ⇒ all partitions recompute
    reg = default_transcript_registry().add(Rule("extra", r"zzz-never-matches"))
    res = run_pipeline(data_dir, out, registry=reg, partitions=4)
    assert res.partitions_run == 4
    assert res.partitions_skipped == 0


def test_manifest_records_lineage(ray_session, data_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run"))
    res = run_pipeline(data_dir, out, partitions=4)
    m = json.load(open(os.path.join(out, "_manifest", "partition=0.json")))
    assert m["rows_in"] > 0
    assert m["rows_in"] == m["rows_routed"]
    assert len(m["input_fragments"]) == 2  # 8 files / 4 partitions
    assert all(os.path.isfile(f) for f in m["input_fragments"])
    assert m["counts_sha256"] and m["duration_s"] >= 0
    assert m["registry_version"] == default_transcript_registry().version


def test_resume_appends_without_recompute(ray_session, tmp_path_factory):
    """Append-aware resume: new input files land in NEW partitions; the
    completed partitions' checkpoints are honored verbatim, the rollup
    covers old + new rows exactly once, and nothing is silently
    dropped."""
    d = str(tmp_path_factory.mktemp("grow"))
    write_transcripts(d, 2_000, n_files=4)
    out = str(tmp_path_factory.mktemp("run"))
    res1 = run_pipeline(d, out, partitions=2)
    assert res1.rows_routed == 2_000
    # add more files (different seed → different content, new names)
    write_transcripts(d + "_extra", 1_000, n_files=2, seed=7)
    import shutil as sh

    for i, f in enumerate(sorted(glob.glob(d + "_extra/*.parquet"))):
        sh.copy(f, os.path.join(d, f"part-newer-{i:05d}.parquet"))
    res2 = run_pipeline(d, out, partitions=2)
    assert res2.partitions_skipped == 2   # the finished partitions stand
    assert res2.partitions_run == 1       # only the new files ran (one
    # new partition: 2 new files at the run's 2-files-per-partition grain)
    assert res2.rows_routed == 3_000      # exactly once: old + new
    # a third run with no further input change is a full no-op
    res3 = run_pipeline(d, out, partitions=2)
    assert res3.partitions_run == 0 and res3.rows_routed == 3_000
    # and the rollup equals a fresh non-resumed run over everything
    fresh_out = str(tmp_path_factory.mktemp("fresh"))
    fresh = run_pipeline(d, fresh_out, partitions=4, resume=False)
    a = res3.counts.sort_by([("rule", "ascending"), ("tool", "ascending"), ("role", "ascending")])
    b = fresh.counts.sort_by([("rule", "ascending"), ("tool", "ascending"), ("role", "ascending")])
    assert a.equals(b)


def test_resume_recomputes_on_removed_input(ray_session, tmp_path_factory):
    """Removing an input file invalidates the checkpoint that covered it
    (fragment subset check) — remaining partitions still skip."""
    d = str(tmp_path_factory.mktemp("shrink"))
    write_transcripts(d, 2_000, n_files=4)
    out = str(tmp_path_factory.mktemp("run"))
    run_pipeline(d, out, partitions=4)  # 1 file per partition
    victims = sorted(glob.glob(os.path.join(d, "*.parquet")))
    os.remove(victims[0])
    res = run_pipeline(d, out, partitions=4)
    assert res.partitions_run == 0        # nothing new to compute
    assert res.partitions_skipped == 3    # the invalidated one is gone
    assert res.rows_routed == 1_500       # rollup excludes the removed file


def test_repartitioned_rerun_prunes_stale_partials(ray_session, tmp_path_factory):
    """Re-running with fewer partitions must not double-count stale
    rollup partials from the wider run."""
    d = str(tmp_path_factory.mktemp("transcripts"))
    write_transcripts(d, 2_000, n_files=8)
    out = str(tmp_path_factory.mktemp("run"))
    res8 = run_pipeline(d, out, partitions=8)
    res2 = run_pipeline(d, out, partitions=2, resume=False)
    assert res2.rows_routed == 2_000
    t8 = {tuple(r.values()) for r in res8.counts.to_pylist()}
    t2 = {tuple(r.values()) for r in res2.counts.to_pylist()}
    assert t8 == t2  # identical rollup, no double counting
    # stale partition files gone
    import glob as g

    assert len(g.glob(os.path.join(out, "rollup_partials", "*.parquet"))) == 2


def test_sidecars_use_sanitized_route_names(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("transcripts"))
    write_transcripts(d, 1_000, n_files=2)
    out = str(tmp_path_factory.mktemp("run"))
    run_pipeline(d, out, partitions=1)
    sidecars = set(os.listdir(os.path.join(out, "_schemas")))
    assert "route=unmatched" in sidecars  # sanitized, not "_unmatched"
    assert "route=_unmatched" not in sidecars


def test_audit_run_passes_and_detects_tampering(ray_session, data_dir, tmp_path_factory):
    from ulp_ray.state.audit import AuditError, audit_run

    out = str(tmp_path_factory.mktemp("run"))
    run_pipeline(data_dir, out, partitions=4)
    report = audit_run(out)
    assert report["ok"] and report["partitions"] == 4
    assert report["rows_routed"] == N_TURNS

    # tamper: delete one sink file → sink rows no longer match manifest
    victim = sorted(
        glob.glob(os.path.join(out, "sinks", "partition=0", "**", "*.parquet"),
                  recursive=True)
    )[0]
    os.remove(victim)
    with pytest.raises(AuditError, match="sink rows"):
        audit_run(out)
    report2 = audit_run(out, strict=False)
    assert not report2["ok"] and any("sink rows" in p for p in report2["problems"])


def test_text_col_change_invalidates_checkpoints(ray_session, tmp_path_factory):
    """Resuming with a different parse column must recompute every
    partition (text_col is part of the checkpoint fingerprint)."""
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from ulp_ray.pipelines.flagship import run_pipeline

    d = str(tmp_path_factory.mktemp("tc_in"))
    tbl = pa2.table(
        {
            "conv_id": pa2.array(["c"] * 8, pa2.string()),
            "turn_idx": pa2.array(range(8), pa2.int32()),
            "role": pa2.array(["user"] * 8, pa2.string()),
            "text": pa2.array(["status=ok at 2024-01-01T00:00:00+00:00 items=1"] * 8),
            "alt": pa2.array(["Calling tool bash with args path=/x timeout=5"] * 8),
            "tool": pa2.array([None] * 8, pa2.string()),
            "ts": pa2.array([0] * 8, pa2.timestamp("us")),
        }
    )
    pq2.write_table(tbl, os.path.join(d, "part-0.parquet"))
    out = str(tmp_path_factory.mktemp("tc_run"))
    r1 = run_pipeline(d, out, partitions=1, resume=False)
    assert {r["rule"] for r in r1.counts.to_pylist()} == {"status"}
    r2 = run_pipeline(d, out, partitions=1, resume=True, text_col="alt")
    assert r2.partitions_skipped == 0 and r2.partitions_run == 1
    assert {r["rule"] for r in r2.counts.to_pylist()} == {"tool_call"}


def test_deleted_schema_partial_forces_recompute(ray_session, data_dir, tmp_path_factory):
    """A manifest whose schema partial was deleted is not trustworthy —
    the partition recomputes and the sidecar set is rebuilt."""
    from ulp_ray.pipelines.flagship import run_pipeline

    out = str(tmp_path_factory.mktemp("sp_run"))
    run_pipeline(data_dir, out, partitions=2, resume=False)
    os.remove(os.path.join(out, "_schemas_partials", "partition=1.json"))
    res = run_pipeline(data_dir, out, partitions=2, resume=True)
    assert res.partitions_run == 1 and res.partitions_skipped == 1
    assert os.path.isfile(
        os.path.join(out, "_schemas_partials", "partition=1.json")
    )


def test_audit_detects_tampered_input_file(ray_session, tmp_path_factory):
    """Per-input-file sha256 lineage (ParsedFileStats analog,
    /root/reference/src/type_map.rs:100-155): flipping bytes in an INPUT
    fragment after the run must fail the audit, and a metadata-only audit
    (verify_inputs=False) must still pass."""
    from ulp_ray.state.audit import AuditError, audit_run

    d = str(tmp_path_factory.mktemp("transcripts_tamper"))
    write_transcripts(d, 1_000, n_files=2)
    out = str(tmp_path_factory.mktemp("run"))
    run_pipeline(d, out, partitions=2)
    assert audit_run(out)["ok"]  # hashes recorded and verified

    victim = sorted(glob.glob(os.path.join(d, "*.parquet")))[0]
    with open(victim, "r+b") as f:
        f.seek(10)
        b = f.read(1)
        f.seek(10)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(AuditError, match="input sha256 mismatch"):
        audit_run(out)
    assert audit_run(out, verify_inputs=False)["ok"]

    # a deleted input is its own violation
    os.remove(victim)
    report = audit_run(out, strict=False)
    assert any("input missing" in p for p in report["problems"])


def test_hash_inputs_false_skips_lineage_hashes(ray_session, tmp_path_factory):
    from ulp_ray.state.manifest import load_completed

    d = str(tmp_path_factory.mktemp("transcripts_nohash"))
    write_transcripts(d, 500, n_files=1)
    out = str(tmp_path_factory.mktemp("run"))
    run_pipeline(d, out, partitions=1, hash_inputs=False)
    (m,) = load_completed(out).values()
    assert m.input_sha256 == {}
    from ulp_ray.state.audit import audit_run

    assert audit_run(out)["ok"]  # empty dict → hash step skipped


def test_transient_fault_retries_and_completes(ray_session, tmp_path_factory):
    """Sink retry policy (the bounded analog of the reference's ES
    bulk-rejection retry loop, src/elastic.rs:124-151): a TRANSIENT
    application-level failure inside the fused read→parse→write task is
    retried by Ray when ``sink_retry_exceptions=True`` and the run
    completes — safe because the sink layout is idempotent
    (deterministic filenames + OVERWRITE)."""
    import pyarrow.compute as _pc  # noqa: F401  (keep import local to test)

    d = str(tmp_path_factory.mktemp("flaky_in"))
    write_transcripts(d, 1_000, n_files=2)
    out = str(tmp_path_factory.mktemp("flaky_run"))
    sentinel = os.path.join(str(tmp_path_factory.mktemp("flaky_s")), "tripped")

    def flaky_pre(batch):
        # fails exactly once (first task to arrive), then heals —
        # single-node test stand-in for an object-store hiccup
        if not os.path.exists(sentinel):
            open(sentinel, "w").close()
            raise RuntimeError("transient fault")
        return batch

    res = run_pipeline(
        d, out, partitions=1, pre_fn=flaky_pre,
        sink_max_retries=3, sink_retry_exceptions=True,
    )
    assert res.rows_routed == 1_000 and res.partitions_run == 1
    from ulp_ray.state.audit import audit_run

    assert audit_run(out)["ok"]


def test_poisoned_input_fails_loudly_then_resumes(ray_session, tmp_path_factory):
    """A POISONED fragment (deterministic error) exhausts its retries and
    fails its partition loudly; completed partitions keep their
    manifests, and after the bad fragment is fixed a resumed run
    recomputes ONLY the failed partition and the audit reconciles."""
    import uuid

    import pyarrow as pa2
    import pyarrow.compute as pc2
    import pyarrow.parquet as pq2

    d = str(tmp_path_factory.mktemp("poison_in"))
    write_transcripts(d, 1_000, n_files=4)
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    # files stripe files[i::2] → partition 1 owns files[1] and files[3];
    # poison files[3] so partition 0 completes first
    victim = files[3]
    tbl = pq2.read_table(victim)
    text = tbl["text"].to_pylist()
    text[0] = "POISON-MARKER " + (text[0] or "")
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"), "text", pa2.array(text, pa2.string())
    )
    pq2.write_table(tbl, victim)

    attempts_dir = str(tmp_path_factory.mktemp("poison_attempts"))

    def poison_pre(batch):
        if pc2.any(
            pc2.match_substring(batch["text"], "POISON-MARKER")
        ).as_py():
            open(os.path.join(attempts_dir, uuid.uuid4().hex), "w").close()
            raise ValueError("poisoned fragment")
        return batch

    out = str(tmp_path_factory.mktemp("poison_run"))
    with pytest.raises(Exception, match="poisoned fragment"):
        run_pipeline(
            d, out, partitions=2, pre_fn=poison_pre,
            sink_max_retries=2, sink_retry_exceptions=True,
        )
    # the deterministic failure was retried exactly max_retries times
    assert len(os.listdir(attempts_dir)) == 1 + 2
    # the partition that finished before the failure kept its manifest
    from ulp_ray.state.manifest import load_completed

    done = load_completed(out)
    assert set(done) == {0}

    # fix the bad fragment (restore clean content), resume: only the
    # failed partition recomputes
    fixed = tbl.set_column(
        tbl.schema.get_field_index("text"),
        "text",
        pa2.array([t.replace("POISON-MARKER ", "") for t in text], pa2.string()),
    )
    pq2.write_table(fixed, victim)
    res = run_pipeline(
        d, out, partitions=2, pre_fn=poison_pre,
        sink_max_retries=2, sink_retry_exceptions=True,
    )
    assert res.partitions_skipped == 1 and res.partitions_run == 1
    assert res.rows_routed == 1_000
    from ulp_ray.state.audit import audit_run

    assert audit_run(out)["ok"]


def test_audit_reconciles_appended_run(ray_session, tmp_path_factory):
    """audit_run still reconciles after an append (non-contiguous
    growth of the partition index set)."""
    from ulp_ray.state.audit import audit_run

    d = str(tmp_path_factory.mktemp("aud_grow"))
    write_transcripts(d, 2_000, n_files=4)
    out = str(tmp_path_factory.mktemp("aud_run"))
    run_pipeline(d, out, partitions=2)
    write_transcripts(d + "_x", 1_000, n_files=2, seed=9)
    import shutil as sh

    for i, f in enumerate(sorted(glob.glob(d + "_x/*.parquet"))):
        sh.copy(f, os.path.join(d, f"part-app-{i:05d}.parquet"))
    run_pipeline(d, out, partitions=2)
    report = audit_run(out, strict=True)
    assert report["ok"], report
