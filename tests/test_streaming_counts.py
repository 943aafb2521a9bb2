"""run_streaming_counts (the pure-throughput path) must produce exactly
the checkpointed pipeline's rollup and the generator's golden counts."""

import pytest

from ulp_ray.fixtures import write_transcripts
from ulp_ray.pipelines.flagship import run_pipeline, run_streaming_counts


@pytest.fixture(scope="module")
def data(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("transcripts"))
    golden = write_transcripts(d, 5_000, n_files=4)
    return d, golden


def test_streaming_counts_match_golden(data):
    d, golden = data
    counts = run_streaming_counts(d)
    got = {(r["rule"], r["tool"], r["role"]): r["n"] for r in counts.to_pylist()}
    assert got == golden.counts


def test_streaming_equals_checkpointed(data, tmp_path_factory):
    d, _ = data
    out = str(tmp_path_factory.mktemp("run"))
    res = run_pipeline(d, out, partitions=2)
    streaming = {
        (r["rule"], r["tool"], r["role"]): r["n"]
        for r in run_streaming_counts(d).to_pylist()
    }
    checkpointed = {
        (r["rule"], r["tool"], r["role"]): r["n"] for r in res.counts.to_pylist()
    }
    assert streaming == checkpointed


def test_streaming_counts_actor_enrich(data):
    d, golden = data
    counts = run_streaming_counts(d, enrich_compute="actors", enrich_concurrency=2)
    got = {(r["rule"], r["tool"], r["role"]): r["n"] for r in counts.to_pylist()}
    assert got == golden.counts
