"""Two-phase NDJSON ingest (ulp entry-C interop): write ulp-style
NDJSON artifacts, re-read, per-route schema fold, normalize (string
sniffing incl. hex ints), routed sinks + sidecars."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ulp_ray.pipelines.ingest import ingest_ndjson
from ulp_ray.sources.io import write_ndjson


@pytest.fixture(scope="module")
def ingested(ray_session, tmp_path_factory):
    import ray.data

    nd_dir = str(tmp_path_factory.mktemp("ndjson"))
    out_dir = str(tmp_path_factory.mktemp("ingest_out"))
    rows = [
        {"id": 1, "kind": "alpha", "code": "0x1f", "amount": "250"},
        {"id": 2, "kind": "alpha", "code": "31", "amount": "125"},
        {"id": 3, "kind": "beta", "code": None, "amount": "0"},
        {"id": 4, "kind": "Beta Max", "code": "7", "amount": "42"},
    ]
    write_ndjson(ray.data.from_items(rows), nd_dir)
    ds = ingest_ndjson(nd_dir, out_dir, route_template="evt_{{kind}}")
    return out_dir, sorted(ds.take_all(), key=lambda r: r["id"])


def test_ingest_normalizes_sniffed_types(ingested):
    _, rows = ingested
    # "0x1f" and "31" both sniff to INT and normalize to int64
    assert [r["code"] for r in rows] == [31, 31, None, 7]
    assert [r["amount"] for r in rows] == [250, 125, 0, 42]
    assert all(isinstance(r["amount"], int) for r in rows)


def test_ingest_routes_sanitized(ingested):
    out_dir, rows = ingested
    assert {r["route"] for r in rows} == {"evt_alpha", "evt_beta", "evt_beta_max"}
    sink = os.path.join(out_dir, "sinks")
    assert sorted(d for d in os.listdir(sink) if d.startswith("route=")) == [
        "route=evt_alpha",
        "route=evt_beta",
        "route=evt_beta_max",
    ]


def test_ingest_writes_per_route_sidecars(ingested):
    out_dir, _ = ingested
    with open(
        os.path.join(out_dir, "_schemas", "route=evt_alpha", "_schema.json")
    ) as f:
        fields = {x["name"]: x["type"] for x in json.load(f)["fields"]}
    assert fields["code"] == "int64"
    assert fields["kind"] == "string"
    with open(os.path.join(out_dir, "_schemas", "global.json")) as f:
        g = {x["name"]: x["type"] for x in json.load(f)["fields"]}
    assert g["amount"] == "int64"


def test_ingest_rerun_overwrites_not_appends(ingested):
    """Re-running the same ingest into the same out_dir must replace the
    sinks, not append — the reference's re-ingest duplicates every doc
    (elastic.rs:108)."""
    out_dir, rows = ingested
    # the fixture's ndjson dir is a sibling tmp dir (mktemp("ndjson"))
    base = os.path.dirname(out_dir.rstrip("/"))
    nd_dirs = [
        os.path.join(base, d) for d in os.listdir(base) if d.startswith("ndjson")
    ]
    assert nd_dirs
    ds2 = ingest_ndjson(nd_dirs[0], out_dir, route_template="evt_{{kind}}")
    assert ds2.count() == len(rows)  # replaced, not doubled
