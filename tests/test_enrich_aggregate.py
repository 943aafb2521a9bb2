"""Enrich (broadcast taxonomy) + partial-count aggregation unit tests."""

import pyarrow as pa

from ulp_ray.stages.aggregate import partial_counts_fn
from ulp_ray.stages.enrich import DEFAULT_TAXONOMY, Enricher, enrich_batch


def test_enrich_batch_lookup():
    batch = pa.table(
        {
            "role": ["user", "assistant", "tool", "ghost"],
            "tool": ["", "bash", "read", "wand"],
        }
    )
    out = enrich_batch(batch, DEFAULT_TAXONOMY)
    assert out["role_class"].to_pylist() == ["human", "model", "infra", "unknown"]
    assert out["tool_class"].to_pylist() == ["none", "exec", "retrieval", "unknown"]


def test_enricher_plain_construction():
    # actor __init__ errors surface late in Ray — smoke the class directly
    e = Enricher()
    batch = pa.table({"role": ["system"], "tool": ["edit"]})
    out = e(batch)
    assert out["role_class"].to_pylist() == ["infra"]
    assert out["tool_class"].to_pylist() == ["mutation"]


def test_partial_counts_fn():
    batch = pa.table(
        {
            "rule": ["a", "a", "b", "a"],
            "tool": ["t", "t", "t", "u"],
            "role": ["r", "r", "r", "r"],
            "payload": [1, 2, 3, 4],
        }
    )
    out = partial_counts_fn(["rule", "tool", "role"])(batch)
    got = {(r["rule"], r["tool"], r["role"]): r["n"] for r in out.to_pylist()}
    assert got == {("a", "t", "r"): 2, ("b", "t", "r"): 1, ("a", "u", "r"): 1}
    assert out.column_names == ["rule", "tool", "role", "n"]


def test_salted_sum_matches_plain(ray_session):
    import numpy as np
    import ray.data

    from ulp_ray.stages.aggregate import salted_sum

    rng = np.random.default_rng(1)
    t = pa.table(
        {
            "k": pa.array(np.array(["hot"] * 5000 + ["a", "b"] * 100)),
            "n": pa.array(np.ones(5200, dtype=np.int64)),
        }
    )
    out = salted_sum(ray.data.from_arrow(t).repartition(4), ["k"], "n", salt=8)
    got = {r["k"]: r["n"] for r in out.take_all()}
    assert got == {"hot": 5000, "a": 100, "b": 100}


def test_remote_env_cwd_detection(monkeypatch, tmp_path):
    from ulp_ray import _env

    monkeypatch.chdir(_env.package_root())
    assert _env.remote_env() == {}
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("PYTHONPATH", raising=False)
    env = _env.remote_env()
    assert _env.package_root() in env["runtime_env"]["env_vars"]["PYTHONPATH"]


def test_enrich_null_role_tool_maps_unknown():
    batch = pa.table(
        {
            "role": pa.array(["user", None]),
            "tool": pa.array([None, "bash"]),
        }
    )
    out = enrich_batch(batch, DEFAULT_TAXONOMY)
    assert out["role_class"].to_pylist() == ["unknown", "unknown"]
    assert out["tool_class"].to_pylist() == ["unknown", "unknown"]


def test_rollup_counts_matches_duckdb(ray_session):
    """GROUP BY ROLLUP: all prefix levels + grand total, with real NULL
    data values coinciding with padded rollup nulls (SQL's own
    ambiguity) — multiset-equal to the DuckDB twin."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ulp_ray.stages.aggregate import rollup_counts

    rng = np.random.default_rng(4)
    t = pa.table(
        {
            "a": pa.array(rng.integers(0, 3, 1000), pa.int64()),
            "b": pa.array(
                [None if x == 0 else f"s{x}" for x in rng.integers(0, 4, 1000)],
                pa.string(),
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    got = rollup_counts(ds, ["a", "b"]).to_pandas()
    exp = (
        duckdb.connect()
        .execute(
            "SELECT a, b, COUNT(*) AS n FROM t GROUP BY ROLLUP(a, b)"
        )
        .df()
    )

    def norm(df):
        rows = []
        for row in df.itertuples(index=False):
            rows.append(
                tuple(
                    "N"
                    if (v is None or (isinstance(v, float) and v != v))
                    else v
                    for v in row
                )
            )
        return sorted(rows, key=str)

    assert norm(got) == norm(exp)
    # no-total variant drops exactly one row (the grand total)
    no_tot = rollup_counts(ds, ["a", "b"], total_row=False).to_pandas()
    assert len(no_tot) == len(got) - 1

    import pytest

    with pytest.raises(ValueError, match="at least one key"):
        rollup_counts(ds, [])
