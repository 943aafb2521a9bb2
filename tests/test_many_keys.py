"""Scale-shape regression: the bucketed co-grouping operators must stay
correct (and not degenerate to per-key Python callbacks) with ≥10⁴
distinct keys — the shape that killed the round-1 per-key map_groups
forms. Correctness here is vs straightforward pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

N_KEYS = 10_000
ROWS = 40_000


@pytest.fixture(scope="module")
def events(ray_session):
    rng = np.random.default_rng(17)
    keys = rng.integers(0, N_KEYS, ROWS)
    ts = np.datetime64("2024-01-01", "us") + rng.integers(
        0, 86_400_000_000, ROWS
    ).astype("timedelta64[us]")
    return pa.table(
        {
            "user_id": pa.array(keys, pa.int64()),
            "event_id": pa.array(np.arange(ROWS), pa.int64()),
            "ts": pa.array(ts),
        }
    )


def test_asof_join_many_keys(events):
    import ray.data

    from ulp_ray.stages.asof import asof_join

    tbl = events
    left_mask = np.arange(ROWS) % 2 == 0
    left_tbl = tbl.filter(pa.array(left_mask)).select(["user_id", "event_id", "ts"])
    right_tbl = (
        tbl.filter(pa.array(~left_mask))
        .select(["user_id", "ts"])
        .append_column("mark", pa.array(np.arange((~left_mask).sum()), pa.int64()))
    )
    out = asof_join(
        ray.data.from_arrow(left_tbl),
        ray.data.from_arrow(right_tbl),
        on="user_id",
        ts_col="ts",
    ).to_pandas()
    assert len(out) == left_tbl.num_rows
    # pandas oracle: global merge_asof by=key
    lp = left_tbl.to_pandas().sort_values("ts", kind="stable")
    rp = right_tbl.to_pandas().sort_values("ts", kind="stable")
    want = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
    key = ["user_id", "event_id"]
    got = out.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["mark"].astype("float64"), want["mark"].astype("float64"), check_names=False
    )
    assert got["user_id"].nunique() > 8_000


def test_session_windows_many_keys(events):
    import ray.data

    from ulp_ray.stages.window import session_windows

    out = session_windows(
        ray.data.from_arrow(events.select(["user_id", "ts"])),
        "user_id",
        gap_s=1800,
    ).to_pandas()
    # pandas oracle
    df = events.select(["user_id", "ts"]).to_pandas().sort_values(["user_id", "ts"])
    gap = pd.Timedelta(seconds=1800)
    new_s = (df["user_id"].ne(df["user_id"].shift())) | (
        df["ts"].diff() > gap
    )
    df["sid"] = new_s.cumsum()
    want = (
        df.groupby("sid")
        .agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
        )
        .reset_index(drop=True)
    )
    key = ["user_id", "session_start"]
    got = out.sort_values(key).reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.astype({"n_events": got["n_events"].dtype}), check_dtype=False
    )
    assert got["user_id"].nunique() > 9_000


def test_turn_gaps_many_keys(events):
    import ray.data

    from ulp_ray.stages.conversation import turn_gaps

    adapted = pa.table(
        {
            "conv_id": events["user_id"].cast(pa.string()),
            "turn_idx": events["event_id"],
            "ts": events["ts"],
        }
    )
    out = turn_gaps(ray.data.from_arrow(adapted)).to_pandas()
    assert len(out) == ROWS
    df = adapted.to_pandas().sort_values(["conv_id", "turn_idx"])
    lag = df.groupby("conv_id", sort=False)["ts"].diff().dt.total_seconds()
    want = df.assign(gap_s=lag)
    key = ["conv_id", "turn_idx"]
    got = out.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_default_buckets_scales_with_cluster(ray_session):
    """buckets=None resolves to max(floor, 4 x cluster CPUs) — the
    co-group reduce keeps every core fed on a big cluster."""
    import ray

    from ulp_ray.stages._bucket import default_buckets

    cpus = int(ray.cluster_resources().get("CPU", 0))
    assert default_buckets() == max(64, 4 * cpus)
    assert default_buckets(floor=1000) == max(1000, 4 * cpus)


def test_resolve_buckets_rows_cap_and_pins(ray_session, tmp_path, monkeypatch):
    """VERDICT r3 item 1: bucket resolution is rows-aware when the input
    row count is free (parquet metadata on an untransformed read) — a
    small table stops fragmenting into cluster-width near-empty tasks —
    while transformed inputs (count unknown) keep the cluster-scaled
    default, explicit buckets= always wins, and the ULP_RAY_BUCKETS env
    pin overrides the default for A/B runs."""
    import pyarrow.parquet as pq
    import ray

    from ulp_ray.stages._bucket import (
        _TARGET_ROWS_PER_BUCKET,
        default_buckets,
        resolve_buckets,
    )

    pq.write_table(pa.table({"k": list(range(1000))}), tmp_path / "t.parquet")
    small = ray.data.read_parquet(str(tmp_path / "t.parquet"))

    # free metadata count (1000 rows) → capped at the floor, not 4×cpus
    assert resolve_buckets(None, small) == 64
    assert resolve_buckets(None, small, floor=8) == 8
    # explicit always wins
    assert resolve_buckets(7, small) == 7
    # transformed input → count unknown → cluster-scaled default
    mapped = small.map_batches(lambda b: b, batch_format="pyarrow")
    assert resolve_buckets(None, mapped) == default_buckets()
    # any-unknown poisons the estimate (sum would under-cap otherwise)
    assert resolve_buckets(None, small, mapped) == default_buckets()
    # the cap formula: ceil(rows / target) once rows exceed floor×target
    rows = 65 * _TARGET_ROWS_PER_BUCKET

    class FakeDS:
        def _meta_count(self):
            return rows

    assert resolve_buckets(None, FakeDS()) == min(default_buckets(), 65)
    # env pin overrides the computed default (benchmark A/B knob)
    monkeypatch.setenv("ULP_RAY_BUCKETS", "96")
    assert default_buckets() == 96
    assert resolve_buckets(None, small) == 96
