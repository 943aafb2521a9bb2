"""Bloom-filter semi join: exactness vs the bucketed semi join, no
false negatives ever, bounded false-positive rate, null semantics,
multi-block OR-fold."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ulp_ray.stages.bloom import bloom_semi_join, build_bloom
from ulp_ray.stages.join import bucketed_semi_join


def _tables(n_left=5000, n_right=400, seed=3):
    rng = np.random.default_rng(seed)
    right_keys = rng.choice(100_000, size=n_right, replace=False)
    left_keys = rng.integers(0, 100_000, size=n_left)
    left = pa.table(
        {
            "k": pa.array(left_keys, pa.int64()),
            "payload": pa.array(rng.integers(0, 10, size=n_left), pa.int64()),
        }
    )
    right = pa.table({"rk": pa.array(right_keys, pa.int64())})
    return left, right, set(right_keys.tolist())


def test_exact_mode_matches_bucketed_semi_join(ray_session):
    left, right, _ = _tables()
    l, r = ray.data.from_arrow(left), ray.data.from_arrow(right)
    got = (
        # min_left_rows=0 pins the bloom path (the auto-skip heuristic
        # would otherwise route this small input straight to the plain
        # join and the comparison would be vacuous)
        bloom_semi_join(l, r, on="k", right_on="rk", exact=True, min_left_rows=0)
        .to_pandas()
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    want = (
        bucketed_semi_join(l, r, on="k", right_on="rk")
        .to_pandas()
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_approximate_mode_no_false_negatives_bounded_fp(ray_session):
    left, right, rset = _tables(n_left=20_000, n_right=1000, seed=11)
    l, r = ray.data.from_arrow(left), ray.data.from_arrow(right)
    out = bloom_semi_join(l, r, on="k", right_on="rk", exact=False).to_pandas()
    got = set(out["k"].tolist())
    true_members = {k for k in left["k"].to_pylist() if k in rset}
    # every true match survives the screen
    assert true_members <= got
    # false positives bounded: 16 bits/key k=4 → ~0.24 % theoretical;
    # allow a generous 10× cushion on ~19k non-member probes
    non_members = len(left) - sum(1 for k in left["k"].to_pylist() if k in rset)
    fp = len(out) - sum(1 for k in out["k"] if k in rset)
    assert fp <= max(20, int(0.024 * non_members))


def test_null_left_keys_never_match(ray_session):
    left = pa.table({"k": pa.array([1, None, 2, None], pa.int64())})
    right = pa.table({"rk": pa.array([1, 2, None], pa.int64())})
    out = bloom_semi_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        on="k",
        right_on="rk",
        exact=False,
    ).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2]


def test_multiblock_build_or_fold(ray_session):
    left, right, rset = _tables(n_left=3000, n_right=600, seed=5)
    l = ray.data.from_arrow(left)
    # split the right side across many blocks so the partial bitmaps
    # really merge (each block contributes a disjoint key subset)
    r = ray.data.from_arrow(right).repartition(23)
    out = bloom_semi_join(
        l, r, on="k", right_on="rk", exact=True, min_left_rows=0
    ).to_pandas()
    want = {k for k in left["k"].to_pylist() if k in rset}
    assert set(out["k"].tolist()) == want


def test_num_hashes_zero_rejected(ray_session):
    right = ray.data.from_arrow(pa.table({"rk": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError, match="num_hashes"):
        build_bloom(right, "rk", num_hashes=0)


def test_auto_skip_small_left(ray_session, monkeypatch):
    """Exact mode with a small metadata-counted left side skips the
    bloom build entirely (proved by poisoning build_bloom) and still
    returns the exact semi-join result; min_left_rows=0 re-engages it."""
    import ulp_ray.stages.bloom as bloom_mod

    left, right, rset = _tables(n_left=2000, n_right=300, seed=9)
    l, r = ray.data.from_arrow(left), ray.data.from_arrow(right)

    def boom(*a, **kw):  # pragma: no cover - must not be reached
        raise AssertionError("build_bloom must be skipped for small left")

    monkeypatch.setattr(bloom_mod, "build_bloom", boom)
    out = bloom_mod.bloom_semi_join(l, r, on="k", right_on="rk", exact=True)
    want = {k for k in left["k"].to_pylist() if k in rset}
    assert set(out.to_pandas()["k"].tolist()) == want
    with pytest.raises(AssertionError, match="must be skipped"):
        bloom_mod.bloom_semi_join(
            l, r, on="k", right_on="rk", exact=True, min_left_rows=0
        ).materialize()


def test_build_bloom_power_of_two_guard(ray_session):
    right = ray.data.from_arrow(pa.table({"rk": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError, match="power of two"):
        build_bloom(right, "rk", num_bits=1000)


def test_empty_right_side(ray_session):
    left = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"rk": pa.array([], pa.int64())})
    out = bloom_semi_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        on="k",
        right_on="rk",
        exact=False,
    )
    assert out.count() == 0


def test_num_bits_below_word_rejected(ray_session):
    right = ray.data.from_arrow(pa.table({"rk": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError, match="power of two >= 64"):
        build_bloom(right, "rk", num_bits=32)
