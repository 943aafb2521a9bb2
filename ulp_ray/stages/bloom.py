"""Bloom-filter pre-filtered semi join.

The bucketed semi join (`join.py`) ships EVERY left row through the
co-group exchange even when almost none match. At 100 TB the classic
fix is a Bloom filter: fold the right side's keys into a fixed-size bit
array (mergeable per-block partials — a bitwise OR is associative and
commutative), broadcast it once via ``ray.put``, and drop non-matching
left rows INSIDE ``map_batches`` before anything shuffles. With
``exact=True`` (default) the survivors still go through the exact
bucketed semi join, so results are identical to ``bucketed_semi_join``
— the filter only shrinks the exchange (by ~the join selectivity).
``exact=False`` skips the verify join and accepts the documented false
positive rate for a single-pass screen.

Cost shape: the build is one streaming pass over the right keys with a
per-block O(m/64)-word partial, OR-folded through a 64-ary tree (never
O(blocks × m) on the driver); the probe is a fully vectorized gather —
two numpy index ops per hash function, no shuffle. Filter size
defaults to 16 bits/key (k = 4 → ~0.24 % fpr) when the right row count
is free from parquet metadata, else 2²⁴ bits (2 MiB).

Hashes reuse the bucketed co-group family's canonical key hash
(`_bucket.key_hash_u64`) so the same logical key hashes identically on
both sides regardless of physical representation, with splitmix64
finalizer-style double hashing deriving the k probe positions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["build_bloom", "bloom_semi_join"]

_DEFAULT_BITS = 1 << 24  # 2 MiB when the right count isn't free
_MAX_BITS = 1 << 30  # 128 MiB broadcast ceiling
_BITS_PER_KEY = 16

# per-worker bitmap cache keyed by broadcast ref — the same fetch-once
# discipline as enrich._BROADCAST_CACHE, but DEDICATED and BOUNDED:
# unlike taxonomy dicts, a bitmap can be 128 MiB, and the cached value
# is a zero-copy view pinning its plasma object, so an unbounded cache
# would pin every bloom filter a long-lived worker ever probed. FIFO
# eviction; 4 live filters covers any realistic concurrent-join fan-in.
_BITS_CACHE: dict[str, np.ndarray] = {}
_BITS_CACHE_MAX = 4


def _fetch_bits(ref) -> np.ndarray:
    key = ref.hex()
    bits = _BITS_CACHE.get(key)
    if bits is None:
        import ray

        bits = ray.get(ref)
        while len(_BITS_CACHE) >= _BITS_CACHE_MAX:
            _BITS_CACHE.pop(next(iter(_BITS_CACHE)))
        _BITS_CACHE[key] = bits
    return bits


def _next_pow2(n: int) -> int:
    return 1 << max(6, (n - 1).bit_length())


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: an independent second hash stream from the
    first (vectorized, uint64 wraparound)."""
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def _positions(h1: np.ndarray, num_hashes: int, num_bits: int) -> np.ndarray:
    """(rows, k) probe positions via double hashing h1 + i·h2 mod m;
    h2 forced odd so the k probes never collapse onto one bit."""
    h2 = _mix(h1) | np.uint64(1)
    i = np.arange(num_hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = h1[:, None] + i[None, :] * h2[:, None]
    return (pos & np.uint64(num_bits - 1)).astype(np.int64)


def build_bloom(
    ds,
    on: str,
    num_bits: int | None = None,
    num_hashes: int = 4,
):
    """Fold ``ds[on]``'s keys into a Bloom bitmap; returns
    ``(ObjectRef[np.ndarray[uint64]], num_bits, num_hashes)``.

    Per-block partials (one ``m/64``-word row each) OR-fold through a
    64-ary ``map_batches`` tree, so neither the driver nor any single
    task ever holds more than 64 partial bitmaps. Null keys are not
    inserted (SQL EXISTS: NULL never matches)."""
    import ray

    from .._env import remote_env
    from ._bucket import key_hash_u64

    if num_hashes < 1:
        # k = 0 would make every probe's hit.all(axis=1) vacuously True:
        # exact=False silently returns EVERY left row (no screen at all)
        # and exact=True silently loses all pruning — fail loudly instead
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    if num_bits is None:
        try:
            n = ds._meta_count()
        except Exception:  # pragma: no cover - internal-API drift guard
            n = None
        num_bits = (
            min(_MAX_BITS, _next_pow2(n * _BITS_PER_KEY)) if n else _DEFAULT_BITS
        )
    if num_bits < 64 or num_bits & (num_bits - 1):
        raise ValueError(
            f"num_bits must be a power of two >= 64 (one uint64 word), "
            f"got {num_bits}"
        )
    words = num_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[on].combine_chunks()
        col = col.drop_null()
        bits = np.zeros(words, dtype=np.uint64)
        if len(col):
            pos = _positions(key_hash_u64(col), num_hashes, num_bits).ravel()
            np.bitwise_or.at(
                bits, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
            )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.large_binary())})

    def or_rows(batch: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for blob in batch["bits"]:
            acc |= np.frombuffer(blob.as_py(), dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.large_binary())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, **remote_env()
    ).materialize()
    while parts.count() > 64:
        parts = parts.map_batches(
            or_rows, batch_format="pyarrow", batch_size=64, **remote_env()
        ).materialize()
    acc = np.zeros(words, dtype=np.uint64)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in b["bits"]:
            acc |= np.frombuffer(blob.as_py(), dtype=np.uint64)
    return ray.put(acc), num_bits, num_hashes


def _free_count(ds) -> int | None:
    """Row count when it's FREE (parquet metadata on an untransformed
    read); None otherwise — never pays an execution."""
    try:
        return ds._meta_count()
    except Exception:  # pragma: no cover - internal-API drift guard
        return None


def bloom_semi_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    num_bits: int | None = None,
    num_hashes: int = 4,
    exact: bool = True,
    buckets: int | None = None,
    min_left_rows: int = 4_000_000,
):
    """Semi join with a broadcast Bloom pre-filter on the left side.

    ``exact=True`` (default): identical results to
    ``bucketed_semi_join(left, right, ...)`` — the bitmap only prunes
    rows BEFORE the exchange, the exact join decides membership. With
    join selectivity s and false-positive rate p, only ``(s + p)`` of
    the left rows shuffle instead of all of them.

    ``exact=False``: single-pass approximate screen — no shuffle at
    all; keeps every true match plus ~``p`` false positives (``p`` ≈
    0.24 % at the default 16 bits/key, k = 4). Null left keys never
    match in either mode (SQL EXISTS semantics).

    Auto-skip (``exact=True`` only — ``exact=False`` callers asked for
    the screen itself): the build pass + broadcast + probe pass are pure
    overhead when the exchange they would shrink is already small, so
    when the LEFT row count is free from parquet metadata and below
    ``min_left_rows`` (default 4M — the measured break-even order on the
    dev box, where the bloom form's fixed cost ≈ 2 s exceeded the whole
    150k-row exchange it saved; tune per cluster), or the RIGHT count is
    free and too large for a useful bitmap under the broadcast ceiling
    (< 2 bits/key ⇒ fpr ≳ 40 %), the call routes straight to
    ``bucketed_semi_join`` — results are identical either way.
    ``min_left_rows=0`` pins the bloom path (tests, oracle queries)."""
    from .._env import remote_env
    from ._bucket import key_hash_u64

    rkey = right_on or on
    if num_hashes < 1:
        # validate BEFORE the auto-skip: otherwise the same invalid call
        # succeeds on a small left and raises on a large one
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    if exact:
        ln = _free_count(left)
        rn = _free_count(right)
        if (ln is not None and ln < min_left_rows) or (
            rn is not None and rn * 2 > _MAX_BITS
        ):
            from .join import bucketed_semi_join

            return bucketed_semi_join(
                left, right, on=on, right_on=rkey, buckets=buckets
            )
    ref, num_bits, num_hashes = build_bloom(
        right.select_columns([rkey]), rkey, num_bits, num_hashes
    )

    def probe(batch: pa.Table) -> pa.Table:
        # bitmap fetched once per worker process (cached by ref — the
        # contamination stage's broadcast discipline); ray.get of a
        # local plasma object is a zero-copy read, and a plain task fn
        # reuses the default worker pool instead of paying an
        # actor-pool spin-up
        bits = _fetch_bits(ref)
        col = batch[on].combine_chunks()
        valid = np.asarray(pc.is_valid(col))
        if not valid.any():
            return batch.slice(0, 0)
        pos = _positions(key_hash_u64(col), num_hashes, num_bits)
        hit = (
            bits[pos >> 6]
            & (np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
        ) != 0
        keep = hit.all(axis=1) & valid
        return batch.filter(pa.array(keep))

    filtered = left.map_batches(probe, batch_format="pyarrow", **remote_env())
    if not exact:
        return filtered
    from .join import bucketed_semi_join

    return bucketed_semi_join(filtered, right, on=on, right_on=rkey, buckets=buckets)
