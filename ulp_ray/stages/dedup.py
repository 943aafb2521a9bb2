"""Deduplication operators for large-scale training-data pipelines.

The reference has no dedup (every record ships with a fresh uuid,
``/root/reference/src/elastic.rs:108`` — re-ingest duplicates docs); these
are the operators a 100 TB corpus pipeline needs, each built Ray-Data-first:

- :func:`exact_dedup` — content-hash partition → per-group first.
- :func:`minhash_signatures` / :func:`minhash_lsh_candidates` /
  :func:`minhash_dedup` — shingle → minhash → banded LSH buckets →
  groupby → candidate pairs → exact-Jaccard verify.
- :func:`simhash_signatures` / :func:`simhash_candidates` — 64-bit simhash
  with banded blocking for hamming-distance ≤ k pairs.
- :func:`ngram_jaccard` — exact n-gram Jaccard between two texts (the
  verifier used by the LSH paths; also exposed standalone).
- :func:`embedding_neardup` — cosine near-duplicate pairs over an
  embedding column: broadcast normalized matrix + blocked matmul
  (exact), or random-hyperplane LSH bucketing (scale path).

Scale notes: signatures are computed per batch (vectorized numpy, no
Python loop over *shingles*); the only all-to-all is the groupby over
(band, band_hash) rows — O(docs × bands) tiny rows, never the text.
Candidate verification re-reads texts only for candidate ids (assumed ≪
corpus; documented per function).
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .._env import remote_env

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_dedup",
    "simhash_signatures",
    "simhash_candidates",
    "ngram_jaccard",
    "embedding_neardup",
    "embedding_neardup_lsh",
]

# Mersenne prime 2^31-1: with a,b,h all < 2^31, (a*h + b) stays < 2^63 —
# no uint64 wraparound, so the permutations really are a universal family
# mod p (a 2^61 modulus would overflow uint64 in the product and silently
# wrap, breaking the uniformity the Jaccard estimate relies on)
_MERSENNE = (1 << 31) - 1


def _stable_u64(arr: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hashes for an object array of strings."""
    return pd.util.hash_array(arr, hash_key="ulp_ray_dedup!16").astype(np.uint64)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, on: str, order_col: str):
    """Exact dedup: keep, for each distinct ``on`` value, the row with the
    minimum ``order_col`` (deterministic winner).

    Two-phase: a vectorized content-hash column is added per batch, the
    shuffle groups by the 64-bit hash (fixed-width key, never the payload
    ordering problem of grouping raw text), and the per-group pandas step
    resolves hash collisions by grouping on the actual value.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        vals = batch[on].to_numpy(zero_copy_only=False)
        return batch.append_column("__h", pa.array(_stable_u64(vals)))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(order_col).groupby(on, sort=False).head(1)
        return out.drop(columns="__h")

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", **remote_env())
        .groupby("__h")
        .map_groups(keep_first, batch_format="pandas", **remote_env())
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Character k-shingle hash set of one document (uint64, unique).
    Scalar form (tests, the Jaccard verifier); the signature stage uses
    the batch form below."""
    hs = _batch_shingle_hashes([text], k)[0]
    return np.unique(hs)


def _batch_shingle_hashes(texts: list[str | None], k: int) -> list[np.ndarray]:
    """Byte-level k-gram rolling hashes for a whole batch, vectorized:
    one concatenated UTF-8 buffer, k shifted-add passes (no per-doc
    string slicing — that Python loop was the signature stage's cost).
    Shingles are BYTE k-grams (multibyte chars span >1 unit) — a
    deterministic, self-consistent family for MinHash."""
    bufs = [(t or "\x00").encode("utf-8") for t in texts]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n < k:
        data = np.concatenate([data, np.zeros(k, dtype=np.uint64)])
        n = len(data)
    # polynomial hash of every k-byte window: h[i] = Σ b[i+j]·P^(k-1-j)
    P = np.uint64(1099511628211)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = acc * P + data[j : n - k + 1 + j]
    # final avalanche (splitmix-style) so nearby windows decorrelate
    acc ^= acc >> np.uint64(33)
    acc *= np.uint64(0xFF51AFD7ED558CCD)
    acc ^= acc >> np.uint64(33)
    ends = np.cumsum(lens)
    starts = ends - lens
    out: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        if e - s >= k:
            out.append(acc[s : e - k + 1])
        else:  # shorter than one shingle: hash the whole doc
            out.append(acc[s : s + 1])
    return out


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    shingle_k: int = 5,
):
    """Per-doc minhash signature: a ``fixed_size_list<uint64>[num_perm]``
    column. Vectorized: per doc one numpy (num_perm × shingles) min-reduce;
    the permutation parameters are module-deterministic (seeded)."""

    a, b = _perm_params(num_perm)

    def sig(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        shingles = _batch_shingle_hashes(texts, shingle_k)
        out = np.empty((len(texts), num_perm), dtype=np.uint64)
        for i, sh in enumerate(shingles):
            sh = np.unique(sh)
            # (a*h + b) mod p, min over shingles — classic universal hashing
            vals = (a[:, None] * (sh[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
            out[i] = vals.min(axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(out.reshape(-1), pa.uint64()), num_perm
                ),
            }
        )

    return ds.map_batches(sig, batch_format="pyarrow", **remote_env())


def minhash_lsh_candidates(
    sig_ds,
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    dedup_pairs: bool = True,
):
    """Banded LSH: explode each signature into (band, band_hash, id) rows,
    group by (band, band_hash), and emit candidate pairs (a < b) from each
    bucket. The shuffle moves only O(docs × bands) fixed-width rows."""
    rows_per_band = num_perm // bands

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sigs = np.asarray(batch["minhash"].combine_chunks().flatten()).reshape(
            len(ids), num_perm
        )
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), len(ids))
        doc_ids = np.tile(ids, bands)
        hashes = np.empty(len(ids) * bands, dtype=np.uint64)
        for bi in range(bands):
            seg = sigs[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            h = np.zeros(len(ids), dtype=np.uint64)
            for c in range(rows_per_band):  # tiny: rows_per_band mixes
                h = h * np.uint64(1099511628211) + seg[:, c]
            hashes[bi * len(ids) : (bi + 1) * len(ids)] = h
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(hashes),
                id_col: pa.array(doc_ids),
            }
        )

    # Millions of tiny buckets make per-group callbacks the bottleneck
    # (one Python call per bucket); instead co-locate buckets into a
    # bounded number of SHARDS (hash(band_hash) % n_shards) and generate
    # pairs per shard with one vectorized pandas self-merge.
    n_shards = 64

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = pc.cast(
            pc.bit_wise_and(batch["band_hash"], pa.scalar(n_shards - 1, pa.uint64())),
            pa.int64(),
        )
        return batch.append_column("shard", shard)

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g[["band", "band_hash", id_col]]
        m = df.merge(df, on=["band", "band_hash"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        out = m.rename(columns={f"{id_col}_a": "id_a", f"{id_col}_b": "id_b"})[
            ["id_a", "id_b"]
        ].drop_duplicates()
        return out.astype("int64")

    cand = (
        sig_ds.map_batches(explode, batch_format="pyarrow", **remote_env())
        .map_batches(add_shard, batch_format="pyarrow", **remote_env())
        .groupby("shard")
        .map_groups(shard_pairs, batch_format="pandas", **remote_env())
    )

    if not dedup_pairs:
        # caller dedups (e.g. minhash_dedup's verify loop) — skip the
        # extra groupby execution
        return cand
    # a pair found in several bands may land in different shards → final
    # global dedup (pairs are few relative to the corpus)
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas", **remote_env()
    )


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard similarity of two texts."""
    sa = set(map(int, _shingle_hashes(text_a or "", k)))
    sb = set(map(int, _shingle_hashes(text_b or "", k)))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def minhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> pa.Table:
    """End-to-end MinHash-LSH near-dup detection: returns the table
    ``(id_a, id_b, jaccard)`` of verified pairs with Jaccard ≥ threshold.

    Verification re-reads only candidate texts (a driver-side broadcast
    filter — assumes candidates ≪ corpus; for corpora where that fails,
    verify inside a bucketed join instead)."""
    sigs = minhash_signatures(ds, text_col, id_col, num_perm, shingle_k)
    cand = minhash_lsh_candidates(
        sigs, id_col, num_perm, bands, dedup_pairs=False
    ).take_all()
    if not cand:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    need = sorted({c["id_a"] for c in cand} | {c["id_b"] for c in cand})
    need_set = set(need)

    def pick(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[id_col], value_set=pa.array(need, type=batch[id_col].type))
        return batch.filter(mask).select([id_col, text_col])

    texts = {}
    for row in ds.map_batches(pick, batch_format="pyarrow", **remote_env()).take_all():
        if row[id_col] in need_set:
            texts[row[id_col]] = row[text_col]

    out_a, out_b, out_j = [], [], []
    seen = set()
    for c in cand:
        key = (c["id_a"], c["id_b"])
        if key in seen:
            continue
        seen.add(key)
        j = ngram_jaccard(texts.get(c["id_a"]), texts.get(c["id_b"]), shingle_k)
        if j >= threshold:
            out_a.append(c["id_a"])
            out_b.append(c["id_b"])
            out_j.append(round(j, 6))
    return pa.table(
        {
            "id_a": pa.array(out_a, pa.int64()),
            "id_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id"):
    """64-bit simhash per doc: sign-sum of token hashes' bits."""

    def sig(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        out = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = np.array((t or "").lower().split(), dtype=object)
            if len(toks) == 0:
                out[i] = 0
                continue
            h = _stable_u64(toks)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            acc = (2 * bits - 1).sum(axis=0)
            out[i] = np.uint64(
                int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2)
            )
        return pa.table({id_col: batch[id_col], "simhash": pa.array(out, pa.uint64())})

    return ds.map_batches(sig, batch_format="pyarrow", **remote_env())


def simhash_candidates(sig_ds, id_col: str = "doc_id", max_hamming: int = 3):
    """Banded blocking for hamming ≤ ``max_hamming``: split the 64 bits
    into (max_hamming + 1) bands — pigeonhole: any pair within distance k
    agrees exactly on ≥1 band — group by (band, band_bits), emit pairs,
    verify the true hamming distance via XOR popcount."""
    n_bands = max_hamming + 1
    width = 64 // n_bands

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sigs = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bands_col, bits_col, id_col_out, sig_out = [], [], [], []
        for bi in range(n_bands):
            shift = np.uint64(bi * width)
            mask = np.uint64((1 << width) - 1)
            bands_col.append(np.full(len(ids), bi, dtype=np.int32))
            bits_col.append((sigs >> shift) & mask)
            id_col_out.append(ids)
            sig_out.append(sigs)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands_col)),
                "band_bits": pa.array(np.concatenate(bits_col), pa.uint64()),
                id_col: pa.array(np.concatenate(id_col_out)),
                "simhash": pa.array(np.concatenate(sig_out), pa.uint64()),
            }
        )

    # same shard trick as minhash: bounded shard count, vectorized
    # self-merge per shard, XOR+popcount vectorized over the pair rows
    n_shards = 64

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = pc.cast(
            pc.bit_wise_and(batch["band_bits"], pa.scalar(n_shards - 1, pa.uint64())),
            pa.int64(),
        )
        return batch.append_column("shard", shard)

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g[["band", "band_bits", id_col, "simhash"]].drop_duplicates(
            ["band", "band_bits", id_col]
        )
        m = df.merge(df, on=["band", "band_bits"], suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if m.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(
                "int64"
            )
        x = m["simhash_a"].to_numpy().astype(np.uint64) ^ m[
            "simhash_b"
        ].to_numpy().astype(np.uint64)
        # vectorized popcount: view as bytes, unpack bits, sum
        ham = (
            np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        m = m.assign(hamming=ham)
        m = m[m["hamming"] <= max_hamming]
        out = m.rename(columns={f"{id_col}_a": "id_a", f"{id_col}_b": "id_b"})[
            ["id_a", "id_b", "hamming"]
        ].drop_duplicates(["id_a", "id_b"])
        return out.astype({"id_a": "int64", "id_b": "int64", "hamming": "int64"})

    cand = (
        sig_ds.map_batches(explode, batch_format="pyarrow", **remote_env())
        .map_batches(add_shard, batch_format="pyarrow", **remote_env())
        .groupby("shard")
        .map_groups(shard_pairs, batch_format="pandas", **remote_env())
    )
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas", **remote_env()
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _normalized_matrix(ds, vec_col: str, id_col: str) -> tuple[np.ndarray, np.ndarray]:
    ids, rows = [], []
    for batch in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ids.append(batch[id_col].to_numpy(zero_copy_only=False))
        flat = np.asarray(batch[vec_col].combine_chunks().flatten(), dtype=np.float32)
        rows.append(flat.reshape(len(batch), -1))
    mat = np.concatenate(rows)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return np.concatenate(ids), mat / norms


def embedding_neardup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> pa.Table:
    """Exact cosine near-dup pairs: the normalized matrix is broadcast
    (``ray.put`` once), each batch computes block × all matmul and emits
    pairs with cos ≥ threshold and id_a < id_b.

    Broadcast-side footprint: N × dim float32 — fine up to ~10⁷ vectors of
    dim ≤ 256 on 128 GiB nodes; beyond that use
    :func:`embedding_neardup_lsh`."""
    import ray

    all_ids, mat = _normalized_matrix(ds, vec_col, id_col)
    mat_ref = ray.put((all_ids, mat))

    def block_pairs(batch: pa.Table) -> pa.Table:
        ids_all, m = ray.get(mat_ref)
        ids_b = batch[id_col].to_numpy(zero_copy_only=False)
        flat = np.asarray(batch[vec_col].combine_chunks().flatten(), dtype=np.float32)
        vb = flat.reshape(len(ids_b), -1)
        nb = np.linalg.norm(vb, axis=1, keepdims=True)
        nb[nb == 0] = 1.0
        sims = (vb / nb) @ m.T
        ia, ja = np.nonzero(sims >= threshold)
        a, b = ids_b[ia], ids_all[ja]
        keep = a < b
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(np.round(sims[ia, ja][keep].astype(np.float64), 6)),
            }
        )

    out = ds.map_batches(block_pairs, batch_format="pyarrow", **remote_env())
    return pa.Table.from_pylist(
        out.take_all(),
        schema=pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64())]
        ),
    )


def embedding_neardup_lsh(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
):
    """Scale path: random-hyperplane LSH — bucket = sign bits of
    ``n_planes`` projections; exact cosine verification only within each
    bucket (groupby). Recall < 1 by construction (near-dups differing in a
    sign bit land apart); raise recall by unioning several plane seeds."""

    def bucketize(batch: pa.Table) -> pa.Table:
        flat = np.asarray(batch[vec_col].combine_chunks().flatten(), dtype=np.float32)
        v = flat.reshape(len(batch), -1)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((v.shape[1], n_planes)).astype(np.float32)
        bits = (v @ planes) > 0
        bucket = (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(bucket),
                vec_col: batch[vec_col],
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        v = np.stack(g[vec_col].to_numpy())
        n = np.linalg.norm(v, axis=1, keepdims=True)
        n[n == 0] = 1.0
        v = v / n
        sims = v @ v.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        a, b = ids[ia], ids[ib]
        swap = a > b
        a[swap], b[swap] = b[swap], a[swap]
        return pd.DataFrame(
            {"id_a": a, "id_b": b, "cosine": np.round(sims[ia, ib].astype(np.float64), 6)}
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", **remote_env())
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas", **remote_env())
    )
