"""ANN top-k: brute-force baseline vs numpy oracle; IVF recall sanity."""

import numpy as np
import pyarrow as pa
import pytest

from ulp_ray.stages.similarity import ann_topk, ann_topk_ivf


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    mat = rng.standard_normal((200, 32)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), 32
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(4), mat


def _numpy_topk(mat, queries, k):
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = qn @ mn.T
    out = {}
    for qi in range(len(queries)):
        order = np.lexsort((np.arange(mat.shape[0]), -sims[qi]))[:k]
        out[qi] = [(int(i), round(float(sims[qi, i]), 6)) for i in order]
    return out


def test_ann_topk_matches_numpy_oracle(corpus):
    ds, mat = corpus
    rng = np.random.default_rng(4)
    queries = rng.standard_normal((3, 32)).astype(np.float32)
    got = ann_topk(ds, queries, k=5)
    oracle = _numpy_topk(mat, queries, 5)
    for row in got.to_pylist():
        vid, score = oracle[row["query_id"]][row["rank"]]
        assert row["vec_id"] == vid
        assert abs(row["score"] - score) < 1e-5


def test_ann_topk_ivf_recall(corpus):
    ds, mat = corpus
    # query = an actual corpus vector → its top-1 must be itself
    queries = mat[[10, 77]]
    got = ann_topk_ivf(ds, queries, k=3, n_lists=8, n_probe=4)
    top1 = {r["query_id"]: r["vec_id"] for r in got.to_pylist() if r["rank"] == 0}
    assert top1[0] == 10
    assert top1[1] == 77


def test_ann_topk_ivf_full_probe_equals_exact(corpus):
    """With n_probe == n_lists every list is probed, so the streaming IVF
    path must return EXACTLY the brute-force ranking (same float64 math,
    same vec_id tie-break)."""
    ds, mat = corpus
    rng = np.random.default_rng(12)
    queries = rng.standard_normal((3, 32)).astype(np.float32)
    exact = ann_topk(ds, queries, k=5).to_pylist()
    ivf = ann_topk_ivf(ds, queries, k=5, n_lists=8, n_probe=8).to_pylist()
    assert ivf == exact


@pytest.mark.slow
def test_ann_topk_ivf_bounded_callbacks_100k(ray_session):
    """≥10⁵ vectors in ONE block: the streaming IVF search asserts its
    per-callback row cap internally (it raises if a callback ever
    exceeds batch_size — the round-2 shape grouped a whole IVF list,
    corpus/n_lists rows, into one callback), so a clean full-path run at
    batch_size ≪ block size IS the bounded-memory evidence."""
    import ray.data

    import ulp_ray.stages.similarity as smod

    n, dim, bs = 100_000, 16, 8192
    rng = np.random.default_rng(21)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.float32()), dim
            ),
        }
    )
    ds = ray.data.from_arrow(t)  # single input block of 100k rows
    got = smod.ann_topk_ivf(
        ds, mat[[5, 500]], k=3, n_lists=None, n_probe=64, batch_size=bs
    )
    top1 = {r["query_id"]: r["vec_id"] for r in got.to_pylist() if r["rank"] == 0}
    assert top1 == {0: 5, 1: 500}  # self-match survives auto n_lists (√N ≈ 317)
