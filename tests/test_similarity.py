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
