"""BM25 top-k: pinned against a pure-python reference implementation
(tf saturation, idf, length normalization), block-count invariance,
and edge cases."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ulp_ray.stages.retrieval import bm25_topk

K1, B = 1.2, 0.75


def _reference_bm25(docs, query, k):
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = []
    terms = sorted(set(query.split()))
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    for i, v in toks.items():
        s = 0.0
        hit = False
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            hit = True
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(v) / avgdl))
        if hit:
            out.append((i, s))
    out.sort(key=lambda r: (-r[1], r[0]))
    return [(i, rank + 1, round(s, 4)) for rank, (i, s) in enumerate(out[:k])]


DOCS = {
    0: "hash join hash join hash",         # high tf, short
    1: "hash join merge sort filter scan group agg window order",
    2: "merge merge merge merge merge merge merge merge",  # tf saturation
    3: "scan filter group",                # no query terms
    4: "join",                             # minimal match
    5: "",                                 # zero tokens (counts in avgdl)
}


def _ds(n_blocks=1):
    t = pa.table(
        {
            "doc_id": pa.array(list(DOCS), pa.int64()),
            "text": pa.array(list(DOCS.values()), pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def test_matches_reference_implementation(ray_session):
    got = bm25_topk(_ds(), "hash join merge", k=10).to_pandas()
    want = _reference_bm25(DOCS, "hash join merge", 10)
    assert list(zip(got["doc_id"], got["rank"])) == [w[:2] for w in want]
    # engine rounds half-away-from-zero (DuckDB lockstep); the python
    # reference's round() is half-to-even — compare within half an ulp
    # of the 4th decimal instead of demanding identical tie-rounding
    for g, w in zip(got["score"], want):
        assert abs(g - w[2]) <= 5e-5
    # the no-term doc never appears
    assert 3 not in set(got["doc_id"])


def test_block_count_invariance(ray_session):
    one = bm25_topk(_ds(1), "hash join merge", k=4).to_pandas()
    many = bm25_topk(_ds(5), "hash join merge", k=4).to_pandas()
    assert one.equals(many)


def test_k_larger_than_matches(ray_session):
    out = bm25_topk(_ds(), "merge", k=50).to_pandas()
    # only docs containing "merge"
    assert set(out["doc_id"]) == {1, 2}
    assert out["rank"].tolist() == [1, 2]


def test_empty_query_rejected(ray_session):
    with pytest.raises(ValueError, match="at least one token"):
        bm25_topk(_ds(), "   ")


def test_no_matches_returns_empty(ray_session):
    out = bm25_topk(_ds(), "zzzz", k=5)
    assert out.count() == 0
