"""Token chunking + sequence packing (training-prep operators)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    texts = []
    for i in range(300):
        n = int(rng.integers(0, 40))
        texts.append(" ".join(f"w{rng.integers(0, 50)}" for _ in range(n)))
    texts[7] = ""
    texts[11] = None
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(3), t


def test_chunk_documents_matches_duckdb(corpus):
    import duckdb

    from ulp_ray.stages.chunk import chunk_documents

    ds, t = corpus
    M, V = 16, 4
    S = M - V
    got = (
        chunk_documents(ds, max_tokens=M, overlap=V)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    exp = con.execute(
        f"WITH l AS (SELECT doc_id, list_filter(regexp_split_to_array(text,"
        f" '\\s+'), x -> x <> '') AS ts FROM documents), "
        f"c AS (SELECT doc_id, ts, len(ts) AS n, "
        f"CASE WHEN len(ts) = 0 THEN NULL WHEN len(ts) <= {M} THEN 1 "
        f"ELSE CAST(ceil(CAST(len(ts) - {M} AS DOUBLE) / {S}) + 1 AS BIGINT) "
        f"END AS nc FROM l) "
        f"SELECT doc_id, i AS chunk_idx, "
        f"CAST(least(i*{S}+{M}, n) - i*{S} AS BIGINT) AS n_tokens, "
        f"array_to_string(ts[i*{S}+1 : least(i*{S}+{M}, n)], ' ') AS text "
        f"FROM c, UNNEST(generate_series(0, nc-1)) AS g(i) "
        f"ORDER BY doc_id, chunk_idx"
    ).df()
    exp["chunk_idx"] = exp["chunk_idx"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


def test_pack_sequences_invariants(corpus):
    from ulp_ray.stages.chunk import pack_sequences

    ds, t = corpus
    M = 64
    out = pack_sequences(ds, max_tokens=M).to_pandas()
    df = t.to_pandas()
    tok_count = (
        df["text"].fillna("").str.split().apply(len).to_numpy()
    )
    # every doc appears exactly once across all sequences
    all_ids = [i for ids in out["doc_ids"] for i in ids]
    assert sorted(all_ids) == sorted(df["doc_id"].tolist())
    # capacity: each sequence <= M tokens unless it is a single oversized doc
    for _, row in out.iterrows():
        assert row["n_tokens"] == sum(tok_count[i] for i in row["doc_ids"])
        if row["n_docs"] > 1:
            assert row["n_tokens"] <= M
    # text round-trip: sequence token count matches its text
    nt = out["text"].str.split().apply(len)
    assert (nt.to_numpy() == out["n_tokens"].to_numpy()).all()
    # deterministic
    out2 = pack_sequences(ds, max_tokens=M).to_pandas()
    assert sorted(out["seq_key"]) == sorted(out2["seq_key"])


def test_pack_sequences_oversized_doc(ray_session):
    import ray.data

    from ulp_ray.stages.chunk import pack_sequences

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b", " ".join(["t"] * 100), "c d"], pa.string()),
        }
    )
    out = pack_sequences(ray.data.from_arrow(t), max_tokens=10).to_pandas()
    big = out[out["n_tokens"] == 100]
    assert len(big) == 1 and big.iloc[0]["n_docs"] == 1


def test_explode_list_positions(ray_session):
    import pyarrow as pa
    import ray.data

    from ulp_ray.stages.chunk import explode_list

    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "xs": pa.array([["a", "b"], [], None, ["c"]], pa.list_(pa.string())),
        }
    )
    out = (
        explode_list(ray.data.from_arrow(t).repartition(2), "xs", ["id"])
        .to_pandas()
        .sort_values(["id", "pos"])
        .reset_index(drop=True)
    )
    assert out.to_dict("list") == {
        "id": [1, 1, 4],
        "pos": [0, 1, 0],
        "xs": ["a", "b", "c"],
    }


def test_chunk_documents_boundaries(ray_session):
    """Exact-boundary token counts and zero overlap: coverage and chunk
    membership follow the window formula exactly."""
    import pyarrow as pa
    import ray.data

    from ulp_ray.stages.chunk import chunk_documents

    M = 8
    docs = {
        0: 7,    # < M  -> 1 chunk
        1: 8,    # == M -> 1 chunk
        2: 9,    # M+1, step 8 (overlap 0) -> 2 chunks (8, 1)
        3: 16,   # 2 exact chunks
        4: 17,   # 3 chunks (8, 8, 1)
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(
                [" ".join(f"d{k}t{i}" for i in range(n)) for k, n in docs.items()]
            ),
        }
    )
    out = (
        chunk_documents(
            ray.data.from_arrow(t), max_tokens=M, overlap=0
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    got = out.groupby("doc_id")["n_tokens"].apply(list).to_dict()
    assert got == {0: [7], 1: [8], 2: [8, 1], 3: [8, 8], 4: [8, 8, 1]}
    # zero-overlap chunks reconstruct the document exactly
    for k, n in docs.items():
        joined = " ".join(out[out["doc_id"] == k]["text"])
        assert joined == " ".join(f"d{k}t{i}" for i in range(n))


def test_chunk_documents_rejects_negative_overlap(ray_session):
    import pytest as _pytest
    import ray.data

    from ulp_ray.stages.chunk import chunk_documents

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["a b"])})
    )
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(ds, max_tokens=8, overlap=-1)
