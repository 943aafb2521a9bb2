"""BM25 text retrieval: top-k documents for a token query.

The lexical-search companion to the embedding ANN (`similarity.py`) —
a training-data pipeline uses it for targeted corpus probes ("which
documents talk about X") and hard-negative mining next to the dense
retriever. Okapi BM25 with the Lucene idf form
``ln((N − df + 0.5)/(df + 0.5) + 1)`` (always positive, so scores are
monotone in tf).

Scale shape — two passes, nothing big ever shuffles:

1. *Stats pass*: one partial-per-block fold produces the corpus doc
   count N and total token count (→ avgdl), plus df for the QUERY
   terms only (per-block (doc, term)-distinct counts filtered by a
   broadcast ``is_in`` on the handful of query tokens — never the full
   vocabulary's DF).
2. *Score pass*: per block, tokenize (the shared lockstep tokenizer),
   per-doc lengths via one ``bincount``, per-term tf via one
   ``bincount`` per query term (queries are a few words), vectorized
   BM25 sum, then a per-block top-k partial — only O(k) rows per block
   reach the driver fold.

The ranking contract is oracle-checked against a DuckDB twin computing
the identical formula; scores are rounded to 4 decimals on both sides
(the only FP hazard is summation-order last-digits; ranking ties break
by doc_id in both engines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._env import remote_env

__all__ = ["bm25_topk"]


def _tokenize_query(query: str) -> list[str]:
    """Distinct query terms via the SAME lockstep tokenizer the corpus
    uses (RE2 ASCII ``\\s`` — `_tokens.flat_tokens`); a Python
    ``str.split`` would also split on Unicode spaces and could produce
    terms no corpus token can ever equal."""
    from ._tokens import flat_tokens

    toks, _ = flat_tokens(pa.array([query], pa.string()))
    return sorted(set(toks.to_pylist()))


def bm25_topk(
    ds,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Top-``k`` documents by BM25 score for ``query``.

    Returns a Dataset ``(doc_id, rank, score)`` — rank 1-based by score
    descending, ties broken by ascending ``id_col``; only documents
    matching at least one query term appear (so fewer than ``k`` rows
    when matches are scarce). ``score`` is rounded to 4 decimals (the
    oracle contract; see module docstring). ``avgdl`` counts ALL corpus
    documents, including zero-token ones."""
    from ._tokens import flat_tokens

    q_terms = _tokenize_query(query)
    if not q_terms:
        raise ValueError("query must contain at least one token")
    q_arr = pa.array(q_terms, pa.string())
    nt = len(q_terms)

    import pyarrow.compute as pc

    # ---- pass 1: N, total tokens, df per query term ----------------
    def stats_partial(batch: pa.Table) -> pa.Table:
        toks, par = flat_tokens(batch[text_col])
        # index_in: one C-level pass gives each token's query-term index
        # (null for non-members) — both the membership mask and the
        # term ids, no Python over tokens
        ti_all = pc.index_in(toks, value_set=q_arr)
        in_q = pc.is_valid(ti_all).to_numpy(zero_copy_only=False)
        df = np.zeros(nt, dtype=np.int64)
        if in_q.any():
            ti = ti_all.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
            hit_par = par[in_q]
            pairs = np.unique(hit_par * nt + ti)  # (doc, term)-distinct
            np.add.at(df, (pairs % nt).astype(np.int64), 1)
        return pa.table(
            {
                "n_docs": pa.array([len(batch)], pa.int64()),
                "n_tokens": pa.array([len(toks)], pa.int64()),
                "df": pa.array([df.tobytes()], pa.binary()),
            }
        )

    stats = ds.map_batches(
        stats_partial, batch_format="pyarrow", batch_size=None, **remote_env()
    )
    n_docs = n_tokens = 0
    df = np.zeros(nt, dtype=np.int64)
    for bt in stats.iter_batches(batch_format="pyarrow", batch_size=None):
        n_docs += int(pc.sum(bt["n_docs"]).as_py() or 0)
        n_tokens += int(pc.sum(bt["n_tokens"]).as_py() or 0)
        for blob in bt["df"]:
            df += np.frombuffer(blob.as_py(), dtype=np.int64)
    if n_docs == 0:
        return_schema = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        import ray

        return ray.data.from_arrow(return_schema)
    avgdl = n_tokens / n_docs
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    # ---- pass 2: per-block score + top-k partial --------------------
    def score_partial(batch: pa.Table) -> pa.Table:
        toks, par = flat_tokens(batch[text_col])
        dl = np.bincount(par, minlength=len(batch)).astype(np.float64)
        ti_all = pc.index_in(toks, value_set=q_arr)
        in_q = pc.is_valid(ti_all).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                id_col: batch[id_col].slice(0, 0),
                "score": pa.array([], pa.float64()),
            }
        )
        if not in_q.any():
            return empty
        hit_par = par[in_q]
        ti = ti_all.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
        score = np.zeros(len(batch), dtype=np.float64)
        denom_norm = k1 * (1.0 - b + b * dl / avgdl)
        matched = np.zeros(len(batch), dtype=bool)
        for i in range(nt):
            tf = np.bincount(hit_par[ti == i], minlength=len(batch)).astype(
                np.float64
            )
            has = tf > 0
            if not has.any():
                continue
            matched |= has
            score[has] += idf[i] * tf[has] * (k1 + 1.0) / (
                tf[has] + denom_norm[has]
            )
        if not matched.any():
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False)[matched]
        sc = score[matched]
        top = np.lexsort((ids, -sc))[:k]  # block-local top-k partial
        return pa.table(
            {
                id_col: pa.array(ids[top]),
                "score": pa.array(sc[top], pa.float64()),
            }
        )

    partials = ds.map_batches(
        score_partial, batch_format="pyarrow", batch_size=None, **remote_env()
    )
    batches = list(partials.iter_batches(batch_format="pyarrow", batch_size=None))
    if batches:
        rows = pa.concat_tables(batches)
        ids = rows[id_col].to_numpy(zero_copy_only=False)
        sc = rows["score"].to_numpy(zero_copy_only=False)
    else:  # no block matched any query term
        ids = np.array([], dtype=np.int64)
        sc = np.array([], dtype=np.float64)
    order = np.lexsort((ids, -sc))[:k]
    # half-away-from-zero to match DuckDB ROUND (numpy's np.round is
    # banker's half-to-even — the repo's lockstep-rounding convention,
    # see the casts module)
    rounded = pc.round(
        pa.array(sc[order], pa.float64()),
        ndigits=4,
        round_mode="half_towards_infinity",
    )
    out = pa.table(
        {
            id_col: pa.array(ids[order]),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "score": rounded,
        }
    )
    import ray

    return ray.data.from_arrow(out)
