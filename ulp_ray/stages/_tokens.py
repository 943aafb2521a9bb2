"""Shared vectorized tokenization/shingling primitives.

One implementation of the whitespace-split → flatten → drop-empty →
parent-index prologue (and of the shifted-array word-n-gram construction
on top of it), used by the vocabulary folds, the chunking/packing ops,
and the n-gram decontamination join. The tokenization contract is in
lockstep with the SQL-oracle form ``regexp_split_to_array(text, '\\s+')``
with empty tokens dropped — change it HERE or the oracle comparisons in
every consumer break together (which is the point).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["flat_tokens", "token_offsets", "word_ngrams_flat", "distinct_pair_stats"]


def flat_tokens(col) -> tuple[pa.Array, np.ndarray]:
    """Whitespace-split a string column; returns ``(flat non-empty
    tokens, int64 parent row index per token)``. Null rows contribute
    nothing; parent indices are non-decreasing.

    The split is ``split_pattern_regex(r"\\s+")`` — the SAME RE2 ``\\s``
    (ASCII ``[\\t\\n\\f\\r ]``) the DuckDB oracles use — NOT
    ``utf8_split_whitespace``, which also splits on Unicode spaces
    (U+00A0, U+2003, …) and silently diverges from every
    ``regexp_split_to_array(text, '\\s+')`` twin on real-world text
    (found by adversarial review, round 4; lockstep pinned by
    ``test_tokenizer_lockstep_unicode_whitespace``). Measured cost of
    the regex form: 106 ms vs 36 ms per 825k tokens — noise next to the
    downstream hash/dedup work that consumes the tokens."""
    toks = pc.split_pattern_regex(col, pattern=r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(keep)), parents[keep].astype(np.int64)


def token_offsets(par: np.ndarray, n_rows: int) -> np.ndarray:
    """Row offsets (length ``n_rows + 1``) over a flat token array's
    parent indices — the ListArray-style view of :func:`flat_tokens`."""
    counts = np.bincount(par, minlength=n_rows).astype(np.int64)
    return np.concatenate([[0], np.cumsum(counts)])


def word_ngrams_flat(
    flat: pa.Array, par: np.ndarray, n: int
) -> tuple[pa.Array, np.ndarray]:
    """All word-``n``-grams over a flat token array (space-joined),
    windows never crossing a parent row: returns ``(grams,
    gram_parent_row)``. Shifted-slice ``binary_join_element_wise`` —
    no Python per window."""
    total = len(flat)
    if total < n:
        return pa.array([], pa.string()), np.array([], np.int64)
    shifted = [flat.slice(k, total - n + 1) for k in range(n)]
    grams = pc.binary_join_element_wise(*shifted, " ")
    same_row = par[: total - n + 1] == par[n - 1 :]
    grams = grams.filter(pa.array(same_row))
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    return pc.cast(grams, pa.string()), par[: total - n + 1][same_row]


def distinct_pair_stats(
    par: np.ndarray, vals: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Distinct (row, value) pair statistics over parallel parent/value
    arrays, all C-level: hash-factorize the values once (O(n), no string
    sort), dedup (row, value_id) int pairs with one ``np.unique``, and
    return ``(uniq_vals, pair_row, pair_value_id, pair_count)`` — one
    entry per distinct pair, with that pair's multiplicity. Shared by
    the document-frequency fold (count rows per value) and the
    repetition stats (count/max distinct values per row)."""
    import pandas as pd

    vid, uniq_vals = pd.factorize(vals)
    n_vals = max(len(uniq_vals), 1)
    pair = par.astype(np.int64, copy=False) * np.int64(n_vals) + vid
    uniq_pair, pair_count = np.unique(pair, return_counts=True)
    return (
        np.asarray(uniq_vals),
        uniq_pair // n_vals,
        (uniq_pair % n_vals).astype(np.int64),
        pair_count,
    )
