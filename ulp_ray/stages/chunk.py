"""Training-sequence preparation: fixed-size token chunking with overlap
and greedy sequence packing.

Two classic LLM-data ops downstream of curation:

- :func:`chunk_documents` — split each document's (whitespace) token
  stream into windows of ``max_tokens`` with ``overlap``-token stride
  overlap. Fully vectorized: token lists stay Arrow, chunk boundaries
  are numpy offset arithmetic, chunk text is one ``binary_join`` — no
  Python per document or chunk. Chunk text joins tokens with single
  spaces (whitespace-normalizing, like the SQL-oracle twin).
- :func:`pack_sequences` — greedy next-fit packing of documents into
  training sequences of at most ``max_tokens``. Packing is PER BLOCK
  (deterministic given block contents under the documented doc_id sort;
  global optimality is not a goal — at 100 TB, cross-block packing
  would be an all-to-all for a ~1% density win). The only scalar loop
  runs over the per-doc TOKEN-COUNT int array (next-fit resets are
  inherently sequential); text never enters the loop — concatenation is
  one vectorized ``binary_join`` over the assembled list array.

A document longer than ``max_tokens`` becomes its own (oversized)
sequence in ``pack_sequences``; chunk first if a hard cap is required.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._env import remote_env

__all__ = ["chunk_documents", "pack_sequences", "explode_list"]


def _filtered_token_lists(col) -> tuple[pa.Array, np.ndarray]:
    """Whitespace-split a string column and drop empty tokens; returns
    (flat token array, int64 row offsets of length n+1). Null rows get
    zero tokens."""
    from ._tokens import flat_tokens, token_offsets

    flat, par = flat_tokens(col)
    return flat, token_offsets(par, len(col))


def chunk_documents(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
    overlap: int = 32,
):
    """Explode documents into overlapping token windows: output
    ``(doc_id, chunk_idx, n_tokens, text)`` with chunk ``i`` covering
    tokens ``[i·step, i·step + max_tokens)``, ``step = max_tokens −
    overlap``. A document with ≤ max_tokens tokens yields one chunk;
    an empty or null text yields none."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must be in [0, max_tokens) — a negative "
                         "overlap would silently skip tokens between chunks")
    step = max_tokens - overlap

    def chunk(batch: pa.Table) -> pa.Table:
        flat, off = _filtered_token_lists(batch[text_col])
        n = np.diff(off)  # tokens per row
        n_chunks = np.where(
            n == 0, 0, np.where(n <= max_tokens, 1, (n - max_tokens + step - 1) // step + 1)
        ).astype(np.int64)
        total = int(n_chunks.sum())
        out_schema = pa.schema(
            [
                (id_col, batch.schema.field(id_col).type),
                ("chunk_idx", pa.int64()),
                ("n_tokens", pa.int64()),
                ("text", pa.string()),
            ]
        )
        if total == 0:
            return out_schema.empty_table()
        parent = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
        # chunk index within its doc: global arange minus each doc's base
        base = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
        cidx = np.arange(total, dtype=np.int64) - base[parent]
        start = cidx * step
        end = np.minimum(start + max_tokens, n[parent])
        sizes = end - start
        # flat take indices: for each chunk, off[parent]+start .. +end
        chunk_base = off[parent] + start
        flat_idx = np.repeat(chunk_base, sizes) + (
            np.arange(int(sizes.sum()), dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(sizes)])[:-1], sizes)
        )
        tokens = flat.take(pa.array(flat_idx, pa.int64()))
        chunk_offsets = np.concatenate([[0], np.cumsum(sizes)])
        chunk_lists = pa.LargeListArray.from_arrays(
            pa.array(chunk_offsets, pa.int64()), tokens
        )
        text = pc.binary_join(chunk_lists, " ")
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(parent, pa.int64())),
                "chunk_idx": pa.array(cidx, pa.int64()),
                "n_tokens": pa.array(sizes, pa.int64()),
                "text": pc.cast(text, pa.string()),
            },
            schema=out_schema,
        )

    return ds.map_batches(chunk, batch_format="pyarrow", **remote_env())


def pack_sequences(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    sep: str = "\n",
):
    """Greedy next-fit packing of documents into training sequences:
    output ``(seq_key, n_docs, n_tokens, doc_ids: list<...>, text)``
    where each sequence's token total is ≤ ``max_tokens`` (except a
    single oversized document, which becomes its own sequence).

    Per block: documents are processed in doc_id order (deterministic
    given block contents); the next-fit scan loops over the int token
    counts only; doc-id lists and concatenated text are built with
    vectorized ListArray slicing + ``binary_join``. ``seq_key`` is
    ``"<first_doc_id>"`` — the id of the sequence's first document —
    globally unique because each document belongs to exactly one
    sequence."""

    def pack(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        out_schema = pa.schema(
            [
                ("seq_key", pa.string()),
                ("n_docs", pa.int64()),
                ("n_tokens", pa.int64()),
                ("doc_ids", pa.large_list(id_type)),
                ("text", pa.string()),
            ]
        )
        if len(batch) == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(batch[id_col])
        batch = batch.take(order)
        flat, off = _filtered_token_lists(batch[text_col])
        n = np.diff(off)
        # next-fit over int counts only (sequential by nature)
        seq_of = np.empty(len(n), dtype=np.int64)
        seq = 0
        acc = 0
        for i, ni in enumerate(n.tolist()):
            if acc > 0 and acc + ni > max_tokens:
                seq += 1
                acc = 0
            seq_of[i] = seq
            acc += ni
        n_seq = seq + 1
        # docs are already in seq order (next-fit is contiguous):
        # sequence boundaries are where seq_of changes
        starts = np.flatnonzero(np.concatenate([[True], seq_of[1:] != seq_of[:-1]]))
        bounds = np.concatenate([starts, [len(n)]])
        n_docs = np.diff(bounds)
        seq_tokens = np.add.reduceat(n, starts) if len(n) else np.array([], np.int64)
        ids = batch[id_col].combine_chunks()
        doc_ids = pa.LargeListArray.from_arrays(pa.array(bounds, pa.int64()), ids)
        # per-sequence text: join each doc's tokens with ' ', then docs
        # with `sep` — both vectorized joins
        doc_lists = pa.LargeListArray.from_arrays(pa.array(off, pa.int64()), flat)
        doc_text = pc.cast(pc.binary_join(doc_lists, " "), pa.string())
        seq_lists = pa.LargeListArray.from_arrays(
            pa.array(bounds, pa.int64()), doc_text.combine_chunks()
            if isinstance(doc_text, pa.ChunkedArray)
            else doc_text,
        )
        text = pc.cast(pc.binary_join(seq_lists, sep), pa.string())
        first_ids = ids.take(pa.array(starts, pa.int64()))
        return pa.table(
            {
                "seq_key": pc.cast(first_ids, pa.string()),
                "n_docs": pa.array(n_docs, pa.int64()),
                "n_tokens": pa.array(seq_tokens, pa.int64()),
                "doc_ids": doc_ids,
                "text": text,
            },
            schema=out_schema,
        )

    return ds.map_batches(pack, batch_format="pyarrow", **remote_env())


def explode_list(ds, list_col: str, id_cols: list[str], pos_col: str = "pos"):
    """Generic UNNEST WITH ORDINALITY: one output row per list element,
    carrying ``id_cols`` + 0-based ``pos_col`` + the element as
    ``list_col``. Vectorized: ``list_flatten`` + ``list_parent_indices``
    + one arange-minus-offsets pass — no Python per row. Null/empty
    lists yield no rows (SQL UNNEST)."""

    def explode(batch: pa.Table) -> pa.Table:
        col = batch[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)
        parents = pc.list_parent_indices(col)
        par_np = parents.to_numpy(zero_copy_only=False)
        # position within the list: global arange minus each list's base
        n_out = len(flat)
        starts = np.flatnonzero(
            np.concatenate([[True], par_np[1:] != par_np[:-1]])
        ) if n_out else np.array([], np.int64)
        base = np.zeros(n_out, dtype=np.int64)
        if n_out:
            base[starts] = np.arange(n_out, dtype=np.int64)[starts]
            base = np.maximum.accumulate(base)
        pos = np.arange(n_out, dtype=np.int64) - base
        cols = {c: batch[c].take(parents) for c in id_cols}
        cols[pos_col] = pa.array(pos, pa.int64())
        cols[list_col] = flat
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow", **remote_env())
