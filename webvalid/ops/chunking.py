"""Fixed-size token-window chunking — LLM sequence-packing prep.

Splits each document into consecutive chunks of `chunk_tokens`
whitespace tokens (last chunk may be short). Fully vectorized per
batch: one Arrow split kernel, chunk boundaries by pure offset
arithmetic over the flat token buffer, and the chunk strings rebuilt
with a single list-join kernel — no per-row Python, no shuffle (a
document's chunks are emitted from the batch that holds it).

No reference analogue; training-data-pipeline addition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_chunks_batch(t: pa.Table, text_col: str, id_col: str,
                       chunk_tokens: int, chunk_col: str,
                       out_col: str) -> pa.Table:
    lists = pc.split_pattern(t[text_col], " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts, nan=0).astype(np.int64)  # null text → 0 chunks
    flat = pc.list_flatten(lists)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    n_chunks = -(-counts // chunk_tokens)  # ceil; empty split still yields 1
    total = int(n_chunks.sum())
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), n_chunks)
    excl = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    chunk_id = np.arange(total, dtype=np.int64) - excl[doc_idx]
    starts = offsets[:-1][doc_idx] + chunk_id * chunk_tokens
    ends = np.minimum(starts + chunk_tokens, offsets[1:][doc_idx])
    # chunks tile the flat token buffer exactly, so the boundary vector
    # (all starts + the final end) is monotone and ListArray-valid
    bounds = np.append(starts, offsets[-1]).astype(np.int32)
    chunk_lists = pa.ListArray.from_arrays(pa.array(bounds, pa.int32()), flat)
    chunk_text = pc.binary_join(chunk_lists, " ")
    ids = t[id_col].take(pa.array(doc_idx, pa.int64()))
    return pa.table({
        id_col: ids,
        chunk_col: pa.array(chunk_id, pa.int64()),
        "n_tokens": pa.array(ends - starts, pa.int64()),
        out_col: chunk_text,
    })


def token_chunks(ds, text_col: str = "text", id_col: str = "doc_id",
                 chunk_tokens: int = 32, chunk_col: str = "chunk_id",
                 out_col: str = "chunk_text"):
    """Dataset → one row per (doc, chunk) with `chunk_col` (0-based),
    `n_tokens`, and the chunk's text. Streaming map; output ≈ input
    text volume, so it flows straight through the executor."""
    return ds.map_batches(
        lambda t: token_chunks_batch(t, text_col, id_col, chunk_tokens,
                                     chunk_col, out_col),
        batch_format="pyarrow")
