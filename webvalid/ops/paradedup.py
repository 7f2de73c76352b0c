"""Paragraph(chunk)-level exact dedup with in-place document rebuild.

The FineWeb/Dolma-style cleaning step one granularity below document
dedup: split every document into fixed-size token chunks (the
deterministic stand-in for paragraphs in the newline-free testdata),
keep the globally FIRST occurrence of each distinct chunk (smallest
(doc_id, chunk_idx)), and rewrite each document as the join of its
surviving chunks. Documents that lose every chunk are dropped.

Scale shape (three streaming passes, one narrow shuffle):

1. chunk + fingerprint per batch (`ops/chunking.token_chunks_batch`,
   reused) → only (chunk_md5, packed(doc_id, chunk_idx)) pairs enter
   Ray's hash groupby — never chunk text. `Min` over the packed int64
   IS the lexicographic (doc_id, chunk_idx) argmin.
2. duplicated groups only (cnt > 1) are collected — the same
   dup-only broadcast contract as `ops/prep._dup_keeper_arrays`:
   unique chunks (the overwhelming majority) never ship anywhere.
3. one rebuild pass re-chunks each batch, drops losing duplicate
   chunks (8-byte md5-prefix probe + FULL-digest confirmation on the
   rare hits, so a prefix collision can never delete a unique chunk),
   and reassembles each document batch-locally — a document's chunks
   are emitted by the batch that holds it, so no reassembly shuffle.

SQL twin (the gate oracle): chunks via str_split + list_slice over
generate_series, winners via ROW_NUMBER() OVER (PARTITION BY
md5(chunk) ORDER BY doc_id, chunk_id) = 1, rebuild via
string_agg(chunk, ' ' ORDER BY chunk_id).

No reference analogue; training-data-pipeline addition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from webvalid.checks.text_parity import _md5_digest8_per_row
from webvalid.ops.chunking import token_chunks_batch
from webvalid.ops.dedup import md5_hex_from_column

_CHUNK_SPAN = 1 << 20  # chunk_idx packs into the low 20 bits
_ID_MAX = 1 << 43      # doc_id packs into the next 43 (packed stays int64)


def _chunk_rows(t: pa.Table, text_col: str, id_col: str,
                chunk_tokens: int) -> pa.Table:
    return token_chunks_batch(t, text_col, id_col, chunk_tokens,
                              "chunk_id", "chunk_text")


def _packed(c: pa.Table, id_col: str) -> np.ndarray:
    ids = c[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    cid = c["chunk_id"].to_numpy(zero_copy_only=False)
    if len(ids) and (ids.min() < 0 or ids.max() >= _ID_MAX
                     or cid.max() >= _CHUNK_SPAN):
        raise ValueError("chunk packing needs 0 <= doc_id < 2^43 and "
                         "chunk_id < 2^20")
    return ids * _CHUNK_SPAN + cid


def _dup_winner_arrays(ds, text_col: str, id_col: str, chunk_tokens: int):
    """(sorted md5-prefix uint64 of DUPLICATED chunks, winner packed id
    per prefix, {full 16-byte md5: winner packed}) — dup-only broadcast;
    the full-digest dict confirms prefix hits exactly."""
    from ray.data.aggregate import Count, Min

    def fp(t: pa.Table) -> pa.Table:
        c = _chunk_rows(t, text_col, id_col, chunk_tokens)
        return pa.table({
            "chunk_md5": pa.array(md5_hex_from_column(c["chunk_text"]),
                                  pa.string()),
            "_packed": pa.array(_packed(c, id_col), pa.int64()),
        })

    groups = ds.map_batches(fp, batch_format="pyarrow") \
        .groupby("chunk_md5").aggregate(
            Min("_packed", alias_name="winner"), Count(alias_name="cnt"))
    dups = groups.filter(expr="cnt > 1").to_pandas()
    if len(dups) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64), {}
    digests = [bytes.fromhex(m) for m in dups["chunk_md5"]]
    prefixes = np.frombuffer(b"".join(d[:8] for d in digests), dtype=np.uint64)
    winners = dups["winner"].to_numpy(dtype=np.int64)
    order = np.argsort(prefixes)
    full = {d: int(w) for d, w in zip(digests, winners)}
    return prefixes[order], winners[order], full


def _rebuild_batch(batch: pa.Table, dup_ref, text_col: str, id_col: str,
                   chunk_tokens: int, out_col: str) -> pa.Table:
    import hashlib

    prefixes, winners, full = ray.get(dup_ref)
    c = _chunk_rows(batch, text_col, id_col, chunk_tokens)
    if c.num_rows == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "n_kept": pa.array([], pa.int64()),
                         out_col: pa.array([], pa.string())})
    packed = _packed(c, id_col)
    keep = np.ones(len(packed), dtype=bool)
    if len(prefixes):
        _, d8 = _md5_digest8_per_row(c["chunk_text"])
        pos = np.searchsorted(prefixes, d8)
        pos[pos >= len(prefixes)] = len(prefixes) - 1
        drop = (prefixes[pos] == d8) & (packed != winners[pos])
        # FULL-digest confirmation for every flagged chunk (flagged =
        # all duplicate losers — the COMMON case in a dedup corpus, not
        # just prefix collisions): digests come straight off the Arrow
        # buffers in one vectorized-ish pass, leaving only dict lookups
        # per flagged row
        flagged = np.flatnonzero(drop)
        if len(flagged):
            from webvalid.ops.dedup import md5_hex_from_column

            sub_hex = md5_hex_from_column(
                c["chunk_text"].combine_chunks().take(
                    pa.array(flagged, pa.int64())))
            for j, i in enumerate(flagged):
                w = full.get(bytes.fromhex(sub_hex[j]))
                if w is None or w == int(packed[i]):
                    drop[i] = False
        keep = ~drop
    kept = c.filter(pa.array(keep))
    if kept.num_rows == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "n_kept": pa.array([], pa.int64()),
                         out_col: pa.array([], pa.string())})
    # batch-local reassembly: kept chunk rows are already in
    # (doc, chunk_id) emission order, so docs are consecutive runs
    ids = kept[id_col].to_numpy(zero_copy_only=False)
    starts = np.concatenate([[0], np.flatnonzero(ids[1:] != ids[:-1]) + 1])
    bounds = np.append(starts, len(ids)).astype(np.int32)
    text_col_arr = kept["chunk_text"]
    if isinstance(text_col_arr, pa.ChunkedArray):
        text_col_arr = text_col_arr.combine_chunks()
    joined = pa.compute.binary_join(
        pa.ListArray.from_arrays(pa.array(bounds, pa.int32()), text_col_arr),
        " ")
    return pa.table({
        id_col: pa.array(ids[starts], pa.int64()),
        "n_kept": pa.array(np.diff(bounds).astype(np.int64), pa.int64()),
        out_col: joined,
    })


def chunk_dedup_rebuild(ds, text_col: str = "text", id_col: str = "doc_id",
                        chunk_tokens: int = 16, out_col: str = "text_dedup"):
    """Dataset of (id, n_kept, rebuilt text) after chunk-level exact
    dedup — first occurrence of each distinct chunk wins; docs losing
    every chunk are dropped (null-text docs have no chunks and drop).
    """
    dup_ref = ray.put(
        _dup_winner_arrays(ds, text_col, id_col, chunk_tokens))
    return ds.map_batches(
        lambda t: _rebuild_batch(t, dup_ref, text_col, id_col,
                                 chunk_tokens, out_col),
        batch_format="pyarrow")
