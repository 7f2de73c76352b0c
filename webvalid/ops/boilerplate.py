"""Corpus-driven boilerplate removal (document-frequency token filter).

Common-Crawl-style pipelines strip tokens/lines that appear in "too
many" documents — navigation chrome, cookie banners, disclaimers — by
computing a global document-frequency table and rewriting every
document without the over-represented entries (the CCNet / RefinedWeb
cleanup shape). Two passes, both streaming:

1. **DF pass**: per-batch partial (token → #docs-in-batch containing
   it), vectorized (split → flatten → per-doc unique via one lexsort);
   partials combine driver-side (DF tables are vocabulary-sized, and
   the HOT subset — df above a large fraction of the corpus — is tiny
   by construction). The same pass carries the corpus doc count, so no
   separate count job runs.
2. **Rewrite pass**: the hot-token set broadcasts as a SORTED uint64
   hash array (zero-copy plasma, searchsorted membership — the repo's
   standard broadcast shape); each batch filters its flattened token
   array with one boolean mask and reassembles documents with Arrow
   offset arithmetic (`ListArray.from_arrays` + `binary_join`). No
   per-row Python in either pass.

Null-text documents are DROPPED (they are marked invalid at the split
and keep zero tokens), as are documents whose every token is hot —
both match the SQL oracle's GROUP BY shape, where `str_split(NULL)`
contributes no rows. Empty-string documents keep DuckDB semantics:
``str_split('', ' ') = ['']``, so '' is a (rarely hot) token.

No reference analogue; north-rule/training-data addition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from webvalid.checks.text_parity import _in_sorted
from webvalid.sketches import hash64


def _split_flat(col) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """(flat token array, int64 offsets, per-row valid mask) of a
    whitespace split. Null rows split as '' so the offsets stay
    strictly increasing (a trailing null otherwise leaves an offset ==
    len(flat), which crashes np.add.reduceat); their tokens must be
    excluded via the valid mask."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.string())
    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    toks = pc.split_pattern(pc.fill_null(col, ""), " ")
    flat = pc.list_flatten(toks)  # honors slice offsets
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offs, valid


def _df_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """(token, df) rows — docs in THIS batch containing each token —
    plus one null-token row carrying the batch's valid-doc count."""
    flat, offs, valid = _split_flat(batch[text_col])
    # count ALL rows (null text included) — matches the oracle's
    # COUNT(*) n_docs denominator
    n_docs_row = pa.table({"token": pa.array([None], pa.string()),
                           "df": pa.array([batch.num_rows], pa.int64())})
    n = len(flat)
    if n == 0 or not valid.any():
        return n_docs_row
    doc_idx = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
    tok_valid = valid[doc_idx]
    toks = flat.to_numpy(zero_copy_only=False)[tok_valid]
    doc_idx = doc_idx[tok_valid]
    # per-doc unique (doc, token) pairs via one lexsort over hashes
    th = hash64(toks)
    order = np.lexsort((th, doc_idx))
    dup = np.zeros(len(toks), dtype=bool)
    dup[1:] = (doc_idx[order][1:] == doc_idx[order][:-1]) & \
              (th[order][1:] == th[order][:-1])
    uniq = toks[order][~dup]
    vals, counts = np.unique(uniq, return_counts=True)
    body = pa.table({"token": pa.array(vals, pa.string()),
                     "df": pa.array(counts, pa.int64())})
    return pa.concat_tables([body, n_docs_row])


def document_frequencies(ds, text_col: str = "text",
                         return_doc_count: bool = False):
    """Corpus-wide token → document-frequency table (and optionally the
    corpus doc count, carried by the same pass — no extra job)."""
    parts = ds.map_batches(
        lambda t: _df_partial(t, text_col), batch_format="pyarrow"
    ).to_pandas()
    if len(parts) == 0:
        out = pd.DataFrame({"token": pd.Series([], dtype=object),
                            "df": pd.Series([], dtype="int64")})
        return (out, 0) if return_doc_count else out
    is_count = parts["token"].isna()
    n_docs = int(parts.loc[is_count, "df"].sum())
    out = parts[~is_count].groupby("token", as_index=False, sort=False)["df"].sum()
    return (out, n_docs) if return_doc_count else out


def rewrite_without_hot(batch: pa.Table, text_col: str,
                        hot_sorted: np.ndarray,
                        passthrough: list[str]) -> pa.Table:
    """Rebuild each doc without hot tokens (Arrow offset arithmetic);
    docs with zero kept tokens — including null-text docs — drop out.
    `passthrough` columns are carried, filtered to the surviving rows."""
    flat, offs, valid = _split_flat(batch[text_col])
    if len(flat) == 0:
        return pa.table({**{c: batch[c].slice(0, 0) for c in passthrough},
                         "clean_text": pa.array([], pa.string())})
    keep = ~_in_sorted(hash64(flat.to_numpy(zero_copy_only=False)), hot_sorted)
    doc_idx = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
    keep &= valid[doc_idx]  # null docs keep nothing
    kept_per_doc = np.add.reduceat(keep.astype(np.int64), offs[:-1])
    new_offs = np.concatenate(([0], np.cumsum(kept_per_doc))).astype(np.int32)
    kept_list = pa.ListArray.from_arrays(
        pa.array(new_offs, pa.int32()), flat.filter(pa.array(keep))
    )
    clean = pc.binary_join(kept_list, " ")
    non_empty = pa.array(kept_per_doc > 0)
    cols = {c: batch[c].filter(non_empty) for c in passthrough}
    cols["clean_text"] = clean.filter(non_empty)
    return pa.table(cols)


def hot_tokens_ref(dfs: pd.DataFrame, n_docs: int, max_df_frac: float):
    """ObjectRef of the sorted hot-token hash array."""
    hot = dfs.loc[dfs["df"] > max_df_frac * n_docs, "token"].to_numpy(dtype=object)
    return ray.put(np.sort(hash64(hot)) if len(hot) else
                   np.empty(0, dtype=np.uint64))


def remove_boilerplate(ds, text_col: str = "text", id_col: str = "doc_id",
                       max_df_frac: float = 0.78):
    """Dataset of (id, clean_text) with tokens of document-frequency
    > max_df_frac · n_docs removed; all-hot and null-text docs dropped."""
    dfs, n_docs = document_frequencies(ds, text_col, return_doc_count=True)
    hot_ref = hot_tokens_ref(dfs, n_docs, max_df_frac)

    def rewrite(batch: pa.Table) -> pa.Table:
        return rewrite_without_hot(batch, text_col, ray.get(hot_ref), [id_col])

    return ds.map_batches(rewrite, batch_format="pyarrow")
