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
   by construction).
2. **Rewrite pass**: the hot-token set broadcasts as a SORTED uint64
   hash array (zero-copy plasma, searchsorted membership — the repo's
   standard broadcast shape); each batch filters its flattened token
   array with one boolean mask and reassembles documents with Arrow
   offset arithmetic (`ListArray.from_arrays` + `binary_join`). No
   per-row Python in either pass.

Documents whose every token is hot are DROPPED from the output (they
carry no signal), which also matches the SQL oracle's GROUP BY shape.

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


def _split_flat(col) -> tuple[pa.Array, np.ndarray]:
    """(flat token array, int64 offsets) of a whitespace split."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col.cast(pa.string()), " ")
    flat = pc.list_flatten(toks)  # honors slice offsets
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offs


def _df_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """(token, df) — number of docs in THIS batch containing token."""
    flat, offs = _split_flat(batch[text_col])
    n = len(flat)
    if n == 0:
        return pa.table({"token": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64())})
    doc_idx = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
    toks = flat.to_numpy(zero_copy_only=False)
    # per-doc unique (doc, token) pairs via one lexsort over hashes
    th = hash64(toks)
    order = np.lexsort((th, doc_idx))
    dup = np.zeros(n, dtype=bool)
    dup[1:] = (doc_idx[order][1:] == doc_idx[order][:-1]) & \
              (th[order][1:] == th[order][:-1])
    uniq = toks[order][~dup]
    vals, counts = np.unique(uniq, return_counts=True)
    return pa.table({"token": pa.array(vals, pa.string()),
                     "df": pa.array(counts, pa.int64())})


def document_frequencies(ds, text_col: str = "text") -> pd.DataFrame:
    """Corpus-wide token → document-frequency table."""
    parts = ds.map_batches(
        lambda t: _df_partial(t, text_col), batch_format="pyarrow"
    ).to_pandas()
    return parts.groupby("token", as_index=False, sort=False)["df"].sum()


def remove_boilerplate(ds, text_col: str = "text", id_col: str = "doc_id",
                       max_df_frac: float = 0.78):
    """Dataset of (id, clean_text) with tokens of document-frequency
    > max_df_frac · n_docs removed; all-hot documents dropped."""
    n_docs = ds.count()
    dfs = document_frequencies(ds, text_col)
    hot = dfs.loc[dfs["df"] > max_df_frac * n_docs, "token"].to_numpy(dtype=object)
    hot_ref = ray.put(np.sort(hash64(hot)) if len(hot) else
                      np.empty(0, dtype=np.uint64))

    def rewrite(batch: pa.Table) -> pa.Table:
        hot_sorted = ray.get(hot_ref)  # zero-copy from plasma
        flat, offs = _split_flat(batch[text_col])
        if len(flat) == 0:
            return pa.table({id_col: batch[id_col].slice(0, 0),
                             "clean_text": pa.array([], pa.string())})
        keep = ~_in_sorted(hash64(flat.to_numpy(zero_copy_only=False)), hot_sorted)
        kept_per_doc = np.add.reduceat(keep.astype(np.int64), offs[:-1])
        kept_per_doc[np.diff(offs) == 0] = 0  # reduceat quirk on empty slices
        new_offs = np.concatenate(([0], np.cumsum(kept_per_doc))).astype(np.int32)
        kept_list = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), flat.filter(pa.array(keep))
        )
        clean = pc.binary_join(kept_list, " ")
        non_empty = pa.array(kept_per_doc > 0)
        return pa.table({
            id_col: batch[id_col].filter(non_empty),
            "clean_text": clean.filter(non_empty),
        })

    return ds.map_batches(rewrite, batch_format="pyarrow")
