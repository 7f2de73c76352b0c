"""TF-IDF scoring — corpus-weighted term relevance per document.

The classic two-pass decomposition over a Dataset:

1. **DF pass**: reuses `boilerplate.document_frequencies` (vectorized
   per-batch partials + driver combine; the DF table is
   vocabulary-sized, never row-sized).
2. **Score pass**: the DF table broadcasts once as a SORTED uint64
   token-hash array plus an aligned df array (the repo's standard
   zero-copy broadcast shape). Each batch computes per-(doc, token)
   term frequencies with one lexsort over hashes, looks up df with one
   searchsorted, and emits `tf · ln(n_docs / df)` — no per-row Python.

Token identity inside the df lookup is the 64-bit hash: two distinct
tokens colliding would merge their df counts. Over a vocabulary of V
tokens the collision probability is ~V²/2⁶⁵ (≈3e-10 at V=1e5) —
documented trade, same as the boilerplate hot-set membership. The
EMITTED token strings are always the real ones from the document.

SQL twin: tf per (doc_id, token) joined to df per token,
`tf * ln(n_docs / df)`. No reference analogue; training-data addition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from webvalid.ops.boilerplate import _split_flat, document_frequencies
from webvalid.sketches import hash64


def _score_batch(batch: pa.Table, text_col: str, id_col: str,
                 hashes_sorted: np.ndarray, dfs_sorted: np.ndarray,
                 n_docs: int, out_col: str) -> pa.Table:
    empty = pa.table({id_col: batch[id_col].slice(0, 0),
                      "token": pa.array([], pa.string()),
                      out_col: pa.array([], pa.float64())})
    flat, offs, valid = _split_flat(batch[text_col])
    if len(flat) == 0:
        return empty
    doc_idx = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
    tok_valid = valid[doc_idx]
    if not tok_valid.any():
        return empty
    toks = flat.to_numpy(zero_copy_only=False)[tok_valid]
    doc_idx = doc_idx[tok_valid]
    th = hash64(toks)
    order = np.lexsort((th, doc_idx))
    d_s, h_s = doc_idx[order], th[order]
    run_start = np.ones(len(d_s), dtype=bool)
    run_start[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    starts = np.flatnonzero(run_start)
    tf = np.diff(np.append(starts, len(d_s)))
    pos = np.searchsorted(hashes_sorted, h_s[starts])
    # every token hash is in the DF table by construction (same corpus)
    df = dfs_sorted[pos]
    score = tf.astype(np.float64) * np.log(n_docs / df.astype(np.float64))
    ids = batch[id_col].to_numpy(zero_copy_only=False)[d_s[starts]]
    return pa.table({
        id_col: pa.array(ids, batch[id_col].type),
        "token": pa.array(toks[order][starts], pa.string()),
        out_col: pa.array(score, pa.float64()),
    })


def tfidf_scores(ds, text_col: str = "text", id_col: str = "doc_id",
                 out_col: str = "tfidf"):
    """Dataset of (id, token, tfidf) — one row per distinct token per
    document; idf = ln(n_docs / df) with n_docs counting ALL rows."""
    from webvalid.rayutil import task_callable

    dfs, n_docs = document_frequencies(ds, text_col, return_doc_count=True)
    th = hash64(dfs["token"].to_numpy(dtype=object))
    order = np.argsort(th, kind="stable")
    ref = ray.put((th[order], dfs["df"].to_numpy(dtype=np.int64)[order]))
    # ref/n_docs ride as ctor kwargs so they are part of the
    # task_callable cache key — a warm worker must never reuse a
    # Scorer built for a previous corpus's broadcast
    return ds.map_batches(
        task_callable(_Scorer, ref=ref, n_docs=n_docs, text_col=text_col,
                      id_col=id_col, out_col=out_col),
        batch_format="pyarrow",
    )


class _Scorer:
    def __init__(self, ref, n_docs: int, text_col: str, id_col: str,
                 out_col: str):
        self.hashes, self.dfs = ray.get(ref)
        self.n_docs = n_docs
        self.text_col, self.id_col, self.out_col = text_col, id_col, out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        return _score_batch(t, self.text_col, self.id_col, self.hashes,
                            self.dfs, self.n_docs, self.out_col)


def tfidf_max_per_doc(ds, text_col: str = "text", id_col: str = "doc_id",
                      round_to: int = 6) -> pd.DataFrame:
    """(id, max tfidf) per document — the per-doc distinctiveness
    reduce over the score stream (each doc's tokens live in one batch,
    so partials are already per-doc; the driver combine is a no-op
    groupby for safety). Rounded for cross-engine float comparison."""
    scores = tfidf_scores(ds, text_col, id_col)

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby(id_col, as_index=False, sort=False)["tfidf"].max()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = scores.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(id_col, as_index=False, sort=False)["tfidf"].max()
    out["max_tfidf"] = out.pop("tfidf").round(round_to)
    return out.sort_values(id_col, kind="mergesort").reset_index(drop=True)
