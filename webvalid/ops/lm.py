"""Corpus bigram-LM quality scoring — the CCNet-style perplexity filter.

Train: corpus unigram + bigram counts (the `ops/ngrams` word-count
shape — per-batch Arrow partials, no token shuffle). Model: add-one
(Laplace) smoothed bigram LM over the corpus vocabulary V,
P(wᵢ|wᵢ₋₁) = (c(wᵢ₋₁wᵢ) + 1) / (c(wᵢ₋₁) + V).

Score: one more streaming pass; each doc's average ln-probability over
its bigrams (docs with < 2 tokens drop — they define no bigram). The
count tables ride the object store once (`ray.put`) and are probed per
batch with pandas hash maps — EXACT string keys, no fingerprint
collisions, honoring the bounded-vocabulary contract the n-gram
family documents (for unbounded vocab, prune with min_count upstream).

Entirely SQL-expressible (counts + join + LN + AVG), so the gate query
is value-exact.

No reference analogue; training-data addition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from webvalid.ops.ngrams import ngram_counts


def _doc_bigrams(t: pa.Table, text_col: str, id_col: str):
    """(doc_id per bigram, first-token array, bigram-string array) for
    every consecutive token pair, pairs never crossing documents —
    the doc-attributed variant of `_batch_ngram_counts`' window
    construction."""
    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col.cast(pa.string()), " ")
    flat = pc.list_flatten(toks)
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    total = len(flat)
    n_starts = max(total - 1, 0)
    if n_starts == 0:
        empty = pa.array([], pa.string())
        return np.empty(0, np.int64), empty, empty
    valid = np.ones(n_starts, dtype=bool)
    inner = offs[(offs > 0) & (offs < total)]
    bad = inner - 1
    bad = bad[(bad >= 0) & (bad < n_starts)]
    valid[bad] = False
    w1 = flat.slice(0, n_starts)
    joined = pc.binary_join_element_wise(w1, flat.slice(1, n_starts), " ")
    keep = pa.array(valid)
    starts = np.flatnonzero(valid)
    doc_idx = np.searchsorted(offs, starts, side="right") - 1
    ids = t[id_col].to_numpy(zero_copy_only=False)[doc_idx]
    return ids.astype(np.int64), w1.filter(keep), joined.filter(keep)


def bigram_lm_scores(ds, text_col: str = "text", id_col: str = "doc_id",
                     ndigits: int | None = 6) -> pd.DataFrame:
    """(id, n_bigrams, avg_logp) per document under the corpus's own
    add-one bigram LM — low scores mark gibberish / vocabulary-foreign
    documents, the classic perplexity quality filter."""
    uni = ngram_counts(ds, text_col, n=1)
    big = ngram_counts(ds, text_col, n=2)
    vocab_size = len(uni)
    model_ref = ray.put((
        pd.Series(uni["cnt"].to_numpy(np.float64),
                  index=uni["ngram"].to_numpy()),
        pd.Series(big["cnt"].to_numpy(np.float64),
                  index=big["ngram"].to_numpy()),
        float(vocab_size),
    ))

    def score(t: pa.Table) -> pa.Table:
        cu, cb, v = ray.get(model_ref)
        ids, w1, bg = _doc_bigrams(t, text_col, id_col)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_bigrams": pa.array([], pa.int64()),
                             "_s": pa.array([], pa.float64())})
        prev = cu.reindex(w1.to_numpy(zero_copy_only=False)).to_numpy()
        pair = cb.reindex(bg.to_numpy(zero_copy_only=False)).to_numpy()
        # every token/bigram of the corpus IS in the corpus counts
        logp = np.log((pair + 1.0) / (prev + v))
        df = pd.DataFrame({id_col: ids, "_s": logp})
        out = df.groupby(id_col, as_index=False).agg(
            n_bigrams=("_s", "size"), _s=("_s", "sum"))
        return pa.Table.from_pandas(out[[id_col, "n_bigrams", "_s"]],
                                    preserve_index=False)

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    comb = parts.groupby(id_col, as_index=False).agg(
        n_bigrams=("n_bigrams", "sum"), _s=("_s", "sum"))
    out = pd.DataFrame({
        id_col: comb[id_col].astype("int64"),
        "n_bigrams": comb["n_bigrams"].astype("int64"),
        "avg_logp": comb["_s"].to_numpy() / comb["n_bigrams"].to_numpy(),
    })
    if ndigits is not None:
        out["avg_logp"] = (out["avg_logp"] + 1e-9).round(ndigits)
    return out.sort_values(id_col, kind="mergesort").reset_index(drop=True)
