"""Corpus bigram-LM quality scoring — the CCNet-style perplexity filter.

Train: corpus unigram + bigram counts (the `ops/ngrams` word-count
shape — per-batch Arrow partials, no token shuffle). Model: add-one
(Laplace) smoothed bigram LM over the corpus vocabulary V,
P(wᵢ|wᵢ₋₁) = (c(wᵢ₋₁wᵢ) + 1) / (c(wᵢ₋₁) + V).

Score: one more streaming pass; each doc's average ln-probability over
its bigrams (docs with < 2 tokens drop — they define no bigram). The
count tables ride the object store once (`ray.put`) as sorted
uint64-hash + count arrays probed with searchsorted — 16 B/entry, with
the same documented V²/2⁶⁵ hash-collision trade as the TF-IDF /
boilerplate kernels (for unbounded vocab, prune with `min_count`).

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


def _hashed_model(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(sorted uint64 hashes, aligned float64 counts) of a count table.

    16 B per entry instead of a pandas string-indexed Series (~10×
    smaller broadcast) and a vectorized searchsorted probe instead of a
    hash-map reindex. Token identity is the 64-bit hash — the same
    documented V²/2⁶⁵ collision trade as the TF-IDF/boilerplate
    kernels. For unbounded vocabularies prune with `min_count`."""
    from webvalid.sketches import hash64

    h = hash64(pdf["ngram"].to_numpy())
    order = np.argsort(h, kind="stable")
    return h[order], pdf["cnt"].to_numpy(np.float64)[order]


def _probe(h_sorted: np.ndarray, counts: np.ndarray,
           keys: np.ndarray, default: float) -> np.ndarray:
    idx = np.searchsorted(h_sorted, keys)
    idx = np.clip(idx, 0, max(len(h_sorted) - 1, 0))
    hit = (h_sorted[idx] == keys) if len(h_sorted) else \
        np.zeros(len(keys), dtype=bool)
    out = np.full(len(keys), default, dtype=np.float64)
    out[hit] = counts[idx[hit]]
    return out


def bigram_lm_scores(ds, text_col: str = "text", id_col: str = "doc_id",
                     ndigits: int | None = 6,
                     min_count: int = 1) -> pd.DataFrame:
    """(id, n_bigrams, avg_logp) per document under the corpus's own
    add-one bigram LM — low scores mark gibberish / vocabulary-foreign
    documents, the classic perplexity quality filter.

    Scale shape: counts come from `ngram_counts(strategy="auto")`
    (shuffle-combined above 1M docs); the model broadcasts once via
    `ray.put` as two sorted-uint64-hash + count arrays (16 B/entry),
    probed per batch with searchsorted — no string tables ship.
    `min_count` > 1 prunes the bigram table (unigram table and V stay
    exact so the smoothing denominator is unchanged; pruned bigrams
    fall back to their Laplace floor — the CCNet-style truncation)."""
    uni = ngram_counts(ds, text_col, n=1)
    big = ngram_counts(ds, text_col, n=2)
    vocab_size = len(uni)
    if min_count > 1:
        big = big[big["cnt"] >= min_count]
    uh, uc = _hashed_model(uni)
    bh, bc = _hashed_model(big)
    model_ref = ray.put((uh, uc, bh, bc, float(vocab_size)))

    def score(t: pa.Table) -> pa.Table:
        from webvalid.sketches import hash64

        uh, uc, bh, bc, v = ray.get(model_ref)
        ids, w1, bg = _doc_bigrams(t, text_col, id_col)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_bigrams": pa.array([], pa.int64()),
                             "_s": pa.array([], pa.float64())})
        # every token of the corpus IS in the unigram table; bigrams
        # may be pruned (min_count) → Laplace floor count 0
        prev = _probe(uh, uc, hash64(w1.to_numpy(zero_copy_only=False)), 1.0)
        pair = _probe(bh, bc, hash64(bg.to_numpy(zero_copy_only=False)), 0.0)
        logp = np.log((pair + 1.0) / (prev + v))
        df = pd.DataFrame({id_col: ids, "_s": logp})
        out = df.groupby(id_col, as_index=False).agg(
            n_bigrams=("_s", "size"), _s=("_s", "sum"))
        return pa.Table.from_pandas(out[[id_col, "n_bigrams", "_s"]],
                                    preserve_index=False)

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:  # all-empty blocks lose their columns in to_pandas
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "n_bigrams": pd.Series([], dtype="int64"),
                             "avg_logp": pd.Series([], dtype="float64")})
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
