"""Global token n-gram frequency counting (the word-count shape).

Corpus-level n-gram statistics drive tokenizer training, contamination
scans and quality heuristics in training-data pipelines. The shape is
classic word-count: a per-batch PARTIAL count (one row per distinct
n-gram per batch) followed by a small combine — the all-to-all shuffle
of raw tokens never happens. Tokenization is a plain whitespace split
(`pc.split_pattern`), chosen to be SQL-twinnable: DuckDB's
``str_split(text, ' ')`` produces identical tokens, so the gate query
has a value-exact oracle (``unnest`` + GROUP BY).

Scale notes:
- Partial counting is vectorized Arrow end to end: split → flatten →
  (join for n>1) → value_counts. No Python loop over rows or tokens.
- The combine is O(#batches × batch-vocab). For natural-language
  vocabularies (≤ tens of millions of n-grams) the driver/pandas
  combine holds; for unbounded vocab pass ``strategy="shuffle"`` to
  combine via `Dataset.groupby(ngram).sum` instead (all-to-all on the
  distinct-ngram table, not the corpus), or cap with ``min_count``
  pruning per partial (documented approximation for the tail).

No reference analogue; north-rule/training-data addition.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _batch_ngram_counts(batch: pa.Table, text_col: str, n: int) -> pa.Table:
    """One (ngram, cnt) row per distinct n-gram in this batch."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col.cast(pa.string()), " ")
    flat = pc.list_flatten(toks)  # honors slice offsets (ListArray.values does not)
    if n == 1:
        grams = flat
    else:
        # consecutive-token windows within each document: align k shifted
        # copies of the flat token array and join; windows that would
        # cross a document boundary are filtered by offset arithmetic.
        import numpy as np

        offs = toks.offsets.to_numpy(zero_copy_only=False)
        total = len(flat)
        if total == 0:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        n_starts = max(total - (n - 1), 0)
        if n_starts == 0:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        starts_valid = np.ones(n_starts, dtype=bool)
        # a window starting at flat index i is valid iff no document
        # boundary lies in (i, i + n - 1]; boundaries are the offsets.
        inner = offs[(offs > 0) & (offs < total)]
        if len(inner):
            bad = np.concatenate([inner - k for k in range(1, n)])
            bad = bad[(bad >= 0) & (bad < n_starts)]
            starts_valid[bad] = False
        parts = [flat.slice(k, n_starts) for k in range(n)]
        joined = pc.binary_join_element_wise(*parts, " ")
        grams = joined.filter(pa.array(starts_valid))
    vc = grams.value_counts()
    if isinstance(vc, pa.ChunkedArray):
        vc = vc.combine_chunks()
    return pa.table({"ngram": vc.field("values"), "cnt": vc.field("counts")})


def ngram_counts(ds, text_col: str = "text", n: int = 1, top_k: int | None = None,
                 strategy: str = "driver") -> pd.DataFrame:
    """Corpus-wide n-gram counts, optionally top-k (ties broken by
    ngram asc — deterministic and matching the SQL oracle's
    ``ORDER BY cnt DESC, ngram``).
    """
    partials = ds.map_batches(
        lambda t: _batch_ngram_counts(t, text_col, n), batch_format="pyarrow"
    )
    if strategy == "shuffle":
        combined = partials.groupby("ngram").sum("cnt").rename_columns(["ngram", "cnt"])
        pdf = combined.to_pandas()
    else:
        pdf = partials.to_pandas()
        pdf = pdf.groupby("ngram", as_index=False, sort=False)["cnt"].sum()
    pdf = pdf.sort_values(["cnt", "ngram"], ascending=[False, True], ignore_index=True)
    if top_k is not None:
        pdf = pdf.head(top_k).reset_index(drop=True)
    return pdf
