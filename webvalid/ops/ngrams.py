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
- The combine is O(#batches × batch-vocab). ``strategy="auto"``
  (default) picks the driver/pandas combine below 1M documents and the
  `Dataset.groupby(ngram).sum` shuffle (all-to-all on the
  distinct-ngram table, not the corpus) above; with ``top_k`` the
  shuffle path also cuts each combined block to its local top-k, so
  the driver never sees the vocabulary.

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
                 strategy: str = "auto",
                 driver_max_docs: int = 1_000_000) -> pd.DataFrame:
    """Corpus-wide n-gram counts, optionally top-k (ties broken by
    ngram asc — deterministic and matching the SQL oracle's
    ``ORDER BY cnt DESC, ngram``).

    strategy:
    - "driver": concatenate the per-batch partials on the driver —
      cheapest below `driver_max_docs` documents;
    - "shuffle": combine via `groupby(ngram).sum` (all-to-all on the
      distinct-ngram table, not the corpus) — the 100-TB path. With
      `top_k`, each combined block keeps only its local top-k before
      the driver's final cut, so the driver sees O(#blocks · k) rows,
      never the vocabulary;
    - "auto" (default): pick by document count (parquet metadata).
    Results are strategy-independent.
    """
    from webvalid.ops.dedup import _resolve_strategy

    partials = ds.map_batches(
        lambda t: _batch_ngram_counts(t, text_col, n), batch_format="pyarrow"
    )
    strategy = _resolve_strategy(strategy, ds, driver_max_docs)
    if strategy == "shuffle":
        combined = partials.groupby("ngram").sum("cnt").rename_columns(["ngram", "cnt"])
        if top_k is not None:
            def local_topk(t: pa.Table) -> pa.Table:
                d = t.to_pandas().sort_values(
                    ["cnt", "ngram"], ascending=[False, True])
                return pa.Table.from_pandas(d.head(top_k),
                                            preserve_index=False)

            combined = combined.map_batches(local_topk, batch_size=None,
                                            batch_format="pyarrow")
        pdf = combined.to_pandas()
        if len(pdf) == 0:
            return pd.DataFrame({"ngram": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype="int64")})
    else:
        pdf = partials.to_pandas()
        if len(pdf) == 0:  # all-empty blocks lose their columns in to_pandas
            return pd.DataFrame({"ngram": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype="int64")})
        pdf = pdf.groupby("ngram", as_index=False, sort=False)["cnt"].sum()
    pdf = pdf.sort_values(["cnt", "ngram"], ascending=[False, True], ignore_index=True)
    if top_k is not None:
        pdf = pdf.head(top_k).reset_index(drop=True)
    return pdf


def _batch_doc_ngrams(batch: pa.Table, text_col: str, id_col: str, n: int):
    """(doc_ids_per_window, window hash64) for every n-token window,
    windows never crossing documents. Vectorized: one split, one
    flatten, n-1 shifted joins, one hash pass."""
    import numpy as np

    from webvalid.sketches import hash64

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col.cast(pa.string()), " ")
    flat = pc.list_flatten(toks)
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    total = len(flat)
    n_starts = max(total - (n - 1), 0)
    if n_starts == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    starts_valid = np.ones(n_starts, dtype=bool)
    inner = offs[(offs > 0) & (offs < total)]
    if len(inner) and n > 1:  # n == 1: no window can cross a boundary
        bad = np.concatenate([inner - k for k in range(1, n)])
        bad = bad[(bad >= 0) & (bad < n_starts)]
        starts_valid[bad] = False
    if n == 1:
        grams = flat
    else:
        parts = [flat.slice(k, n_starts) for k in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
    doc_idx = np.repeat(np.arange(len(offs) - 1), np.diff(offs))[:n_starts]
    ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_idx[starts_valid]]
    hashes = hash64(grams.filter(pa.array(starts_valid)).to_numpy(zero_copy_only=False))
    return ids.astype(np.int64), hashes


def ngram_contamination(ds, benchmark_texts: list, n: int = 2,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> pd.DataFrame:
    """Benchmark-contamination scan: per doc, the number of DISTINCT
    n-grams it shares with a benchmark corpus.

    The standard eval-decontamination op for training pipelines: the
    benchmark's n-gram set is tiny (evals are small), so it broadcasts
    as a SORTED uint64 hash array and every corpus doc gets a
    vectorized searchsorted membership pass — no shuffle, no state,
    O(corpus tokens) total work. Returns only contaminated docs
    (n_hits >= 1).
    """
    import numpy as np

    import ray

    from webvalid.sketches import hash64

    bench_t = pa.table({id_col: pa.array(range(len(benchmark_texts)), pa.int64()),
                        text_col: pa.array(benchmark_texts, pa.string())})
    _, bench_hashes = _batch_doc_ngrams(bench_t, text_col, id_col, n)
    bench_ref = ray.put(np.unique(bench_hashes))

    def scan(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)  # zero-copy from plasma
        ids, hashes = _batch_doc_ngrams(batch, text_col, id_col, n)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64())})
        pos = np.searchsorted(bench, hashes)
        pos[pos >= len(bench)] = max(len(bench) - 1, 0)
        hit = bench[pos] == hashes if len(bench) else np.zeros(len(hashes), bool)
        ids, hashes = ids[hit], hashes[hit]
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64())})
        # distinct (doc, ngram) pairs via one lexsort
        order = np.lexsort((hashes, ids))
        ids, hashes = ids[order], hashes[order]
        dup = np.zeros(len(ids), dtype=bool)
        dup[1:] = (ids[1:] == ids[:-1]) & (hashes[1:] == hashes[:-1])
        ids = ids[~dup]
        uniq, counts = np.unique(ids, return_counts=True)
        return pa.table({id_col: pa.array(uniq, pa.int64()),
                         "n_hits": pa.array(counts, pa.int64())})

    parts = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:  # all-empty blocks lose their columns in to_pandas
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "n_hits": pd.Series([], dtype="int64")})
    # batches are disjoint doc sets, but a doc split across batches
    # would double-count distinct n-grams; Ray blocks never split rows,
    # so a plain per-doc sum is exact
    out = parts.groupby(id_col, as_index=False)["n_hits"].sum()
    return out.sort_values(id_col).reset_index(drop=True)


def _mg_partial(batch: pa.Table, text_col: str, n: int, k: int) -> pa.Table:
    from webvalid.sketches import MisraGries

    counts = _batch_ngram_counts(batch, text_col, n)
    mg = MisraGries(k=k)
    if counts.num_rows:
        mg.add(counts["ngram"].to_numpy(zero_copy_only=False),
               counts["cnt"].to_numpy(zero_copy_only=False))
    return pa.table({"state": pa.array([mg.serialize()], pa.binary())})


def ngram_topk_sketch(ds, text_col: str = "text", n: int = 1, top_k: int = 50,
                      k_counters: int = 4096) -> pd.DataFrame:
    """EXACT corpus top-k n-grams in O(k_counters) memory — the
    unbounded-vocabulary scale path for `ngram_counts`.

    Two passes:
    1. Per-batch Misra–Gries partials merge to a candidate set that
       provably contains every n-gram with frequency > N/(k+1)
       (mergeable-summaries guarantee — the full vocabulary never
       materializes anywhere).
    2. Candidates broadcast as a sorted hash array; one vectorized
       membership+count pass yields their EXACT frequencies.

    The result equals the exact top-k whenever the k-th item's true
    frequency exceeds the sketch's error bound N/(k_counters+1); the
    bound is CHECKED at runtime and a ValueError asks for more
    counters if it fails (never a silently-approximate answer).
    """
    import numpy as np

    import ray

    from webvalid.sketches import MisraGries, hash64

    parts = ds.map_batches(
        lambda t: _mg_partial(t, text_col, n, k_counters), batch_format="pyarrow"
    ).to_pandas()
    mg = MisraGries(k=k_counters)
    for blob in parts["state"]:
        mg.merge(MisraGries.deserialize(blob))
    cand = np.asarray(list(mg.counts.keys()), dtype=object)
    if len(cand) == 0:
        if mg.error_bound() > 0:
            # all counters cancelled (near-uniform data): nothing is
            # certifiable — never return an empty "top-k" silently
            raise ValueError(
                f"top-{top_k} not certifiable: no candidate survived the "
                f"sketch (error bound {mg.error_bound():.1f}); "
                f"raise k_counters (= {k_counters})"
            )
        return pd.DataFrame({"ngram": pd.Series([], dtype=object),
                             "cnt": pd.Series([], dtype="int64")})
    cand_hashes = hash64(cand)
    order = np.argsort(cand_hashes)
    hashes_sorted, cand_sorted = cand_hashes[order], cand[order]
    if len(np.unique(hashes_sorted)) != len(hashes_sorted):
        # two candidate strings share a hash64 (~k²/2⁶⁴ odds): the
        # broadcast membership can't distinguish them — refuse rather
        # than certify corrupted counts
        raise ValueError("candidate hash collision; rerun with a "
                         "different seed or use ngram_counts")
    cand_ref = ray.put((hashes_sorted, cand_sorted))

    def exact_counts(batch: pa.Table) -> pa.Table:
        h_sorted, c_sorted = ray.get(cand_ref)
        counts = _batch_ngram_counts(batch, text_col, n)
        if counts.num_rows == 0:
            return pa.table({"cand_idx": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        grams = counts["ngram"].to_numpy(zero_copy_only=False)
        h = hash64(grams)
        pos = np.searchsorted(h_sorted, h)
        pos[pos >= len(h_sorted)] = len(h_sorted) - 1
        hit = h_sorted[pos] == h
        # exact-key confirmation: a non-candidate colliding with a
        # candidate's hash must not pollute its "exact" count
        idx = np.flatnonzero(hit)
        if len(idx):
            really = c_sorted[pos[idx]] == grams[idx]
            idx = idx[really]
        return pa.table({"cand_idx": pa.array(pos[idx], pa.int64()),
                         "cnt": counts["cnt"].take(pa.array(idx, pa.int64()))})

    exact = ds.map_batches(exact_counts, batch_format="pyarrow").to_pandas()
    agg = exact.groupby("cand_idx", as_index=False)["cnt"].sum()
    agg["ngram"] = cand_sorted[agg["cand_idx"].to_numpy()]
    agg = agg.sort_values(["cnt", "ngram"], ascending=[False, True],
                          ignore_index=True)
    bound = mg.error_bound()
    if bound > 0:
        # non-candidates can have true frequency up to `bound`; only
        # exact counts strictly above it are certifiably in the top-k
        certified = agg[agg["cnt"] > bound]
        if len(certified) < top_k:
            raise ValueError(
                f"top-{top_k} not certifiable: only {len(certified)} "
                f"candidates exceed the sketch error bound {bound:.1f}; "
                f"raise k_counters (= {k_counters})"
            )
        agg = certified
    # bound == 0 → the vocab never exceeded the counters: counts are
    # plain exact for the WHOLE vocabulary, no certification needed
    out = agg.head(top_k)[["ngram", "cnt"]].reset_index(drop=True)
    out["cnt"] = out["cnt"].astype("int64")
    return out
