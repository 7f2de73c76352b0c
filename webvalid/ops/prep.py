"""Composed corpus-preparation pipeline: dedup → boilerplate → split.

The end-to-end shape a training-data pipeline actually runs, built by
COMPOSING the engine's operators (each independently oracle-checked):

1. **Exact dedup** (`ops/dedup.exact_dedup_groups`): keep the minimum
   doc_id per distinct text. The keep-filter broadcast is scale-safe:
   only DUPLICATED groups ship — a sorted uint64 md5-prefix array plus
   the aligned keeper ids — because the overwhelmingly-common unique
   rows pass by default. O(dup groups) broadcast, not O(corpus).
2. **Boilerplate strip** (`ops/boilerplate.remove_boilerplate`
   semantics, recomputed over the deduped corpus): tokens with
   document frequency > max_df_frac · kept_docs are removed; all-hot
   docs drop.
3. **Deterministic split** (`ops/sampling.hash_split` semantics on the
   ORIGINAL text): content-keyed, so a doc's split never changes when
   upstream cleaning changes.

Three streaming passes over the corpus, no row shuffles beyond the
dedup-group aggregate (which moves (md5, id) pairs, never text).
The whole composition is SQL-expressible, so the gate query
`prep_corpus_documents` is value-exact against one composed DuckDB
oracle — the strongest end-to-end correctness check in the repo.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from webvalid.checks.text_parity import _md5_digest8_per_row
from webvalid.ops.boilerplate import (
    document_frequencies,
    hot_tokens_ref,
    rewrite_without_hot,
)
from webvalid.ops.dedup import exact_dedup_groups
from webvalid.ops.sampling import add_split_column, split_thresholds


def _dup_keeper_arrays(ds, text_col: str, id_col: str):
    """(sorted md5-prefix uint64 of DUPLICATED texts, keeper id per
    prefix, {full 16-byte md5: keeper}) — the scale-safe dedup
    broadcast (unique rows never ship). The full-digest dict exists so
    prefix HITS are confirmed exactly: a unique document whose 8-byte
    md5 prefix collides with a dup group's must never be dropped."""
    groups = exact_dedup_groups(ds, text_col=text_col, id_col=id_col).to_pandas()
    dups = groups[(groups["cnt"] > 1) & groups["text_md5"].notna()]
    if len(dups) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64), {}
    digests = [bytes.fromhex(m) for m in dups["text_md5"]]
    prefixes = np.frombuffer(b"".join(d[:8] for d in digests), dtype=np.uint64)
    keepers = dups["keeper"].to_numpy(dtype=np.int64)
    order = np.argsort(prefixes)
    full = {d: int(k) for d, k in zip(digests, keepers)}
    return prefixes[order], keepers[order], full


def _keep_filter(dup_ref, text_col: str, id_col: str):
    def keep(batch: pa.Table) -> pa.Table:
        import hashlib

        prefixes, keepers, full = ray.get(dup_ref)
        valid, d8 = _md5_digest8_per_row(batch[text_col])
        if len(prefixes) == 0:
            return batch
        pos = np.searchsorted(prefixes, d8)
        pos[pos >= len(prefixes)] = len(prefixes) - 1
        in_dup = (prefixes[pos] == d8) & valid
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        drop = in_dup & (ids != keepers[pos])
        # exact confirmation for the (rare) flagged rows: recompute the
        # FULL digest and require membership with a matching keeper —
        # an 8-byte prefix collision must not drop a unique document
        flagged = np.flatnonzero(drop)
        if len(flagged):
            col = batch[text_col]
            for i in flagged:
                t = col[int(i)].as_py()
                k = full.get(hashlib.md5(t.encode()).digest())
                if k is None or k == int(ids[i]):
                    drop[i] = False
        return batch.filter(pa.array(~drop))

    return keep


def prep_corpus(ds, text_col: str = "text", id_col: str = "doc_id",
                max_df_frac: float = 0.78,
                fractions: dict[str, float] | None = None):
    """Dataset of (id, split, clean_text) for the deduped, de-boiler-
    plated corpus; all-hot documents are dropped."""
    dup_ref = ray.put(_dup_keeper_arrays(ds, text_col, id_col))
    kept = ds.map_batches(_keep_filter(dup_ref, text_col, id_col),
                          batch_format="pyarrow")
    # split BEFORE the rewrite so assignment keys on the original text,
    # then strip boilerplate computed over the KEPT corpus only; the DF
    # pass also carries the kept-doc count (no separate count job)
    th = split_thresholds(fractions or {"train": 0.8, "valid": 0.1, "test": 0.1})
    with_split = kept.map_batches(
        lambda t: add_split_column(t, text_col, th), batch_format="pyarrow"
    )
    dfs, n_docs = document_frequencies(kept, text_col, return_doc_count=True)
    hot_ref = hot_tokens_ref(dfs, n_docs, max_df_frac)

    def rewrite(batch: pa.Table) -> pa.Table:
        return rewrite_without_hot(batch, text_col, ray.get(hot_ref),
                                   [id_col, "split"])

    return with_split.map_batches(rewrite, batch_format="pyarrow")


def prep_corpus_v2(ds, text_col: str = "text", id_col: str = "doc_id",
                   max_df_frac: float = 0.78,
                   max_top_token_frac: float = 0.15, min_tokens: int = 20,
                   fractions: dict[str, float] | None = None):
    """prep_corpus with a repetition-quality gate between dedup and the
    boilerplate strip (the Gopher-style filter a real corpus prep
    runs): dedup → drop docs that are too repetitive or too short →
    split on the original text → boilerplate DF computed over the
    FILTERED corpus only. Still SQL-expressible end-to-end, so the
    gate stays value-exact."""
    from webvalid.ops.textstats import repetition_filter

    dup_ref = ray.put(_dup_keeper_arrays(ds, text_col, id_col))
    kept = ds.map_batches(_keep_filter(dup_ref, text_col, id_col),
                          batch_format="pyarrow")
    clean = repetition_filter(kept, text_col,
                              max_top_token_frac=max_top_token_frac,
                              min_tokens=min_tokens)
    th = split_thresholds(fractions or {"train": 0.8, "valid": 0.1, "test": 0.1})
    with_split = clean.map_batches(
        lambda t: add_split_column(t, text_col, th), batch_format="pyarrow"
    )
    dfs, n_docs = document_frequencies(clean, text_col, return_doc_count=True)
    hot_ref = hot_tokens_ref(dfs, n_docs, max_df_frac)

    def rewrite(batch: pa.Table) -> pa.Table:
        return rewrite_without_hot(batch, text_col, ray.get(hot_ref),
                                   [id_col, "split"])

    return with_split.map_batches(rewrite, batch_format="pyarrow")
