"""BPE tokenizer training + encoding — the tokenizer-prep stage of a
training-data pipeline.

Training follows the classic byte-pair-encoding algorithm (Sennrich et
al. 2016, public): greedy merges of the most frequent adjacent symbol
pair, counted over the corpus WORD-FREQUENCY table — the standard
practical formulation, because pair counts are a linear function of
word frequencies, so the corpus never needs a second scan per merge.
The word table comes from `ops/ngrams.ngram_counts(strategy="auto")`
(per-batch Arrow partials; groupby-sum shuffle above 1M docs), and the
merge loop runs driver-side over that table — O(vocab) state, which is
the documented bounded-vocabulary contract of the n-gram family.

Encoding is a stateless map stage: merge ranks broadcast once via
`ray.put`, applied per word with a per-actor memo (Zipf makes the memo
hit rate ≈ 1), emitting per-doc token counts — vectorizable downstream.

Determinism: ties on pair frequency break by the lexicographically
smallest pair, so the merge list is a pure function of the corpus.

No reference analogue; north-rule / LLM-data addition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def train_bpe(ds, text_col: str = "text", n_merges: int = 200,
              min_freq: int = 2) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus word table.

    Words are whitespace tokens (matching the n-gram family's
    SQL-twinnable tokenization); symbols start as single characters.
    Merges whose best pair count falls below `min_freq` stop early.
    Returns the ordered merge list [(left, right), ...].
    """
    from webvalid.ops.ngrams import ngram_counts

    words = ngram_counts(ds, text_col, n=1)
    freqs = dict(zip(words["ngram"], words["cnt"].astype(int)))
    # symbol sequences per word + incremental pair statistics (the
    # standard Sennrich-style bookkeeping: each merge touches only the
    # words that contain the merged pair)
    seqs: dict[str, list[str]] = {w: list(w) for w in freqs if w}
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set] = {}

    def add_word(w: str, sign: int):
        sym = seqs[w]
        f = freqs[w] * sign
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + f
            if sign > 0:
                pair_words.setdefault(p, set()).add(w)
            else:
                # prune the inverted index too, or later merges rescan
                # words that no longer contain the pair (stale sets
                # grow monotonically over hundreds of merges)
                s = pair_words.get(p)
                if s is not None:
                    s.discard(w)

    for w in seqs:
        add_word(w, +1)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # max count, ties → lexicographically smallest pair
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < min_freq:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for w in list(pair_words.get(best, ())):
            add_word(w, -1)
            sym = seqs[w]
            out = []
            i = 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == best[0]
                        and sym[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            seqs[w] = out
            add_word(w, +1)
        # drop exhausted entries so the argmin scan stays tight
        for p in [p for p, c in pair_counts.items() if c <= 0]:
            pair_counts.pop(p, None)
            pair_words.pop(p, None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in rank order (lowest rank first)."""
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BpeEncoder:
    """Actor-pool map_batches callable: text → per-doc BPE token count
    (+ distinct-token count). Ranks resolve once per actor; a word→len
    memo makes repeated words (the Zipf mass) O(1)."""

    def __init__(self, merges_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        merges = ray.get(merges_ref)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col = text_col
        self.id_col = id_col
        self._memo: dict[str, int] = {}

    _MEMO_CAP = 1_000_000  # long-lived actors + Heaps'-law vocab growth

    def _count(self, word: str) -> int:
        n = self._memo.get(word)
        if n is None:
            if len(self._memo) >= self._MEMO_CAP:
                self._memo.clear()  # bounded: Zipf mass refills fast
            n = len(encode_word(word, self.ranks))
            self._memo[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n_tok = np.zeros(len(texts), dtype=np.int64)
        n_words = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            words = t.split(" ")
            words = [w for w in words if w]
            n_words[i] = len(words)
            n_tok[i] = sum(self._count(w) for w in words)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_words": pa.array(n_words),
            "n_bpe_tokens": pa.array(n_tok),
        })


def bpe_token_counts(ds, merges: list, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Dataset of (id, n_words, n_bpe_tokens) under a trained merge
    list (broadcast once; actor pool)."""
    from webvalid.rayutil import task_callable

    merges_ref = ray.put(merges)
    return ds.select_columns([id_col, text_col]).map_batches(
        task_callable(BpeEncoder, merges_ref=merges_ref,
                      text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )
