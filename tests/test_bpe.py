"""BPE tokenizer training/encoding tests (ops/bpe.py) vs a naive
recount-from-scratch reference implementation."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _naive_bpe(word_freqs: dict, n_merges: int, min_freq: int = 2):
    """Deliberately slow reference: full pair recount every merge."""
    seqs = {w: list(w) for w in word_freqs if w}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, sym in seqs.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + word_freqs[w]
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < min_freq:
            break
        merges.append(best)
        for w, sym in seqs.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def test_train_bpe_matches_naive(ray_session):
    import ray.data

    from webvalid.ops.bpe import train_bpe

    rng = np.random.default_rng(7)
    vocab = ["lower", "lowest", "newer", "newest", "wider", "widest",
             "low", "new", "wide", "test", "text", "texts"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
             for _ in range(300)]
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(4)
    got = train_bpe(ds, n_merges=25)

    # reference word-freq table
    wf: dict = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1
    exp, _ = _naive_bpe(wf, 25)
    assert got == exp


def test_encode_word_applies_merges_in_rank_order():
    from webvalid.ops.bpe import encode_word

    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("e", "r"): 2}
    assert encode_word("lower", ranks) == ["low", "er"]
    assert encode_word("xyz", ranks) == ["x", "y", "z"]
    assert encode_word("", ranks) == []


def test_bpe_token_counts_parity_and_bounds(ray_session):
    import ray.data

    from webvalid.ops.bpe import (bpe_token_counts, encode_word, train_bpe)

    rng = np.random.default_rng(11)
    vocab = ["alpha", "alphabet", "beta", "betamax", "gamma", "gam"]
    rows = []
    for i in range(120):
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab,
                                                 rng.integers(1, 9)))})
    rows.append({"doc_id": 120, "text": None})
    rows.append({"doc_id": 121, "text": ""})
    ds = ray.data.from_items(rows).repartition(3)
    merges = train_bpe(ds, n_merges=30)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    out = bpe_token_counts(ds, merges).to_pandas() \
        .set_index("doc_id").sort_index()
    for r in rows:
        t = r["text"]
        exp_words = [w for w in (t or "").split(" ") if w]
        exp_tok = sum(len(encode_word(w, ranks)) for w in exp_words)
        assert out.loc[r["doc_id"], "n_words"] == len(exp_words)
        assert out.loc[r["doc_id"], "n_bpe_tokens"] == exp_tok
        chars = len((t or "").replace(" ", ""))
        assert exp_words == [] or \
            len(exp_words) <= exp_tok <= chars
