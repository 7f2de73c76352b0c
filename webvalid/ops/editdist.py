"""Levenshtein edit distance — the character-level near-dup verifier.

MinHash/SimHash find CANDIDATE near-dups cheaply; edit distance is the
precise (but O(len²)) confirmation kernel a curation pipeline applies
to the few surviving pairs. The DP runs one row per character of `a`,
fully vectorized over `b`: substitutions and deletions are two shifted
vector mins, and the sequential insertion dependency
cur[j] = min(cur[j], cur[j-1]+1) is closed in one vectorized
prefix-min scan via cur[j] = j + min_{k<=j}(t[k] - k). Inputs are
truncated to `max_chars` so one adversarial pair can't stall a task.

Unit costs (insert = delete = substitute = 1) match SQL levenshtein().
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def levenshtein(a: str, b: str, max_chars: int | None = None) -> int:
    """Edit distance with unit costs; optional truncation first."""
    if max_chars is not None:
        a, b = a[:max_chars], b[:max_chars]
    if not a:
        return len(b)
    if not b:
        return len(a)
    aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    n = len(bb)
    idx = np.arange(n + 1, dtype=np.int64)
    prev = idx.copy()
    t = np.empty(n + 1, dtype=np.int64)
    for i, ca in enumerate(aa, start=1):
        t[0] = i
        np.minimum(prev[:-1] + (bb != ca), prev[1:] + 1, out=t[1:])
        u = t - idx
        np.minimum.accumulate(u, out=u)
        prev = u + idx
    return int(prev[-1])


def adjacent_edit_distances(ds, key: str, order_col: str, text_col: str,
                            max_chars: int = 120):
    """Edit distance between each row's text and the NEXT row's text
    in per-key `order_col` order (SQL twin: levenshtein(substr(text),
    LEAD(substr(text)) OVER (PARTITION BY key ORDER BY order_col))).

    Distributed via ops/keyscan.py: ONE range sort, in-block adjacent
    pairs, and a one-row carry (the open key's last (order, truncated
    text)) so the pair that straddles a block edge is emitted by the
    next block. (key, order_col) must be row-unique. Returns a
    Dataset of (key, order_col, next_id, dist)."""
    from webvalid.ops.keyscan import _runs, per_key_scan
    import pyarrow as pa

    by = [key, order_col]

    def partial(t: pa.Table) -> dict:
        k = t[key].to_numpy(zero_copy_only=False)
        n = len(k)
        last_txt = t[text_col][n - 1].as_py()
        return {
            "head": t[key][0].as_py(),
            "tail": t[key][n - 1].as_py(),
            "single": bool(k[0] == k[-1]),
            # truncate before carrying — only max_chars matter
            "tail_rows": {order_col: [t[order_col][n - 1].as_py()],
                          text_col: [(last_txt or "")[:max_chars]
                                     if last_txt is not None else None]},
        }

    def fold(state, part):
        if part is None:
            return None, None, None
        cont = state is not None and part["head"] == state[0]
        inject = state[1] if cont else None
        return inject, (part["tail"], part["tail_rows"]), None

    def apply(t: pa.Table, inject) -> pa.Table:
        empty = pa.table({key: t[key].slice(0, 0),
                          order_col: t[order_col].slice(0, 0),
                          "next_id": t[order_col].slice(0, 0),
                          "dist": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        k = t[key].to_numpy(zero_copy_only=False)
        ids = t[order_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        starts = _runs(k)
        bounds = np.concatenate([starts, [len(k)]])
        out_k, out_id, out_next, out_d = [], [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            for i in range(int(s), int(e) - 1):
                out_k.append(k[s])
                out_id.append(ids[i])
                out_next.append(ids[i + 1])
                out_d.append(levenshtein(texts[i] or "", texts[i + 1] or "",
                                         max_chars))
        if inject:
            # boundary pair: previous block's last row → this head row
            out_k.append(k[0])
            out_id.append(inject[order_col][0])
            out_next.append(ids[0])
            out_d.append(levenshtein(inject[text_col][0] or "",
                                     texts[0] or "", max_chars))
        if not out_k:
            return empty
        return pa.table({key: pa.array(out_k),
                         order_col: pa.array(out_id),
                         "next_id": pa.array(out_next),
                         "dist": pa.array(out_d, pa.int64())})

    out, _ = per_key_scan(ds, by, partial, fold, apply)
    return out
