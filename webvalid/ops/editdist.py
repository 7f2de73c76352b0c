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
                            max_chars: int = 120) -> pd.DataFrame:
    """Edit distance between each row's text and the NEXT row's text
    in per-key `order_col` order (SQL twin: levenshtein(substr(text),
    LEAD(substr(text)) OVER (PARTITION BY key ORDER BY order_col))).

    Needs a key's rows co-located → rides the hash groupby like the
    other per-key window ops; inside a group the pairs are
    embarrassingly sequential and each DP is vectorized."""
    def dist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort")
        texts = g[text_col].tolist()
        ids = g[order_col].to_numpy()
        rows = [(g[key].iloc[0], ids[i], ids[i + 1],
                 levenshtein(texts[i] or "", texts[i + 1] or "", max_chars))
                for i in range(len(texts) - 1)]
        return pd.DataFrame(rows, columns=[key, order_col, "next_id", "dist"])

    return ds.groupby(key).map_groups(dist, batch_format="pandas").to_pandas()
