"""Exact distributed quantile selection WITHOUT a global sort.

`kth_smallest` finds the exact k-th order statistic by iterative
histogram bisection: each round is one streaming pass that bins the
in-range values into `bins` equal-width counters (a tiny mergeable
partial per batch), the driver locates the bin containing the k-th
element, and the range narrows ~bins× per round. When the surviving
range holds few enough values they are collected and selected exactly.
Total cost: O(rounds) streaming passes + one answer-sized collect —
no shuffle, O(bins) driver state per round. This is the scale path for
exact percentiles where `Dataset.sort` would be an all-to-all and a
t-digest would be approximate.

No reference analogue; north-rule addition (exact quantile twin of the
TDigest sketch in sketches.py).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _range_histogram(ds, col: str, lo: float, hi: float, bins: int):
    """One streaming pass: counts of in-[lo, hi] values per equal-width
    bin (last bin right-closed), plus the below-lo count."""
    width = hi - lo

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        below = int((v < lo).sum())
        inr = v[(v >= lo) & (v <= hi)]
        if width > 0:
            b = np.clip(((inr - lo) / width * bins).astype(np.int64),
                        0, bins - 1)
            counts = np.bincount(b, minlength=bins)
        else:
            counts = np.zeros(bins, dtype=np.int64)
            counts[0] = len(inr)
        return pa.table({"below": pa.array([below], pa.int64()),
                         "counts": pa.array([counts.tolist()],
                                            pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    below = int(parts["below"].sum())
    counts = np.sum(np.stack(parts["counts"].to_numpy()), axis=0) \
        if len(parts) else np.zeros(bins, dtype=np.int64)
    return below, counts


def kth_smallest(ds, col: str, k: int, bins: int = 2048,
                 collect_limit: int = 65536, max_rounds: int = 12) -> float:
    """Exact k-th smallest (1-based) non-null value of `col`."""
    stats = ds.map_batches(
        lambda t: pa.table({
            "n": pa.array([len(t[col]) - t[col].null_count], pa.int64()),
            "lo": pa.array([pc.min(t[col]).as_py()], pa.float64()),
            "hi": pa.array([pc.max(t[col]).as_py()], pa.float64()),
        }),
        batch_format="pyarrow").to_pandas()
    n = int(stats["n"].sum())
    if not (1 <= k <= n):
        raise ValueError(f"k={k} out of range for {n} non-null rows")
    lo = float(stats["lo"].min())
    hi = float(stats["hi"].max())
    # invariant: k stays GLOBAL (1-based over all non-null values);
    # each round recomputes the below-lo count fresh, so nothing is
    # ever subtracted twice
    remaining = n
    for _ in range(max_rounds):
        if lo == hi or remaining <= collect_limit:
            break
        below, counts = _range_histogram(ds, col, lo, hi, bins)
        cum = np.cumsum(counts)
        b = int(np.searchsorted(cum, k - below))
        remaining = int(counts[b])
        width = (hi - lo) / bins
        # widen the bin by a relative epsilon so float boundary drift
        # can never strand the k-th value outside the surviving range
        # (a stranded value would crash the final index, not mis-answer,
        # but the margin costs only a few extra collected rows)
        eps = width * 1e-9
        lo, hi = (max(lo, lo + b * width - eps),
                  (lo + (b + 1) * width + eps if b < bins - 1 else hi))

    # answer-sized exact finish: one pass collecting only the surviving
    # range plus its below-lo count
    def final(t: pa.Table) -> pa.Table:
        v = pc.drop_null(t[col]).to_numpy(zero_copy_only=False)
        inr = v[(v >= lo) & (v <= hi)]
        return pa.table({"below": pa.array([int((v < lo).sum())], pa.int64()),
                         "vals": pa.array([inr.tolist()],
                                          pa.list_(pa.float64()))})

    parts = ds.map_batches(final, batch_format="pyarrow").to_pandas()
    below = int(parts["below"].sum())
    vals = np.concatenate(parts["vals"].to_numpy())
    vals.sort(kind="mergesort")
    return float(vals[k - below - 1])


def exact_quantile_disc(ds, col: str, qs: list[float],
                        **kwargs) -> pd.DataFrame:
    """Exact discrete quantiles (SQL quantile_disc semantics: the value
    at 0-based index floor(q·(n−1)) of the sorted non-null column)."""
    n = int(ds.map_batches(
        lambda t: pa.table({"n": pa.array(
            [len(t[col]) - t[col].null_count], pa.int64())}),
        batch_format="pyarrow").to_pandas()["n"].sum())
    rows = []
    for q in qs:
        k = int(math.floor(q * (n - 1))) + 1
        rows.append({"q": q, "value": kth_smallest(ds, col, k, **kwargs)})
    return pd.DataFrame(rows)


def exact_quantile_cont(ds, col: str, qs: list[float],
                        ndigits: int | None = 6, **kwargs) -> pd.DataFrame:
    """Exact interpolated quantiles (SQL quantile_cont /
    PERCENTILE_CONT semantics): with h = q·(n−1) over the sorted
    non-null column, linearly interpolate between the values at
    0-based indices floor(h) and ceil(h).

    Each boundary value comes from the histogram-bisection
    `kth_smallest` — no sort, no shuffle, answer-sized collection."""
    n = int(ds.map_batches(
        lambda t: pa.table({"n": pa.array(
            [len(t[col]) - t[col].null_count], pa.int64())}),
        batch_format="pyarrow").to_pandas()["n"].sum())
    rows = []
    for q in qs:
        h = q * (n - 1)
        lo = int(math.floor(h))
        frac = h - lo
        v_lo = kth_smallest(ds, col, lo + 1, **kwargs)
        v = v_lo if frac == 0.0 else \
            v_lo + frac * (kth_smallest(ds, col, lo + 2, **kwargs) - v_lo)
        rows.append({"q": q, "value": round(v, ndigits) if ndigits else v})
    return pd.DataFrame(rows)
