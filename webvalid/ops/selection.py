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


def _stats_partial(col: str):
    """Per-batch (n, lo, hi) over VALID values — excluding both arrow
    nulls and float NaN (len − null_count would count NaN, desyncing
    the global rank from the NaN-dropping histogram/final passes and
    crashing the final index)."""
    def fn(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        v = v[~pd.isna(v)]
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "lo": pa.array([float(v.min()) if len(v) else math.inf],
                           pa.float64()),
            "hi": pa.array([float(v.max()) if len(v) else -math.inf],
                           pa.float64()),
        })

    return fn


def kth_smallest(ds, col: str, k: int, bins: int = 2048,
                 collect_limit: int = 65536, max_rounds: int = 12) -> float:
    """Exact k-th smallest (1-based) valid (non-null, non-NaN) value of
    `col` — the single-rank case of `kth_smallest_multi` (one shared
    implementation; the multi version's early rounds cost exactly one
    histogram for a single rank)."""
    return kth_smallest_multi(ds, col, [k], bins=bins,
                              collect_limit=collect_limit,
                              max_rounds=max_rounds)[0]


def exact_quantile_disc(ds, col: str, qs: list[float],
                        **kwargs) -> pd.DataFrame:
    """Exact discrete quantiles (SQL quantile_disc semantics: the value
    at 0-based index floor(q·(n−1)) of the sorted non-null column)."""
    vals = kth_smallest_multi(
        ds, col, ks_from_n=lambda n: [int(math.floor(q * (n - 1))) + 1
                                      for q in qs], **kwargs)
    return pd.DataFrame({"q": qs, "value": vals})


def exact_quantile_cont(ds, col: str, qs: list[float],
                        ndigits: int | None = 6, **kwargs) -> pd.DataFrame:
    """Exact interpolated quantiles (SQL quantile_cont /
    PERCENTILE_CONT semantics): with h = q·(n−1) over the sorted
    non-null column, linearly interpolate between the values at
    0-based indices floor(h) and ceil(h).

    Each boundary value comes from the histogram-bisection
    `kth_smallest` — no sort, no shuffle, answer-sized collection.
    The valid-row count comes from the multi-rank selector's own stats
    pass (no separate counting scan)."""
    spec = []  # (k_lo index into ks, k_hi index or None, frac)

    def ks_from_n(n: int) -> list[int]:
        ks: list[int] = []
        spec.clear()
        for q in qs:
            h = q * (n - 1)
            lo = int(math.floor(h))
            frac = h - lo
            i_lo = len(ks)
            ks.append(lo + 1)
            if frac == 0.0:
                spec.append((i_lo, None, 0.0))
            else:
                ks.append(lo + 2)
                spec.append((i_lo, i_lo + 1, frac))
        return ks

    vals = kth_smallest_multi(ds, col, ks_from_n=ks_from_n, **kwargs)
    rows = []
    for q, (i_lo, i_hi, frac) in zip(qs, spec):
        v = vals[i_lo] if i_hi is None else \
            vals[i_lo] + frac * (vals[i_hi] - vals[i_lo])
        rows.append({"q": q,
                     "value": round(v, ndigits) if ndigits is not None
                     else v})
    return pd.DataFrame(rows)


def kth_smallest_multi(ds, col: str, ks: list[int] | None = None,
                       bins: int = 2048, collect_limit: int = 65536,
                       max_rounds: int = 12,
                       ks_from_n=None) -> list[float]:
    """Exact k-th smallest for SEVERAL ranks in shared passes: every
    bisection round is ONE `map_batches` pass that histograms all the
    distinct surviving ranges at once (ranks start from the same
    global range, so early rounds cost exactly one histogram), and the
    exact finish is one pass collecting every final range. A caller
    needing Q interpolated quantiles pays O(rounds + 1) passes instead
    of O(2·Q·rounds) individual `kth_smallest` calls."""
    stats = ds.map_batches(_stats_partial(col),
                           batch_format="pyarrow").to_pandas()
    n = int(stats["n"].sum())
    if ks is None:
        ks = ks_from_n(n)
    for k in ks:
        if not (1 <= k <= n):
            raise ValueError(f"k={k} out of range for {n} non-null rows")
    lo0, hi0 = float(stats["lo"].min()), float(stats["hi"].max())
    state = [{"lo": lo0, "hi": hi0, "rem": n} for _ in ks]

    def _hist_pass(intervals: list[tuple[float, float]]) -> list:
        def partial(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)]
            rows_b, rows_c = [], []
            for (ilo, ihi) in intervals:
                width = ihi - ilo
                rows_b.append(int((v < ilo).sum()))
                inr = v[(v >= ilo) & (v <= ihi)]
                if width > 0:
                    b = np.clip(((inr - ilo) / width * bins).astype(np.int64),
                                0, bins - 1)
                    rows_c.append(np.bincount(b, minlength=bins).tolist())
                else:
                    c = np.zeros(bins, dtype=np.int64)
                    c[0] = len(inr)
                    rows_c.append(c.tolist())
            return pa.table({"iv": pa.array(range(len(intervals)), pa.int64()),
                             "below": pa.array(rows_b, pa.int64()),
                             "counts": pa.array(rows_c,
                                                pa.list_(pa.int64()))})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        out = []
        for iv in range(len(intervals)):
            sub = parts[parts["iv"] == iv]
            below = int(sub["below"].sum())
            counts = np.sum(np.stack(sub["counts"].to_numpy()), axis=0)
            out.append((below, counts))
        return out

    for _ in range(max_rounds):
        active = [i for i, s in enumerate(state)
                  if s["lo"] != s["hi"] and s["rem"] > collect_limit]
        if not active:
            break
        dedup: dict[tuple[float, float], list[int]] = {}
        for i in active:
            dedup.setdefault((state[i]["lo"], state[i]["hi"]), []).append(i)
        intervals = list(dedup.keys())
        hists = _hist_pass(intervals)
        for (ilo, ihi), (below, counts) in zip(intervals, hists):
            cum = np.cumsum(counts)
            width = (ihi - ilo) / bins
            eps = width * 1e-9
            for i in dedup[(ilo, ihi)]:
                b = int(np.searchsorted(cum, ks[i] - below))
                state[i]["rem"] = int(counts[b])
                state[i]["lo"] = max(ilo, ilo + b * width - eps)
                state[i]["hi"] = (ilo + (b + 1) * width + eps
                                  if b < bins - 1 else ihi)

    # one exact finish pass over the union of distinct final ranges
    dedup2: dict[tuple[float, float], list[int]] = {}
    for i, s in enumerate(state):
        dedup2.setdefault((s["lo"], s["hi"]), []).append(i)
    finals = list(dedup2.keys())

    def final(t: pa.Table) -> pa.Table:
        v = pc.drop_null(t[col]).to_numpy(zero_copy_only=False)
        rows_b, rows_v = [], []
        for (flo, fhi) in finals:
            rows_b.append(int((v < flo).sum()))
            rows_v.append(v[(v >= flo) & (v <= fhi)].tolist())
        return pa.table({"iv": pa.array(range(len(finals)), pa.int64()),
                         "below": pa.array(rows_b, pa.int64()),
                         "vals": pa.array(rows_v, pa.list_(pa.float64()))})

    parts = ds.map_batches(final, batch_format="pyarrow").to_pandas()
    answers: list[float] = [math.nan] * len(ks)
    for iv, (flo, fhi) in enumerate(finals):
        sub = parts[parts["iv"] == iv]
        below = int(sub["below"].sum())
        vals = np.concatenate(sub["vals"].to_numpy())
        vals.sort(kind="mergesort")
        for i in dedup2[(flo, fhi)]:
            answers[i] = float(vals[ks[i] - below - 1])
    return answers


def grouped_kth_smallest_multi(ds, key: str, val: str, ks_of_n,
                               value_fn=None, bins: int = 1024,
                               collect_limit: int = 65536,
                               max_rounds: int = 12) -> dict:
    """Per-KEY exact k-th smallest for several ranks — the grouped
    sibling of `kth_smallest_multi`, sharing its shape: one stats pass,
    histogram-bisection rounds that batch EVERY key's surviving
    interval into one `map_batches` pass, one exact finish pass. The
    all-to-all a `groupby(key).map_groups` would pay is replaced by
    O(rounds) streaming scans; the driver holds only (key, rank)
    interval state (answer-sized key domain — same contract as the
    other grouped aggregates here).

    - `ks_of_n(n)` -> list of 1-based ranks wanted for a key with n
      valid rows (e.g. the two middle ranks for a midpoint median).
    - `value_fn(keys_np, vals_np) -> vals_np` optionally derives the
      ranked quantity per row (e.g. |v - median[key]| for MAD).

    Returns {key_value: [answers in ks_of_n order]}; a key whose rows
    are ALL null/NaN maps to [] (the caller decides its NaN/NULL shape
    — dropping such keys would emit fewer rows than a SQL GROUP BY).
    NaN/null values are excluded per key.
    """
    import pandas as pd

    def _vals(t: pa.Table):
        kv = t[key].to_numpy(zero_copy_only=False)
        x = t[val].to_numpy(zero_copy_only=False).astype(np.float64)
        if value_fn is not None:
            x = value_fn(kv, x)
        return kv, x

    def stats_partial(t: pa.Table) -> pa.Table:
        kv, x = _vals(t)
        kok = ~pd.isna(kv)
        # keep every valid KEY (a group of all-null values must still
        # surface, like SQL GROUP BY); count/min/max skip NaN values
        df = pd.DataFrame({"k": kv[kok], "x": x[kok]})
        g = df.groupby("k", sort=False)["x"].agg(["count", "min", "max"])
        return pa.table({"k": pa.array(g.index.to_numpy()),
                         "n": pa.array(g["count"].to_numpy(np.int64)),
                         "lo": pa.array(g["min"].to_numpy(np.float64)),
                         "hi": pa.array(g["max"].to_numpy(np.float64))})

    sp = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    if len(sp) == 0:
        return {}
    st = sp.groupby("k").agg(n=("n", "sum"), lo=("lo", "min"),
                             hi=("hi", "max"))
    uk = st.index.to_numpy()
    uk_index = pd.Index(uk)

    # state: one entry per (key, rank)
    state: list[dict] = []
    per_key: dict = {}
    for ki, (kval, row) in enumerate(st.iterrows()):
        n = int(row["n"])
        if n == 0:
            per_key[kval] = []  # all-null group: surfaced, no ranks
            continue
        ks = ks_of_n(n)
        ids = []
        for k in ks:
            if not (1 <= k <= n):
                raise ValueError(f"rank {k} out of range for key {kval!r} "
                                 f"({n} valid rows)")
            ids.append(len(state))
            state.append({"ki": ki, "k": k, "lo": float(row["lo"]),
                          "hi": float(row["hi"]), "rem": n})
        per_key[kval] = ids

    def hist_pass(intervals: list[tuple[int, float, float]]) -> list:
        def partial(t: pa.Table) -> pa.Table:
            kv, x = _vals(t)
            ok = ~pd.isna(kv) & ~np.isnan(x)
            idx = uk_index.get_indexer(kv[ok])
            xv = x[ok]
            rows_b, rows_c = [], []
            for (ki, ilo, ihi) in intervals:
                mine = xv[idx == ki]
                rows_b.append(int((mine < ilo).sum()))
                inr = mine[(mine >= ilo) & (mine <= ihi)]
                width = ihi - ilo
                if width > 0:
                    b = np.clip(((inr - ilo) / width * bins).astype(np.int64),
                                0, bins - 1)
                    rows_c.append(np.bincount(b, minlength=bins).tolist())
                else:
                    c = np.zeros(bins, dtype=np.int64)
                    c[0] = len(inr)
                    rows_c.append(c.tolist())
            return pa.table({"iv": pa.array(range(len(intervals)), pa.int64()),
                             "below": pa.array(rows_b, pa.int64()),
                             "counts": pa.array(rows_c,
                                                pa.list_(pa.int64()))})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        out = []
        for iv in range(len(intervals)):
            sub = parts[parts["iv"] == iv]
            out.append((int(sub["below"].sum()),
                        np.sum(np.stack(sub["counts"].to_numpy()), axis=0)))
        return out

    for _ in range(max_rounds):
        active = [i for i, s in enumerate(state)
                  if s["lo"] != s["hi"] and s["rem"] > collect_limit]
        if not active:
            break
        dedup: dict[tuple[int, float, float], list[int]] = {}
        for i in active:
            s = state[i]
            dedup.setdefault((s["ki"], s["lo"], s["hi"]), []).append(i)
        intervals = list(dedup.keys())
        for (ki, ilo, ihi), (below, counts) in zip(intervals,
                                                   hist_pass(intervals)):
            cum = np.cumsum(counts)
            width = (ihi - ilo) / bins
            eps = width * 1e-9
            for i in dedup[(ki, ilo, ihi)]:
                b = int(np.searchsorted(cum, state[i]["k"] - below))
                state[i]["rem"] = int(counts[b])
                state[i]["lo"] = max(ilo, ilo + b * width - eps)
                state[i]["hi"] = (ilo + (b + 1) * width + eps
                                  if b < bins - 1 else ihi)

    dedup2: dict[tuple[int, float, float], list[int]] = {}
    for i, s in enumerate(state):
        dedup2.setdefault((s["ki"], s["lo"], s["hi"]), []).append(i)
    finals = list(dedup2.keys())

    def final(t: pa.Table) -> pa.Table:
        kv, x = _vals(t)
        ok = ~pd.isna(kv) & ~np.isnan(x)
        idx = uk_index.get_indexer(kv[ok])
        xv = x[ok]
        rows_b, rows_v = [], []
        for (ki, flo, fhi) in finals:
            mine = xv[idx == ki]
            rows_b.append(int((mine < flo).sum()))
            rows_v.append(mine[(mine >= flo) & (mine <= fhi)].tolist())
        return pa.table({"iv": pa.array(range(len(finals)), pa.int64()),
                         "below": pa.array(rows_b, pa.int64()),
                         "vals": pa.array(rows_v, pa.list_(pa.float64()))})

    parts = ds.map_batches(final, batch_format="pyarrow").to_pandas()
    answers = [math.nan] * len(state)
    for iv, (ki, flo, fhi) in enumerate(finals):
        sub = parts[parts["iv"] == iv]
        below = int(sub["below"].sum())
        vals = np.concatenate(sub["vals"].to_numpy()) if len(sub) else \
            np.array([])
        vals.sort(kind="mergesort")
        for i in dedup2[(ki, flo, fhi)]:
            answers[i] = float(vals[state[i]["k"] - below - 1])
    return {kval: [answers[i] for i in ids]
            for kval, ids in per_key.items()}
