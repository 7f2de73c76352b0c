"""Grouped-aggregate extensions: mode, Shannon entropy, correlation.

All three follow the engine's standard two-phase shape: a vectorized
per-batch partial (one row per in-batch group, pandas/numpy kernels)
plus an O(#groups) driver combine — nothing larger than the group
domain ever moves, so there is no shuffle and the ops stream at any
input scale provided the (key × value) domain is materially smaller
than the data (the usual profile-aggregation contract).

No reference analogue; north-rule / training-data additions (mode and
entropy are the categorical-drift profile primitives; correlation is
the numeric-pair drift primitive).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _keyval_counts(ds, key: str, val: str) -> pd.DataFrame:
    """Two-phase (key, val) counts: per-batch partials + driver sum."""
    def partial(t: pa.Table) -> pa.Table:
        df = t.select([key, val]).to_pandas()
        out = df.groupby([key, val], as_index=False, sort=False).size() \
                .rename(columns={"size": "_c"})
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.groupby([key, val], as_index=False, sort=False)["_c"].sum()


def grouped_mode(ds, key: str, val: str, out_col: str = "mode_val",
                 count_col: str = "n") -> pd.DataFrame:
    """Per-key MODE of `val` with a deterministic tie-break (highest
    count, then smallest value — SQL twin: ROW_NUMBER() OVER (PARTITION
    BY key ORDER BY COUNT(*) DESC, val) = 1)."""
    comb = _keyval_counts(ds, key, val)
    comb = comb.sort_values([key, "_c", val], ascending=[True, False, True],
                            kind="mergesort")
    top = comb.drop_duplicates(key, keep="first")
    return pd.DataFrame({key: top[key].to_numpy(),
                         out_col: top[val].to_numpy(),
                         count_col: top["_c"].to_numpy()}).reset_index(drop=True)


def grouped_entropy(ds, key: str, val: str, out_col: str = "entropy",
                    ndigits: int | None = 6) -> pd.DataFrame:
    """Per-key Shannon entropy (nats) of the `val` distribution:
    -Σ p·ln(p) over the key's value counts. Vectorized on the combined
    counts; rounds to `ndigits` for cross-engine float comparability."""
    comb = _keyval_counts(ds, key, val)
    n = comb.groupby(key, sort=False)["_c"].transform("sum").to_numpy()
    p = comb["_c"].to_numpy() / n
    comb = comb.assign(_t=-p * np.log(p))
    out = comb.groupby(key, as_index=False, sort=False)["_t"].sum() \
              .rename(columns={"_t": out_col})
    if ndigits is not None:
        out[out_col] = out[out_col].round(ndigits)
    return out.sort_values(key, kind="mergesort").reset_index(drop=True)


def grouped_corr(ds, key: str, x: str, y: str, out_col: str = "corr_xy",
                 count_col: str = "n_pairs",
                 ndigits: int | None = 6) -> pd.DataFrame:
    """Per-key Pearson correlation of (x, y) over non-null pairs.

    Per-batch partials carry the six mergeable sums (n, Σx, Σy, Σx²,
    Σy², Σxy); the driver combines them and closes the formula
    (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²ₛ)(n·Σy² − Σy²ₛ)) — identical
    for sample and population, so it matches SQL corr(). Rows where
    either side is null are excluded (SQL semantics)."""
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: t[key].to_numpy(zero_copy_only=False),
            "_x": t[x].to_numpy(zero_copy_only=False),
            "_y": t[y].to_numpy(zero_copy_only=False),
        }).dropna(subset=["_x", "_y"])
        df["_xx"] = df["_x"] * df["_x"]
        df["_yy"] = df["_y"] * df["_y"]
        df["_xy"] = df["_x"] * df["_y"]
        df["_n"] = 1
        out = df.groupby(key, as_index=False, sort=False)[
            ["_n", "_x", "_y", "_xx", "_yy", "_xy"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    c = parts.groupby(key, as_index=False, sort=False)[
        ["_n", "_x", "_y", "_xx", "_yy", "_xy"]].sum()
    n = c["_n"].to_numpy(dtype=np.float64)
    sx, sy = c["_x"].to_numpy(), c["_y"].to_numpy()
    sxx, syy, sxy = c["_xx"].to_numpy(), c["_yy"].to_numpy(), c["_xy"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = (n * sxy - sx * sy) / np.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy))
    out = pd.DataFrame({key: c[key].to_numpy(), out_col: corr,
                        count_col: c["_n"].to_numpy(dtype=np.int64)})
    if ndigits is not None:
        out[out_col] = out[out_col].round(ndigits)
    return out.sort_values(key, kind="mergesort").reset_index(drop=True)


def grouped_count_distinct(ds, key: str, val: str,
                           out_col: str = "n_distinct") -> pd.DataFrame:
    """Per-key exact COUNT(DISTINCT val): per-batch distinct (key, val)
    pairs — domain-sized, not row-sized — then a driver distinct +
    count. Exact twin of the per-key HLL sketch path."""
    def partial(t: pa.Table) -> pa.Table:
        df = t.select([key, val]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.drop_duplicates()
    # SQL semantics throughout: a NULL key is its own group
    # (dropna=False), and a group whose vals are all NULL still exists
    # with COUNT(DISTINCT)=0 — so collect the key domain BEFORE
    # dropping null vals and left-join the counts back (pandas merge
    # matches NaN keys to each other, like GROUP BY does)
    keys = parts[[key]].drop_duplicates()
    nn = parts.dropna(subset=[val])
    counts = nn.groupby(key, as_index=False, sort=False, dropna=False)[val] \
               .size().rename(columns={"size": out_col})
    out = keys.merge(counts, on=key, how="left")
    out[out_col] = out[out_col].fillna(0).astype("int64")
    return out.sort_values(key, kind="mergesort").reset_index(drop=True)


def grouped_minmax_normalize(ds, key: str, val: str,
                             out_col: str = "norm_val"):
    """Per-key min-max feature scaling: (v − min_k) / (max_k − min_k),
    null when the key's range is zero (SQL NULLIF semantics).

    Two-phase: a twophase min/max partial pass builds an O(#keys)
    table, broadcast ONCE as sorted numpy arrays (ray.put); the rescale
    pass is a vectorized searchsorted lookup per batch — no shuffle,
    and the fact table is touched twice but never moved."""
    def partial(t: pa.Table) -> pa.Table:
        df = t.select([key, val]).to_pandas()
        out = df.groupby(key, as_index=False, sort=False)[val] \
                .agg(["min", "max"]).reset_index(drop=True)
        out.columns = [key, "_min", "_max"]
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    comb = parts.groupby(key, as_index=False, sort=False) \
                .agg(_min=("_min", "min"), _max=("_max", "max")) \
                .sort_values(key, kind="mergesort")
    import ray as _ray
    ref = _ray.put((comb[key].to_numpy(), comb["_min"].to_numpy(),
                    comb["_max"].to_numpy()))

    class _Rescale:
        def __init__(self, ref):
            self.keys, self.mins, self.maxs = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False)
            v = t[val].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.keys, k)
            rng = self.maxs[idx] - self.mins[idx]
            with np.errstate(invalid="ignore", divide="ignore"):
                norm = np.where(rng == 0, np.nan,
                                (v - self.mins[idx]) / rng)
            return t.append_column(out_col, pa.array(norm, pa.float64()))

    from webvalid.rayutil import task_callable

    return ds.map_batches(task_callable(_Rescale, ref=ref),
                          batch_format="pyarrow")


def grouped_skew_kurt(ds, key: str, val: str, ndigits: int | None = 6
                      ) -> pd.DataFrame:
    """Per-key sample skewness and excess kurtosis (SQL skewness() /
    kurtosis(): the bias-corrected Fisher–Pearson definitions).

    Two streaming passes keep the arithmetic exact: pass 1 is a tiny
    (n, Σx) twophase for the per-group means; pass 2 ships the O(#keys)
    mean table into each task and accumulates CENTRAL moment sums
    Σd², Σd³, Σd⁴ — no raw fourth-power sums, so there is no
    catastrophic cancellation when the driver closes the formulas.
    Nulls are excluded per group (SQL semantics)."""
    def p1(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: t[key].to_numpy(zero_copy_only=False),
            "_x": t[val].to_numpy(zero_copy_only=False),
        }).dropna(subset=["_x"])
        df["_n"] = 1
        out = df.groupby(key, as_index=False, sort=False)[["_n", "_x"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(p1, batch_format="pyarrow").to_pandas()
    c1 = parts.groupby(key, as_index=False, sort=False)[["_n", "_x"]].sum() \
              .sort_values(key, kind="mergesort")
    gkeys = c1[key].to_numpy()
    n = c1["_n"].to_numpy(dtype=np.float64)
    means = c1["_x"].to_numpy() / n

    def p2(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: t[key].to_numpy(zero_copy_only=False),
            "_x": t[val].to_numpy(zero_copy_only=False),
        }).dropna(subset=["_x"])
        d = df["_x"].to_numpy() - means[np.searchsorted(gkeys, df[key].to_numpy())]
        df = df.assign(_d2=d * d, _d3=d ** 3, _d4=d ** 4)
        out = df.groupby(key, as_index=False, sort=False)[
            ["_d2", "_d3", "_d4"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    p = ds.map_batches(p2, batch_format="pyarrow").to_pandas()
    c2 = p.groupby(key, as_index=False, sort=False)[["_d2", "_d3", "_d4"]] \
          .sum().sort_values(key, kind="mergesort")
    m2 = c2["_d2"].to_numpy()
    m3 = c2["_d3"].to_numpy()
    m4 = c2["_d4"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        s = np.sqrt(m2 / (n - 1))  # sample std
        skew = (n / ((n - 1) * (n - 2))) * m3 / s ** 3
        kurt = (n * (n + 1) / ((n - 1) * (n - 2) * (n - 3))) * m4 / s ** 4 \
            - 3.0 * (n - 1) ** 2 / ((n - 2) * (n - 3))
    out = pd.DataFrame({key: gkeys, "skew": skew, "kurt": kurt})
    if ndigits is not None:
        out["skew"] = out["skew"].round(ndigits)
        out["kurt"] = out["kurt"].round(ndigits)
    return out.reset_index(drop=True)


def zscore_outlier_counts(ds, key: str, val: str, z: float = 2.0
                          ) -> pd.DataFrame:
    """Per-key count of rows whose |x − mean| / stddev_samp exceeds z.

    Pass 1: (n, Σx, Σx²) twophase → mean and sample std per key (the
    mild cancellation of the sum-of-squares form is harmless for a
    threshold test). Pass 2 ships the O(#keys) stats table and counts
    exceedances vectorized — the classic broadcast-the-profile,
    scan-the-data anomaly shape."""
    def p1(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: t[key].to_numpy(zero_copy_only=False),
            "_x": t[val].to_numpy(zero_copy_only=False),
        }).dropna(subset=["_x"])
        df["_xx"] = df["_x"] * df["_x"]
        df["_n"] = 1
        out = df.groupby(key, as_index=False, sort=False)[
            ["_n", "_x", "_xx"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(p1, batch_format="pyarrow").to_pandas()
    c = parts.groupby(key, as_index=False, sort=False)[["_n", "_x", "_xx"]] \
             .sum().sort_values(key, kind="mergesort")
    gkeys = c[key].to_numpy()
    n = c["_n"].to_numpy(dtype=np.float64)
    mean = c["_x"].to_numpy() / n
    with np.errstate(invalid="ignore", divide="ignore"):
        sd = np.sqrt(np.maximum(c["_xx"].to_numpy() - n * mean * mean, 0.0)
                     / (n - 1))

    def p2(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: t[key].to_numpy(zero_copy_only=False),
            "_x": t[val].to_numpy(zero_copy_only=False),
        }).dropna(subset=["_x"])
        idx = np.searchsorted(gkeys, df[key].to_numpy())
        with np.errstate(invalid="ignore", divide="ignore"):
            zz = np.abs(df["_x"].to_numpy() - mean[idx]) / sd[idx]
        df = df.assign(_o=(zz > z).astype(np.int64), _n=1)
        out = df.groupby(key, as_index=False, sort=False)[["_o", "_n"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    p = ds.map_batches(p2, batch_format="pyarrow").to_pandas()
    out = p.groupby(key, as_index=False, sort=False)[["_o", "_n"]].sum() \
           .rename(columns={"_o": "n_outliers", "_n": "n_rows"}) \
           .sort_values(key, kind="mergesort")
    return out.reset_index(drop=True)


def grouped_geomean(ds, key: str, val: str, out_col: str = "geomean",
                    ndigits: int | None = 6) -> pd.DataFrame:
    """Per-key geometric mean of positive `val` rows: exp(mean(ln x)),
    the SQL twin EXP(AVG(LN(x))). Non-positive and null rows are
    excluded (matching SQL, where LN of them is an error/null).
    Mergeable (n, Σln x) partials — same twophase shape as the other
    grouped stats."""
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: t[key].to_numpy(zero_copy_only=False),
            "_x": t[val].to_numpy(zero_copy_only=False),
        }).dropna(subset=["_x"])
        df = df[df["_x"] > 0]
        df["_lx"] = np.log(df["_x"].to_numpy())
        df["_n"] = 1
        out = df.groupby(key, as_index=False, sort=False)[["_n", "_lx"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    c = parts.groupby(key, as_index=False, sort=False)[["_n", "_lx"]].sum()
    out = pd.DataFrame({
        key: c[key],
        out_col: np.exp(c["_lx"].to_numpy() / c["_n"].to_numpy(np.float64)),
    })
    if ndigits is not None:
        out[out_col] = out[out_col].round(ndigits)
    return out.sort_values(key, kind="mergesort").reset_index(drop=True)


def grouped_median_mad(ds, key: str, val: str, ndigits: int | None = 6
                       ) -> pd.DataFrame:
    """Per-key median and MAD (median absolute deviation) — the robust
    location/scale profile (SQL twins median() / mad(), both with
    midpoint interpolation on even counts).

    Rides the shared histogram-bisection selector
    (`selection.grouped_kth_smallest_multi`): two grouped multi-rank
    selections — the median's two middle ranks, then the same ranks
    over |v − median[key]| derived on the fly per pass — each a few
    streaming scans with O(#keys × ranks) driver state. No
    `map_groups`, no all-to-all of raw rows (the r3 version was the
    suite's last per-group-Python aggregate). Nulls excluded per key;
    SQL midpoint semantics on even counts."""
    import pandas as _pd

    from webvalid.ops.selection import grouped_kth_smallest_multi

    def mid_ranks(n: int) -> list[int]:
        return [(n + 1) // 2, n // 2 + 1]

    med2 = grouped_kth_smallest_multi(ds, key, val, mid_ranks)
    # a key whose values are all null maps to [] -> NaN row (SQL GROUP
    # BY keeps the group with NULL median/mad; dropping it would emit
    # fewer rows than the oracle)
    med = {k: (v[0] + v[1]) / 2.0 if v else float("nan")
           for k, v in med2.items()}
    med_index = _pd.Index(sorted(med))
    med_vals = np.array([med[k] for k in med_index], np.float64)

    def absdev(keys_np: np.ndarray, x: np.ndarray) -> np.ndarray:
        idx = med_index.get_indexer(keys_np)
        safe = np.clip(idx, 0, None)
        centered = np.abs(x - med_vals[safe])
        return np.where(idx >= 0, centered, np.nan)

    mad2 = grouped_kth_smallest_multi(ds, key, val, mid_ranks,
                                      value_fn=absdev)
    rows = []
    for k in sorted(med):
        v = mad2.get(k, [])
        m = med[k]
        d = (v[0] + v[1]) / 2.0 if v else float("nan")
        if ndigits is not None and not (np.isnan(m) or np.isnan(d)):
            m, d = round(m, ndigits), round(d, ndigits)
        rows.append({key: k, "median": m, "mad": d})
    return pd.DataFrame(rows)


def winsorized_mean(ds, key: str, val: str, q_lo: float = 0.05,
                    q_hi: float = 0.95, out_col: str = "wmean",
                    count_col: str = "n",
                    ndigits: int | None = 6) -> pd.DataFrame:
    """Per-key mean of `val` after winsorizing at the GLOBAL exact
    interpolated [q_lo, q_hi] quantiles (PERCENTILE_CONT semantics via
    `ops/selection.exact_quantile_cont` — histogram bisection, no
    sort). The two fences are answer-sized scalars broadcast into a
    clip-and-sum two-phase aggregate, so the whole op is streaming
    passes + an O(#groups) combine. SQL twin:
    AVG(LEAST(GREATEST(val, lo), hi)) GROUP BY key.

    Rounds after a +1e-9 nudge (see `impute_group_mean_events`):
    summation-order float residue must not straddle a round boundary
    differently across engines."""
    from webvalid.ops.selection import exact_quantile_cont

    fences = exact_quantile_cont(ds, val, [q_lo, q_hi], ndigits=None)
    lo, hi = float(fences["value"].iloc[0]), float(fences["value"].iloc[1])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: t[key].to_numpy(zero_copy_only=False),
            "_x": t[val].to_numpy(zero_copy_only=False),
        }).dropna(subset=["_x"])
        df["_x"] = np.clip(df["_x"].to_numpy(), lo, hi)
        df["_n"] = 1
        out = df.groupby(key, as_index=False, sort=False)[["_n", "_x"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    c = parts.groupby(key, as_index=False, sort=False)[["_n", "_x"]].sum()
    out = pd.DataFrame({
        key: c[key],
        out_col: c["_x"].to_numpy() / c["_n"].to_numpy(np.float64),
        count_col: c["_n"].astype(np.int64),
    })
    if ndigits is not None:
        out[out_col] = (out[out_col] + 1e-9).round(ndigits)
    return out.sort_values(key, kind="mergesort").reset_index(drop=True)


def grouped_regr_slope(ds, key: str, x: str, y: str,
                       slope_col: str = "slope",
                       icept_col: str = "icept", count_col: str = "n",
                       ndigits: int | None = 6) -> pd.DataFrame:
    """Per-key least-squares line of y on x over non-null pairs —
    the numeric trend/drift primitive (e.g. value vs hours-since-t0
    per event type). Mergeable (n, Σx, Σy, Σxy, Σxx) partials; the
    driver closes slope = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) and
    intercept = (Σy − slope·Σx)/n, the explicit-sums formula the SQL
    oracle states verbatim (NOT regr_slope, whose accumulation order
    differs). Callers should pre-center x (small-magnitude ints) so
    Σx/Σxx are float64-exact and cancellation is benign; outputs round
    after a +1e-9 nudge. Keys with zero x-variance get null slope
    (SQL NULLIF semantics)."""
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: t[key].to_numpy(zero_copy_only=False),
            "_x": t[x].to_numpy(zero_copy_only=False).astype(np.float64),
            "_y": t[y].to_numpy(zero_copy_only=False).astype(np.float64),
        }).dropna(subset=["_x", "_y"])
        df["_n"] = 1
        df["_xy"] = df["_x"] * df["_y"]
        df["_xx"] = df["_x"] * df["_x"]
        out = df.groupby(key, as_index=False, sort=False)[
            ["_n", "_x", "_y", "_xy", "_xx"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    c = parts.groupby(key, as_index=False, sort=False)[
        ["_n", "_x", "_y", "_xy", "_xx"]].sum()
    n = c["_n"].to_numpy(np.float64)
    sx, sy = c["_x"].to_numpy(), c["_y"].to_numpy()
    sxy, sxx = c["_xy"].to_numpy(), c["_xx"].to_numpy()
    den = n * sxx - sx * sx
    with np.errstate(invalid="ignore", divide="ignore"):
        slope = np.where(den == 0, np.nan, (n * sxy - sx * sy) / den)
        icept = (sy - slope * sx) / n
    out = pd.DataFrame({key: c[key], slope_col: slope, icept_col: icept,
                        count_col: c["_n"].astype(np.int64)})
    if ndigits is not None:
        out[slope_col] = (out[slope_col] + 1e-9).round(ndigits)
        out[icept_col] = (out[icept_col] + 1e-9).round(ndigits)
    return out.sort_values(key, kind="mergesort").reset_index(drop=True)


def chi2_independence(ds, key_a: str, key_b: str,
                      ndigits: int | None = 6) -> pd.DataFrame:
    """Chi-squared test of independence on the (key_a × key_b)
    contingency table, plus Cramér's V — the categorical-association
    drift primitive (is lang independent of source?). Two-phase
    (a, b) count partials; the table math is answer-sized driver
    work. Expected counts row_tot·col_tot/n; dof (R−1)(C−1).
    SQL twin: the same sums stated explicitly. Rounds after a +1e-9
    nudge."""
    comb = _keyval_counts(ds, key_a, key_b)
    pivot = comb.pivot_table(index=key_a, columns=key_b, values="_c",
                             fill_value=0, aggfunc="sum")
    obs = pivot.to_numpy(np.float64)
    n = obs.sum()
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    exp = row @ col / n
    with np.errstate(invalid="ignore", divide="ignore"):
        terms = np.where(exp > 0, (obs - exp) ** 2 / exp, 0.0)
    stat = float(terms.sum())
    r, c = obs.shape
    dof = (r - 1) * (c - 1)
    v = float(np.sqrt(stat / (n * min(r - 1, c - 1)))) \
        if min(r, c) > 1 and n > 0 else float("nan")
    from webvalid.sketches import chi2_sf

    p = chi2_sf(stat, dof)
    out = pd.DataFrame({"chi2": [stat], "dof": [dof], "cramers_v": [v],
                        "p_value": [p]})
    if ndigits is not None:
        for col_ in ("chi2", "cramers_v"):
            out[col_] = (out[col_] + 1e-9).round(ndigits)
        out["p_value"] = (out["p_value"] + 1e-9).round(ndigits)
    return out


def grouped_harmonic_mean(ds, key: str, val: str, out_col: str = "hmean",
                          ndigits: int | None = 6) -> pd.DataFrame:
    """Per-key harmonic mean of positive `val` rows: n / Σ(1/x), the
    SQL twin COUNT(x)/SUM(1/x) (non-positive and null rows excluded,
    matching the geomean contract)."""
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: t[key].to_numpy(zero_copy_only=False),
            "_x": t[val].to_numpy(zero_copy_only=False),
        }).dropna(subset=["_x"])
        df = df[df["_x"] > 0]
        df["_inv"] = 1.0 / df["_x"].to_numpy()
        df["_n"] = 1
        out = df.groupby(key, as_index=False, sort=False)[["_n", "_inv"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    c = parts.groupby(key, as_index=False, sort=False)[["_n", "_inv"]].sum()
    out = pd.DataFrame({
        key: c[key],
        out_col: c["_n"].to_numpy(np.float64) / c["_inv"].to_numpy(),
    })
    if ndigits is not None:
        out[out_col] = (out[out_col] + 1e-9).round(ndigits)
    return out.sort_values(key, kind="mergesort").reset_index(drop=True)


def ranksum_test(ds, val_col: str, flag_col: str,
                 ndigits: int | None = 6) -> pd.DataFrame:
    """Mann-Whitney U (rank-sum) test of the flagged rows' `val_col`
    distribution vs the rest — the nonparametric numeric-drift
    primitive. Tie-averaged ranks, tie-corrected normal approximation,
    no continuity correction (the SQL twin states the identical
    closed form).

    Two-phase (value, flag) count partials — the usual bounded-domain
    profile contract — then answer-sized driver rank math: avg rank
    per distinct value = rows-before + (t+1)/2; U₁ = R₁ − n₁(n₁+1)/2;
    z = (U₁ − n₁n₂/2) / √(n₁n₂/12 · ((N+1) − Σ(t³−t)/(N(N−1))))."""
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "_v": t[val_col].to_numpy(zero_copy_only=False),
            "_f": t[flag_col].to_numpy(zero_copy_only=False).astype(bool),
        }).dropna(subset=["_v"])
        df["_n1"] = df["_f"].astype(np.int64)
        df["_t"] = 1
        out = df.groupby("_v", as_index=False, sort=False)[["_n1", "_t"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    c = parts.groupby("_v", as_index=False, sort=False)[["_n1", "_t"]].sum() \
             .sort_values("_v", kind="mergesort")
    tv = c["_t"].to_numpy(np.float64)
    n1v = c["_n1"].to_numpy(np.float64)
    before = np.concatenate([[0.0], np.cumsum(tv)[:-1]])
    avgrank = before + (tv + 1.0) / 2.0
    r1 = float((n1v * avgrank).sum())
    n1 = float(n1v.sum())
    n = float(tv.sum())
    n2 = n - n1
    tie = float((tv * tv * tv - tv).sum())
    u1 = r1 - n1 * (n1 + 1.0) / 2.0
    var = n1 * n2 / 12.0 * ((n + 1.0) - tie / (n * (n - 1.0)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var) if var > 0 else float("nan")
    out = pd.DataFrame({"u1": [u1], "n1": [int(n1)], "n2": [int(n2)],
                        "z": [z]})
    if ndigits is not None:
        out["u1"] = (out["u1"] + 1e-9).round(ndigits)
        out["z"] = (out["z"] + 1e-9).round(ndigits)
    return out


def mutual_information(ds, key_a: str, key_b: str,
                       ndigits: int | None = 6) -> pd.DataFrame:
    """Mutual information I(A;B) in nats over the (A × B) contingency
    table, plus the normalized variant I/√(H(A)·H(B)) — the
    information-theoretic association score next to chi²'s
    significance. Same two-phase count partials; zero-count cells
    contribute 0. SQL twin states the identical sum."""
    comb = _keyval_counts(ds, key_a, key_b)
    pivot = comb.pivot_table(index=key_a, columns=key_b, values="_c",
                             fill_value=0, aggfunc="sum")
    obs = pivot.to_numpy(np.float64)
    n = obs.sum()
    p = obs / n
    pa_ = p.sum(axis=1, keepdims=True)
    pb = p.sum(axis=0, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        terms = np.where(p > 0, p * np.log(p / (pa_ * pb)), 0.0)
        mi = float(terms.sum())
        ha = float(-(pa_[pa_ > 0] * np.log(pa_[pa_ > 0])).sum())
        hb = float(-(pb[pb > 0] * np.log(pb[pb > 0])).sum())
    nmi = mi / math.sqrt(ha * hb) if ha > 0 and hb > 0 else float("nan")
    out = pd.DataFrame({"mi": [mi], "nmi": [nmi]})
    if ndigits is not None:
        out["mi"] = (out["mi"] + 1e-9).round(ndigits)
        out["nmi"] = (out["nmi"] + 1e-9).round(ndigits)
    return out


def grouped_distinct_hll(ds, key: str, val: str, p: int = 12):
    """Per-group approximate COUNT(DISTINCT val) via mergeable HLL
    partials — the bounded-memory route when exact per-group distinct
    (a (key, val)-domain shuffle or distinct-pairs pass) is too big.

    One streaming pass: each block emits one (key, registers) row per
    in-block group — registers are 2**p bytes, built with ONE flat
    `np.maximum.at` over (group_code * m + idx) so there is no per-row
    or per-group Python in the hot path (kernel shared with the global
    HLL via sketches.hll_idx_rank). The driver folds partials with
    elementwise max. Contract: #groups × 2**p bytes fits the driver —
    the same vocabulary-sized-partials trade as the rest of this
    module; rows never leave the workers.

    Returns DataFrame (key, distinct_est: float). Null vals are
    ignored (SQL COUNT(DISTINCT) semantics); null keys form their own
    group (SQL GROUP BY semantics).
    """
    from webvalid.sketches import HyperLogLog, hash64, hll_idx_rank

    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        g = t[key].to_numpy(zero_copy_only=False)
        v = t[val].to_numpy(zero_copy_only=False)
        if v.dtype == object:
            ok = np.asarray([x is not None for x in v], bool)
        else:
            ok = ~pd.isna(v)
        empty = pa.table({key: t[key].slice(0, 0),
                          "_regs": pa.array([], pa.binary())})
        if not ok.any():
            return empty
        codes, uniques = pd.factorize(g[ok], use_na_sentinel=False)
        # canonical hash dtype: a nullable int column arrives float64
        # in null-bearing blocks and int64 elsewhere, and
        # hash64(int 5) != hash64(float 5.0) — the same value would
        # count twice. Float64 is exact below 2^53; above it distinct
        # ints can collide into one double (an under-count, acceptable
        # for an approximate-distinct sketch and shared with the
        # column-stats hash path).
        vv = v[ok]
        if vv.dtype.kind in "iub":
            vv = vv.astype(np.float64)
        idx, rank = hll_idx_rank(hash64(vv), p)
        regs = np.zeros(len(uniques) * m, dtype=np.uint8)
        np.maximum.at(regs, codes.astype(np.int64) * m + idx, rank)
        return pa.table({
            # from_pandas: factorize surfaces null keys as NaN — map
            # them back to Arrow nulls (null keys are their own group)
            key: pa.array(list(uniques), type=t[key].type,
                          from_pandas=True),
            "_regs": pa.array([regs[i * m:(i + 1) * m].tobytes()
                               for i in range(len(uniques))], pa.binary()),
        })

    merged: dict = {}
    for row in ds.map_batches(partial, batch_format="pyarrow") \
                 .iter_rows():
        k, blob = row[key], row["_regs"]
        regs = np.frombuffer(blob, dtype=np.uint8)
        if k in merged:
            np.maximum(merged[k], regs, out=merged[k])
        else:
            merged[k] = regs.copy()
    rows = [{key: k,
             "distinct_est": HyperLogLog(p=p, registers=regs).estimate()}
            for k, regs in merged.items()]
    return pd.DataFrame(rows, columns=[key, "distinct_est"]) \
        .sort_values(key, kind="mergesort").reset_index(drop=True)
