"""Cohort retention analysis — the classic product-analytics matrix.

Cohort = a user's first active day; each cell (cohort_day, day_offset)
counts the distinct users of that cohort active exactly `offset` days
after their first day.

Scale shape: pass 1 is a two-phase MIN(day) per user (O(#users)
partials, no shuffle); the (sorted user ids, first day) pair is a
zero-copy broadcast (`ray.put` of two int64 arrays, resolved per batch
with searchsorted — the repo's standard small-side join). Pass 2 emits
per-batch DISTINCT (cohort, offset, user) triples — bounded by
users × active-days, the usual profile-smaller-than-data contract —
and the driver's final distinct + count is answer-sized.

Days are integer epoch days via TRUNCATING division (toward zero),
matching DuckDB's integer `//` exactly — numpy's floor division
diverges on pre-1970 (negative-epoch) timestamps, which is precisely
the kind of edge a web-crawl corpus contains. SQL semantics
throughout: a NULL user id is its own user (GROUP BY keeps it).

No reference analogue; training-data/analytics addition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

_DAY_US = 86_400_000_000


def _day_col(t: pa.Table, ts_col: str) -> np.ndarray:
    # normalize to µs first: pandas-backed blocks carry timestamp[ns]
    us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    # TRUNC toward zero (DuckDB integer division), not numpy floor:
    # -1 µs must land on day 0, like the SQL oracle computes it
    return np.where(us >= 0, us // _DAY_US, -((-us) // _DAY_US))


def first_day_per_user(ds, key: str, ts_col: str) -> pd.DataFrame:
    """(key, cohort_day) via mergeable per-batch MIN partials.
    NULL keys form their own user (SQL GROUP BY semantics)."""
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: t[key].to_numpy(zero_copy_only=False),
                           "_d": _day_col(t, ts_col)})
        out = df.groupby(key, as_index=False, sort=False, dropna=False)["_d"] \
                .min()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0 or key not in parts.columns:
        # all-empty blocks arrive column-less from Ray — the oracle's
        # answer is simply the empty set
        return pd.DataFrame({key: pd.Series([], dtype=object),
                             "cohort_day": pd.Series([], dtype="int64")})
    return parts.groupby(key, as_index=False, sort=False, dropna=False)["_d"] \
                .min().rename(columns={"_d": "cohort_day"})


def retention_matrix(ds, key: str, ts_col: str) -> pd.DataFrame:
    """(cohort_day, day_offset, n_users) — distinct users of each
    cohort active at each day offset (offset 0 row = cohort size)."""
    first = first_day_per_user(ds, key, ts_col)
    empty = pd.DataFrame({"cohort_day": pd.Series([], dtype="int64"),
                          "day_offset": pd.Series([], dtype="int64"),
                          "n_users": pd.Series([], dtype="int64")})
    if len(first) == 0:
        return empty
    # split the (at most one) NULL-user row out of the searchsorted
    # side: argsort/searchsorted can't order None/NaN ids portably
    isna = first[key].isna()
    null_day = (int(first.loc[isna, "cohort_day"].iloc[0])
                if isna.any() else None)
    nn = first[~isna]
    order = np.argsort(nn[key].to_numpy())
    ref = ray.put((nn[key].to_numpy()[order],
                   nn["cohort_day"].to_numpy()[order], null_day))

    def partial(t: pa.Table) -> pa.Table:
        users_sorted, first_day, nday = ray.get(ref)
        ids = t[key].to_numpy(zero_copy_only=False)
        na = pd.isna(ids)
        cohort = np.empty(len(ids), dtype=np.int64)
        if (~na).any():
            pos = np.searchsorted(users_sorted, ids[~na])
            cohort[~na] = first_day[pos]  # non-null ids all present
        if na.any():
            cohort[na] = nday
        day = _day_col(t, ts_col)
        df = pd.DataFrame({"cohort_day": cohort, "day_offset": day - cohort,
                           key: ids}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0 or "cohort_day" not in parts.columns:
        return empty
    distinct = parts.drop_duplicates()
    out = distinct.groupby(["cohort_day", "day_offset"], as_index=False) \
                  .size().rename(columns={"size": "n_users"})
    return out.sort_values(["cohort_day", "day_offset"],
                           kind="mergesort").reset_index(drop=True)


def new_users_daily(ds, key: str, ts_col: str) -> pd.DataFrame:
    """(day, n_new, n_cum): users first seen per day + the cumulative
    distinct-user count over time — answer-sized math on top of the
    `first_day_per_user` partials."""
    first = first_day_per_user(ds, key, ts_col)
    if len(first) == 0:
        return pd.DataFrame({"day": pd.Series([], dtype="int64"),
                             "n_new": pd.Series([], dtype="int64"),
                             "n_cum": pd.Series([], dtype="int64")})
    out = first.groupby("cohort_day", as_index=False).size() \
               .rename(columns={"cohort_day": "day", "size": "n_new"})
    out = out.sort_values("day", kind="mergesort").reset_index(drop=True)
    out["n_cum"] = out["n_new"].cumsum()
    return out
