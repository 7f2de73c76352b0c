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

Days are integer epoch days (epoch_us // 86_400_000_000) so both the
engine and the SQL oracle stay in exact integer arithmetic.

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
    return us // _DAY_US


def first_day_per_user(ds, key: str, ts_col: str) -> pd.DataFrame:
    """(key, cohort_day) via mergeable per-batch MIN partials."""
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: t[key].to_numpy(zero_copy_only=False),
                           "_d": _day_col(t, ts_col)})
        out = df.groupby(key, as_index=False, sort=False)["_d"].min()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.groupby(key, as_index=False, sort=False)["_d"].min() \
                .rename(columns={"_d": "cohort_day"})


def retention_matrix(ds, key: str, ts_col: str) -> pd.DataFrame:
    """(cohort_day, day_offset, n_users) — distinct users of each
    cohort active at each day offset (offset 0 row = cohort size)."""
    first = first_day_per_user(ds, key, ts_col)
    order = np.argsort(first[key].to_numpy())
    ref = ray.put((first[key].to_numpy()[order],
                   first["cohort_day"].to_numpy()[order]))

    def partial(t: pa.Table) -> pa.Table:
        users_sorted, first_day = ray.get(ref)
        ids = t[key].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(users_sorted, ids)
        cohort = first_day[pos]  # every id is present by construction
        day = _day_col(t, ts_col)
        df = pd.DataFrame({"cohort_day": cohort, "day_offset": day - cohort,
                           key: ids}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
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
    out = first.groupby("cohort_day", as_index=False).size() \
               .rename(columns={"cohort_day": "day", "size": "n_new"})
    out = out.sort_values("day", kind="mergesort").reset_index(drop=True)
    out["n_cum"] = out["n_new"].cumsum()
    return out
