"""As-of join: match each left row to the most recent right row at or
before its timestamp, per key.

Ray Data has no as-of join; the reference has no joins at all
(SURVEY.md §2.4) — this is a north-rule-style addition for event-stream
enrichment (e.g. attribute each click to the user's latest purchase).

Scale shapes:
- broadcast (default here): the right side (already filtered/projected,
  assumed small — one event family, not the corpus) ships once via
  `ray.put`, pre-sorted by (key, ts); each left batch runs ONE
  C-implemented `pandas.merge_asof` — no per-row Python, no shuffle of
  the left side.
- co-partitioned (the 100-TB path when the right side is also huge):
  bucket BOTH sides by `hash(key) % B` with the machinery in
  ops/joins.py, then run the same merge_asof per bucket. The
  partitioning assumption is that each bucket's right slice fits a
  worker — document per use.

Semantics match DuckDB's `ASOF JOIN` with `l.ts >= r.ts` (backward
search, exact matches allowed). Left rows with no prior right row get
nulls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _ts_us_series(s: pd.Series) -> pd.Series:
    if np.issubdtype(s.dtype, np.datetime64):
        return s.astype("datetime64[us]").astype(np.int64)
    return s.astype(np.int64)


class _AsofBatcher:
    """map_batches callable: merge_asof of each left batch against the
    broadcast right table (resolved once per worker)."""

    def __init__(self, right_ref, on: str, by: str, suffix: str):
        right = ray.get(right_ref)
        self.right = right.sort_values([on]).reset_index(drop=True)
        self.on = on
        self.by = by
        self.suffix = suffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        left = batch.to_pandas()
        left[self.on] = _ts_us_series(left[self.on])
        order = left[self.on].argsort(kind="stable").to_numpy()
        left_sorted = left.iloc[order]
        out = pd.merge_asof(
            left_sorted, self.right, on=self.on, by=self.by,
            direction="backward", allow_exact_matches=True,
            suffixes=("", self.suffix),
        )
        return pa.Table.from_pandas(out, preserve_index=False)


def asof_join_broadcast(left_ds, right: pd.DataFrame, on: str, by: str,
                        suffix: str = "_r"):
    """left_ds ASOF-JOIN right on `by` key with `l.on >= r.on`.

    `right` columns other than (on, by) are appended; a right column
    whose name collides with a left column gets `suffix`. The right
    frame's `on` column is normalized to epoch microseconds, as is the
    left's in the output.
    """
    right = right.copy()
    right[on] = _ts_us_series(right[on])
    right_ref = ray.put(right)
    from webvalid.rayutil import task_callable

    return left_ds.map_batches(
        task_callable(_AsofBatcher, right_ref=right_ref, on=on, by=by,
                      suffix=suffix),
        batch_format="pyarrow",
    )
