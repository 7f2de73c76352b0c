"""Distributed set operations on key columns: EXCEPT / INTERSECT.

Two strategies with tested-equal results:

- `driver` (default for modest key domains): each batch emits its
  DISTINCT keys (a vocabulary-sized partial, never the rows), the
  driver unions the partials per side and finishes with one
  np.setdiff1d / np.intersect1d. Moves O(|distinct keys|), not O(rows).
- `shuffle` (unbounded key domains): each side's batches emit distinct
  (key, in_a, in_b) presence partials; the union groupby-sums the
  presence flags so every key lands on one reducer, and the filter
  `in_a > 0 AND in_b == 0` (EXCEPT) / `both > 0` (INTERSECT) never
  touches a driver-side set. Driver memory is O(result).

NULL keys are dropped on both sides (documented deviation from SQL
EXCEPT, which treats NULL as a regular value; the engine's key columns
are non-null by schema contract).

No reference analogue; north-rule/training-data addition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _distinct_partial(col: str, in_a: int, in_b: int):
    def fn(t: pa.Table) -> pa.Table:
        vals = pc.unique(pc.drop_null(t[col].combine_chunks()
                                      if isinstance(t[col], pa.ChunkedArray)
                                      else t[col]))
        n = len(vals)
        return pa.table({
            col: vals,
            "in_a": pa.array(np.full(n, in_a, np.int64)),
            "in_b": pa.array(np.full(n, in_b, np.int64)),
        })
    return fn


def set_op_keys(a_ds, b_ds, col: str, op: str = "except",
                strategy: str = "driver") -> pd.DataFrame:
    """DISTINCT keys of `a_ds` EXCEPT/INTERSECT those of `b_ds`.

    Returns a one-column DataFrame named `col`, sorted ascending.
    """
    if op not in ("except", "intersect"):
        raise ValueError("op must be 'except' or 'intersect'")
    if col in ("in_a", "in_b", "sum(in_a)", "sum(in_b)"):
        raise ValueError(f"key column name {col!r} collides with the "
                         f"presence-flag columns — rename it upstream")
    if strategy == "driver":
        def side(ds):
            parts = ds.map_batches(_distinct_partial(col, 1, 0),
                                   batch_format="pyarrow").to_pandas()
            return np.unique(parts[col].to_numpy())

        a, b = side(a_ds), side(b_ds)
        vals = np.setdiff1d(a, b) if op == "except" else np.intersect1d(a, b)
        return pd.DataFrame({col: vals})
    if strategy != "shuffle":
        raise ValueError("strategy must be 'driver' or 'shuffle'")

    tagged = a_ds.map_batches(_distinct_partial(col, 1, 0),
                              batch_format="pyarrow").union(
        b_ds.map_batches(_distinct_partial(col, 0, 1), batch_format="pyarrow")
    )
    presence = tagged.groupby(col).sum(["in_a", "in_b"])

    def keep(t: pa.Table) -> pa.Table:
        a = pc.greater(t["sum(in_a)"], 0)
        b = t["sum(in_b)"]
        m = pc.and_(a, pc.equal(b, 0)) if op == "except" else \
            pc.and_(a, pc.greater(b, 0))
        return t.filter(m)

    out = presence.map_batches(keep, batch_format="pyarrow").to_pandas()
    return (out[[col]].sort_values(col, kind="mergesort")
            .reset_index(drop=True))
