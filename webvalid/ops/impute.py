"""Missing-value imputation: per-key fill-forward and group-mean fill.

Data-cleaning primitives for training pipelines (sensor/event streams
with gaps, quality columns that fail to compute for some rows):

- `fill_forward_per_key`: LOCF (last observation carried forward)
  within a key's (order, tiebreak) timeline — the SQL twin is
  last_value(x IGNORE NULLS) OVER (PARTITION BY key ORDER BY ...
  ROWS UNBOUNDED PRECEDING).
- `fill_group_mean`: replace nulls with the key's mean — the SQL twin
  is COALESCE(x, AVG(x) OVER (PARTITION BY key)).

Scale shapes: fill-forward needs a key's rows co-located and ordered,
so it rides Ray's hash groupby (one shuffle, same contract as the
other per-key window ops in ops/rank.py); group-mean fill is the
broadcast-the-profile two-pass — a tiny (key, mean) table computed by
streaming partials, shipped into a vectorized scan, no shuffle at all.

No reference analogue; north-rule / training-data additions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def fill_forward_per_key(ds, key: str, order_col: str, tiebreak: str,
                         value_col: str, out_col: str = "filled"):
    """Per-key fill-forward of `value_col` nulls in (order, tiebreak)
    order. Leading nulls (no prior observation) stay null.

    Distributed via ops/keyscan.py (carry = the open key's last
    non-null value — one scalar per block boundary); returns a
    Dataset."""
    from webvalid.ops.keyscan import fill_forward_scan

    return fill_forward_scan(ds, key, order_col, tiebreak, value_col,
                             out_col=out_col)


def fill_group_mean(ds, key: str, value_col: str,
                    out_col: str = "filled", ndigits: int | None = 6):
    """Replace `value_col` nulls with the key's mean over non-null
    rows (keys that are ALL null keep null). Two-phase mean + a
    broadcast vectorized fill pass — streams at any scale where the
    key domain is small."""
    def p1(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: t[key].to_numpy(zero_copy_only=False),
            "_x": t[value_col].to_numpy(zero_copy_only=False),
        }).dropna(subset=["_x"])
        df["_n"] = 1
        out = df.groupby(key, as_index=False, sort=False)[["_n", "_x"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(p1, batch_format="pyarrow").to_pandas()
    c = parts.groupby(key, as_index=False, sort=False)[["_n", "_x"]].sum() \
             .sort_values(key, kind="mergesort")
    gkeys = c[key].to_numpy()
    means = c["_x"].to_numpy() / c["_n"].to_numpy(dtype=np.float64)

    def fill(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(gkeys, k)
        # keys absent from the mean table (all-null groups) keep NaN
        idx = np.clip(idx, 0, len(gkeys) - 1)
        known = gkeys[idx] == k if len(gkeys) else np.zeros(len(k), bool)
        filled = np.where(np.isnan(v) & known, means[idx], v)
        if ndigits is not None:
            filled = np.round(filled, ndigits)
        return t.append_column(out_col, pa.array(filled, pa.float64()))

    return ds.map_batches(fill, batch_format="pyarrow")
