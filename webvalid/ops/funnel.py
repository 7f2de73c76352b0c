"""Event-funnel conversion: per key, how many A-events are followed by
a B-event within a horizon — the sequence-analytics primitive
(click → purchase, view → signup, …).

Per-key co-location uses the real groupby shuffle (same
one-key-per-group contract as sessionize); inside a group the match is
one vectorized searchsorted of each A timestamp into the key's sorted
B timestamps — no per-event Python, no cross-key state.

No reference analogue; streaming-analytics / north-rule addition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def funnel_conversion(ds, key: str, ts_col: str, type_col: str,
                      from_type: str, to_type: str, horizon: int,
                      n_from_col: str = "n_from",
                      n_conv_col: str = "n_conversions") -> pd.DataFrame:
    """Per `key`: count of `from_type` events and of those having at
    least one `to_type` event with ts in [ts, ts + horizon]. Keys with
    no `from_type` events are omitted (SQL inner-aggregate shape)."""
    def conv(g: pd.DataFrame) -> pd.DataFrame:
        a = np.sort(g.loc[g[type_col] == from_type, ts_col].to_numpy())
        if len(a) == 0:
            return pd.DataFrame({key: [], n_from_col: [], n_conv_col: []})
        b = np.sort(g.loc[g[type_col] == to_type, ts_col].to_numpy())
        if len(b):
            idx = np.searchsorted(b, a, side="left")
            ok = (idx < len(b)) & (b[np.clip(idx, 0, len(b) - 1)] <= a + horizon)
            n_conv = int(ok.sum())
        else:
            n_conv = 0
        return pd.DataFrame({key: [g[key].iloc[0]],
                             n_from_col: [len(a)], n_conv_col: [n_conv]})

    out = ds.groupby(key).map_groups(conv, batch_format="pandas").to_pandas()
    out[n_from_col] = out[n_from_col].astype(np.int64)
    out[n_conv_col] = out[n_conv_col].astype(np.int64)
    return out.sort_values(key).reset_index(drop=True)
