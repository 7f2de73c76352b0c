"""Per-key top-N (rank/window family): the deterministic core of
stratified dataset curation — "keep the N best documents per bucket".

Ray Data has no window functions; this is the standard two-phase
decomposition: each batch keeps its local top-N per key (pandas
sort + groupby.head, C-implemented), the driver combines the partials
and takes the final top-N. Partial and final sizes are O(#keys · N) —
the size of the RESULT, so nothing larger than the answer ever moves.
Ties are broken by an explicit `tiebreak` column so results are
deterministic and SQL-oracle-matchable (ROW_NUMBER ... ORDER BY
order_col DESC, tiebreak ASC).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _local_topn(key: str, order_col: str, tiebreak: str, n: int):
    def fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values([order_col, tiebreak], ascending=[False, True],
                            kind="mergesort")
        out = df.groupby(key, sort=False).head(n)
        return pa.Table.from_pandas(out, preserve_index=False)

    return fn


def top_n_per_key(ds, key: str, order_col: str, n: int,
                  tiebreak: str, rank_col: str = "rn") -> pd.DataFrame:
    """Top `n` rows per `key` by `order_col` DESC (ties: `tiebreak`
    ASC), with a 1-based `rank_col`. Returns a pandas DataFrame sorted
    by (key, rank)."""
    partials = ds.map_batches(
        _local_topn(key, order_col, tiebreak, n), batch_format="pyarrow"
    ).to_pandas()
    final = (
        partials.sort_values([order_col, tiebreak], ascending=[False, True],
                             kind="mergesort")
        .groupby(key, sort=False)
        .head(n)
    )
    final = final.sort_values([key, order_col, tiebreak],
                              ascending=[True, False, True], kind="mergesort")
    final[rank_col] = final.groupby(key, sort=False).cumcount() + 1
    return final.reset_index(drop=True)


def rolling_mean_per_key(ds, key: str, order_col: str, value_col: str,
                         window: int, tiebreak: str,
                         out_col: str = "rolling_avg") -> pd.DataFrame:
    """Per-key rolling mean over the trailing `window` rows (ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW), ordered by
    (order_col, tiebreak).

    A rolling frame needs each key's rows co-located and ordered, so
    this uses the real `groupby(key).map_groups` shuffle — the same
    partitioning assumption as sessionization (one key fits one
    group). Inside a group the computation is C-level pandas
    `rolling(...).mean()`. SQL twin: AVG(v) OVER (PARTITION BY key
    ORDER BY order_col, tiebreak ROWS BETWEEN n-1 PRECEDING AND
    CURRENT ROW).
    """
    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([order_col, tiebreak], kind="mergesort")
        g[out_col] = g[value_col].rolling(window, min_periods=1).mean()
        return g

    return ds.groupby(key).map_groups(roll, batch_format="pandas").to_pandas()
