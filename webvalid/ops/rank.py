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

import numpy as np
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
                         out_col: str = "rolling_avg"):
    """Per-key rolling mean over the trailing `window` rows (ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW), ordered by
    (order_col, tiebreak).

    Distributed via ops/keyscan.py (ONE range sort + vectorized
    per-block kernels + O(#blocks) driver carry of each open key's
    last window-1 values) — no per-group Python, no driver
    materialization. Returns a Dataset. SQL twin: AVG(v) OVER
    (PARTITION BY key ORDER BY order_col, tiebreak ROWS BETWEEN n-1
    PRECEDING AND CURRENT ROW)."""
    from webvalid.ops.keyscan import rolling_agg_scan

    return rolling_agg_scan(ds, key, order_col, tiebreak, value_col,
                            window, {out_col: "mean"})

def lag_per_key(ds, key: str, order_col: str, value_col: str,
                tiebreak: str, n: int = 1,
                out_col: str = "lagged"):
    """Per-key LAG(value, n): the value n rows earlier in (order_col,
    tiebreak) order, null for the first n rows of each key.
    Distributed via ops/keyscan.py (carry = open key's last n values);
    returns a Dataset."""
    from webvalid.ops.keyscan import lag_scan

    return lag_scan(ds, key, order_col, tiebreak, value_col, n=n,
                    out_col=out_col)

def cumsum_per_key(ds, key: str, order_col: str, value_col: str,
                   tiebreak: str, out_col: str = "cum_sum"):
    """Per-key running total (SUM ... OVER (PARTITION BY key ORDER BY
    order_col, tiebreak ROWS UNBOUNDED PRECEDING)). Distributed via
    ops/keyscan.py: carry = one float per open key, folded with one
    add per block — cross-block accumulation groups differently than a
    single scan, so callers compare with the repo's +1e-9 nudged round.
    Returns a Dataset."""
    from webvalid.ops.keyscan import cumsum_scan

    return cumsum_scan(ds, key, order_col, tiebreak, value_col,
                       out_col=out_col)

def global_row_number(ds, by: list[str], descending: list[bool] | bool,
                      rank_col: str = "rn"):
    """Distributed zipWithIndex: total-order rank over the whole dataset.

    `by` MUST be a unique composite key (pass a tiebreak column last) —
    uniqueness is what makes the sorted blocks' ranges disjoint, which
    this decomposition relies on:

    1. `ds.sort(by)` range-partitions (the one unavoidable all-to-all),
       materialized so both passes see identical blocks.
    2. Pass 1 emits one tiny partial per BLOCK — its first-row key and
       row count. The driver sorts the O(#blocks) partials the same way
       and prefix-sums counts into per-block rank offsets.
    3. Pass 2 re-maps each block: rank = its offset + arange(len). The
       offset map is broadcast once (it is #blocks entries).

    Nothing but the answer's sort moves; driver state is O(#blocks).
    Returns a Dataset with `rank_col` added (1-based).
    """
    if isinstance(descending, bool):
        descending = [descending] * len(by)
    sorted_ds = ds.sort(by, descending=descending).materialize()

    def head_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: t[c].slice(0, 0) for c in by} |
                            {"_cnt": pa.array([], pa.int64())})
        first = t.slice(0, 1)
        return pa.table({c: first[c] for c in by} |
                        {"_cnt": pa.array([t.num_rows], pa.int64())})

    heads = sorted_ds.map_batches(head_partial, batch_size=None,
                                  batch_format="pyarrow").to_pandas()
    heads = heads.sort_values(by, ascending=[not d for d in descending],
                              kind="mergesort").reset_index(drop=True)
    if heads.duplicated(subset=by).any():
        raise ValueError("global_row_number needs a unique `by` composite "
                         "(add a tiebreak column) — duplicate block heads "
                         "mean key ranges overlap")
    offsets = heads["_cnt"].cumsum().shift(fill_value=0)
    key_to_off = {tuple(row): int(off) for row, off in
                  zip(heads[by].itertuples(index=False), offsets)}
    import ray as _ray
    off_ref = _ray.put(key_to_off)

    def number(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(rank_col, pa.array([], pa.int64()))
        first = tuple(t[c][0].as_py() for c in by)
        off = _ray.get(off_ref)[first]
        rn = np.arange(off + 1, off + 1 + t.num_rows, dtype=np.int64)
        return t.append_column(rank_col, pa.array(rn))

    return sorted_ds.map_batches(number, batch_size=None,
                                 batch_format="pyarrow")


def global_ntile(ds, by: list[str], descending: list[bool] | bool,
                 k: int, bucket_col: str = "bucket"):
    """SQL NTILE(k) over the whole dataset: global_row_number's sorted
    blocks + offsets, with ranks mapped to k near-equal buckets (the
    first n % k buckets take the extra row, as SQL does). Same unique
    composite `by` contract; returns a Dataset with `bucket_col`."""
    ranked = global_row_number(ds, by, descending, rank_col="__rn")
    # count is O(#blocks) metadata on the materialized sort
    n = ranked.count()
    q, r = divmod(n, k)

    def bucketize(t: pa.Table) -> pa.Table:
        rn = t["__rn"].to_numpy()
        cut = r * (q + 1)
        b = np.where(rn <= cut,
                     (rn - 1) // (q + 1),
                     r + (rn - cut - 1) // max(q, 1)) + 1
        out = t.drop_columns(["__rn"])
        return out.append_column(bucket_col, pa.array(b.astype(np.int64)))

    return ranked.map_batches(bucketize, batch_size=None,
                              batch_format="pyarrow")


def lead_per_key(ds, key: str, order_col: str, value_col: str,
                 tiebreak: str, n: int = 1,
                 out_col: str = "led"):
    """Per-key LEAD(value, n) — the value n rows LATER in (order_col,
    tiebreak) order, null for each key's last n rows. Distributed via
    ops/keyscan.py with a REVERSE fold (carry flows from each block's
    head into the previous block's tail); returns a Dataset."""
    from webvalid.ops.keyscan import lead_scan

    return lead_scan(ds, key, order_col, tiebreak, value_col, n=n,
                     out_col=out_col)

def dense_rank_per_key(ds, key: str, order_col: str, tiebreak: str,
                       descending: bool = False, out_col: str = "drank"):
    """Per-key DENSE_RANK() by order_col (ties share a rank, no gaps).

    Built for HIGH-cardinality keys, where `groupby(key).map_groups`
    pays a Python call per group (measured: 150k 4-row groups → 60 s;
    this path → ~2 s): one global sort by (key, order, tiebreak) —
    `tiebreak` makes block heads unique so block order is recoverable —
    then ranks are computed per BLOCK with a vectorized run-count
    kernel, and blocks that continue a key from the previous block get
    a driver-stitched offset. The stitch state is O(#blocks): each
    block's partial carries only its boundary (head/tail key+value)
    and head/tail distinct counts. Returns a Dataset with `out_col`.
    """
    by = [key, order_col, tiebreak]
    desc = [False, descending, False]
    sorted_ds = ds.sort(by, descending=desc).materialize()

    def _cols(t: pa.Table):
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[order_col].to_numpy(zero_copy_only=False)
        return k, v

    def _local(k: np.ndarray, v: np.ndarray):
        """(key_id per row, dense rank per row within this block)."""
        n = len(k)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = k[1:] != k[:-1]
        new_val = new_key.copy()
        new_val[1:] |= v[1:] != v[:-1]
        c = np.cumsum(new_val)
        key_id = np.cumsum(new_key) - 1
        start_c = c[np.flatnonzero(new_key)]
        return key_id, c - start_c[key_id] + 1

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: t[c].slice(0, 0) for c in by} | {
                "_n_head": pa.array([], pa.int64()),
                "_n_tail": pa.array([], pa.int64()),
                "_single": pa.array([], pa.bool_()),
                "_tail_key": t[key].slice(0, 0),
                "_tail_val": t[order_col].slice(0, 0),
            })
        k, v = _cols(t)
        key_id, rank = _local(k, v)
        head = t.slice(0, 1)
        n_head = int(rank[key_id == 0].max())
        n_tail = int(rank[key_id == key_id[-1]].max())
        return pa.table({c: head[c] for c in by} | {
            "_n_head": pa.array([n_head], pa.int64()),
            "_n_tail": pa.array([n_tail], pa.int64()),
            "_single": pa.array([bool(key_id[-1] == 0)]),
            "_tail_key": t[key].slice(t.num_rows - 1, 1),
            "_tail_val": t[order_col].slice(t.num_rows - 1, 1),
        })

    heads = sorted_ds.map_batches(partial, batch_size=None,
                                  batch_format="pyarrow").to_pandas()
    heads = heads.sort_values(by, ascending=[not d for d in desc],
                              kind="mergesort").reset_index(drop=True)
    if heads.duplicated(subset=by).any():
        raise ValueError("dense_rank_per_key needs a unique "
                         "(key, order, tiebreak) composite to recover "
                         "block order")
    by_arrays = [heads[c].to_numpy() for c in by]
    n_head_a = heads["_n_head"].to_numpy()
    n_tail_a = heads["_n_tail"].to_numpy()
    single_a = heads["_single"].to_numpy()
    tail_key_a = heads["_tail_key"].to_numpy()
    tail_val_a = heads["_tail_val"].to_numpy()
    offsets: dict = {}
    cur_key = cur_last_val = None
    cur_distinct = 0
    for i in range(len(heads)):  # O(#blocks), driver-side
        head_tuple = tuple(a[i] for a in by_arrays)
        if cur_key is not None and head_tuple[0] == cur_key:
            dup = head_tuple[1] == cur_last_val
            off = cur_distinct - (1 if dup else 0)
        else:
            off = 0
        offsets[head_tuple] = off
        if single_a[i] and head_tuple[0] == cur_key:
            cur_distinct = off + int(n_head_a[i])
        elif single_a[i]:
            cur_distinct = int(n_head_a[i])
        else:
            cur_distinct = int(n_tail_a[i])
        cur_key = tail_key_a[i]
        cur_last_val = tail_val_a[i]
    import ray as _ray
    off_ref = _ray.put(offsets)

    def number(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        k, v = _cols(t)
        key_id, rank = _local(k, v)
        head_tuple = tuple(t[c][0].as_py() for c in by)
        off = _ray.get(off_ref)[head_tuple]
        rank = rank.astype(np.int64)
        rank[key_id == 0] += off
        return t.append_column(out_col, pa.array(rank))

    return sorted_ds.map_batches(number, batch_size=None,
                                 batch_format="pyarrow")


def rank_per_key(ds, key: str, order_col: str, tiebreak: str,
                 descending: bool = False, out_col: str = "rnk"):
    """Per-key RANK() by order_col (competition rank: ties share a rank,
    gaps follow — rank = #rows of the key with a strictly smaller value
    + 1).

    Same high-cardinality design as dense_rank_per_key: one global sort
    by (key, order, tiebreak), a vectorized per-block kernel, and an
    O(#blocks) driver stitch. The stitch state per key boundary is
    (rows seen so far, global rank of the still-open tail tie group):
    a block continuing a key adds its row-count offset to every local
    rank, and rows tying the previous block's tail value inherit that
    group's already-assigned rank. Returns a Dataset with `out_col`.
    """
    by = [key, order_col, tiebreak]
    desc = [False, descending, False]
    sorted_ds = ds.sort(by, descending=desc).materialize()

    def _cols(t: pa.Table):
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[order_col].to_numpy(zero_copy_only=False)
        return k, v

    def _local(k: np.ndarray, v: np.ndarray):
        """(key_id per row, competition rank per row within block)."""
        n = len(k)
        idx = np.arange(n, dtype=np.int64)
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = k[1:] != k[:-1]
        new_val = new_key.copy()
        new_val[1:] |= v[1:] != v[:-1]
        key_id = np.cumsum(new_key) - 1
        grp_id = np.cumsum(new_val) - 1
        key_start = idx[new_key]
        grp_start = idx[new_val]
        rank = grp_start[grp_id] - key_start[key_id] + 1
        return key_id, rank

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: t[c].slice(0, 0) for c in by} | {
                "_rows_tail": pa.array([], pa.int64()),
                "_single": pa.array([], pa.bool_()),
                "_one_group": pa.array([], pa.bool_()),
                "_tail_grp_rank": pa.array([], pa.int64()),
                "_tail_key": t[key].slice(0, 0),
                "_tail_val": t[order_col].slice(0, 0),
            })
        k, v = _cols(t)
        key_id, rank = _local(k, v)
        head = t.slice(0, 1)
        return pa.table({c: head[c] for c in by} | {
            "_rows_tail": pa.array([int((key_id == key_id[-1]).sum())], pa.int64()),
            "_single": pa.array([bool(key_id[-1] == 0)]),
            "_one_group": pa.array([bool(key_id[-1] == 0 and v[0] == v[-1])]),
            "_tail_grp_rank": pa.array([int(rank[-1])], pa.int64()),
            "_tail_key": t[key].slice(t.num_rows - 1, 1),
            "_tail_val": t[order_col].slice(t.num_rows - 1, 1),
        })

    heads = sorted_ds.map_batches(partial, batch_size=None,
                                  batch_format="pyarrow").to_pandas()
    heads = heads.sort_values(by, ascending=[not d for d in desc],
                              kind="mergesort").reset_index(drop=True)
    if heads.duplicated(subset=by).any():
        raise ValueError("rank_per_key needs a unique (key, order, "
                         "tiebreak) composite to recover block order")
    by_arrays = [heads[c].to_numpy() for c in by]
    rows_tail_a = heads["_rows_tail"].to_numpy()
    single_a = heads["_single"].to_numpy()
    one_group_a = heads["_one_group"].to_numpy()
    tail_grp_rank_a = heads["_tail_grp_rank"].to_numpy()
    tail_key_a = heads["_tail_key"].to_numpy()
    tail_val_a = heads["_tail_val"].to_numpy()
    offsets: dict = {}
    cur_key = cur_last_val = None
    cur_rows = 0          # rows of cur_key seen so far
    cur_tie_rank = 0      # global rank of cur_key's open tail tie group
    for i in range(len(heads)):  # O(#blocks), driver-side
        head_tuple = tuple(a[i] for a in by_arrays)
        continuing = cur_key is not None and head_tuple[0] == cur_key
        tie = continuing and head_tuple[1] == cur_last_val
        off = cur_rows if continuing else 0
        offsets[head_tuple] = (off, cur_tie_rank if tie else -1)
        if single_a[i] and continuing:
            cur_tie_rank = (cur_tie_rank if (one_group_a[i] and tie)
                            else int(tail_grp_rank_a[i]) + off)
            cur_rows = off + int(rows_tail_a[i])
        else:
            cur_tie_rank = int(tail_grp_rank_a[i])
            cur_rows = int(rows_tail_a[i])
        cur_key = tail_key_a[i]
        cur_last_val = tail_val_a[i]
    import ray as _ray
    off_ref = _ray.put(offsets)

    def number(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        k, v = _cols(t)
        key_id, rank = _local(k, v)
        head_tuple = tuple(t[c][0].as_py() for c in by)
        off, head_rank = _ray.get(off_ref)[head_tuple]
        rank = rank.astype(np.int64)
        rank[key_id == 0] += off
        if head_rank >= 0:
            rank[(key_id == 0) & (v == v[0])] = head_rank
        return t.append_column(out_col, pa.array(rank))

    return sorted_ds.map_batches(number, batch_size=None,
                                 batch_format="pyarrow")


def global_cume_dist(ds, by: list[str], descending: list[bool] | bool,
                     out_col: str = "cd"):
    """SQL CUME_DIST() over the whole dataset under a UNIQUE composite
    `by` (pass a tiebreak last): with no peers, cume_dist = rn / n on
    the zipWithIndex rank. Returns a Dataset with `out_col`."""
    ranked = global_row_number(ds, by, descending, rank_col="__rn")
    n = float(ranked.count())

    def cd(t: pa.Table) -> pa.Table:
        rn = t["__rn"].to_numpy()
        vals = rn.astype(np.float64) / n
        return t.drop_columns(["__rn"]).append_column(
            out_col, pa.array(vals, pa.float64()))

    return ranked.map_batches(cd, batch_size=None, batch_format="pyarrow")


def rolling_agg_per_key(ds, key: str, order_col: str, value_col: str,
                        window: int, tiebreak: str,
                        aggs: dict[str, str]):
    """Per-key trailing-window aggregates (ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW) for several reducers at once —
    `aggs` = {out_col: how} with how in mean/sum/min/max. Distributed
    via ops/keyscan.py; returns a Dataset."""
    from webvalid.ops.keyscan import rolling_agg_scan

    return rolling_agg_scan(ds, key, order_col, tiebreak, value_col,
                            window, aggs)

def global_percent_rank(ds, by: list[str], descending: list[bool] | bool,
                        out_col: str = "pr"):
    """SQL PERCENT_RANK() over the whole dataset: (rn - 1) / (n - 1)
    on the zipWithIndex rank (0 for a single row). Same unique
    composite `by` contract; returns a Dataset with `out_col`."""
    ranked = global_row_number(ds, by, descending, rank_col="__rn")
    n = ranked.count()
    denom = float(n - 1) if n > 1 else 1.0

    def pr(t: pa.Table) -> pa.Table:
        rn = t["__rn"].to_numpy()
        vals = (rn - 1).astype(np.float64) / denom
        return t.drop_columns(["__rn"]).append_column(
            out_col, pa.array(vals, pa.float64()))

    return ranked.map_batches(pr, batch_size=None, batch_format="pyarrow")


def first_last_value_per_key(ds, key: str, order_col: str, value_col: str,
                             tiebreak: str):
    """Per-key FIRST_VALUE and LAST_VALUE of `value_col` in (order_col,
    tiebreak) order. Distributed via ops/keyscan.py: after the range
    sort a run's first/last rows ARE the answers — interior keys emit
    from their block, edge keys merge through the O(#blocks) driver
    fold. Returns a Dataset of (key, first_value, last_value)."""
    from webvalid.ops.keyscan import first_last_scan

    return first_last_scan(ds, key, order_col, tiebreak, value_col)


def rate_per_key(ds, key: str, order_col: str, value_col: str,
                 tiebreak: str, out_col: str = "rate"):
    """Per-key rate of change: (value − LAG(value)) / (order −
    LAG(order)), null on the first row of each key and wherever the
    order delta is zero (SQL NULLIF semantics). Deltas are row-local
    pairs, so the keyscan block decomposition is bit-identical to a
    single-series scan. Returns a Dataset."""
    from webvalid.ops.keyscan import rate_scan

    return rate_scan(ds, key, order_col, tiebreak, value_col,
                     out_col=out_col)

def streaks_per_key(ds, key: str, order_col: str, tiebreak: str,
                    val_col: str, max_col: str = "max_streak",
                    runs_col: str = "n_runs"):
    """Per-key gaps-and-islands run stats over `val_col` in
    (order_col, tiebreak) order: length of the longest run of equal
    consecutive values plus the total number of runs. SQL twin: the
    classic ROW_NUMBER() − ROW_NUMBER() OVER (PARTITION BY key, val)
    island construction. Integer outputs — exact, no rounding.

    Distributed via ops/keyscan.py: keys interior to a block emit
    their row from a vectorized reduceat kernel; keys whose runs touch
    a block edge merge through the O(#blocks) driver fold. Returns a
    Dataset."""
    from webvalid.ops.keyscan import streaks_scan

    return streaks_scan(ds, key, order_col, tiebreak, val_col,
                        max_col=max_col, runs_col=runs_col)

def rolling_range_sum_per_key(ds, key: str, order_col: str, value_col: str,
                              tiebreak: str, span: int,
                              out_col: str = "range_sum",
                              ndigits: int | None = 6):
    """Per-key time/RANGE-frame rolling sum: for each row, the sum of
    `value_col` over rows of the same key with order in
    [order − span, order] — SQL RANGE BETWEEN span PRECEDING AND
    CURRENT ROW. Peer rows (equal order values) share one frame, per
    SQL RANGE semantics, so the result is tie-order independent.
    Rounds after a +1e-9 nudge (cross-engine summation order).

    Distributed via ops/keyscan.py: carry = the open key's rows within
    `span` of its tail (bounded by the frame, not the key); in-block
    frames are resolved with ONE searchsorted over a monotonic remap
    of every run. Returns a Dataset."""
    from webvalid.ops.keyscan import rolling_range_sum_scan

    return rolling_range_sum_scan(ds, key, order_col, tiebreak, value_col,
                                  span, out_col=out_col, ndigits=ndigits)

def ewma_per_key(ds, key: str, order_col: str, tiebreak: str,
                 value_col: str, alpha: float, out_col: str = "ewma",
                 ndigits: int | None = 6):
    """Per-key exponential moving average, recursive form
    y₁ = x₁, yᵢ = (1−α)·yᵢ₋₁ + α·xᵢ (pandas ewm(adjust=False)). SQL
    twin: the closed-form weighted sum Σ wᵢⱼ·xⱼ with w = α(1−α)^(i−j)
    (j>1) and (1−α)^(i−1) for j=1; accumulation orders agree to ~1e-12
    relative, so outputs round after a +1e-9 nudge.

    NULL values are DROPPED before the scan (the recursion is defined
    over observed values only) — the SQL twin must filter the same way.
    Distributed via ops/keyscan.py (carry = one float per open key,
    advanced with the closed-form decay). Returns a Dataset."""
    from webvalid.ops.keyscan import ewma_scan

    return ewma_scan(ds, key, order_col, tiebreak, value_col, alpha,
                     out_col=out_col, ndigits=ndigits)
