"""Event-time windowed aggregation over stream-shaped tables.

Ray Data has no native event-time windows or watermarks, so windows
are expressed as data (SURVEY.md §2.9 applied to the `events` table):

- tumbling windows: `window_start = floor(ts / size) * size` computed
  vectorized in `map_batches`, then an ordinary grouped aggregate over
  (key?, window_start) — two-phase, no row shuffle;
- sliding windows: each row replicated into the ceil(size/step)
  windows it belongs to (flat map), then the same grouped aggregate;
- session windows: rows co-located per key (`groupby(key)`), sorted by
  ts inside `map_groups`, and split where the gap exceeds the timeout.
  This is the one genuinely key-partitioned operator here — the
  partitioning assumption is that one key's events fit one group.

All timestamps are epoch microseconds (Arrow timestamp[us] cast).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _ts_us(col) -> pa.ChunkedArray:
    """Normalize any timestamp unit to epoch microseconds (int64)."""
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us"))
    return pc.cast(col, pa.int64())


def add_tumbling_window(batch: pa.Table, ts_col: str, size_us: int,
                        out_col: str = "window_start") -> pa.Table:
    ts = _ts_us(batch[ts_col])
    start = pc.multiply(pc.divide(ts, size_us), size_us)
    return batch.append_column(out_col, start)


def tumbling_aggregate(ds, ts_col: str, size_us: int, keys: list[str],
                       spec: dict) -> pd.DataFrame:
    """Two-phase tumbling-window aggregate: {out: (src, how)} like
    queries.twophase_agg, grouped by [window_start] + keys."""
    from webvalid.queries import twophase_agg

    with_win = ds.map_batches(
        lambda t: add_tumbling_window(t, ts_col, size_us), batch_format="pyarrow"
    )
    need = ["window_start"] + keys + sorted({src for src, _ in spec.values()})
    return twophase_agg(with_win.select_columns(list(dict.fromkeys(need))),
                        ["window_start"] + keys, spec)


def explode_sliding_windows(batch: pa.Table, ts_col: str, size_us: int,
                            step_us: int) -> pa.Table:
    """Replicate each row into every sliding window containing it."""
    ts = _ts_us(batch[ts_col]).to_numpy()
    n_windows = int(np.ceil(size_us / step_us))
    # FLOOR division on purpose: the window grid is the step multiples
    # and membership needs the largest grid point <= ts — floor gives
    # that for negative timestamps too (trunc would assign a pre-1970
    # row to a window that starts after it). The SQL twin's inner join
    # drops empty grid points, so its generate_series lo just needs to
    # reach the engine's lowest window (oracle uses MIN//step - 2).
    last_start = (ts // step_us) * step_us
    parts = []
    for k in range(n_windows):
        start = last_start - k * step_us
        keep = ts < start + size_us
        sub = batch.filter(pa.array(keep))
        if sub.num_rows:
            parts.append(
                sub.append_column("window_start", pa.array(start[keep], pa.int64()))
            )
    return pa.concat_tables(parts) if parts else batch.slice(0, 0).append_column(
        "window_start", pa.array([], pa.int64())
    )


def sliding_aggregate(ds, ts_col: str, size_us: int, step_us: int,
                      keys: list[str], spec: dict) -> pd.DataFrame:
    from webvalid.queries import twophase_agg

    exploded = ds.map_batches(
        lambda t: explode_sliding_windows(t, ts_col, size_us, step_us),
        batch_format="pyarrow",
    )
    need = ["window_start"] + keys + sorted({src for src, _ in spec.values()})
    return twophase_agg(exploded.select_columns(list(dict.fromkeys(need))),
                        ["window_start"] + keys, spec)


def sessionize(ds, key: str, ts_col: str, gap_us: int,
               tiebreak: str | None = None):
    """Session windows per key: gap splitting over (key, ts)-sorted
    blocks. Returns a Dataset of
    (key, session_id, session_start, session_end, n_events).

    Distributed via ops/keyscan.py: ONE range sort, vectorized
    per-block session extraction, and an O(#blocks) driver fold that
    chains each block's open tail session into the next block (a
    session spanning blocks is merged there). Session membership is
    tie-order independent; pass `tiebreak` when (key, ts) can repeat
    so block order is recoverable."""
    from webvalid.ops.keyscan import sessionize_scan

    cols = [key, ts_col] + ([tiebreak] if tiebreak is not None else [])
    return sessionize_scan(ds.select_columns(cols), key, ts_col, gap_us,
                           tiebreak=tiebreak)


def densify_hourly(ds, ts_us_col: str = "ts_us",
                   out_col: str = "cnt"):
    """Gap-filled hourly counts: every hour between the global min and
    max event hour appears, empty hours with count 0 (SQL twin:
    generate_series LEFT JOIN counts). The grid is derived driver-side
    from the O(#hours) two-phase partials — answer-sized, no shuffle."""
    import numpy as np
    import pandas as pd

    HOUR_US = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        h = pc.multiply(pc.divide(t[ts_us_col], HOUR_US), HOUR_US)
        df = pd.DataFrame({"window_start": h.to_numpy(zero_copy_only=False)})
        out = df.groupby("window_start", as_index=False).size() \
                .rename(columns={"size": out_col})
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0 or "window_start" not in parts.columns:
        # all-empty blocks arrive column-less from Ray; the oracle's
        # generate_series over NULL bounds is likewise empty
        return pd.DataFrame({"window_start": pd.Series([], dtype="int64"),
                             out_col: pd.Series([], dtype="int64")})
    counts = parts.groupby("window_start", as_index=False)[out_col].sum()
    grid = pd.DataFrame({"window_start": np.arange(
        counts["window_start"].min(),
        counts["window_start"].max() + HOUR_US, HOUR_US)})
    out = grid.merge(counts, on="window_start", how="left")
    out[out_col] = out[out_col].fillna(0).astype(np.int64)
    return out.reset_index(drop=True)


def windowed_distinct(ds, ts_col: str, id_col: str,
                      bucket_us: int = 3_600_000_000, n_buckets: int = 3
                      ) -> pd.DataFrame:
    """Sliding-window COUNT DISTINCT: for every time bucket present in
    the data, the number of distinct ids seen in the window of the
    `n_buckets` buckets ending there (e.g. trailing-3h active users
    per hour).

    Distinct-over-sliding-windows does not decompose into mergeable
    per-window counts, but it DOES decompose into (bucket, id) pair
    dedup: each batch emits its locally-unique pairs (bounded by
    #buckets × #ids, typically ≪ #rows), the driver dedups globally,
    replicates each pair to the n_buckets windows it affects, and
    counts — all vectorized, nothing but the pair domain ever moves."""
    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # TRUNC toward zero: the SQL twin DEFINES buckets by DuckDB's
        # integer // (trunc); numpy floor would shift every pre-1970
        # event one bucket down from the oracle's definition
        hb = np.where(ts >= 0, ts // bucket_us, -((-ts) // bucket_us))
        df = pd.DataFrame({"_hb": hb,
                           "_id": t[id_col].to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0 or "_hb" not in parts.columns:
        return pd.DataFrame({"window_end": pd.Series([], dtype="int64"),
                             "n_ids": pd.Series([], dtype="int64")})
    pairs = parts.drop_duplicates()
    present = np.sort(pairs["_hb"].unique())
    reps = pd.concat([pairs.assign(_w=pairs["_hb"] + off)
                      for off in range(n_buckets)], ignore_index=True)
    reps = reps[reps["_w"].isin(present)].drop_duplicates(["_w", "_id"])
    out = reps.groupby("_w", as_index=False)["_id"].nunique() \
              .rename(columns={"_w": "window_end", "_id": "n_ids"})
    out["window_end"] = out["window_end"] * bucket_us
    return out.sort_values("window_end", kind="mergesort") \
              .reset_index(drop=True)


def interval_coverage_per_key(ds, key: str, start_us_col: str,
                              dur_us: int, tiebreak: str | None = None):
    """Per-key union length of the intervals [start, start + dur):
    overlapping/touching intervals merge (classic gaps-and-islands on
    the running max end), returning total covered microseconds and the
    merged-interval count. Integer-exact — no rounding.

    Distributed via ops/keyscan.py (reset-aware running max per block,
    O(#blocks) driver island-merge — fixed duration bounds the carry
    to ONE open island). Pass `tiebreak` when (key, start) can repeat.
    Returns a Dataset. SQL twin: the MAX() OVER running-end island
    construction."""
    from webvalid.ops.keyscan import interval_coverage_scan

    return interval_coverage_scan(ds, key, start_us_col, dur_us,
                                  tiebreak=tiebreak)

