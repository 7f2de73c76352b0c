"""Reshape operators: pivot (long → wide) and unpivot/melt (wide → long).

Pivot is a grouped aggregate whose RESULT is reshaped: per-batch
partials group by (index + pivot column), the driver combines the tiny
partials and pivots — nothing larger than the answer (|index values| ×
|pivot values|) ever moves, so the op is shuffle-free and safe at any
input scale provided the OUTPUT grid is small (the usual crosstab
contract; a huge pivot domain is a modeling error, not an engine path).

Unpivot is a pure streaming map: each batch emits one slice per value
column with a constant `measure` label — no state, no shuffle, output
is k× the input and flows straight through the executor.

No reference analogue; north-rule/training-data additions.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

_COMBINE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def pivot_table(ds, index: list[str], pivot_col: str,
                value_col: str | None = None, how: str = "count",
                fill=0) -> pd.DataFrame:
    """Crosstab of `ds`: one row per `index` combination, one column per
    distinct `pivot_col` value, cells = how(value_col) (count needs no
    value_col). Missing cells filled with `fill`. Columns are the pivot
    values as strings, sorted; rows sorted by `index`."""
    if how not in _COMBINE:
        raise ValueError(f"how must be one of {sorted(_COMBINE)}")
    keys = [*index, pivot_col]
    agg = (pd.NamedAgg(column=pivot_col, aggfunc="size") if how == "count"
           else pd.NamedAgg(column=value_col, aggfunc=how))

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby(keys, as_index=False, sort=False).agg(_cell=agg)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame(columns=index)
    combined = parts.groupby(keys, as_index=False, sort=False).agg(
        _cell=pd.NamedAgg(column="_cell", aggfunc=_COMBINE[how])
    )
    wide = combined.pivot_table(index=index, columns=pivot_col,
                                values="_cell", aggfunc="first")
    wide.columns = [str(c) for c in wide.columns]
    wide = wide[sorted(wide.columns)]
    if fill is not None:
        # preserve integer cells for count/sum over ints
        wide = wide.fillna(fill)
        if how in ("count", "sum") and all(
            pd.api.types.is_numeric_dtype(wide[c]) for c in wide.columns
        ):
            ints = combined["_cell"].dtype.kind in "iu"
            if ints:
                wide = wide.astype("int64")
    return wide.reset_index().sort_values(index, kind="mergesort").reset_index(drop=True)


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_name: str = "measure", value_name: str = "val",
            value_type: pa.DataType | None = None):
    """Melt `value_cols` into (`var_name`, `value_name`) long format —
    one output row per input row per value column. Streaming map; the
    value columns must share (or be castable to) `value_type`."""
    vt = value_type or pa.float64()

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: t[k] for k in id_cols}
            cols[var_name] = pa.array([c] * t.num_rows, pa.string())
            cols[value_name] = t[c].cast(vt)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


def rollup_counts(ds, keys: list[str], out_col: str = "n_rows",
                  all_label: str = "ALL") -> pd.DataFrame:
    """GROUP BY ROLLUP(keys) row counts: one result block per prefix
    level (full keys, then each shorter prefix, then grand total),
    coarser levels re-aggregated DRIVER-SIDE from the finest partials
    — the input is touched once, and nothing larger than the finest
    group count ever moves. Key columns must be non-null strings
    (`all_label` marks rolled-up positions, as COALESCE does in SQL)."""
    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby(keys, as_index=False, sort=False).size() \
                .rename(columns={"size": out_col})
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    finest = parts.groupby(keys, as_index=False, sort=False)[out_col].sum()
    levels = [finest]
    for depth in range(len(keys) - 1, -1, -1):
        lv = (finest.groupby(keys[:depth], as_index=False, sort=False)[out_col]
              .sum() if depth else
              pd.DataFrame({out_col: [finest[out_col].sum()]}))
        for rolled in keys[depth:]:
            lv[rolled] = all_label
        levels.append(lv[keys + [out_col]])
    out = pd.concat(levels, ignore_index=True)
    return out.sort_values(keys, kind="mergesort").reset_index(drop=True)


def cube_counts(ds, keys: list[str], out_col: str = "n_rows",
                all_label: str = "ALL") -> pd.DataFrame:
    """GROUP BY CUBE(keys) row counts: every subset of `keys` as a
    grouping set (2^k levels), all re-aggregated DRIVER-SIDE from one
    finest-partials pass — the input is touched once. Same non-null
    string-key contract as rollup_counts (`all_label` marks rolled-up
    positions, as COALESCE does in SQL)."""
    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby(keys, as_index=False, sort=False).size() \
                .rename(columns={"size": out_col})
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    finest = parts.groupby(keys, as_index=False, sort=False)[out_col].sum()
    levels = []
    for mask in range(1 << len(keys)):
        kept = [k for i, k in enumerate(keys) if mask & (1 << i)]
        lv = (finest.groupby(kept, as_index=False, sort=False)[out_col].sum()
              if kept else
              pd.DataFrame({out_col: [finest[out_col].sum()]}))
        for rolled in keys:
            if rolled not in kept:
                lv[rolled] = all_label
        levels.append(lv[keys + [out_col]])
    out = pd.concat(levels, ignore_index=True)
    return out.sort_values(keys, kind="mergesort").reset_index(drop=True)


def grouped_string_agg(ds, keys: list[str], val_col: str, sep: str = ",",
                       out_col: str = "agg") -> pd.DataFrame:
    """Per-group ordered string concatenation (SQL string_agg(val, sep
    ORDER BY val)), keys and val non-null.

    ONE range sort by (keys, val), then a per-block vectorized run-join:
    key-change boundaries found by adjacent comparison, each run joined
    in a single Arrow `binary_join` kernel call (offset arithmetic — no
    per-group Python, no group-fits-a-worker contract; a group may span
    any number of blocks). Each block emits one FRAGMENT row per key-run
    — O(#groups + #blocks) rows total — and the driver stitches
    fragments with one more vectorized run-join.

    Stitch ordering never consults Ray block order: fragments sort by
    (keys, min_val, max_val). After a global sort, fragments of one key
    in different blocks can overlap only AT a tied value, and tied
    values stringify identically, so any (min, max)-consistent order
    yields the same final string. Value→text uses Arrow cast semantics
    (matches SQL CAST(... AS VARCHAR) for ints/strings)."""
    import numpy as np
    import pyarrow.compute as pc

    sep_s = pa.scalar(sep, pa.large_string())

    def _run_starts(t: pa.Table, cols: list[str]) -> np.ndarray:
        n = t.num_rows
        change = np.zeros(n, bool)
        change[0] = True
        for k in cols:
            a = t[k].combine_chunks().to_numpy(zero_copy_only=False)
            change[1:] |= a[1:] != a[:-1]
        return np.flatnonzero(change)

    def _join_runs(t: pa.Table, starts: np.ndarray, val: str) -> pa.Array:
        offsets = pa.array(np.append(starts, t.num_rows).astype(np.int64))
        vals = pc.cast(t[val].combine_chunks(), pa.large_string())
        return pc.binary_join(
            pa.LargeListArray.from_arrays(offsets, vals), sep_s)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {k: t[k] for k in keys}
                | {"_min": t[val_col], "_max": t[val_col],
                   out_col: pa.array([], pa.large_string())})
        starts = _run_starts(t, keys)
        ends = np.append(starts[1:], t.num_rows) - 1
        return pa.table(
            {k: t[k].take(starts) for k in keys}
            | {"_min": t[val_col].take(starts),
               "_max": t[val_col].take(ends),
               out_col: _join_runs(t, starts, val_col)})

    frags = (ds.sort(keys + [val_col])
               .map_batches(partial, batch_size=None, batch_format="pyarrow")
               .to_pandas())
    if not len(frags):
        return pd.DataFrame(columns=keys + [out_col])
    frags = frags.sort_values(keys + ["_min", "_max"],
                              kind="mergesort").reset_index(drop=True)
    ft = pa.Table.from_pandas(frags, preserve_index=False)
    starts = _run_starts(ft, keys)
    out = pa.table(
        {k: ft[k].take(starts) for k in keys}
        | {out_col: _join_runs(ft, starts, out_col)}).to_pandas()
    return out.sort_values(keys, kind="mergesort").reset_index(drop=True)
