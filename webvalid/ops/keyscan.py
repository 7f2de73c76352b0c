"""Distributed per-key ordered scans (the dense_rank decomposition).

The per-key window family (rolling frames, lag/lead, running totals,
EWMA, fill-forward, sessionization, run streaks) previously used
`groupby(key).map_groups`, which pays a Python call per group — ruinous
at per-user key cardinality — and returned driver-materialized pandas.
This module generalizes the pattern that fixed `dense_rank_per_key`
(ops/rank.py): ONE global sort by (key, order, tiebreak), a vectorized
per-block partial pass whose output is O(#blocks), a driver fold that
threads bounded carry state from each block's tail into the next
block's head, and a second vectorized per-block pass that applies the
injected carry. Row-level results stay distributed (a Dataset is
returned); the driver holds only #blocks × carry-size state.

Partitioning assumption: none beyond Ray's range sort — a key may span
any number of blocks; the carry (window-1 rows, one float, one open
session, ...) is what crosses the boundary, never the key's rows.

Reference: the reference engine has no window functions (SURVEY.md
§2.6); these ops are north-rule additions for event-stream validation.
"""

from __future__ import annotations

import hashlib
import pickle

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _hid(values) -> str:
    """Stable block identity from its first row's sort-key values."""
    return hashlib.md5(repr(tuple(values)).encode()).hexdigest()


def per_key_scan(ds, by: list[str], partial_fn, fold_fn, apply_fn,
                 pre=None, reverse: bool = False, fold_rev_fn=None):
    """Generic sorted-block scan. Returns (Dataset, driver_rows).

    - `by` = [key, order_col, tiebreak] — must be row-unique (block
      order is recovered by sorting block heads, exactly like
      dense_rank_per_key).
    - `partial_fn(t: pa.Table) -> dict` — small picklable per-block
      summary (bounded carry material only, never the block's rows).
    - `fold_fn(state, part) -> (inject, state, rows)` — driver-side,
      called once per block in sorted order (reversed if `reverse`,
      for lead-style carries), then once more with part=None to flush.
      `rows` (a list of dicts or None) accumulates driver-emitted
      output for ops whose boundary rows close on the driver.
    - `fold_rev_fn` (optional): a second fold run in the OPPOSITE
      direction over the same partials (e.g. forward-peer carries for
      RANGE frames). When given, apply_fn receives a
      (forward_inject, reverse_inject) tuple.
    - `apply_fn(t: pa.Table, inject) -> pa.Table` — second pass;
      `inject` is the fold's value for this block (None for blocks the
      fold never saw, e.g. empty ones).
    """
    by = list(dict.fromkeys(by))  # callers may pass order == tiebreak
    if pre is not None:
        ds = pre(ds)
    sorted_ds = ds.sort(by).materialize()

    key_col = by[0]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"_hid": pa.array([], pa.string()),
                             "_blob": pa.array([], pa.binary()),
                             "_ord": pa.array([], pa.binary())})
        # null/NaN in ANY sort column would break the fold chain: a null
        # key fragments runs (NaN != NaN); a null order/tiebreak value in
        # a block HEAD row enters the pickled head tuple, where pandas'
        # driver-side head ordering can diverge from Ray's range-sort
        # null placement (or raise TypeError on object columns),
        # desyncing block order — reject loudly instead
        for col in by:
            kc = t[col]
            bad = kc.null_count > 0
            if not bad and pa.types.is_floating(kc.type):
                import pyarrow.compute as _pc
                bad = bool(_pc.any(_pc.is_nan(kc)).as_py())
            if bad:
                raise ValueError(
                    f"per_key_scan: null/NaN values in sort column "
                    f"{col!r} — filter or fill them upstream")
        head = tuple(t[c][0].as_py() for c in by)
        d = partial_fn(t)
        return pa.table({
            "_hid": pa.array([_hid(head)], pa.string()),
            "_blob": pa.array([pickle.dumps(d)], pa.binary()),
            # order key: pickled head tuple is NOT sortable — ship the
            # typed values and sort driver-side via a DataFrame
            "_ord": pa.array([pickle.dumps(head)], pa.binary()),
        })

    heads = sorted_ds.map_batches(partial, batch_size=None,
                                  batch_format="pyarrow").to_pandas()
    if len(heads):
        key_tuples = [pickle.loads(b) for b in heads["_ord"]]
        ordf = pd.DataFrame(key_tuples, columns=[f"c{i}" for i in range(len(by))])
        order = ordf.sort_values(list(ordf.columns), kind="mergesort").index
        if ordf.duplicated().any():
            raise ValueError("per_key_scan needs a unique (key, order, "
                             "tiebreak) composite to recover block order")
        heads = heads.iloc[order].reset_index(drop=True)
        if reverse:
            heads = heads.iloc[::-1].reset_index(drop=True)

    inject_map: dict = {}
    state = None
    driver_rows: list = []
    parts = [pickle.loads(b) for b in heads["_blob"]]
    for hid, part in zip(heads["_hid"], parts):
        inject, state, rows = fold_fn(state, part)
        inject_map[hid] = inject
        if rows:
            driver_rows.extend(rows)
    _, _, rows = fold_fn(state, None)
    if rows:
        driver_rows.extend(rows)

    if fold_rev_fn is not None:
        state = None
        for hid, part in zip(reversed(list(heads["_hid"])), reversed(parts)):
            inject, state, rows = fold_rev_fn(state, part)
            inject_map[hid] = (inject_map[hid], inject)
            if rows:
                driver_rows.extend(rows)
        _, _, rows = fold_rev_fn(state, None)
        if rows:
            driver_rows.extend(rows)

    inj_ref = ray.put(inject_map)

    def apply(t: pa.Table) -> pa.Table:
        inject = None
        if t.num_rows:
            head = tuple(t[c][0].as_py() for c in by)
            inject = ray.get(inj_ref).get(_hid(head))
        return apply_fn(t, inject)

    out = sorted_ds.map_batches(apply, batch_size=None,
                                batch_format="pyarrow")
    return out, driver_rows


# ---------------------------------------------------------------------------
# shared partial/fold shapes
# ---------------------------------------------------------------------------


def _runs(k: np.ndarray) -> np.ndarray:
    """Start indices of equal-key runs in a sorted key array."""
    return np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1])


def _carry_rows_partial(t: pa.Table, key: str, cols: list[str], cap: int) -> dict:
    """head/tail keys + the tail run's last `cap` rows of `cols`."""
    k = t[key].to_numpy(zero_copy_only=False)
    n = len(k)
    starts = _runs(k)
    tail_start = int(starts[-1])
    lo = max(tail_start, n - cap) if cap else n
    return {
        "head": t[key][0].as_py(),
        "tail": t[key][n - 1].as_py(),
        "single": bool(k[0] == k[n - 1]),
        "tail_rows": {c: t[c].slice(lo, n - lo).to_pylist() for c in cols},
    }


def _carry_rows_fold(cap: int, cols: list[str]):
    """fold_fn threading 'last cap rows of the open key' forward."""
    def fold(state, part):
        if part is None:
            return None, None, None
        cont = state is not None and part["head"] == state[0]
        inject = state[1] if cont else None
        rows = part["tail_rows"]
        if part["single"] and cont:
            merged = {c: (state[1][c] + rows[c])[-cap:] for c in cols}
        else:
            merged = {c: rows[c][-cap:] for c in cols}
        return inject, (part["tail"], merged), None

    return fold


def _chain_fold(merge_fn, row_fn):
    """Fold factory for per-key AGGREGATE scans: thread the open key's
    running summary across blocks, emit a driver row when the chain
    closes. `merge_fn(a, b)` combines adjacent summaries of one key;
    `row_fn(key_val, summary)` shapes the emitted row. Partials must
    carry head/tail/single plus head_stats/tail_stats."""
    def fold(state, part):
        rows = []
        if part is None:
            if state is not None:
                rows.append(row_fn(state[0], state[1]))
            return None, None, rows
        head_stats = part["head_stats"]
        tail_stats = part["tail_stats"] if part.get("tail_stats") is not None \
            else head_stats
        cont = state is not None and part["head"] == state[0]
        if cont:
            merged = merge_fn(state[1], head_stats)
            if part["single"]:
                return {"head_in_chain": True}, (part["tail"], merged), rows
            rows.append(row_fn(part["head"], merged))
            inject = {"head_in_chain": True}
        else:
            if state is not None:
                rows.append(row_fn(state[0], state[1]))
            inject = {"head_in_chain": part["single"]}
        return inject, (part["tail"], tail_stats), rows

    return fold


def _union_driver_rows(out, rows, cols):
    """Union fold-emitted driver rows into the apply pass's Dataset with
    a MATCHING arrow schema (a pandas-block union would declare one
    schema and carry another — Ray warns and schema-strict consumers
    misread the types)."""
    if not rows:
        return out
    import ray.data

    pdf = pd.DataFrame(rows)[cols]
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    try:
        sch = out.schema()
        target = pa.schema([(n, t) for n, t in zip(sch.names, sch.types)])
        tbl = tbl.cast(target)
    except Exception:
        pass  # best effort — fall back to arrow's inferred types
    return out.union(ray.data.from_arrow(tbl))


def _head_run_len(k: np.ndarray) -> int:
    starts = _runs(k)
    return int(starts[1]) if len(starts) > 1 else len(k)


# ---------------------------------------------------------------------------
# row-level scan ops
# ---------------------------------------------------------------------------


def rolling_agg_scan(ds, key: str, order_col: str, tiebreak: str,
                     value_col: str, window: int,
                     aggs: dict[str, str]):
    """Per-key trailing-`window`-row aggregates (ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW), `aggs` = {out_col: mean|sum|min|max}.
    Carry = the open key's last window-1 values; in-block work is one
    C-level pandas groupby.rolling per reducer. Returns a Dataset."""
    by = [key, order_col, tiebreak]
    cap = window - 1

    def partial(t):
        return _carry_rows_partial(t, key, [value_col], cap)

    def apply(t: pa.Table, inject) -> pa.Table:
        if t.num_rows == 0:
            for out in aggs:
                t = t.append_column(out, pa.array([], pa.float64()))
            return t
        df = t.to_pandas()
        g = df.groupby(key, sort=False)[value_col]
        carry = inject[value_col] if inject else []
        h = _head_run_len(df[key].to_numpy())
        for out, how in aggs.items():
            vals = getattr(g.rolling(window, min_periods=1), how)() \
                .reset_index(drop=True).to_numpy()
            if carry:
                # None (null carry rows) → NaN; dtype pinned so an
                # all-null carry can't produce an object series
                pre = pd.Series(list(carry) + list(df[value_col].iloc[:h]),
                                dtype=np.float64)
                patched = getattr(pre.rolling(window, min_periods=1), how)() \
                    .to_numpy()[len(carry):]
                vals[:h] = patched
            df[out] = vals
        return pa.Table.from_pandas(df, preserve_index=False)

    out, _ = per_key_scan(ds, by, partial, _carry_rows_fold(cap, [value_col]),
                          apply)
    return out


def lag_scan(ds, key: str, order_col: str, tiebreak: str, value_col: str,
             n: int = 1, out_col: str = "lagged"):
    """Per-key LAG(value, n) — null for each key's first n rows. Carry
    = the open key's last n values. Returns a Dataset."""
    by = [key, order_col, tiebreak]

    def partial(t):
        return _carry_rows_partial(t, key, [value_col], n)

    def apply(t: pa.Table, inject) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.float64()))
        df = t.to_pandas()
        shifted = df.groupby(key, sort=False)[value_col].shift(n)
        carry = inject[value_col] if inject else []
        if carry:
            h = _head_run_len(df[key].to_numpy())
            m = len(carry)
            # padded = carry + head_vals; row i gets padded[m + i - n]
            for i in range(min(n, h)):
                j = m + i - n
                if j >= 0:
                    shifted.iloc[i] = carry[j]
        df[out_col] = shifted
        return pa.Table.from_pandas(df, preserve_index=False)

    out, _ = per_key_scan(ds, by, partial, _carry_rows_fold(n, [value_col]),
                          apply)
    return out


def lead_scan(ds, key: str, order_col: str, tiebreak: str, value_col: str,
              n: int = 1, out_col: str = "led"):
    """Per-key LEAD(value, n) — null for each key's last n rows. The
    fold runs in REVERSE block order; carry = the open key's first n
    values (taken from the following block). Returns a Dataset."""
    by = [key, order_col, tiebreak]

    def partial(t):
        k = t[key].to_numpy(zero_copy_only=False)
        h = _head_run_len(k)
        return {
            "head": t[key][0].as_py(),
            "tail": t[key][len(k) - 1].as_py(),
            "single": bool(k[0] == k[-1]),
            "head_rows": t[value_col].slice(0, min(n, h)).to_pylist(),
        }

    def fold(state, part):
        if part is None:
            return None, None, None
        # reversed iteration: `state` describes the NEXT block in data
        # order; inject fills the tail run's last rows
        cont = state is not None and part["tail"] == state[0]
        inject = state[1] if cont else None
        if part["single"] and cont:
            merged = (part["head_rows"] + state[1])[:n]
        else:
            merged = part["head_rows"][:n]
        return inject, (part["head"], merged), None

    def apply(t: pa.Table, inject) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.float64()))
        df = t.to_pandas()
        shifted = df.groupby(key, sort=False)[value_col].shift(-n)
        if inject:
            k = df[key].to_numpy()
            starts = _runs(k)
            tail_start = int(starts[-1])
            tail_vals = list(df[value_col].iloc[tail_start:])
            padded = tail_vals + list(inject)
            L = len(tail_vals)
            for i in range(max(0, L - n), L):
                if i + n < len(padded):
                    shifted.iloc[tail_start + i] = padded[i + n]
        df[out_col] = shifted
        return pa.Table.from_pandas(df, preserve_index=False)

    out, _ = per_key_scan(ds, by, partial, fold, apply, reverse=True)
    return out


def cumsum_scan(ds, key: str, order_col: str, tiebreak: str, value_col: str,
                out_col: str = "cum_sum"):
    """Per-key running total. Carry = the open key's running sum (one
    float; the block's tail-run local sum is folded in with one add per
    block, so cross-block accumulation groups differently than a
    single-series scan — callers must compare with the repo's standard
    +1e-9 nudged round, as the gates do). Returns a Dataset."""
    by = [key, order_col, tiebreak]

    def partial(t):
        k = t[key].to_numpy(zero_copy_only=False)
        starts = _runs(k)
        v = t[value_col].to_numpy(zero_copy_only=False)
        tail = v[int(starts[-1]):]
        tail = tail[~pd.isna(tail)]
        # pairwise np.sum is fine here: the carry is folded with one
        # extra add per block anyway, and callers compare under the
        # +1e-9 nudged round (see docstring)
        return {
            "head": t[key][0].as_py(),
            "tail": t[key][len(k) - 1].as_py(),
            "single": bool(k[0] == k[-1]),
            "tail_sum": float(tail.sum()) if len(tail) else 0.0,
            # non-null count rides along: SQL SUM OVER an all-NULL
            # prefix is NULL, not 0 — the fill below must know whether
            # any prior non-null value exists
            "tail_nn": int(len(tail)),
        }

    def fold(state, part):
        if part is None:
            return None, None, None
        cont = state is not None and part["head"] == state[0]
        inject = (state[1], state[2]) if cont else None
        bsum, bnn = (state[1], state[2]) if (cont and part["single"]) \
            else (0.0, 0)
        return inject, (part["tail"], bsum + part["tail_sum"],
                        bnn + part["tail_nn"]), None

    def apply(t: pa.Table, inject) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.float64()))
        df = t.to_pandas()
        # an all-null sorted block arrives Arrow-typed `null` →
        # object in pandas; coerce back to float64 (cumsum on object
        # raises)
        if df[value_col].dtype == object:
            df[value_col] = pd.to_numeric(df[value_col], errors="coerce")
        cs = df.groupby(key, sort=False)[value_col].cumsum().astype(np.float64)
        # SQL SUM(value) OVER (... UNBOUNDED PRECEDING) ignores NULLs:
        # at a NULL-value row the frame still sums the prior non-nulls
        # (pandas cumsum emits NaN there) — forward-fill within the
        # key; rows before a key's first non-null stay NULL (empty
        # frame sums to NULL)
        cs = cs.groupby(df[key], sort=False).ffill()
        if inject is not None:
            isum, inn = inject
            h = _head_run_len(df[key].to_numpy())
            head = cs.iloc[:h] + isum
            if inn > 0:
                # leading NULLs of a continuing key take the carried
                # running sum (prior blocks had non-null values)
                head = head.fillna(isum)
            cs.iloc[:h] = head
        df[out_col] = cs
        return pa.Table.from_pandas(df, preserve_index=False)

    out, _ = per_key_scan(ds, by, partial, fold, apply)
    return out


def rate_scan(ds, key: str, order_col: str, tiebreak: str, value_col: str,
              out_col: str = "rate"):
    """Per-key (value − LAG(value)) / (order − LAG(order)), null on each
    key's first row and where the order delta is 0 (SQL NULLIF). Deltas
    are row-local pairs, so the block decomposition is bit-identical to
    the single-series scan. Carry = the open key's last row."""
    by = [key, order_col, tiebreak]

    def partial(t):
        return _carry_rows_partial(t, key, [order_col, value_col], 1)

    def apply(t: pa.Table, inject) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.float64()))
        df = t.to_pandas()
        g = df.groupby(key, sort=False)
        dv = g[value_col].diff().to_numpy()
        dt = g[order_col].diff().to_numpy(dtype=np.float64)
        if inject and inject[order_col]:
            prev_v = inject[value_col][-1]
            prev_v = np.nan if prev_v is None else prev_v  # null carry row
            dv[0] = df[value_col].iloc[0] - prev_v
            dt[0] = float(df[order_col].iloc[0] - inject[order_col][-1])
        with np.errstate(invalid="ignore", divide="ignore"):
            df[out_col] = np.where(dt == 0, np.nan, dv / dt)
        return pa.Table.from_pandas(df, preserve_index=False)

    out, _ = per_key_scan(ds, by, partial, _carry_rows_fold(
        1, [order_col, value_col]), apply)
    return out


def ewma_scan(ds, key: str, order_col: str, tiebreak: str, value_col: str,
              alpha: float, out_col: str = "ewma",
              ndigits: int | None = 6):
    """Per-key EWMA, recursive form y₁=x₁, yᵢ=(1−α)yᵢ₋₁+αxᵢ (pandas
    ewm(adjust=False)). Null values are dropped before the scan (the
    recursion is defined over observed values only). Carry = the open
    key's current y (one float); the fold advances it per block with
    the closed-form decay (agrees with the sequential recursion to
    ~1e-12 relative — outputs round after the +1e-9 nudge, as before).
    Returns a Dataset."""
    by = [key, order_col, tiebreak]
    a = float(alpha)

    def pre(d):
        import pyarrow.compute as pc

        def drop_null(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_valid(t[value_col]))

        return d.map_batches(drop_null, batch_format="pyarrow")

    def partial(t):
        k = t[key].to_numpy(zero_copy_only=False)
        starts = _runs(k)
        x = t[value_col].to_numpy(zero_copy_only=False)[int(starts[-1]):] \
            .astype(np.float64)
        m = len(x)
        w = (1.0 - a) ** np.arange(m - 1, -1, -1, dtype=np.float64)
        S = float(a * np.dot(w, x))
        return {
            "head": t[key][0].as_py(),
            "tail": t[key][len(k) - 1].as_py(),
            "single": bool(k[0] == k[-1]),
            "m": m, "S": S, "x1": float(x[0]) if m else 0.0,
        }

    def fold(state, part):
        if part is None:
            return None, None, None
        cont = state is not None and part["head"] == state[0]
        inject = state[1] if cont else None
        decay = (1.0 - a) ** part["m"]
        if part["single"] and cont:
            y_end = decay * state[1] + part["S"]
        else:
            # tail run starts inside this block: y₁ = x₁ semantics →
            # y_m = S + (1−α)^m·x₁ (the j=1 term upgraded from α·w to w)
            y_end = part["S"] + decay * part["x1"]
        return inject, (part["tail"], y_end), None

    def apply(t: pa.Table, inject) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.float64()))
        df = t.to_pandas()
        y = df.groupby(key, sort=False)[value_col] \
            .ewm(alpha=a, adjust=False).mean().reset_index(drop=True) \
            .to_numpy()
        if inject is not None:
            h = _head_run_len(df[key].to_numpy())
            seq = pd.Series([inject] + list(df[value_col].iloc[:h]),
                            dtype=np.float64)
            y[:h] = seq.ewm(alpha=a, adjust=False).mean().to_numpy()[1:]
        if ndigits is not None:
            y = np.round(y + 1e-9, ndigits)
        df[out_col] = y
        return pa.Table.from_pandas(df, preserve_index=False)

    out, _ = per_key_scan(ds, by, partial, fold, apply, pre=pre)
    return out


def fill_forward_scan(ds, key: str, order_col: str, tiebreak: str,
                      value_col: str, out_col: str = "filled"):
    """Per-key LOCF fill-forward; leading nulls (no prior observation)
    stay null. Carry = the open key's last non-null value."""
    by = [key, order_col, tiebreak]

    def partial(t):
        k = t[key].to_numpy(zero_copy_only=False)
        starts = _runs(k)
        tail = t[value_col].slice(int(starts[-1])).to_pandas()
        nn = tail.dropna()
        return {
            "head": t[key][0].as_py(),
            "tail": t[key][len(k) - 1].as_py(),
            "single": bool(k[0] == k[-1]),
            "last_nn": (nn.iloc[-1] if len(nn) else None),
        }

    def fold(state, part):
        if part is None:
            return None, None, None
        cont = state is not None and part["head"] == state[0]
        inject = state[1] if cont else None
        if part["last_nn"] is not None:
            nxt = part["last_nn"]
        elif part["single"] and cont:
            nxt = state[1]
        else:
            nxt = None
        return inject, (part["tail"], nxt), None

    def apply(t: pa.Table, inject) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, t[value_col].slice(0, 0))
        df = t.to_pandas()
        f = df.groupby(key, sort=False)[value_col].ffill()
        if inject is not None:
            h = _head_run_len(df[key].to_numpy())
            head = f.iloc[:h]
            # after ffill, remaining NaNs in the head run are exactly
            # the leading ones (no prior in-block observation)
            f.iloc[:h] = head.fillna(inject)
        df[out_col] = f
        return pa.Table.from_pandas(df, preserve_index=False)

    out, _ = per_key_scan(ds, by, partial, fold, apply)
    return out


def rolling_range_sum_scan(ds, key: str, order_col: str, tiebreak: str,
                           value_col: str, span: int,
                           out_col: str = "range_sum",
                           ndigits: int | None = 6):
    """Per-key RANGE frame sum over [order − span, order], peer rows
    (equal order) sharing one frame, per SQL RANGE semantics. Two
    carries cross block edges: FORWARD, the open key's (order, value)
    rows within `span` of its tail (bounded by the frame, not the
    key); and REVERSE, each block's leading peer-group (sum, count) —
    a peer group that straddles a block edge contributes forward to
    the previous block's equal-order rows. In-block frames are fully
    vectorized: orders are remapped to a globally monotonic axis with
    inter-run gaps > span so ONE searchsorted serves every run."""
    by = [key, order_col, tiebreak]

    def partial(t):
        k = t[key].to_numpy(zero_copy_only=False)
        starts = _runs(k)
        o = t[order_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False)
        tail_start = int(starts[-1])
        last = o[-1]
        lo = tail_start + int(np.searchsorted(o[tail_start:], last - span,
                                              side="left"))
        head_end = int(starts[1]) if len(starts) > 1 else len(k)
        # leading peer group: head-run rows with o == o[0]
        pg_end = int(np.searchsorted(o[:head_end], o[0], side="right"))
        pg = np.asarray(v[:pg_end], dtype=np.float64)
        pg_valid = ~np.isnan(pg)
        return {
            "head": t[key][0].as_py(),
            "tail": t[key][len(k) - 1].as_py(),
            "single": bool(k[0] == k[-1]),
            "head_o": o[0], "tail_o": last,
            "one_peer": bool(k[0] == k[-1] and o[0] == last),
            "peer_sum": float(pg[pg_valid].sum()),
            "peer_cnt": int(pg_valid.sum()),
            "tail_rows": {
                order_col: t[order_col].slice(lo).to_pylist(),
                value_col: t[value_col].slice(lo).to_pylist(),
            },
        }

    def fold(state, part):
        if part is None:
            return None, None, None
        cont = state is not None and part["head"] == state[0]
        inject = state[1] if cont else None
        rows = part["tail_rows"]
        if part["single"] and cont:
            o = state[1][order_col] + rows[order_col]
            v = state[1][value_col] + rows[value_col]
        else:
            o, v = rows[order_col], rows[value_col]
        if o:
            cut = np.searchsorted(np.asarray(o), o[-1] - span, side="left")
            o, v = o[int(cut):], v[int(cut):]
        return inject, (part["tail"], {order_col: o, value_col: v}), None

    def fold_rev(state, part):
        """Reversed order: `state` describes the NEXT block's leading
        peer group (possibly extended further right); inject patches
        this block's tail rows that share that order."""
        if part is None:
            return None, None, None
        fwd = None
        if (state is not None and part["tail"] == state[0]
                and part["tail_o"] == state[1]):
            fwd = {"sum": state[2], "cnt": state[3]}
        s0, c0 = part["peer_sum"], part["peer_cnt"]
        if part["one_peer"] and fwd is not None:
            s0, c0 = s0 + fwd["sum"], c0 + fwd["cnt"]
        return fwd, (part["head"], part["head_o"], s0, c0), None

    def apply(t: pa.Table, inject) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.float64()))
        back, fwd = inject if inject is not None else (None, None)
        df = t.to_pandas()
        k = df[key].to_numpy()
        o = df[order_col].to_numpy()
        raw = df[value_col].to_numpy(np.float64)
        starts = _runs(k)
        bounds = np.concatenate([starts, [len(k)]])
        run_id = np.repeat(np.arange(len(starts)), np.diff(bounds))
        run_min = o[starts]
        run_max = o[bounds[1:] - 1]
        # guard arithmetic in float64 FIRST: int64 run_max - run_min can
        # silently wrap for order extents past 2^63 and the wrapped value
        # would then PASS the guard with a corrupted remap — only build
        # the int64 lift after the float-domain check succeeds
        extents_f = (run_max.astype(np.float64) - run_min.astype(np.float64)
                     + float(span) + 2.0)
        if extents_f.sum() < float(1 << 62):
            spans = (run_max - run_min).astype(np.int64)
            extents = spans + span + 2
            # monotonic remap: shift each run past the previous by >
            # span so ONE searchsorted serves every run
            base = np.concatenate([[0], np.cumsum(extents)[:-1]])
            o_mono = (o - run_min[run_id]) + base[run_id]
            valid = ~np.isnan(raw)
            vv = np.where(valid, raw, 0.0)
            csum = np.concatenate([[0.0], np.cumsum(vv)])
            ccnt = np.concatenate([[0], np.cumsum(valid)])
            lo = np.searchsorted(o_mono, o_mono - span, side="left")
            hi = np.searchsorted(o_mono, o_mono, side="right")
            s = csum[hi] - csum[lo]
            cnt = (ccnt[hi] - ccnt[lo]).astype(np.int64)
        else:
            # extreme key-cardinality x time-extent: the cumulative
            # lift would overflow int64 (silent numpy wrap) — fall
            # back to an exact per-run loop
            s = np.empty(len(k))
            cnt = np.empty(len(k), np.int64)
            for r0, r1 in zip(bounds[:-1], bounds[1:]):
                oo, rr = o[r0:r1], raw[r0:r1]
                val = ~np.isnan(rr)
                cs = np.concatenate([[0.0],
                                     np.cumsum(np.where(val, rr, 0.0))])
                cc = np.concatenate([[0], np.cumsum(val)])
                lo_ = np.searchsorted(oo, oo - span, side="left")
                hi_ = np.searchsorted(oo, oo, side="right")
                s[r0:r1] = cs[hi_] - cs[lo_]
                cnt[r0:r1] = cc[hi_] - cc[lo_]
        if back is not None and back[order_col]:
            # head run: recompute with the backward in-frame carry
            h = _head_run_len(k)
            po = np.asarray(back[order_col])
            pv = np.asarray(back[value_col], dtype=np.float64)
            # keep orders in their native (integer) dtype — a float64
            # cast would lose precision above 2^53 (epoch-ns orders)
            all_o = np.concatenate([po, o[:h]])
            all_v = np.concatenate([pv, raw[:h]])
            a_valid = ~np.isnan(all_v)
            a_vv = np.where(a_valid, all_v, 0.0)
            a_csum = np.concatenate([[0.0], np.cumsum(a_vv)])
            a_ccnt = np.concatenate([[0], np.cumsum(a_valid)])
            a_lo = np.searchsorted(all_o, o[:h] - span, side="left")
            a_hi = np.searchsorted(all_o, o[:h], side="right")
            s[:h] = a_csum[a_hi] - a_csum[a_lo]
            cnt[:h] = a_ccnt[a_hi] - a_ccnt[a_lo]
        if fwd is not None:
            tail_start = int(starts[-1])
            peers = np.flatnonzero(o[tail_start:] == o[-1]) + tail_start
            s[peers] += fwd["sum"]
            cnt[peers] += fwd["cnt"]
        res = np.where(cnt == 0, np.nan, s)
        if ndigits is not None:
            res = np.round(res + 1e-9, ndigits)
        df[out_col] = res
        return pa.Table.from_pandas(df, preserve_index=False)

    out, _ = per_key_scan(ds, by, partial, fold, apply, fold_rev_fn=fold_rev)
    return out


# ---------------------------------------------------------------------------
# per-key aggregate scans (answer rows close on run boundaries)
# ---------------------------------------------------------------------------


def _run_stats(vals: np.ndarray) -> dict:
    """Run-length stats of a value sequence: gaps-and-islands summary."""
    codes, _ = pd.factorize(pd.Series(vals), use_na_sentinel=False)
    change = np.concatenate([[True], codes[1:] != codes[:-1]])
    ends = np.append(np.flatnonzero(change), len(codes))
    lens = np.diff(ends)
    return {"first_val": vals[0], "first_len": int(lens[0]),
            "last_val": vals[-1], "last_len": int(lens[-1]),
            "max": int(lens.max()), "nruns": int(len(lens))}


def _merge_run_stats(a: dict, b: dict) -> dict:
    """Concatenate two adjacent run summaries of the same key."""
    av, bv = a["last_val"], b["first_val"]
    a_na, b_na = pd.isna(av), pd.isna(bv)
    same = (a_na and b_na) or (not a_na and not b_na and av == bv)
    if same:
        cross = a["last_len"] + b["first_len"]
        return {
            "first_val": a["first_val"],
            "first_len": cross if a["nruns"] == 1 else a["first_len"],
            "last_val": b["last_val"],
            "last_len": cross if b["nruns"] == 1 else b["last_len"],
            "max": max(a["max"], b["max"], cross),
            "nruns": a["nruns"] + b["nruns"] - 1,
        }
    return {"first_val": a["first_val"], "first_len": a["first_len"],
            "last_val": b["last_val"], "last_len": b["last_len"],
            "max": max(a["max"], b["max"]),
            "nruns": a["nruns"] + b["nruns"]}


def streaks_scan(ds, key: str, order_col: str, tiebreak: str, val_col: str,
                 max_col: str = "max_streak", runs_col: str = "n_runs"):
    """Per-key longest equal-value run + run count (gaps-and-islands)
    in (order, tiebreak) order. Keys interior to a block emit their row
    distributed; keys whose runs touch a block edge chain through the
    driver fold (O(#blocks) rows). Returns a Dataset."""
    by = [key, order_col, tiebreak]

    def partial(t):
        k = t[key].to_numpy(zero_copy_only=False)
        starts = _runs(k)
        v = t[val_col].to_numpy(zero_copy_only=False)
        head_stats = _run_stats(v[:int(starts[1])] if len(starts) > 1 else v)
        tail_stats = head_stats if len(starts) == 1 \
            else _run_stats(v[int(starts[-1]):])
        return {
            "head": t[key][0].as_py(),
            "tail": t[key][len(k) - 1].as_py(),
            "single": bool(k[0] == k[-1]),
            "head_stats": head_stats, "tail_stats": tail_stats,
        }

    def _row(key_val, st):
        return {key: key_val, max_col: st["max"], runs_col: st["nruns"]}

    fold = _chain_fold(_merge_run_stats, _row)

    def apply(t: pa.Table, inject) -> pa.Table:
        empty = pa.table({key: t[key].slice(0, 0),
                          max_col: pa.array([], pa.int64()),
                          runs_col: pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[val_col].to_numpy(zero_copy_only=False)
        starts = _runs(k)
        n_keys = len(starts)
        skip_head = inject is not None and inject.get("head_in_chain")
        # vectorized gaps-and-islands across ALL keys in the block:
        # one factorize + reduceat, no Python per key
        codes, _ = pd.factorize(pd.Series(v), use_na_sentinel=False)
        newkey = np.zeros(len(k), dtype=bool)
        newkey[0] = True
        newkey[1:] = k[1:] != k[:-1]
        change = newkey.copy()
        change[1:] |= codes[1:] != codes[:-1]
        run_starts = np.flatnonzero(change)
        run_lens = np.diff(np.append(run_starts, len(k)))
        # runs are grouped by key in order; first run index of each key
        key_first_run = np.searchsorted(run_starts, starts, side="left")
        max_per_key = np.maximum.reduceat(run_lens, key_first_run)
        nruns_per_key = np.diff(np.append(key_first_run, len(run_lens)))
        keep = np.ones(n_keys, dtype=bool)
        keep[-1] = False                 # tail key → chained through fold
        if skip_head:
            keep[0] = False
        if not keep.any():
            return empty
        return pa.table({key: pa.array(k[starts[keep]]),
                         max_col: pa.array(max_per_key[keep].astype(np.int64)),
                         runs_col: pa.array(nruns_per_key[keep].astype(np.int64))})

    out, driver_rows = per_key_scan(ds, by, partial, fold, apply)
    return _union_driver_rows(out, driver_rows, [key, max_col, runs_col])


def sessionize_scan(ds, key: str, ts_col: str, gap_us: int,
                    tiebreak: str | None = None):
    """Session windows per key: (key, session_id, session_start,
    session_end, n_events), sessions split where the per-key event gap
    exceeds `gap_us`. Sessions interior to a block emit distributed;
    the open session at each block's tail chains through the driver
    fold and is emitted when it closes (O(#blocks) driver rows).
    `ts_col` is normalized to epoch microseconds. Session membership is
    tie-order independent (equal timestamps always share a session),
    but pass a `tiebreak` column when (key, ts) may repeat so block
    order is recoverable. Returns a Dataset."""

    def to_us(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us"))
        ts = ts.cast(pa.int64())
        # a null/NaN timestamp would silently wrap to INT64_MIN and
        # merge into a session — reject loudly (same contract as the
        # null-key guard in per_key_scan)
        if ts.null_count > 0:
            raise ValueError(
                f"sessionize: null timestamps in {ts_col!r} — filter "
                f"them upstream")
        cols = {key: t[key], "_ts": ts}
        if tiebreak is not None:
            cols[tiebreak] = t[tiebreak]
        return pa.table(cols)

    by = [key, "_ts"] + ([tiebreak] if tiebreak is not None else [])

    def _sessions(ts: np.ndarray) -> np.ndarray:
        """session start indices within one key run."""
        brk = np.concatenate([[True], np.diff(ts) > gap_us])
        return np.flatnonzero(brk)

    def partial(t):
        k = t[key].to_numpy(zero_copy_only=False)
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        starts = _runs(k)
        tail_start = int(starts[-1])
        tail_ts = ts[tail_start:]
        sess = _sessions(tail_ts)
        last_s = int(sess[-1])
        return {
            "head": t[key][0].as_py(),
            "tail": t[key][len(k) - 1].as_py(),
            "single": bool(k[0] == k[-1]),
            "head_first_ts": int(ts[0]),
            "n_tail_sessions": int(len(sess)),
            "tail_last": {"start": int(tail_ts[last_s]),
                          "end": int(tail_ts[-1]),
                          "n": int(len(tail_ts) - last_s)},
        }

    def _row(key_val, sid, s):
        return {key: key_val, "session_id": int(sid),
                "session_start": int(s["start"]),
                "session_end": int(s["end"]), "n_events": int(s["n"])}

    def fold(state, part):
        rows = []
        if part is None:
            if state is not None:
                k0, off, open_s = state
                rows.append(_row(k0, off, open_s))
            return None, None, rows
        cont = state is not None and part["head"] == state[0]
        if cont:
            k0, off, open_s = state
            merged = part["head_first_ts"] - open_s["end"] <= gap_us
            if not merged:
                rows.append(_row(k0, off, open_s))
                off += 1
                inject = {"base": off, "merge": None}
            else:
                inject = {"base": off, "merge": open_s}
            if part["single"]:
                nl = part["n_tail_sessions"]
                last = dict(part["tail_last"])
                if merged and nl == 1:
                    last = {"start": open_s["start"], "end": last["end"],
                            "n": open_s["n"] + last["n"]}
                new_off = off + nl - 1
                return inject, (part["tail"], new_off, last), rows
            new_off = part["n_tail_sessions"] - 1
            return inject, (part["tail"], new_off, part["tail_last"]), rows
        if state is not None:
            k0, off, open_s = state
            rows.append(_row(k0, off, open_s))
        inject = {"base": 0, "merge": None}
        return inject, (part["tail"], part["n_tail_sessions"] - 1,
                        part["tail_last"]), rows

    def apply(t: pa.Table, inject) -> pa.Table:
        empty = pa.table({key: t[key].slice(0, 0),
                          "session_id": pa.array([], pa.int64()),
                          "session_start": pa.array([], pa.int64()),
                          "session_end": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        k = t[key].to_numpy(zero_copy_only=False)
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        starts = _runs(k)
        base = inject["base"] if inject else 0
        merge = inject["merge"] if inject else None
        # vectorized sessionization across ALL keys in the block
        brk = np.zeros(len(k), dtype=bool)
        brk[0] = True
        brk[1:] = (k[1:] != k[:-1]) | (np.diff(ts) > gap_us)
        s_starts = np.flatnonzero(brk)
        s_ends = np.append(s_starts[1:], len(k))
        s_key_idx = np.searchsorted(starts, s_starts, side="right") - 1
        key_first_sess = np.searchsorted(s_key_idx, np.arange(len(starts)))
        # 0-based ids, matching the SQL twin's SUM(new_s) - 1
        sid = (np.arange(len(s_starts), dtype=np.int64)
               - key_first_sess[s_key_idx])
        sid[s_key_idx == 0] += base
        st = ts[s_starts].astype(np.int64)
        en = ts[s_ends - 1].astype(np.int64)
        nn = (s_ends - s_starts).astype(np.int64)
        if merge is not None:
            st[0] = merge["start"]
            nn[0] += merge["n"]
        keep = np.ones(len(s_starts), dtype=bool)
        keep[-1] = False  # open tail session → chained through fold
        if not keep.any():
            return empty
        return pa.table({key: pa.array(k[s_starts[keep]]),
                         "session_id": pa.array(sid[keep]),
                         "session_start": pa.array(st[keep]),
                         "session_end": pa.array(en[keep]),
                         "n_events": pa.array(nn[keep])})

    prepped = ds.map_batches(to_us, batch_format="pyarrow")
    out, driver_rows = per_key_scan(prepped, by, partial, fold, apply)
    return _union_driver_rows(
        out, driver_rows,
        [key, "session_id", "session_start", "session_end", "n_events"])


def first_last_scan(ds, key: str, order_col: str, tiebreak: str,
                    value_col: str):
    """Per-key FIRST_VALUE / LAST_VALUE of `value_col` in (order,
    tiebreak) order — one row per key. After the range sort, a key
    run's first/last rows ARE the answers, so blocks emit interior
    keys directly and keys touching a block edge merge through the
    O(#blocks) driver fold (first from the chain's head, last from its
    tail). Returns a Dataset of (key, first_value, last_value)."""
    by = [key, order_col, tiebreak]

    def partial(t: pa.Table) -> dict:
        k = t[key].to_numpy(zero_copy_only=False)
        n = len(k)
        starts = _runs(k)
        head_end = int(starts[1]) if len(starts) > 1 else n
        return {
            "head": t[key][0].as_py(),
            "tail": t[key][n - 1].as_py(),
            "single": bool(k[0] == k[-1]),
            "head_stats": {"first": t[value_col][0].as_py(),
                           "last": t[value_col][head_end - 1].as_py()},
            "tail_stats": {"first": t[value_col][int(starts[-1])].as_py(),
                           "last": t[value_col][n - 1].as_py()},
        }

    def _row(key_val, st):
        return {key: key_val, "first_value": st["first"],
                "last_value": st["last"]}

    fold = _chain_fold(
        lambda a, b: {"first": a["first"], "last": b["last"]}, _row)

    def apply(t: pa.Table, inject) -> pa.Table:
        empty = pa.table({key: t[key].slice(0, 0),
                          "first_value": t[value_col].slice(0, 0),
                          "last_value": t[value_col].slice(0, 0)})
        if t.num_rows == 0:
            return empty
        k = t[key].to_numpy(zero_copy_only=False)
        starts = _runs(k)
        bounds = np.concatenate([starts, [len(k)]])
        keep = np.ones(len(starts), dtype=bool)
        keep[-1] = False                      # tail key chains via fold
        if inject is not None and inject.get("head_in_chain"):
            keep[0] = False
        if not keep.any():
            return empty
        first_idx = starts[keep]
        last_idx = bounds[1:][keep] - 1
        return pa.table({key: t[key].take(pa.array(first_idx)),
                         "first_value": t[value_col].take(pa.array(first_idx)),
                         "last_value": t[value_col].take(pa.array(last_idx))})

    out, driver_rows = per_key_scan(ds, by, partial, fold, apply)
    return _union_driver_rows(out, driver_rows,
                              [key, "first_value", "last_value"])


def interval_coverage_scan(ds, key: str, start_us_col: str, dur_us: int,
                           tiebreak: str | None = None):
    """Per-key union length of fixed-duration intervals [start, start +
    dur): overlapping/touching intervals merge; returns (key,
    covered_us, n_intervals) — one row per key, integer-exact.

    Keyscan shape: after the (key, start) sort, islands are computed
    per block with ONE reset-aware running-max (no Python per key);
    keys touching a block edge chain through the driver fold. Because
    every interval has the SAME duration, an open island can only
    merge with the next block's FIRST island (the second island starts
    strictly later than first_start + dur), so the carry is one island
    plus two counters."""
    by = [key, start_us_col] + ([tiebreak] if tiebreak else [])

    def _run_summary(s: np.ndarray) -> dict:
        """Island summary of ONE run's sorted starts."""
        e = s + dur_us
        pmax = np.maximum.accumulate(e)
        new = np.ones(len(s), dtype=bool)
        new[1:] = s[1:] > pmax[:-1]
        idx = np.flatnonzero(new)
        ends = np.maximum.reduceat(e, idx)
        starts = s[idx]
        return {"first_s": int(starts[0]), "first_e": int(ends[0]),
                "last_s": int(starts[-1]), "last_e": int(ends[-1]),
                "covered": int((ends - starts).sum()), "n": int(len(idx))}

    def _merge(a: dict, b: dict) -> dict:
        if b["first_s"] <= a["last_e"]:  # open island absorbs b's first
            joined_s, joined_e = a["last_s"], b["first_e"]
            covered = (a["covered"] - (a["last_e"] - a["last_s"])
                       + b["covered"] - (b["first_e"] - b["first_s"])
                       + (joined_e - joined_s))
            n = a["n"] + b["n"] - 1
            first = (joined_s, joined_e) if a["n"] == 1 \
                else (a["first_s"], a["first_e"])
            last = (joined_s, joined_e) if b["n"] == 1 \
                else (b["last_s"], b["last_e"])
        else:
            covered = a["covered"] + b["covered"]
            n = a["n"] + b["n"]
            first = (a["first_s"], a["first_e"])
            last = (b["last_s"], b["last_e"])
        return {"first_s": first[0], "first_e": first[1],
                "last_s": last[0], "last_e": last[1],
                "covered": covered, "n": n}

    def partial(t: pa.Table) -> dict:
        k = t[key].to_numpy(zero_copy_only=False)
        s = t[start_us_col].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = _runs(k)
        head_end = int(starts[1]) if len(starts) > 1 else len(k)
        return {
            "head": t[key][0].as_py(),
            "tail": t[key][len(k) - 1].as_py(),
            "single": bool(k[0] == k[-1]),
            "head_stats": _run_summary(s[:head_end]),
            "tail_stats": (_run_summary(s[int(starts[-1]):])
                           if len(starts) > 1 else None),
        }

    def _row(key_val, st):
        return {key: key_val, "covered_us": st["covered"],
                "n_intervals": st["n"]}

    fold = _chain_fold(_merge, _row)

    def apply(t: pa.Table, inject) -> pa.Table:
        empty = pa.table({key: t[key].slice(0, 0),
                          "covered_us": pa.array([], pa.int64()),
                          "n_intervals": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        k = t[key].to_numpy(zero_copy_only=False)
        s = t[start_us_col].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = _runs(k)
        bounds = np.concatenate([starts, [len(k)]])
        n_runs = len(starts)
        run_id = np.repeat(np.arange(n_runs), np.diff(bounds))
        # guard arithmetic in UNBOUNDED Python ints first: s + dur_us can
        # wrap in int64 and np.int64(huge) raises OverflowError — either
        # way the documented exact per-run fallback would never be taken
        # (crash or corrupted remap). Only build the int64 lift arrays
        # once the whole lifted range provably fits.
        s_min, s_max = int(s.min()), int(s.max())
        e_max = s_max + dur_us
        off_py = e_max - s_min + dur_us + 1
        if e_max + n_runs * off_py < (1 << 62):
            e = s + dur_us
            off = np.int64(off_py)
            # ONE reset-aware running max: lift each run past the
            # previous by `off` so accumulation never crosses a reset
            m = e + run_id * off
            pmax = np.maximum.accumulate(m)
            new = np.ones(len(s), dtype=bool)
            new[1:] = (run_id[1:] != run_id[:-1]) | \
                (s[1:] + run_id[1:] * off > pmax[:-1])
            isl_idx = np.flatnonzero(new)
            isl_bounds = np.append(isl_idx, len(s))
            isl_end = (pmax[isl_bounds[1:] - 1]
                       - run_id[isl_idx] * off)
            isl_len = isl_end - s[isl_idx]
            isl_run = run_id[isl_idx]
            # np.add.at keeps the accumulation in int64 — bincount's
            # float64 weights would round covered lengths past 2^53,
            # breaking the integer-exact contract (and parity with the
            # exact per-run fallback) on extreme extents
            covered = np.zeros(n_runs, dtype=np.int64)
            np.add.at(covered, isl_run, isl_len)
            n_isl = np.bincount(isl_run, minlength=n_runs).astype(np.int64)
        else:
            # extreme key-cardinality x time-extent: the lift would
            # overflow int64 (silent numpy wrap) — exact per-run loop
            covered = np.empty(n_runs, np.int64)
            n_isl = np.empty(n_runs, np.int64)
            for ri, (r0, r1) in enumerate(zip(bounds[:-1], bounds[1:])):
                st = _run_summary(s[r0:r1])
                covered[ri] = st["covered"]
                n_isl[ri] = st["n"]
        keep = np.ones(len(starts), dtype=bool)
        keep[-1] = False
        if inject is not None and inject.get("head_in_chain"):
            keep[0] = False
        if not keep.any():
            return empty
        return pa.table({key: pa.array(k[starts[keep]]),
                         "covered_us": pa.array(covered[keep]),
                         "n_intervals": pa.array(n_isl[keep])})

    out, driver_rows = per_key_scan(ds, by, partial, fold, apply)
    return _union_driver_rows(out, driver_rows,
                              [key, "covered_us", "n_intervals"])
