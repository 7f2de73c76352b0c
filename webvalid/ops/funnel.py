"""Event-funnel conversion: per key, how many A-events are followed by
a B-event within a horizon — the sequence-analytics primitive
(click → purchase, view → signup, …).

Distributed via ops/keyscan.py (ONE range sort, vectorized per-block
matching, O(#blocks) driver state) instead of a per-key map_groups:
inside a block, runs are remapped onto a monotonic time axis with
inter-run gaps > horizon so ONE searchsorted matches every A against
every B; an A near a block's tail may convert via a B in a LATER
block, so a REVERSE fold carries each block's head-run B timestamps
within `horizon` of its first event backward (bounded by the horizon
window, never by the key). Per-block partial counts then combine with
an answer-sized groupby(key).sum.

No reference analogue; streaming-analytics / north-rule addition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def funnel_conversion(ds, key: str, ts_col: str, type_col: str,
                      from_type: str, to_type: str, horizon: int,
                      n_from_col: str = "n_from",
                      n_conv_col: str = "n_conversions",
                      tiebreak: str | None = None) -> pd.DataFrame:
    """Per `key`: count of `from_type` events and of those having at
    least one `to_type` event with ts in [ts, ts + horizon]. Keys with
    no `from_type` events are omitted (SQL inner-aggregate shape).
    Pass `tiebreak` (any unique column) when (key, ts, type) rows can
    repeat, so block order is recoverable."""
    from webvalid.ops.keyscan import _head_run_len, _runs, per_key_scan

    by = [key, ts_col, type_col] + ([tiebreak] if tiebreak else [])

    def partial(t: pa.Table) -> dict:
        k = t[key].to_numpy(zero_copy_only=False)
        ts = t[ts_col].to_numpy(zero_copy_only=False)
        typ = t[type_col].to_numpy(zero_copy_only=False)
        h = _head_run_len(k)
        first_ts = ts[0]
        # ts[:h] >= first_ts (sorted), so compare via the non-negative
        # difference — first_ts + horizon itself can wrap int64 near
        # the extremes. If the head run's own extent could overflow
        # the int64 difference (>= 2^62 checked in float), do the
        # comparison in exact Python ints.
        if float(ts[h - 1]) - float(first_ts) < float(1 << 62):
            in_h = (ts[:h] - first_ts) <= horizon
        else:
            in_h = np.array([int(x) - int(first_ts) <= horizon
                             for x in ts[:h]], dtype=bool)
        mask = (typ[:h] == to_type) & in_h
        tail_start = int(_runs(k)[-1])
        tail_ts = ts[tail_start:]
        tail_typ = typ[tail_start:]
        return {
            "head": t[key][0].as_py(),
            "tail": t[key][len(k) - 1].as_py(),
            "single": bool(k[0] == k[-1]),
            "head_first_ts": int(first_ts),
            # already ascending: the block is sorted by (key, ts, ...)
            "head_b": ts[:h][mask].tolist(),
            "tail_last_ts": int(ts[-1]),
            # B events at the tail run's LAST timestamp: the only B's
            # that can still convert equal-ts A events in LATER blocks
            # (sortedness forces A.ts >= tail_last_ts >= B.ts there)
            "tail_has_b_at_last": bool(
                ((tail_typ == to_type) & (tail_ts == ts[-1])).any()),
        }

    def fold_rev(state, part):
        if part is None:
            return None, None, None
        fwd = None
        if state is not None and part["tail"] == state[0]:
            fwd = state[1]
        hb = part["head_b"]
        if part["single"] and fwd is not None:
            lim = part["head_first_ts"] + horizon
            hb = hb + [b for b in fwd if b <= lim]
        return fwd, (part["head"], sorted(hb)), None

    def fold_fwd(state, part):
        """Forward carry: whether the open key has a B event AT its
        last-seen timestamp — the only earlier-block B's that can
        convert an equal-timestamp A at the next block's head."""
        if part is None:
            return None, None, None
        inject = None
        cont = state is not None and part["head"] == state[0]
        if cont and state[2] and part["head_first_ts"] == state[1]:
            inject = state[1]
        has_b = part["tail_has_b_at_last"]
        if (not has_b and part["single"] and cont and state[2]
                and state[1] == part["tail_last_ts"]):
            has_b = True  # carried equal-ts B's stay live through the block
        return inject, (part["tail"], part["tail_last_ts"], has_b), None

    def apply(t: pa.Table, inject) -> pa.Table:
        empty = pa.table({key: t[key].slice(0, 0),
                          n_from_col: pa.array([], pa.int64()),
                          n_conv_col: pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        fwd_ts, carried = inject if inject is not None else (None, None)
        k = t[key].to_numpy(zero_copy_only=False)
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        typ = t[type_col].to_numpy(zero_copy_only=False)
        starts = _runs(k)
        bounds = np.concatenate([starts, [len(k)]])
        run_id = np.repeat(np.arange(len(starts)), np.diff(bounds))
        run_min = ts[starts]
        run_max = ts[bounds[1:] - 1]
        a_mask = typ == from_type
        b_mask = typ == to_type
        # float-domain pre-check BEFORE any int64 arithmetic: extreme
        # extents wrap int64 silently and would then pass the guard
        # with a corrupted remap (same pattern as keyscan.py)
        extents_f = (run_max.astype(np.float64) - run_min.astype(np.float64)
                     + float(horizon) + 2.0)
        if extents_f.sum() < float(1 << 62):
            extents = (run_max - run_min) + horizon + 2
            # horizon-gapped monotonic remap: ONE searchsorted serves
            # every run (gaps > horizon block cross-run matches)
            base = np.concatenate([[0], np.cumsum(extents)[:-1]])
            mono = (ts - run_min[run_id]) + base[run_id]
            b_mono = mono[b_mask]
            if carried:
                # same-key B events from later blocks, remapped with
                # the TAIL run's transform (they continue its axis)
                tail_i = len(starts) - 1
                ext = (np.asarray(carried, dtype=np.int64)
                       - run_min[tail_i] + base[tail_i])
                b_mono = np.concatenate([b_mono, ext])
            a_mono = mono[a_mask]
            if len(b_mono):
                idx = np.searchsorted(b_mono, a_mono, side="left")
                ok = (idx < len(b_mono)) & \
                    (b_mono[np.clip(idx, 0, len(b_mono) - 1)]
                     <= a_mono + horizon)
            else:
                ok = np.zeros(len(a_mono), dtype=bool)
        else:
            # extreme key-cardinality x time-extent: the remap would
            # overflow int64 — exact per-run loop
            ok_full = np.zeros(len(k), dtype=bool)
            for ri, (r0, r1) in enumerate(zip(bounds[:-1], bounds[1:])):
                am = a_mask[r0:r1]
                bb = ts[r0:r1][b_mask[r0:r1]]
                if ri == len(starts) - 1 and carried:
                    bb = np.concatenate([bb, np.asarray(carried, np.int64)])
                aa = ts[r0:r1][am]
                if len(bb):
                    idx = np.searchsorted(bb, aa, side="left")
                    # bb[idx] >= aa by construction; the mod-2^64
                    # uint64 subtraction is the exact non-negative
                    # diff for ANY int64 pair (aa + horizon itself
                    # wraps near the extremes this branch exists for)
                    diff = (bb[np.clip(idx, 0, len(bb) - 1)]
                            .astype(np.uint64) - aa.astype(np.uint64))
                    okr = (idx < len(bb)) & (diff <= np.uint64(horizon))
                else:
                    okr = np.zeros(len(aa), dtype=bool)
                w = np.flatnonzero(am) + r0
                ok_full[w] = okr
            ok = ok_full[a_mask]
        a_runs = run_id[a_mask]
        if fwd_ts is not None:
            # equal-ts B's left in an EARLIER block (type sorts them
            # before A at the same timestamp) convert head-run A's
            ok = ok | ((a_runs == 0) & (ts[a_mask] == fwd_ts))
        n_from = np.bincount(a_runs, minlength=len(starts))
        n_conv = np.bincount(a_runs[ok], minlength=len(starts))
        keep = n_from > 0
        if not keep.any():
            return empty
        return pa.table({key: pa.array(k[starts[keep]]),
                         n_from_col: pa.array(n_from[keep].astype(np.int64)),
                         n_conv_col: pa.array(n_conv[keep].astype(np.int64))})

    parts, _ = per_key_scan(ds, by, partial, fold_fwd, apply,
                            fold_rev_fn=fold_rev)
    out = parts.groupby(key).sum([n_from_col, n_conv_col]).to_pandas()
    if len(out) == 0:
        # all-empty blocks lose their columns in to_pandas (same guard
        # as ngrams.ngram_counts)
        import pandas as pd
        return pd.DataFrame({key: pd.Series([], dtype=object),
                             n_from_col: pd.Series([], dtype="int64"),
                             n_conv_col: pd.Series([], dtype="int64")})
    out.columns = [key, n_from_col, n_conv_col]
    out[n_from_col] = out[n_from_col].astype(np.int64)
    out[n_conv_col] = out[n_conv_col].astype(np.int64)
    return out.sort_values(key).reset_index(drop=True)
