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
    if isinstance(s.dtype, pd.DatetimeTZDtype):
        # np.issubdtype raises TypeError on tz-aware dtypes — normalize
        # to naive UTC first (the partitioned path's Arrow cast does
        # the equivalent)
        s = s.dt.tz_convert("UTC").dt.tz_localize(None)
    if np.issubdtype(s.dtype, np.datetime64):
        return s.astype("datetime64[us]").astype(np.int64)
    return s.astype(np.int64)


def _check_f64_int_exact(s: pd.Series) -> None:
    """A float64 key column that REPRESENTS integers (null-upcast int64)
    already lost exactness at/past 2^53 — detect and raise rather than
    silently matching a neighboring key."""
    v = s.to_numpy()
    finite = v[~np.isnan(v)]
    if len(finite) and np.abs(finite).max() >= float(1 << 53):
        raise ValueError(
            "as-of join: null-bearing integer by-keys at or beyond 2^53 "
            "lost float64 exactness in the pandas null upcast — filter "
            "nulls upstream")


def _align_by(left_s: pd.Series, right_s: pd.Series,
              int_provenance: tuple[bool, bool] = (False, False)
              ) -> tuple[pd.Series, pd.Series]:
    """Give merge_asof matching by-key dtypes across sides WITHOUT
    corrupting keys: when both sides share a dtype they pass through
    untouched (int64 keys stay exact at any magnitude). Only when one
    side carries nulls (pandas upcasts int64 → float64+NaN) must the
    other side cast to float64 — exact below 2^53, and keys at/past
    2^53 RAISE instead of silently matching a neighboring key (same
    contract as bloom_anti_join). Null keys (NaN) match nothing,
    like SQL.

    `int_provenance` marks sides whose ORIGINAL (Arrow) type was
    integer: a float64 side with int provenance is a null upcast and
    gets the 2^53 exactness check even when the dtypes already match
    (both-sides-null-bearing batches would otherwise bypass every
    guard)."""
    lp, rp = int_provenance
    if left_s.dtype == right_s.dtype:
        if pd.api.types.is_float_dtype(left_s.dtype):
            if lp:
                _check_f64_int_exact(left_s)
            if rp:
                _check_f64_int_exact(right_s)
        return left_s, right_s
    if not (pd.api.types.is_numeric_dtype(left_s.dtype)
            and pd.api.types.is_numeric_dtype(right_s.dtype)):
        raise TypeError(
            f"as-of by-key dtypes differ and are not both numeric: "
            f"{left_s.dtype} vs {right_s.dtype}")
    out = []
    for s in (left_s, right_s):
        if pd.api.types.is_integer_dtype(s.dtype):
            v = s.to_numpy()
            if len(v) and np.abs(v).max() >= (1 << 53):
                raise ValueError(
                    "as-of join: integer by-keys at or beyond 2^53 "
                    "cannot be carried exactly as float64 (the other "
                    "side holds null keys, forcing the cast) — filter "
                    "nulls upstream or split the join")
            out.append(s.astype(np.float64))
        else:
            # float side: if it was an int64 column upcast by pandas
            # null handling, values at/past 2^53 already lost exactness
            _check_f64_int_exact(s)
            out.append(s.astype(np.float64))
    return out[0], out[1]


def _pin_types(out: pd.DataFrame, types: dict[str, pa.DataType]) -> pa.Table:
    """Rebuild the merge output with PINNED Arrow types: pandas upcasts
    null-bearing int64 to float64+NaN (5.0 hashes differently than the
    oracle's 5 — CORRECTNESS_r03's one red row) and the upcast would
    also vary batch-to-batch with match luck. from_pandas=True turns
    NaN back into proper Arrow nulls."""
    return pa.table(
        {c: pa.array(out[c], type=types[c], from_pandas=True)
         for c in types})


class _AsofBatcher:
    """map_batches callable: merge_asof of each left batch against the
    broadcast right table (resolved once per worker)."""

    def __init__(self, right_ref, on: str, by: str, suffix: str):
        # the right frame arrives pre-sorted (asof_join_broadcast sorts
        # ONCE on the driver before ray.put — re-sorting per worker
        # would repeat the same O(R log R) work W times)
        self.right = ray.get(right_ref)
        self.on = on
        self.by = by
        self.suffix = suffix
        # the right table is fixed for the actor's lifetime — derive
        # its Arrow types once, not per batch
        rschema = pa.Schema.from_pandas(self.right, preserve_index=False)
        self.rtypes = [(n, t) for n, t in zip(rschema.names, rschema.types)
                       if n not in (on, by)]
        # int provenance of the right by-key (an integer-typed column is
        # exact; a float column from the CALLER is taken at face value —
        # upcast detection needs the original type, which only the
        # caller has for a pandas frame)
        self.r_int = pd.api.types.is_integer_dtype(self.right[by].dtype)
        self._right_float = None  # lazily built+validated ONCE per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        # output types: the batch's own types (on normalized to int64)
        # plus the appended right columns' Arrow types
        out_types = {n: (pa.int64() if n == self.on else t)
                     for n, t in zip(batch.schema.names, batch.schema.types)}
        for n, t in self.rtypes:
            name = n + self.suffix if n in out_types else n
            out_types[name] = t
        left = batch.to_pandas()
        left[self.on] = _ts_us_series(left[self.on])
        right = self.right
        rs = right[self.by]
        l_int = pa.types.is_integer(batch.schema.field(self.by).type)
        if left[self.by].dtype != rs.dtype and self.r_int:
            # right must cast to float64: validate + copy ONCE per
            # actor, not per batch (the broadcast right is immutable)
            if self._right_float is None:
                _, rb = _align_by(left[self.by], rs, (l_int, self.r_int))
                self._right_float = right.assign(**{self.by: rb})
            right = self._right_float
            lb, _ = _align_by(left[self.by], right[self.by],
                              (l_int, False))
            left[self.by] = lb
        else:
            lb, rb = _align_by(left[self.by], rs, (l_int, self.r_int))
            left[self.by] = lb
            if rb is not rs:
                right = right.assign(**{self.by: rb})
        order = left[self.on].argsort(kind="stable").to_numpy()
        left_sorted = left.iloc[order]
        out = pd.merge_asof(
            left_sorted, right, on=self.on, by=self.by,
            direction="backward", allow_exact_matches=True,
            suffixes=("", self.suffix),
        )
        # restore the batch's input row order (callers may rely on Ray
        # Data's default order preservation)
        out = out.iloc[np.argsort(order, kind="stable")]
        return _pin_types(out, out_types)


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
    # Secondary sort on every other column: merge_asof picks the LAST
    # tied right row, so equal-(by, on) rows need a deterministic order
    # independent of arrival/block order (Ray union block order varies
    # across sessions — this was CORRECTNESS_r02's one hash mismatch).
    tiebreak = [c for c in right.columns if c != on]
    right = right.sort_values([on] + tiebreak,
                              kind="stable").reset_index(drop=True)
    right_ref = ray.put(right)
    from webvalid.rayutil import task_callable

    return left_ds.map_batches(
        task_callable(_AsofBatcher, right_ref=right_ref, on=on, by=by,
                      suffix=suffix),
        batch_format="pyarrow",
    )


def asof_join_partitioned(left_ds, right_ds, on: str, by: str,
                          num_buckets: int = 32):
    """Co-partitioned as-of join — the 100-TB path when BOTH sides are
    too large to broadcast.

    Both sides are tagged, normalized onto one union schema (the other
    side's value columns null-filled), bucketed by ``hash(by) %
    num_buckets``, and co-grouped with ONE `groupby(bucket).map_groups`
    shuffle; each bucket runs the same C-implemented `merge_asof` as
    the broadcast path. Because the bucket key is the join key's hash,
    every row of a key lands in exactly one group — results are
    identical to the broadcast path (tested).

    Partitioning assumption: one bucket's rows fit a worker. Size
    `num_buckets` to ~cluster cores; salt-split hot keys upstream if a
    single key exceeds a worker (a single KEY cannot be split for an
    as-of join — its right side must be seen whole).

    Contract: right columns other than (on, by) must not collide with
    left columns (pre-rename them — the gate queries do).
    """
    import pyarrow.compute as pc

    from webvalid.ops.joins import bucket_of

    lsch = left_ds.schema()
    rsch = right_ds.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    rvals = [c for c in rsch.names if c not in (on, by)]
    overlap = set(rvals) & set(lsch.names)
    if overlap:
        raise ValueError(f"rename right columns before joining: {sorted(overlap)}")
    lcols = list(lsch.names)
    field_types = {c: (pa.int64() if c == on else ltypes[c]) for c in lcols}
    field_types.update({c: rtypes[c] for c in rvals})
    all_cols = lcols + rvals

    def make_tag(side: int, present: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for c in all_cols:
                if c in present:
                    arr = t[c]
                    if c == on:
                        # normalize to epoch MICROSECONDS like the
                        # broadcast path (_ts_us_series) — a raw int64
                        # cast of timestamp[ns] would be 1000x off
                        if pa.types.is_timestamp(arr.type):
                            arr = arr.cast(pa.timestamp("us"))
                        arr = arr.cast(pa.int64())
                    cols[c] = arr
                else:
                    cols[c] = pa.nulls(n, field_types[c])
            # bucket_of canonicalizes key dtype before hashing — a batch
            # with any null key materializes int64 as float64+NaN, which
            # raw hash64 would route to a DIFFERENT bucket than the same
            # value on an all-int64 batch (silently dropped matches)
            keys = t[by].to_numpy(zero_copy_only=False)
            cols["_bucket"] = pa.array(bucket_of(keys, num_buckets))
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    tagged = left_ds.map_batches(make_tag(0, lcols), batch_format="pyarrow").union(
        right_ds.map_batches(make_tag(1, [on, by] + rvals), batch_format="pyarrow")
    )

    # Output schema is pinned to the ORIGINAL Arrow types. The union
    # schema null-fills the other side's columns, and a pandas co-group
    # would upcast null-bearing int64 to float64 — the driver then hashes
    # 5.0 vs the oracle's 5 and mismatches even though values are equal
    # (CORRECTNESS_r03's one red row). So: split sides in Arrow (each
    # side's own columns are null-free there), run merge_asof on clean
    # dtypes, and cast the appended right-value columns (the only ones
    # that can gain NaN, from unmatched left rows) back via
    # pa.array(from_pandas=True) → NaN becomes a proper Arrow null.
    out_schema = pa.schema([(c, field_types[c]) for c in all_cols])

    def join_bucket(t: pa.Table) -> pa.Table:
        left_t = t.filter(pc.equal(t["_side"], 0)).select(lcols)
        if left_t.num_rows == 0:
            return out_schema.empty_table()
        right_t = t.filter(pc.equal(t["_side"], 1)).select([on, by] + rvals)
        left = left_t.to_pandas()
        right = right_t.to_pandas()
        # align by-key dtypes across sides (a null-bearing side upcasts
        # int64 -> float64+NaN and merge_asof refuses the mismatch);
        # no-op when both sides kept the same dtype, loud past 2^53.
        # Provenance from the union schema: an integer by column that
        # arrives float64 here is a null upcast on BOTH sides.
        by_int = pa.types.is_integer(field_types[by])
        left[by], right[by] = _align_by(left[by], right[by],
                                        (by_int, by_int))
        left = left.sort_values(on, kind="stable").reset_index(drop=True)
        # Deterministic tie order for equal-(by, on) right rows — see
        # _AsofBatcher.__init__; without this, merge_asof's last-tied-row
        # pick depends on Ray's session-varying union block order.
        right = right.sort_values([on, by] + rvals,
                                  kind="stable").reset_index(drop=True)
        out = pd.merge_asof(left, right, on=on, by=by,
                            direction="backward", allow_exact_matches=True)
        return _pin_types(out, {c: field_types[c] for c in all_cols})

    return tagged.groupby("_bucket").map_groups(join_bucket,
                                                batch_format="pyarrow")
