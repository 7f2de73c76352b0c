"""Partitioned hash joins with salting — the large-side referential path.

When a reference table is too large to broadcast, both sides are
co-partitioned by `hash(key) % num_buckets` and joined bucket-by-bucket:
the right side is bucketed driver-side once (it is the smaller side by
assumption — big, but far smaller than the fact table) and each bucket
is shipped to the object store; the left side tags rows with their
bucket in `map_batches` and each batch joins against only its buckets'
tables. Hot keys are handled by SALTING: keys whose frequency exceeds
the skew threshold get `salt = hash(row) % n_salts` appended to the
bucket id, and the right-side rows for those keys are replicated into
every salted bucket — the classic skew-join transform.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from pandas import isna as pd_isna

from webvalid.sketches import hash64


# Version tag of the key-hash scheme (canonical dtype + hash64). Bump
# whenever _canon_for_hash / hash64 semantics change: bucketed parquet
# layouts written under one scheme route equal keys to DIFFERENT bucket
# ids under another, and a cross-scheme storage_partitioned_join would
# silently drop matches. "v2" = numerics canonicalized to float64.
HASH_SCHEME = "v2-float64canon"


def _canon_for_hash(arr: np.ndarray) -> np.ndarray:
    """Canonicalize key arrays before hashing: pd.util.hash_array gives
    DIFFERENT hashes for the same value carried as int64, float64 or
    object, and a nullable int column materializes as float64 — so
    build and probe sides must hash one canonical dtype. Numerics hash
    as float64 (exact for |k| < 2^53 — document keys larger than that
    as out of contract); strings/objects hash as-is."""
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        return arr
    if arr.dtype.kind in "iuf":
        return arr.astype(np.float64)
    return arr


def bucket_of(values, num_buckets: int) -> np.ndarray:
    arr = _canon_for_hash(np.asarray(values))
    return (hash64(arr) % np.uint64(num_buckets)).astype(np.int64)


def build_right_buckets(right: pa.Table, key: str, num_buckets: int,
                        hot_keys: set | None = None, n_salts: int = 1) -> list:
    """Bucket the right side; replicate hot-key rows across salt slots.

    Returns `num_buckets * n_salts` ObjectRefs of pa.Table, laid out as
    bucket_id * n_salts + salt with DISJOINT slots: salt 0 holds the
    bucket's cold rows, salts 1..n-1 each hold one full replica of the
    bucket's hot rows (n_salts == 1: everything in slot 0). A consumer
    reads slot 0 plus ONE worker-chosen hot replica — so a hot bucket's
    fetch load spreads across replicas and nothing needs a dedup on
    read (the old overlapping layout required a key-level dedup that
    silently collapsed legitimate duplicate right keys)."""
    keys = right[key].to_numpy(zero_copy_only=False)
    b = bucket_of(keys, num_buckets)
    if hot_keys and n_salts > 1:
        hot = np.array([k in hot_keys for k in keys], dtype=bool)
    else:
        hot = np.zeros(len(keys), bool)
    tables: list[pa.Table] = [right.slice(0, 0)] * (num_buckets * n_salts)
    for bucket in range(num_buckets):
        in_bucket = b == bucket
        cold = right.filter(pa.array(in_bucket & ~hot))
        tables[bucket * n_salts] = cold
        if hot.any():
            hot_rows = right.filter(pa.array(in_bucket & hot))
            for salt in range(1, n_salts):
                tables[bucket * n_salts + salt] = hot_rows
    return [ray.put(t) for t in tables]


def _in_sorted_keys(sorted_keys: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership of `keys` in a SORTED unique key array.

    searchsorted for numeric dtypes; np.isin (sort-based, C) for
    object/string dtypes. Never a per-element Python `in`.
    """
    if len(sorted_keys) == 0:
        return np.zeros(len(keys), dtype=bool)
    if sorted_keys.dtype.kind in "iuf" and keys.dtype.kind in "iuf":
        pos = np.clip(np.searchsorted(sorted_keys, keys), 0, len(sorted_keys) - 1)
        return sorted_keys[pos] == keys
    return np.isin(keys, sorted_keys)


def _bucket_slot_refs(refs: list, bucket: int, n_salts: int) -> list:
    """The refs a consumer reads for one bucket: the cold slot plus one
    worker-chosen hot replica (load-spread across replicas)."""
    import os

    out = [refs[bucket * n_salts]]
    if n_salts > 1:
        out.append(refs[bucket * n_salts + 1 + (os.getpid() % (n_salts - 1))])
    return out


class BucketedAntiJoin:
    """map_batches callable: rows whose key misses the right side
    (or, with keep_hits=True, the SEMI join — rows whose key is
    present; payload columns are never attached, only the filter).

    Resolves only the bucket tables a batch actually needs, builds a
    per-bucket sorted key array lazily, caches across batches.
    """

    def __init__(self, bucket_refs, key: str, num_buckets: int, n_salts: int = 1,
                 keep_hits: bool = False):
        self.bucket_refs = bucket_refs
        self.key = key
        self.num_buckets = num_buckets
        self.n_salts = n_salts
        self.keep_hits = keep_hits
        self._key_arrays: dict[int, np.ndarray] = {}

    def _keys_sorted(self, bucket: int) -> np.ndarray:
        ks = self._key_arrays.get(bucket)
        if ks is None:
            parts = [
                ray.get(ref)[self.key].to_numpy(zero_copy_only=False)
                for ref in _bucket_slot_refs(self.bucket_refs, bucket,
                                             self.n_salts)
            ]
            cat = np.concatenate(parts) if parts else np.empty(0)
            if cat.dtype == object:
                # np.unique cannot order None next to strings; null
                # right-side keys can't match anything anyway
                cat = cat[np.asarray([k is not None for k in cat], bool)]
            ks = np.unique(cat)
            self._key_arrays[bucket] = ks
        return ks

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key].to_numpy(zero_copy_only=False)
        # a null left key matches nothing → always a miss (same as the
        # original `k not in ks` set semantics); it must not reach the
        # numpy sort-based membership, which cannot compare None. A
        # NULLABLE int column materializes as float64 with NaN — treat
        # NaN the same way
        if keys.dtype == object:
            null_left = np.asarray([k is None for k in keys], bool)
        else:
            null_left = pd_isna(keys)
        b = bucket_of(keys, self.num_buckets)
        miss = np.zeros(len(keys), dtype=bool)
        for bucket in np.unique(b[~null_left]) if null_left.any() else np.unique(b):
            ks = self._keys_sorted(int(bucket))
            sel = (b == bucket) & ~null_left
            miss[sel] = ~_in_sorted_keys(ks, keys[sel])
        miss |= null_left
        # semi join = complement of anti; null keys match nothing so
        # they stay on the anti side under either polarity (SQL IN/EXISTS)
        return batch.filter(pa.array(~miss if self.keep_hits else miss))


def salted_anti_join(left_ds, right: pa.Table, key: str,
                     num_buckets: int = 32, hot_keys: set | None = None,
                     n_salts: int = 4):
    """Left rows whose `key` is absent from `right` (referential violations)."""
    from webvalid.rayutil import task_callable

    refs = build_right_buckets(right, key, num_buckets, hot_keys=hot_keys,
                               n_salts=n_salts if hot_keys else 1)
    return left_ds.map_batches(
        task_callable(BucketedAntiJoin, bucket_refs=refs, key=key,
                      num_buckets=num_buckets,
                      n_salts=n_salts if hot_keys else 1),
        batch_format="pyarrow",
    )


def salted_semi_join(left_ds, right: pa.Table, key: str,
                     num_buckets: int = 32, hot_keys: set | None = None,
                     n_salts: int = 4):
    """Left rows whose `key` IS present in `right` (SQL `IN`/`EXISTS`
    semi join). Same bucketed membership machinery as the anti join —
    only the filter polarity differs; no payload columns move."""
    from webvalid.rayutil import task_callable

    refs = build_right_buckets(right, key, num_buckets, hot_keys=hot_keys,
                               n_salts=n_salts if hot_keys else 1)
    return left_ds.map_batches(
        task_callable(BucketedAntiJoin, bucket_refs=refs, key=key,
                      num_buckets=num_buckets,
                      n_salts=n_salts if hot_keys else 1, keep_hits=True),
        batch_format="pyarrow",
    )


class BucketedInnerJoin:
    """map_batches callable: inner (or left outer, via join_type) hash
    join of each batch against its bucket tables (payload columns
    appended; left outer fills misses with nulls)."""

    def __init__(self, bucket_refs, key: str, num_buckets: int, n_salts: int = 1,
                 join_type: str = "inner"):
        self.bucket_refs = bucket_refs
        self.key = key
        self.num_buckets = num_buckets
        self.n_salts = n_salts
        self.join_type = join_type
        self._lookups: dict[int, pa.Table] = {}

    def _bucket_table(self, bucket: int) -> pa.Table:
        t = self._lookups.get(bucket)
        if t is None:
            # cold slot + ONE hot replica — slots are disjoint, so no
            # dedup (the old key-level dedup collapsed legitimate
            # duplicate right keys, losing one-to-many join rows)
            parts = [ray.get(ref) for ref in _bucket_slot_refs(
                self.bucket_refs, bucket, self.n_salts)]
            t = pa.concat_tables(parts)
            self._lookups[bucket] = t
        return t

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key].to_numpy(zero_copy_only=False)
        b = bucket_of(keys, self.num_buckets)
        out = []
        for bucket in np.unique(b):
            sub = batch.filter(pa.array(b == bucket))
            right = self._bucket_table(int(bucket))
            joined = sub.join(right, keys=self.key, join_type=self.join_type)
            if joined.num_rows:
                out.append(joined)
        if not out:
            empty = batch.slice(0, 0)
            right0 = self._bucket_table(0)
            return empty.join(right0.slice(0, 0), keys=self.key,
                              join_type=self.join_type)
        return pa.concat_tables(out, promote_options="default")


def ray_native_inner_join(left_ds, right_ds, on: str, right_on: str,
                          num_partitions: int | None = None):
    """True all-to-all hash join (`ray.data.Dataset.join`, hash-shuffle
    operator) — the regime where BOTH sides are too large to broadcast
    or to bucket driver-side, so each must be hash-partitioned across
    the cluster. For a small right side prefer the broadcast path
    (searchsorted against a `ray.put` key array) or
    `salted_inner_join`: on this sandbox the native join costs ~3.5 s
    where the broadcast join costs ~0.3 s at the same scale, but only
    the shuffle join's memory is independent of either side's size.
    """
    import ray as _ray

    if num_partitions is None:
        num_partitions = max(8, int(_ray.cluster_resources().get("CPU", 8)) // 2)
    return left_ds.join(
        right_ds, join_type="inner", num_partitions=num_partitions,
        on=(on,), right_on=(right_on,),
    )


def salted_inner_join(left_ds, right: pa.Table, key: str,
                      num_buckets: int = 32, hot_keys: set | None = None,
                      n_salts: int = 4):
    """Inner join left_ds ⋈ right on `key`, bucketed + hot-key salted."""
    from webvalid.rayutil import task_callable

    refs = build_right_buckets(right, key, num_buckets, hot_keys=hot_keys,
                               n_salts=n_salts if hot_keys else 1)
    return left_ds.map_batches(
        task_callable(BucketedInnerJoin, bucket_refs=refs, key=key,
                      num_buckets=num_buckets,
                      n_salts=n_salts if hot_keys else 1),
        batch_format="pyarrow",
    )


def salted_left_join(left_ds, right: pa.Table, key: str,
                     num_buckets: int = 32, hot_keys: set | None = None,
                     n_salts: int = 4):
    """Left OUTER join left_ds ⟕ right on `key` (misses keep the left
    row with null payload columns), bucketed + hot-key salted."""
    from webvalid.rayutil import task_callable

    refs = build_right_buckets(right, key, num_buckets, hot_keys=hot_keys,
                               n_salts=n_salts if hot_keys else 1)
    return left_ds.map_batches(
        task_callable(BucketedInnerJoin, bucket_refs=refs, key=key,
                      num_buckets=num_buckets,
                      n_salts=n_salts if hot_keys else 1,
                      join_type="left outer"),
        batch_format="pyarrow",
    )


def bloom_anti_join(left_ds, right_keys, key: str, fpr: float = 0.01):
    """One-sided anti-join for reference key sets beyond sorted-array
    broadcast scale (~1.2 B/key at 1% FPR vs 8 B/key): keep rows whose
    key the Bloom filter DEFINITELY lacks.

    Guarantee direction (same as the engine's fingerprint checks):
    every returned row is a REAL miss — the filter never reports false
    negatives — while a ~fpr fraction of true misses is hidden by
    false positives. Exact results need the sorted-array or shuffle
    paths; this is the memory-bound fallback, and the trade is
    explicit in the name.
    """
    import pyarrow.compute as pc  # noqa: F401  (parity with siblings)

    from webvalid.rayutil import task_callable
    from webvalid.sketches import BloomFilter, hash64

    keys_np = np.asarray(
        right_keys.to_numpy(zero_copy_only=False)
        if hasattr(right_keys, "to_numpy") else right_keys)
    if keys_np.dtype == object:
        keys_np = keys_np[np.asarray([k is not None for k in keys_np], bool)]
    else:
        keys_np = keys_np[~pd_isna(keys_np)]
    # INTEGER keys hash as float64 — exact only below 2^53. An int key
    # past that can round to the SAME double as a distinct probe key, so
    # genuine orphans would read 'present' deterministically (a
    # systematic miss, unlike the advertised probabilistic FPR). Enforce
    # the contract instead of documenting it: with no build key >= 2^53,
    # probe keys past 2^53 round to doubles that equal no exact build
    # double, so they still miss correctly. Native-float columns are
    # exempt at build time: their values ARE float64 already (e.g.
    # epoch-ns floats), so canonicalization is lossless at any magnitude
    # and float probes hash identically. But an INTEGER probe against a
    # float build key >= 2^53 still rounds on the probe cast and can
    # collide with a representable build double (2^53+1 -> 2^53), so
    # that mixed case raises at probe time instead (see _BloomAnti).
    build_big = False
    if len(keys_np) and keys_np.dtype.kind in "iuf":
        build_big = (float(np.abs(keys_np.astype(np.float64)).max())
                     >= float(1 << 53))
    if build_big and keys_np.dtype.kind in "iu":
        raise ValueError(
            "bloom_anti_join: build-side keys at or beyond 2^53 are "
            "not exactly representable as float64 and would hide "
            "real orphans — use the sorted-array or shuffle anti-join"
        )
    bf = BloomFilter.for_capacity(len(keys_np), fpr=fpr)
    # canonical dtype: the probe side hashes the column's native array,
    # so the build side must hash the SAME canonical form (forcing
    # dtype=object here made every present numeric key a "miss")
    bf.add_hashes(hash64(_canon_for_hash(keys_np)))
    bf_ref = ray.put(bf.serialize())

    return left_ds.map_batches(
        task_callable(_BloomAnti, ref=bf_ref, key=key, build_big=build_big),
        batch_format="pyarrow",
    )


class _BloomAnti:
    def __init__(self, ref, key: str, build_big: bool = False):
        from webvalid.sketches import BloomFilter

        self.bf = BloomFilter.deserialize(ray.get(ref))
        self.key = key
        self.build_big = build_big

    def __call__(self, t: pa.Table) -> pa.Table:
        vals = t[self.key].to_numpy(zero_copy_only=False)
        if vals.dtype == object:
            null = np.asarray([v is None for v in vals], bool)
        else:
            null = pd_isna(vals)
        # integer probe values >= 2^53 round on the float64 cast; safe
        # when NO build key reaches 2^53 (rounded probes equal no build
        # double), a deterministic-hidden-orphan risk when one does
        if (self.build_big and vals.dtype.kind in "iu" and len(vals)
                and float(np.abs(vals.astype(np.float64)).max())
                >= float(1 << 53)):
            raise ValueError(
                "bloom_anti_join: integer probe keys at or beyond 2^53 "
                "against a float build side reaching 2^53 round on the "
                "float64 cast and would hide real orphans — use the "
                "sorted-array or shuffle anti-join"
            )
        miss = ~self.bf.contains_hashes(hash64(_canon_for_hash(vals)))
        return t.filter(pa.array(miss | null))


def salted_full_join(left_ds, right: pa.Table, key: str,
                     num_buckets: int = 32, hot_keys: set | None = None,
                     n_salts: int = 4):
    """FULL OUTER join = left outer UNION right-only rows (USING-style:
    one coalesced key column; left payload columns null-filled on the
    right-only side).

    The right-only side needs the LEFT side's distinct key set — the
    streamed pass ships vocabulary-sized per-batch distinct partials,
    never rows (same key-domain-fits-driver contract as the setops
    driver strategy; for unbounded key domains use the shuffle join).
    """
    lo = salted_left_join(left_ds, right, key, num_buckets=num_buckets,
                          hot_keys=hot_keys, n_salts=n_salts)

    def distinct_keys(t: pa.Table) -> pa.Table:
        col = t[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({key: pc.unique(pc.drop_null(col))})

    parts = left_ds.select_columns([key]).map_batches(
        distinct_keys, batch_format="pyarrow").to_pandas()
    left_keys = np.unique(parts[key].to_numpy())
    miss = ~_in_sorted_keys(left_keys,
                            right[key].to_numpy(zero_copy_only=False))
    right_only = right.filter(pa.array(miss))

    left_schema = left_ds.schema()
    cols: dict = {}
    for name, typ in zip(left_schema.names, left_schema.types):
        if name == key:
            cols[name] = right_only[key]
        else:
            cols[name] = pa.nulls(right_only.num_rows, typ)
    for name in right.column_names:
        if name != key:
            cols[name] = right_only[name]
    import ray.data as _rd

    return lo.union(_rd.from_arrow(pa.table(cols)))


def broadcast_range_join(left_ds, intervals: pa.Table, ts_col: str,
                         start_col: str, end_col: str):
    """Interval/range join: keep left rows whose `ts_col` falls inside
    one of the half-open [start, end) intervals and tag them with the
    interval's columns.

    The interval table (small side) is broadcast ONCE as plain sorted
    numpy arrays via ray.put; per batch, membership is two vectorized
    searchsorted/compare passes — no shuffle, no per-row Python.
    Intervals must be NON-overlapping (checked at build time): a row
    can land in at most one, so `searchsorted(starts, ts) - 1` plus an
    end-bound check resolves it. Overlapping interval sets are a
    different operator (explode + join) by design.
    """
    starts = intervals[start_col].to_numpy(zero_copy_only=False)
    order = np.argsort(starts, kind="stable")
    starts = starts[order]
    ends = intervals[end_col].to_numpy(zero_copy_only=False)[order]
    if np.any(ends[:-1] > starts[1:]):
        raise ValueError("broadcast_range_join needs non-overlapping "
                         "intervals (sorted ends must not pass the next "
                         "start)")
    payload = {c: intervals[c].to_numpy(zero_copy_only=False)[order]
               for c in intervals.column_names}
    # carry the arrow types: a zero-hit batch would otherwise emit its
    # payload columns as type null (inferred from an empty object
    # array), making blocks disagree on the schema
    ptypes = {c: intervals.schema.field(c).type
              for c in intervals.column_names}
    ref = ray.put((starts, ends, payload, ptypes))

    class _RangeJoin:
        def __init__(self, ref):
            (self.starts, self.ends, self.payload,
             self.ptypes) = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ts = t[ts_col].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.starts, ts, side="right") - 1
            safe = np.clip(idx, 0, None)
            ok = (idx >= 0) & (ts < self.ends[safe])
            sel = np.flatnonzero(ok)
            out = t.take(pa.array(sel, pa.int64()))
            hit = idx[sel]
            for c, vals in self.payload.items():
                if c not in out.column_names:
                    out = out.append_column(
                        c, pa.array(vals[hit], type=self.ptypes[c]))
            return out

    from webvalid.rayutil import task_callable

    return left_ds.map_batches(task_callable(_RangeJoin, ref=ref),
                               batch_format="pyarrow")


def write_bucketed(ds, key: str, out_dir: str, num_buckets: int):
    """Materialize a dataset into `out_dir/bucket=<i>/` parquet,
    bucketed by hash(key) % num_buckets — the storage layout half of
    the storage-partitioned join. One streaming pass; each task
    appends only to its rows' bucket directories."""
    def tag(t: pa.Table) -> pa.Table:
        b = bucket_of(t[key].to_numpy(zero_copy_only=False), num_buckets)
        return t.append_column("bucket", pa.array(b, pa.int64()))

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"])
    # record the bucket count: joining layouts bucketed with DIFFERENT
    # counts would silently drop matches (keys land in different
    # bucket ids) — storage_partitioned_join cross-checks this
    import json
    import os

    with open(os.path.join(out_dir, "_buckets.json"), "w") as f:
        json.dump({"key": key, "num_buckets": num_buckets,
                   "hash_scheme": HASH_SCHEME}, f)


@ray.remote
def _join_bucket(left_files: list, right_files: list, key: str,
                 how: str, right_schema_file: str) -> pa.Table:
    import pyarrow.parquet as pq

    lt = pa.concat_tables([pq.read_table(f) for f in left_files])
    rt = (pa.concat_tables([pq.read_table(f) for f in right_files])
          if right_files
          else pq.read_schema(right_schema_file).empty_table())
    out = lt.join(rt, keys=key, join_type=how)
    return out.drop_columns([c for c in ("bucket",) if c in out.column_names])


def storage_partitioned_join(left_dir: str, right_dir: str, key: str,
                             how: str = "inner"):
    """Join two `write_bucketed` layouts bucket-by-bucket with NO
    shuffle: co-located buckets ship straight from storage into one
    Arrow hash join task each — the classic bucketed-table join that
    turns a repeated 100-TB exchange into a one-time layout cost.
    Buckets missing on either side contribute nothing for inner joins
    (and left rows join nothing for left outer). Returns a Dataset
    over the per-bucket join outputs."""
    import glob
    import os

    import ray.data

    def buckets(d: str) -> dict[int, list]:
        out: dict[int, list] = {}
        for p in glob.glob(os.path.join(d, "bucket=*")):
            out[int(os.path.basename(p).split("=")[1])] = sorted(
                glob.glob(os.path.join(p, "*.parquet")))
        return out

    if how not in ("inner", "left outer"):
        raise ValueError("storage_partitioned_join supports 'inner' and "
                         "'left outer' only (right/full outer would need "
                         "right-only buckets scheduled too)")
    def bucket_meta(d: str):
        import json
        try:
            with open(os.path.join(d, "_buckets.json")) as f:
                return json.load(f)
        except OSError:
            # a layout with NO metadata is strictly LESS trustworthy
            # than one with an unversioned metadata file — refusing the
            # latter but accepting the former would leave the silent-
            # dropped-matches hole open
            raise ValueError(
                f"{d} has no _buckets.json — cannot verify bucket count "
                f"or hash scheme; rewrite the layout with write_bucketed")

    ml, mr = bucket_meta(left_dir), bucket_meta(right_dir)
    if ml["num_buckets"] != mr["num_buckets"]:
        raise ValueError(
            f"bucket-count mismatch: left written with {ml['num_buckets']} "
            f"buckets, right with {mr['num_buckets']} — co-located joining "
            f"would silently drop matches; rewrite one side with the "
            f"other's count")
    # the hash SCHEME must match too: a layout bucketed under an older
    # canonicalization routes equal keys to different bucket ids, and
    # the bucket-count check cannot see that. An unversioned layout
    # (pre-scheme-tag _buckets.json) is refused for the same reason.
    for side, m in (("left", ml), ("right", mr)):
        scheme = m.get("hash_scheme")
        if scheme != HASH_SCHEME:
            raise ValueError(
                f"{side} layout was bucketed under hash scheme "
                f"{scheme!r} but this engine uses {HASH_SCHEME!r} — "
                f"equal keys would land in different buckets and "
                f"silently drop matches; rewrite the layout with "
                f"write_bucketed")
    lb, rb = buckets(left_dir), buckets(right_dir)
    if not rb:
        raise ValueError("right layout has no populated buckets")
    try:
        schema_file = next(f for fs in rb.values() if fs for f in fs[:1])
    except StopIteration:
        raise ValueError("right layout has no parquet files")
    ids = sorted(set(lb) & set(rb)) if how == "inner" else sorted(lb)
    refs = [_join_bucket.remote(lb[i], rb.get(i, []), key, how, schema_file)
            for i in ids if lb.get(i)]
    if not refs:
        raise ValueError("no populated buckets to join")
    return ray.data.from_arrow_refs(refs)
