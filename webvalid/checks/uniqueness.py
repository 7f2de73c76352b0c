"""Uniqueness check: duplicate detection on a key column (url).

north_rule capability (no reference analogue; generalizes the per-block
distinct-domain machinery, reference: CDCStream/DatabaseStatistics.java:50-59).

Scale shape: `groupby(key).count()` is the one genuine all-to-all
shuffle in the suite — but it ships only the key column, never payload
(html stays columnar-pruned at the read). The duplicate key set is then
assumed small (violations are rare by construction) and broadcast back
via `ray.put` for a vectorized semi-join inside `map_batches` that
collects the violating rows with their partitions. Keys are
near-unique, so the shuffle has no hot keys and needs no salting; for
adversarial key skew, pre-salt with `hash(key) % S` and re-merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from webvalid.checks.base import CheckConfig, verdict_row, violation_row


def duplicate_keys(ds, column: str):
    """Dataset of (column, count) for keys appearing more than once.

    Shuffle path (ray groupby) — kept for very large key spaces where
    the hash-collect path's driver memory (8 bytes/row) won't fit; at
    multi-node 10^12-row scale this is the route, pre-bucketed by
    hash(key) % B.
    """
    import pyarrow.compute as pc

    counts = ds.select_columns([column]).groupby(column).count()
    return counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)), batch_format="pyarrow"
    )


def _dup_hash_candidates(ds, column: str) -> np.ndarray:
    """Find duplicate-key *hash* candidates without a shuffle.

    Streams only a uint64 hash per row to the driver (8 B/row — e.g.
    8 GB per 10^9 rows) and finds repeated hashes vectorized. Returns
    the candidate hash values (superset of true dup keys: includes any
    hash collisions, which pass 2 filters exactly by key).
    """
    from webvalid.sketches import hash64

    def to_hash(t: pa.Table) -> pa.Table:
        vals = t[column].to_numpy(zero_copy_only=False)
        return pa.table({"h": pa.array(hash64(vals), pa.uint64())})

    hash_ds = ds.select_columns([column]).map_batches(to_hash, batch_format="pyarrow")
    chunks = [b["h"].to_numpy() for b in hash_ds.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")]
    if not chunks:
        return np.empty(0, dtype=np.uint64)
    all_hashes = np.concatenate(chunks)
    uniq, counts = np.unique(all_hashes, return_counts=True)
    return uniq[counts > 1]


def _collect_candidate_rows_fn(cand_ref, column: str):
    """Task-based map_batches semi-join against the broadcast
    candidate-hash set (vectorized np.isin on uint64 hashes; plasma get
    of the shared array is cached per worker — cheaper than spinning an
    actor pool for a pass that usually touches few rows)."""

    def fn(batch: pa.Table) -> pa.Table:
        from webvalid.sketches import hash64

        cand = ray.get(cand_ref)
        vals = batch[column].to_numpy(zero_copy_only=False)
        h = hash64(vals)
        idx = np.flatnonzero(np.isin(h, cand, assume_unique=False))
        pids = batch["partition_id"].to_numpy()
        return pa.table(
            {
                "partition_id": pa.array(pids[idx], pa.int64()),
                "url": pa.array(vals[idx].astype(object), pa.string()),
            }
        )

    return fn


def _empty_violations() -> pa.Table:
    return pa.table(
        {
            "partition_id": pa.array([], pa.int64()),
            "check": pa.array([], pa.string()),
            "url": pa.array([], pa.string()),
            "reason": pa.array([], pa.string()),
        }
    )


def collect_dup_rows(ds, cand: np.ndarray, cfg: CheckConfig, column: str = "url",
                     check_name: str = "uniqueness"):
    """Pass 2: given candidate dup-key hashes, collect the matching rows
    and group exactly by key driver-side (hash collisions filtered).

    Returns (violations_table capped at cfg.max_violations_per_check,
    dup_key_count, exact per-partition violation counts). Verdicts must
    use the counts dict, not the capped row sample.
    """
    if len(cand) == 0:
        return _empty_violations(), 0, {}
    cand_ref = ray.put(np.sort(cand))
    rows = ds.select_columns([column, "partition_id"]).map_batches(
        _collect_candidate_rows_fn(cand_ref, column),
        batch_format="pyarrow",
    ).to_pandas()
    counts = rows.groupby("url")["partition_id"].transform("size")
    rows = rows[counts > 1]  # drop hash-collision singletons
    if len(rows) == 0:
        return _empty_violations(), 0, {}
    per_part = rows.groupby("partition_id").size().to_dict()
    n_keys = int(rows["url"].nunique())
    rows = rows.head(cfg.max_violations_per_check)
    vtab = pa.table(
        {
            "partition_id": pa.array(rows["partition_id"].to_numpy(), pa.int64()),
            "check": pa.array([check_name] * len(rows), pa.string()),
            "url": pa.array(rows["url"].astype(object), pa.string()),
            "reason": pa.array(["duplicate"] * len(rows), pa.string()),
        }
    )
    return vtab, n_keys, {int(k): int(v) for k, v in per_part.items()}


def _dups_in(arrays: list[np.ndarray]) -> np.ndarray:
    if not arrays:
        return np.empty(0, dtype=np.uint64)
    s = np.sort(np.concatenate(arrays))
    dup = s[1:][s[1:] == s[:-1]]
    if len(dup) == 0:
        return dup
    return np.unique(dup)


def dup_candidates_from_hash_arrays(hash_blobs: list[bytes],
                                    n_buckets: int = 16) -> np.ndarray:
    """Pass 1 over pre-collected uint64 hash blobs (one per batch,
    emitted by the main partial pass): repeated hash values.

    The O(n log n) sort is sharded by the hashes' top bits into
    `n_buckets` Ray tasks so candidate-finding parallelizes instead of
    serializing the driver (duplicates can only collide within a
    bucket). Falls back to a local sort for small inputs.
    """
    if not hash_blobs:
        return np.empty(0, dtype=np.uint64)
    arrays = [np.frombuffer(b, dtype=np.uint64) for b in hash_blobs]
    total = sum(len(a) for a in arrays)
    if total < 4_000_000 or not ray.is_initialized():
        return _dups_in(arrays)

    shift = np.uint64(64 - int(np.log2(n_buckets)))
    boundaries = (np.arange(1, n_buckets, dtype=np.uint64) << shift)
    buckets: list[list[np.ndarray]] = [[] for _ in range(n_buckets)]
    for a in arrays:
        # the partial pass emits blobs PRE-SORTED (sorted in the
        # parallel scan tasks), so bucketing is n_buckets-1 binary
        # searches; the argsort fallback keeps unsorted blobs (older
        # checkpoints, other callers) correct — the is-sorted check is
        # ~70x cheaper than sorting
        if len(a) < 2 or bool((a[1:] >= a[:-1]).all()):
            bounds = np.searchsorted(a, boundaries)
        else:
            b = (a >> shift).astype(np.int64)
            order = np.argsort(b, kind="stable")
            a, sorted_b = a[order], b[order]
            bounds = np.searchsorted(sorted_b, np.arange(1, n_buckets))
        for i, chunk in enumerate(np.split(a, bounds)):
            if len(chunk):
                buckets[i].append(chunk)

    dups_task = ray.remote(_dups_in)
    refs = [dups_task.remote(chunks) for chunks in buckets if chunks]
    found = ray.get(refs)
    found = [f for f in found if len(f)]
    if not found:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(found)


def uniqueness_check(ds, cfg: CheckConfig, column: str = "url",
                     check_name: str = "uniqueness"):
    """Standalone two-pass uniqueness check (no shuffle): (1) stream
    per-row uint64 key hashes to the driver, find repeats vectorized;
    (2) collect rows matching the (rare) candidate hashes and group
    exactly. `ds` must already carry partition_id and the key column.
    Returns (capped violations table, dup key count, per-partition
    exact counts)."""
    cand = _dup_hash_candidates(ds, column)
    return collect_dup_rows(ds, cand, cfg, column=column, check_name=check_name)


def dup_candidates_via_shuffle(ds, column: str) -> np.ndarray:
    """Pass-1 cutover route: duplicate-key candidates via the
    groupby-count shuffle (nothing O(rows) reaches the driver; only the
    rare duplicate keys come back, as hashes for the shared pass 2)."""
    from webvalid.sketches import hash64

    dup = duplicate_keys(ds, column).to_pandas()
    if len(dup) == 0:
        return np.empty(0, dtype=np.uint64)
    return np.unique(hash64(dup[column].to_numpy()))


def uniqueness_verdicts(per_part: dict[int, int], all_partitions: list[int],
                        check_name: str = "uniqueness", column: str = "url") -> list[dict]:
    """Per-partition pass/fail from exact per-partition dup-row counts."""
    return [
        verdict_row(pid, check_name, column, per_part.get(pid, 0) == 0,
                    float(per_part.get(pid, 0)), "dup rows in partition")
        for pid in all_partitions
    ]
