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
    """Dataset of (column, count) for keys appearing more than once."""
    import pyarrow.compute as pc

    counts = ds.select_columns([column]).groupby(column).count()
    return counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], 1)), batch_format="pyarrow"
    )


class _CollectDupRows:
    """map_batches semi-join against the broadcast duplicate-key set."""

    def __init__(self, dup_ref, column: str, check_name: str):
        self.dups = set(ray.get(dup_ref))
        self.column = column
        self.check_name = check_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch[self.column].to_numpy(zero_copy_only=False)
        mask = np.array([v in self.dups for v in vals], dtype=bool)
        idx = np.flatnonzero(mask)
        pids = batch["partition_id"].to_numpy()
        return pa.table(
            {
                "partition_id": pa.array(pids[idx], pa.int64()),
                "check": pa.array([self.check_name] * len(idx), pa.string()),
                "url": pa.array(vals[idx].astype(object), pa.string()),
                "reason": pa.array(["duplicate"] * len(idx), pa.string()),
            }
        )


def uniqueness_check(ds, cfg: CheckConfig, column: str = "url",
                     check_name: str = "uniqueness"):
    """Returns (violations_table, dup_key_count).

    `ds` must already carry partition_id and the key column.
    """
    dup_ds = duplicate_keys(ds, column)
    dup_keys = [r[column] for r in dup_ds.take_all()]  # small by construction
    if not dup_keys:
        return pa.table(
            {
                "partition_id": pa.array([], pa.int64()),
                "check": pa.array([], pa.string()),
                "url": pa.array([], pa.string()),
                "reason": pa.array([], pa.string()),
            }
        ), 0
    dup_ref = ray.put(dup_keys)
    violations = ds.select_columns([column, "partition_id"]).map_batches(
        _CollectDupRows,
        fn_constructor_kwargs={"dup_ref": dup_ref, "column": column, "check_name": check_name},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    vtab = pa.Table.from_pandas(violations.to_pandas(), preserve_index=False)
    return vtab, len(dup_keys)


def uniqueness_verdicts(violations: pa.Table, all_partitions: list[int],
                        check_name: str = "uniqueness", column: str = "url") -> list[dict]:
    """Per-partition pass/fail from the (small) violations table."""
    per_part: dict[int, int] = {}
    for pid in violations["partition_id"].to_pylist():
        per_part[pid] = per_part.get(pid, 0) + 1
    return [
        verdict_row(pid, check_name, column, per_part.get(pid, 0) == 0,
                    float(per_part.get(pid, 0)), "dup rows in partition")
        for pid in all_partitions
    ]
