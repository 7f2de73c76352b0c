"""Referential-integrity check: key columns vs reference key tables.

north_rule capability (no reference analogue — SURVEY.md §2.4).

Scale shape: reference tables that fit in memory (the common case —
lang codes, host registries) are broadcast ONCE via `ray.put` and the
anti-join is a vectorized not-in filter inside an actor-pool
`map_batches` (the actor resolves the ObjectRef once in `__init__`,
not per batch). For reference tables too large to broadcast, use the
salted co-partitioned hash-join path: bucket both sides by
`hash(key) % B` (salting hot keys into sub-buckets), group by bucket,
and anti-join per bucket — implemented in webvalid/ops/joins.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from webvalid.checks.base import CheckConfig, verdict_row


class RefCheckBatcher:
    """Actor-pool map_batches callable: violations for values missing
    from the broadcast reference key sets.

    `ref_sets_ref` is a `ray.put` ObjectRef of {column: frozenset(valid)}.
    """

    def __init__(self, ref_sets_ref):
        self.ref_sets: dict[str, frozenset] = ray.get(ref_sets_ref)
        # Arrow value-set arrays built once per actor for vectorized is_in.
        self._value_sets = {
            col: pa.array(sorted(vals), pa.string()) for col, vals in self.ref_sets.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        pids_out: list[np.ndarray] = []
        checks: list[str] = []
        urls_out: list[np.ndarray] = []
        reasons: list[str] = []
        n_out = 0
        parts = []
        for col, value_set in self._value_sets.items():
            ok = pc.is_in(batch[col], value_set=value_set)
            bad = pc.fill_null(pc.invert(ok), True)
            idx = np.flatnonzero(bad.to_numpy(zero_copy_only=False))
            if len(idx) == 0:
                continue
            sub = batch.take(pa.array(idx))
            vals = sub[col].to_pylist()
            parts.append(
                pa.table(
                    {
                        "partition_id": sub["partition_id"].cast(pa.int64()),
                        "check": pa.array([f"referential_{col}"] * len(idx), pa.string()),
                        "url": sub["url"].cast(pa.string()),
                        "reason": pa.array(
                            [f"{col}={v!r} not in reference" for v in vals], pa.string()
                        ),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "partition_id": pa.array([], pa.int64()),
                    "check": pa.array([], pa.string()),
                    "url": pa.array([], pa.string()),
                    "reason": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(parts)


def load_ref_sets(paths: dict[str, tuple[str, str]]) -> dict[str, frozenset]:
    """{check_column: (parquet_path, key_column)} → {check_column: frozenset}."""
    import pyarrow.parquet as pq

    out = {}
    for col, (path, key_col) in paths.items():
        t = pq.read_table(path, columns=[key_col])
        out[col] = frozenset(t[key_col].to_pylist())
    return out


def referential_verdicts(violations: pa.Table, all_partitions: list[int],
                         columns: list[str]) -> list[dict]:
    per: dict[tuple[int, str], int] = {}
    for pid, check in zip(
        violations["partition_id"].to_pylist(), violations["check"].to_pylist()
    ):
        per[(pid, check)] = per.get((pid, check), 0) + 1
    rows = []
    for col in columns:
        check = f"referential_{col}"
        for pid in all_partitions:
            c = per.get((pid, check), 0)
            rows.append(verdict_row(pid, check, col, c == 0, float(c), "orphan keys"))
    return rows
