"""Snapshot diff: key-level comparison of two table versions.

The regression-check primitive a validation engine runs between
pipeline releases: given an OLD and a NEW snapshot sharing a key
column, classify every key as added / removed / changed (same key,
different row content) — unchanged keys are never surfaced.

Scale shape: each side collapses to (key, row-fingerprint uint64)
pairs inside `map_batches` (full-row md5 over the canonicalized
column values), then ONE Ray hash groupby over the union classifies
keys by which sides contributed — only 16 B/row ever shuffles, and
the output is diff-sized, not table-sized. This mirrors the exact
dedup shape (`ops/dedup.exact_dedup_groups`): fingerprints through
the shuffle, never payloads.

No reference analogue; north-rule / validation addition.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _row_fingerprints(t: pa.Table, key_col: str, cols: list[str]) -> pa.Table:
    """(key, uint64 fingerprint) — md5 over '\\x1f'-joined canonical
    string forms of `cols` (None → '\\x00'); floats via repr so equal
    doubles hash equal."""
    n = t.num_rows
    parts = []
    for c in cols:
        col = t[c]
        if pa.types.is_floating(col.type):
            vals = [("\x00" if v is None else repr(v))
                    for v in col.to_pylist()]
        else:
            vals = [("\x00" if v is None else str(v)) for v in col.to_pylist()]
        parts.append(vals)
    fps = np.empty(n, dtype=np.uint64)
    for i in range(n):
        h = hashlib.md5("\x1f".join(p[i] for p in parts).encode()).digest()
        fps[i] = np.frombuffer(h[:8], dtype=np.uint64)[0]
    # int64 view: only EQUALITY of fingerprints matters downstream, and
    # Ray/pandas aggregate int64 natively
    return pa.table({"key": t[key_col].cast(pa.int64()),
                     "fp": pa.array(fps.view(np.int64), pa.int64())})


def snapshot_diff(old_ds, new_ds, key_col: str, cols: list[str]):
    """DataFrame of (key, status) for keys that differ between the
    snapshots; status in {'added', 'removed', 'changed'}. Requires
    unique keys per side (asserted post-aggregate). Returns sorted by
    key."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def fp_side(side_flag: int):
        def fn(t: pa.Table) -> pa.Table:
            out = _row_fingerprints(t, key_col, cols)
            return out.append_column(
                "side", pa.array(np.full(out.num_rows, side_flag, np.int64)))
        return fn

    both = old_ds.map_batches(fp_side(1), batch_format="pyarrow").union(
        new_ds.map_batches(fp_side(2), batch_format="pyarrow"))
    g = both.groupby("key").aggregate(
        Sum("side", alias_name="sides"), Count(alias_name="cnt"),
        Min("fp", alias_name="fp_min"), Max("fp", alias_name="fp_max"),
    ).to_pandas()
    if ((g["sides"] == 3) != (g["cnt"] == 2)).any() or (g["cnt"] > 2).any():
        raise ValueError("snapshot_diff needs unique keys per side")
    status = np.where(
        g["sides"] == 1, "removed",
        np.where(g["sides"] == 2, "added",
                 np.where(g["fp_min"] != g["fp_max"], "changed", "")))
    out = pd.DataFrame({"key": g["key"].astype("int64"), "status": status})
    out = out[out["status"] != ""]
    return out.sort_values("key", kind="mergesort").reset_index(drop=True)
