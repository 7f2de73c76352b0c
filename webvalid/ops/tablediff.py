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

import numpy as np
import pandas as pd
import pyarrow as pa


def _row_fingerprints(t: pa.Table, key_col: str, cols: list[str]) -> pa.Table:
    """(key, int64 fingerprint) — 8-byte md5 prefix over the
    '\\x1f'-joined canonical string forms of `cols` (NULL → '\\x00').
    Fully Arrow-side: cast-to-string + one binary_join_element_wise,
    then buffer-level hashing (`_md5_digest8_per_row` — no Python
    strings). Arrow's cast renders equal values identically on both
    snapshots, which is the only property the diff needs; only
    EQUALITY of fingerprints matters downstream, and Ray aggregates
    int64 natively."""
    import pyarrow.compute as pc

    from webvalid.checks.text_parity import _md5_digest8_per_row

    parts = [pc.fill_null(pc.cast(t[c], pa.string()), "\x00") for c in cols]
    joined = parts[0] if len(parts) == 1 else \
        pc.binary_join_element_wise(*parts, "\x1f")
    _, d8 = _md5_digest8_per_row(joined)
    return pa.table({"key": t[key_col].cast(pa.int64()),
                     "fp": pa.array(d8.view(np.int64), pa.int64())})


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
