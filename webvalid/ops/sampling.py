"""Deterministic content-hash dataset splitting and stratified sampling.

Training-data pipelines need reproducible train/valid/test splits and
per-stratum downsampling (e.g. cap the dominant language) that

- don't depend on row order, partitioning, or cluster size,
- never require a shuffle (pure map stage), and
- can be recomputed by any other system, because the assignment is a
  pure function of row CONTENT.

We key on ``md5(text)``: the first 16 bits of the digest give 65,536
deterministic buckets; a row's bucket is stable across runs, engines
and partitionings. A fraction ``f`` selects buckets ``< int(f * 65536)``.
DuckDB expresses the identical split as a lexicographic comparison on
``substr(md5(text), 1, 4)`` (fixed-width lowercase hex compares like the
number), which is what the gate-query oracles do.

Scale: one C md5 per row streamed straight from the Arrow string
buffers (no Python string materialization — see
``checks/text_parity._md5_digest8_per_row``), no state, no shuffle.
At 100 TB this stage is embarrassingly parallel and its output
composes with any downstream partitioning.

No reference analogue (`/root/reference` has no sampling); this is a
north-rule/training-data addition per the build brief.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from webvalid.checks.text_parity import _md5_digest8_per_row

BUCKETS = 65536


def md5_bucket16(col) -> tuple[np.ndarray, np.ndarray]:
    """(valid_mask, uint16 bucket per row) from the first two md5 digest
    bytes — equals ``int(md5(text).hexdigest()[:4], 16)``.

    ``_md5_digest8_per_row`` returns the first 8 digest bytes as a
    little-endian uint64, so digest[0] is the low byte.
    """
    valid, d8 = _md5_digest8_per_row(col)
    b0 = (d8 & np.uint64(0xFF)).astype(np.uint32)
    b1 = ((d8 >> np.uint64(8)) & np.uint64(0xFF)).astype(np.uint32)
    return valid, ((b0 << 8) | b1).astype(np.uint16)


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """Cumulative bucket thresholds for named split fractions.

    ``{"train": .8, "valid": .1, "test": .1}`` →
    ``[("train", 52428), ("valid", 58982), ("test", 65536)]``
    (floor per cumulative fraction; the last split absorbs rounding and
    any remainder, matching the SQL CASE's ELSE branch).
    """
    items = list(fractions.items())
    if not items:
        raise ValueError("split fractions must be non-empty")
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(
            f"split fractions sum to {total:.4f} > 1 — overlapping "
            f"cumulative thresholds would silently starve later splits")
    out, cum = [], 0.0
    for name, frac in items[:-1]:
        cum += frac
        out.append((name, int(cum * BUCKETS)))
    out.append((items[-1][0], BUCKETS))
    return out


def add_split_column(batch: pa.Table, text_col: str = "text",
                     thresholds: list[tuple[str, int]] | None = None,
                     out_col: str = "split") -> pa.Table:
    """Append the deterministic split assignment as a string column.

    Null text falls into the LAST split (the SQL CASE ELSE branch —
    ``substr(md5(NULL),1,4)`` is NULL so every WHEN is false).
    """
    if thresholds is None:
        thresholds = split_thresholds({"train": 0.8, "valid": 0.1, "test": 0.1})
    valid, bucket = md5_bucket16(batch[text_col])
    names = [t[0] for t in thresholds]
    bounds = np.asarray([t[1] for t in thresholds])
    idx = np.searchsorted(bounds, bucket, side="right")
    idx = np.minimum(idx, len(names) - 1)
    idx[~valid] = len(names) - 1
    dict_arr = pa.DictionaryArray.from_arrays(
        pa.array(idx, pa.int32()), pa.array(names, pa.string())
    )
    return batch.append_column(out_col, dict_arr.cast(pa.string()))


def hash_split(ds, text_col: str = "text",
               fractions: dict[str, float] | None = None,
               out_col: str = "split"):
    """Dataset → Dataset with a deterministic `split` column."""
    th = split_thresholds(fractions or {"train": 0.8, "valid": 0.1, "test": 0.1})
    return ds.map_batches(
        lambda t: add_split_column(t, text_col, th, out_col),
        batch_format="pyarrow",
    )


def stratified_sample(ds, strat_col: str = "lang", rates: dict[str, float] | None = None,
                      default_rate: float = 1.0, text_col: str = "text"):
    """Deterministic per-stratum downsample: keep a row iff its md5
    bucket is below ``rate(stratum) * 65536``.

    The canonical "cap the dominant language" op: hot strata get a low
    rate, the tail passes through. Selection is content-keyed, so the
    sample is stable under repartitioning and resumable reruns — a
    resumed job keeps exactly the rows the first attempt kept.
    """
    rates = rates or {}
    rate_items = sorted(rates.items())
    keys = [k for k, _ in rate_items]
    th = np.asarray([int(v * BUCKETS) for _, v in rate_items], dtype=np.int64)
    default_th = int(default_rate * BUCKETS)

    def keep(batch: pa.Table) -> pa.Table:
        valid, bucket = md5_bucket16(batch[text_col])
        strata = np.asarray(batch[strat_col].to_pylist(), dtype=object)
        # null strata take the default rate (the SQL CASE's ELSE branch);
        # they must not reach searchsorted (None is not orderable)
        null_stratum = np.asarray([s is None for s in strata], dtype=bool)
        if len(keys):
            safe = np.where(null_stratum, keys[0], strata)
            pos = np.searchsorted(np.asarray(keys, dtype=object), safe)
            pos = np.minimum(pos, len(keys) - 1)
            known = (np.asarray(keys, dtype=object)[pos] == safe) & ~null_stratum
            row_th = np.where(known, th[pos], default_th)
        else:
            row_th = np.full(len(batch), default_th)
        return batch.filter(pa.array(valid & (bucket < row_th)))

    return ds.map_batches(keep, batch_format="pyarrow")


def bottomk_sample(ds, k: int, text_col: str = "text",
                   id_col: str = "doc_id"):
    """Deterministic uniform k-sample: the k docs with the smallest
    md5(text) (bottom-k / KMV sampling — a uniform sample because the
    hash is uniform, yet reproducible and mergeable, unlike reservoir
    sampling). Each batch ships only its local bottom-k (id, hash)
    pairs; the driver merges O(#batches · k) pairs. Hash order is the
    md5 HEX-string order (digest byte order), so the SQL twin is
    `ORDER BY md5(text), id LIMIT k`; ties between identical texts
    break by id. Returns a sorted pandas DataFrame of ids.
    """
    import pandas as pd

    def local(batch: pa.Table) -> pa.Table:
        valid, d8 = _md5_digest8_per_row(batch[text_col])
        h = d8.byteswap()  # little-endian uint64 -> digest byte order
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(valid)
        if len(sel) > k:
            sub = np.lexsort((ids[sel], h[sel]))[:k]
            sel = sel[sub]
        return pa.table({id_col: pa.array(ids[sel], batch[id_col].type),
                         "_h": pa.array(h[sel], pa.uint64())})

    parts = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["_h", id_col], kind="mergesort").head(k)
    return parts[[id_col]].sort_values(id_col).reset_index(drop=True)


def cap_per_group(ds, group_col: str = "lang", k: int = 50,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Keep at most k rows per group, chosen deterministically by
    (md5(text), id) order — the language/domain-rebalancing cap of a
    training-data mixer (the md5 order is a content-stable uniform
    draw, so the cap is an unbiased per-group subsample).

    Mergeable per-group top-k: each batch keeps its local smallest k
    per group (ships ≤ k·#groups rows), the driver head-k's the
    concatenated partials — no shuffle, no full-column collect.
    SQL twin: ROW_NUMBER() OVER (PARTITION BY group
    ORDER BY md5(text), id) <= k."""
    import pandas as pd

    from webvalid.ops.dedup import md5_hex_from_column

    def local(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            group_col: batch[group_col].to_numpy(zero_copy_only=False),
            id_col: batch[id_col].to_numpy(zero_copy_only=False),
            # full-hex md5 straight off the Arrow buffers — identical
            # order to the SQL twin, no per-row Python string encode
            "_md5": md5_hex_from_column(batch[text_col]),
        })
        df = df[df["_md5"].notna()]
        # dropna=False: a null GROUP is a partition like any other in
        # the SQL twin (PARTITION BY group) — pandas' default silently
        # discarded its rows entirely
        df = df.sort_values([group_col, "_md5", id_col], kind="mergesort") \
               .groupby(group_col, sort=False, dropna=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    kept = parts.sort_values([group_col, "_md5", id_col], kind="mergesort") \
                .groupby(group_col, sort=False, dropna=False).head(k)
    return kept[[group_col, id_col]].sort_values(
        [group_col, id_col], kind="mergesort").reset_index(drop=True)


def systematic_weighted_sample(ds, id_col: str, weight_col: str, step: int):
    """Deterministic probability-proportional-to-size sampling: lay
    every row's INTEGER weight end-to-end along the id-sorted axis and
    keep each row whose span crosses a multiple of `step` (selection
    probability ≈ weight/step, rows with weight ≥ step always kept).

    Same decomposition as `ops/rank.global_row_number`: one sort
    (range partitioning), per-BLOCK (head key, weight sum) partials,
    an O(#blocks) driver prefix, and a re-map pass that adds each
    block's weight offset to its in-block cumulative sum — exact
    int64 arithmetic throughout, so the selected set is reproducible
    on any partition layout. SQL twin: the window cumulative weight
    with integer-division boundary crossing.
    """
    if step < 1:
        raise ValueError(f"step must be >= 1 (got {step}) — step=0 would "
                         f"silently select nothing (int // 0 wraps to 0)")
    import ray as _ray

    sorted_ds = ds.sort(id_col).materialize()

    def head_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: t[id_col].slice(0, 0),
                             "_wsum": pa.array([], pa.int64())})
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: t[id_col].slice(0, 1),
                         "_wsum": pa.array([int(w.sum())], pa.int64())})

    heads = sorted_ds.map_batches(head_partial, batch_size=None,
                                  batch_format="pyarrow").to_pandas()
    heads = heads.sort_values(id_col, kind="mergesort").reset_index(drop=True)
    if heads[id_col].duplicated().any():
        raise ValueError("systematic_weighted_sample needs unique ids "
                         "(duplicate block heads)")
    offsets = heads["_wsum"].cumsum().shift(fill_value=0)
    key_to_off = {k: int(o) for k, o in zip(heads[id_col], offsets)}
    off_ref = _ray.put(key_to_off)

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(w) and w.min() < 0:
            raise ValueError("weights must be non-negative integers")
        off = _ray.get(off_ref)[t[id_col][0].as_py()]
        cum = off + np.cumsum(w)
        before = cum - w
        keep = (before // step) < (cum // step)
        return t.filter(pa.array(keep))

    return sorted_ds.map_batches(pick, batch_size=None,
                                 batch_format="pyarrow")
