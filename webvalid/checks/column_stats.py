"""Per-partition column statistics check.

Generalizes the reference's per-block domain/frequency machinery
(reference: CDCStream/DatabaseStatistics.java:37-91) to typed columns
per BASELINE.json north_rule: null fraction, min/max, distinct count
(HyperLogLog), quantiles (TDigest), plus categorical / numeric
histograms that feed the drift detectors.

Execution shape (scale-first): ONE vectorized `map_batches` pass over
zero-copy Arrow batches emits a tiny pickled partial state per
(partition_id, column, batch); a `groupby(partition_id, column)` merge
over those partials yields the final per-partition stats table. No row
ever shuffles — only O(#partitions × #columns) sketch states.
"""

from __future__ import annotations

import math
import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webvalid.checks.base import CheckConfig, verdict_row
from webvalid.partition import partition_slices
from webvalid.sketches import CategoricalHistogram, HyperLogLog, NumericHistogram, TDigest, hash64

# Which sketches run per column kind.
_NUMERIC_KINDS = ("int", "float", "double", "timestamp")


def _is_numeric(t: pa.DataType) -> bool:
    return (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_timestamp(t)
    )


def _col_to_float(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Non-null values as float64 (timestamps → epoch micros; exact below 2^53)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())
    np_arr = arr.drop_null().to_numpy(zero_copy_only=False)
    return np_arr.astype(np.float64, copy=False)


class ColumnState:
    """Mergeable per-(partition, column) statistic state."""

    __slots__ = ("n", "nulls", "min_num", "max_num", "min_str", "max_str",
                 "hll", "tdigest", "cat_hist", "num_hist", "n_bytes", "max_bytes")

    def __init__(self, cfg: CheckConfig | None = None, kind: str = "str",
                 hist_range: tuple[float, float] | None = None,
                 use_hll: bool = True):
        cfg = cfg or CheckConfig()
        self.n = 0
        self.nulls = 0
        self.min_num = math.inf
        self.max_num = -math.inf
        self.min_str: str | None = None
        self.max_str: str | None = None
        self.hll = HyperLogLog(p=cfg.hll_p) if use_hll else None
        self.tdigest = TDigest(delta=cfg.tdigest_delta) if kind == "num" else None
        self.cat_hist = CategoricalHistogram() if kind == "cat" else None
        self.num_hist = (
            NumericHistogram(hist_range[0], hist_range[1], bins=64) if hist_range else None
        )
        self.n_bytes = 0
        self.max_bytes = 0

    # -- accumulation ------------------------------------------------------

    def update_from_array(self, col, col_type: pa.DataType) -> None:
        self.n += len(col)
        self.nulls += col.null_count
        if pa.types.is_binary(col_type) or pa.types.is_large_binary(col_type):
            sizes = pc.binary_length(col).drop_null()
            if len(sizes):
                self.n_bytes += int(pc.sum(sizes).as_py())
                self.max_bytes = max(self.max_bytes, int(pc.max(sizes).as_py()))
            return
        if _is_numeric(col_type):
            vals = _col_to_float(col)
            if len(vals):
                self.min_num = min(self.min_num, float(vals.min()))
                self.max_num = max(self.max_num, float(vals.max()))
                if self.hll is not None:
                    self.hll.add_hashes(hash64(vals))
                if self.tdigest is not None:
                    self.tdigest.add_array(vals)
                if self.num_hist is not None:
                    self.num_hist.add_array(vals)
            return
        # strings
        nn = col.drop_null()
        if len(nn):
            mm = pc.min_max(nn).as_py()
            lo, hi = mm["min"], mm["max"]
            if self.min_str is None or lo < self.min_str:
                self.min_str = lo
            if self.max_str is None or hi > self.max_str:
                self.max_str = hi
            if self.hll is not None or self.cat_hist is not None:
                np_vals = nn.to_numpy(zero_copy_only=False)
                if self.hll is not None:
                    self.hll.add_hashes(hash64(np_vals))
                if self.cat_hist is not None:
                    self.cat_hist.add(np_vals)

    # -- merge -------------------------------------------------------------

    def merge(self, other: "ColumnState") -> "ColumnState":
        self.n += other.n
        self.nulls += other.nulls
        self.min_num = min(self.min_num, other.min_num)
        self.max_num = max(self.max_num, other.max_num)
        for v in (other.min_str,):
            if v is not None and (self.min_str is None or v < self.min_str):
                self.min_str = v
        for v in (other.max_str,):
            if v is not None and (self.max_str is None or v > self.max_str):
                self.max_str = v
        if self.hll is not None and other.hll is not None:
            self.hll.merge(other.hll)
        elif self.hll is None:
            self.hll = other.hll
        if self.tdigest is not None and other.tdigest is not None:
            self.tdigest.merge(other.tdigest)
        elif self.tdigest is None:
            self.tdigest = other.tdigest
        if self.cat_hist is not None and other.cat_hist is not None:
            self.cat_hist.merge(other.cat_hist)
        elif self.cat_hist is None:
            self.cat_hist = other.cat_hist
        if self.num_hist is not None and other.num_hist is not None:
            self.num_hist.merge(other.num_hist)
        elif self.num_hist is None:
            self.num_hist = other.num_hist
        self.n_bytes += other.n_bytes
        self.max_bytes = max(self.max_bytes, other.max_bytes)
        return self

    def serialize(self) -> bytes:
        return pickle.dumps(self)

    @staticmethod
    def deserialize(blob: bytes) -> "ColumnState":
        return pickle.loads(blob)


def column_kind(name: str, t: pa.DataType, categorical_columns: tuple[str, ...]) -> str:
    if name in categorical_columns:
        return "cat"
    if _is_numeric(t):
        return "num"
    return "str"


class StatsPartial:
    """map_batches callable: batch → partial-state rows.

    Stateless; config captured at construction (pickled once per task).
    `hist_ranges` gives fixed numeric-histogram bounds per column so the
    binned distributions are mergeable across the whole table.
    """

    def __init__(self, cfg: CheckConfig, columns: tuple[str, ...],
                 categorical_columns: tuple[str, ...] = ("lang", "host"),
                 hist_ranges: dict | None = None):
        self.cfg = cfg
        self.columns = columns
        self.categorical = categorical_columns
        self.hist_ranges = hist_ranges or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        pids: list[int] = []
        cols: list[str] = []
        states: list[bytes] = []
        for pid, sub in partition_slices(batch):
            for name in self.columns:
                if name not in sub.column_names:
                    continue  # e.g. html pruned in binary_stats="metadata" mode
                col = sub[name]
                kind = column_kind(name, col.type, self.categorical)
                st = ColumnState(self.cfg, kind=kind,
                                 hist_range=self.hist_ranges.get(name),
                                 use_hll=name in self.cfg.hll_columns)
                st.update_from_array(col.combine_chunks(), col.type)
                pids.append(pid)
                cols.append(name)
                states.append(st.serialize())
        return pa.table(
            {
                "partition_id": pa.array(pids, pa.int64()),
                "column": pa.array(cols, pa.string()),
                "state": pa.array(states, pa.binary()),
            }
        )


def merge_states(group: pa.Table) -> pa.Table:
    """map_groups callable: merge all partial states of one (partition, column)."""
    blobs = group["state"].to_pylist()
    st = ColumnState.deserialize(blobs[0])
    for b in blobs[1:]:
        st.merge(ColumnState.deserialize(b))
    return pa.table(
        {
            "partition_id": pa.array([group["partition_id"][0].as_py()], pa.int64()),
            "column": pa.array([group["column"][0].as_py()], pa.string()),
            "state": pa.array([st.serialize()], pa.binary()),
        }
    )


def stats_rows(merged: list[dict], cfg: CheckConfig) -> list[dict]:
    """Readable per-(partition, column) stats from merged states."""
    out = []
    for row in merged:
        st = ColumnState.deserialize(row["state"])
        qs = (
            st.tdigest.quantiles(cfg.quantiles)
            if st.tdigest is not None and st.tdigest.count
            else [math.nan] * len(cfg.quantiles)
        )
        out.append(
            {
                "partition_id": row["partition_id"],
                "column": row["column"],
                "n": st.n,
                "nulls": st.nulls,
                "null_frac": st.nulls / st.n if st.n else math.nan,
                "min_num": st.min_num if st.min_num != math.inf else math.nan,
                "max_num": st.max_num if st.max_num != -math.inf else math.nan,
                "min_str": st.min_str,
                "max_str": st.max_str,
                "distinct_hll": st.hll.estimate() if st.hll is not None else math.nan,
                **{f"q{int(q * 100):02d}": v for q, v in zip(cfg.quantiles, qs)},
                "n_bytes": st.n_bytes,
                "max_bytes": st.max_bytes,
            }
        )
    return out


def stats_verdicts(stats: list[dict], cfg: CheckConfig) -> list[dict]:
    """Threshold verdicts per (partition, column) from readable stats rows."""
    verdicts = []
    for s in stats:
        col = s["column"]
        if col in cfg.null_frac_max:
            limit = cfg.null_frac_max[col]
            frac = s["null_frac"]
            verdicts.append(
                verdict_row(
                    s["partition_id"], "null_frac", col, frac <= limit, frac,
                    f"limit={limit}",
                )
            )
        if col == "warc_ts" and cfg.ts_range is not None:
            lo, hi = cfg.ts_range
            in_range = (
                not math.isnan(s["min_num"])
                and s["min_num"] >= lo
                and s["max_num"] < hi
            )
            metric = s["min_num"]
            verdicts.append(
                verdict_row(
                    s["partition_id"], "ts_range", col, in_range, metric,
                    f"window=[{lo},{hi})",
                )
            )
        if col == "url":
            # degenerate-key guard: a partition whose url column collapses
            # to few distinct values signals a broken upstream extractor
            n_nonnull = s["n"] - s["nulls"]
            est = s["distinct_hll"]
            ok = n_nonnull == 0 or est >= 0.5 * n_nonnull
            verdicts.append(
                verdict_row(
                    s["partition_id"], "distinct_collapse", col, ok,
                    est / n_nonnull if n_nonnull else math.nan,
                    "HLL distinct / non-null rows >= 0.5",
                )
            )
        # user-declared expectations evaluated per partition straight
        # from the stats the suite already computed — no extra pass
        # (kinds: null_frac_le / min_ge / max_le / distinct_frac_ge /
        # q50_between — all stats-derivable; the richer global runner
        # is checks/expectations.run_expectations)
        for e in cfg.expectations:
            if e["column"] != col:
                continue
            kind, val = e["kind"], e["value"]
            if kind == "null_frac_le":
                metric, ok = s["null_frac"], s["null_frac"] <= val
            elif kind == "min_ge":
                metric = s["min_num"]
                ok = not (metric == metric and metric < val)
            elif kind == "max_le":
                metric = s["max_num"]
                ok = not (metric == metric and metric > val)
            elif kind == "distinct_frac_ge":
                # HLL estimate / non-null rows (approximate by nature)
                nn = s["n"] - s["nulls"]
                metric = s["distinct_hll"] / nn if nn else math.nan
                ok = not (metric == metric and metric < val)
            elif kind == "q50_between":
                metric = s.get("q50", math.nan)
                lo_, hi_ = val
                ok = not (metric == metric and not (lo_ <= metric <= hi_))
                val = hi_
            else:
                raise ValueError(
                    f"per-partition expectation kind {kind!r} not "
                    "stats-derivable (use checks/expectations for the "
                    "full set)")
            verdicts.append(verdict_row(
                s["partition_id"], f"expect_{kind}", col, ok,
                float(metric), f"value={val}"))
    return verdicts


def metadata_binary_states(files: list[str], block_size: int, column: str,
                           cfg: CheckConfig) -> list[tuple[int, bytes]] | None:
    """Per-partition ColumnStates for a binary payload column computed
    from Parquet ROW-GROUP METADATA only — zero data IO.

    The null-fraction check on a 100-TB `html` column does not need the
    bytes: Parquet row-group statistics carry exact `null_count` per
    column chunk, and the `row_index` column's min/max statistics place
    each row group inside a logical partition. Skipping the column in
    the scan read cuts the dominant share of the input bytes (measured:
    ~60% of read wall on the bench fixture).

    Exactness contract: returns None — caller falls back to the full
    scan — unless EVERY row group (a) has row_index and `column`
    statistics, (b) is row_index-contiguous (max-min+1 == num_rows),
    and (c) lies entirely inside one partition (no block-boundary
    straddle). When it returns states, n and nulls are exact; byte-size
    stats (n_bytes / max_bytes) are not derivable from metadata and
    stay 0 — run with binary_stats="scan" when those are needed.

    Driver-side loop over file footers: O(#files) metadata reads. At
    cluster scale this pre-pass would itself map over a Dataset of file
    paths; the per-file logic is identical.
    """
    import pyarrow.parquet as pq

    agg: dict[int, list[int]] = {}
    for f in files:
        md = pq.read_metadata(f)
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        try:
            ri = names.index("row_index")
            ci = names.index(column)
        except ValueError:
            return None
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            rstat = rg.column(ri).statistics
            cstat = rg.column(ci).statistics
            if rstat is None or cstat is None or not rstat.has_min_max:
                return None
            if cstat.null_count is None:
                return None
            lo, hi = int(rstat.min), int(rstat.max)
            if hi - lo + 1 != rg.num_rows:
                return None  # row_index not contiguous in this group
            if lo // block_size != hi // block_size:
                return None  # straddles a partition boundary
            a = agg.setdefault(lo // block_size, [0, 0])
            a[0] += rg.num_rows
            a[1] += int(cstat.null_count)
    out = []
    for pid, (n, nulls) in sorted(agg.items()):
        st = ColumnState(cfg, kind="str", use_hll=False)
        st.n = n
        st.nulls = nulls
        out.append((pid, st.serialize()))
    return out
