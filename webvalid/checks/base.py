"""Shared check protocol types: config, verdict/violation row schemas.

Output model (FIXTURES.md F4): every check emits one verdict row per
(partition, check[, column]) plus zero or more violation rows
identifying offending urls. This generalizes the reference's only
"sink" — printed concept segments + "Done."
(reference: CDCStream/DriftDetector.java:103,112-114) — into tabular,
resumable Parquet output.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

VERDICT_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.int64()),
        pa.field("check", pa.string()),
        pa.field("column", pa.string()),
        pa.field("pass", pa.bool_()),
        pa.field("metric", pa.float64()),
        pa.field("detail", pa.string()),
    ]
)

VIOLATION_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.int64()),
        pa.field("check", pa.string()),
        pa.field("url", pa.string()),
        pa.field("reason", pa.string()),
    ]
)


def verdict_row(partition_id: int, check: str, column: str, ok: bool,
                metric: float, detail: str = "") -> dict:
    return {
        "partition_id": int(partition_id),
        "check": check,
        "column": column,
        "pass": bool(ok),
        "metric": float(metric),
        "detail": detail,
    }


def violation_row(partition_id: int, check: str, url: str, reason: str) -> dict:
    return {
        "partition_id": int(partition_id),
        "check": check,
        "url": url,
        "reason": reason,
    }


@dataclass
class CheckConfig:
    """Thresholds + knobs for the whole suite (defaults match FIXTURES.md F1)."""

    block_size: int = 1_000
    # column stats
    null_frac_max: dict = field(default_factory=lambda: {"html": 0.05, "text": 0.06})
    ts_range: tuple[int, int] | None = None  # (lo_us, hi_us) inclusive-exclusive
    hll_p: int = 12
    # HLL distinct sketches only where distinctness is meaningful; hashing
    # every long text body costs real scan time for a rarely-used number
    hll_columns: tuple[str, ...] = ("url", "lang", "host", "warc_ts")
    tdigest_delta: int = 200
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.99)
    # uniqueness
    unique_columns: tuple[str, ...] = ("url",)
    # referential
    lang_column: str = "lang"
    # drift
    drift_columns: tuple[str, ...] = ("lang", "host")
    # None = uncapped (reference parity); set for high-cardinality
    # projections — tail values collapse into drift_check.OTHER_BUCKET
    drift_max_histogram_keys: int | None = None
    drift_coefficient: float = 3.0
    min_change_degree: float = 0.1
    chi2_alpha: float = 1e-3
    # "consecutive": each partition vs its predecessor (fast drifts);
    # "global": each partition vs the pooled rest of the run (catches
    # slow drifts a per-step test never sees);
    # "window": each partition vs the pooled previous chi2_window
    # partitions (slow-ish drifts without the global mode's
    # everything-influences-everything coupling)
    chi2_reference: str = "consecutive"
    chi2_window: int = 5
    ks_alpha: float = 1e-3
    # PSI drift-magnitude gate per projection column (vs previous
    # partition); 0.25 is the standard "major shift" threshold
    psi_max: float = 0.25
    psi_smooth: float = 0.5
    # uniqueness pass-1 route: below this row count, per-batch uint64
    # key-hash blobs are sorted in bucketed tasks (8 B/row of transient
    # memory); above it, the groupby(key).count() shuffle path is used
    # so nothing O(rows) converges on one place
    uniqueness_driver_max_rows: int = 2_000_000_000
    # binary payload columns (html): "metadata" derives the null-frac
    # stats from Parquet row-group statistics and DROPS the column from
    # the scan read (zero data IO for ~the largest column; n/nulls
    # exact, byte-size stats 0) with automatic fallback to "scan" when
    # row groups lack statistics, aren't row_index-contiguous, or
    # straddle a partition boundary; "scan" always reads the bytes and
    # additionally yields exact n_bytes/max_bytes
    binary_stats: str = "metadata"
    # user-declared per-partition expectations evaluated from the
    # stats pass (kinds: null_frac_le / min_ge / max_le /
    # distinct_frac_ge / q50_between); the full
    # six-kind global runner is checks/expectations.run_expectations
    expectations: tuple = ()
    # violations
    max_violations_per_check: int = 10_000
