"""Validation checks: schema, column stats, uniqueness, referential, drift.

Each check follows the partial/merge/verdict protocol of SURVEY.md
§2.10: vectorized per-batch partials inside `map_batches` (zero-copy
Arrow), tiny mergeable states per (partition_id, column), a small merge
step, and per-partition verdict + violation rows.
"""

from webvalid.checks.base import (
    CheckConfig,
    VERDICT_SCHEMA,
    VIOLATION_SCHEMA,
    verdict_row,
    violation_row,
)

__all__ = [
    "CheckConfig",
    "VERDICT_SCHEMA",
    "VIOLATION_SCHEMA",
    "verdict_row",
    "violation_row",
]
