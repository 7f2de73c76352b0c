"""Canonical webpages schema + schema-check helpers.

The engine's input table shape comes from BASELINE.json `input_hint`:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
The schema check generalizes the reference's arity assertion
(reference: CDDA/DriftDetector.java:84-91 — consecutive blocks must
agree on column count; CDCStream/DatabaseStatistics.java:38-40 —
non-empty) into a per-batch name/type/nullability comparison.
"""

from __future__ import annotations

import pyarrow as pa

WEBPAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us"), nullable=False),
        pa.field("html", pa.binary(), nullable=True),
        pa.field("text", pa.string(), nullable=True),
        pa.field("lang", pa.string(), nullable=False),
    ]
)

# Columns the engine adds (generator bakes row_index in; partition_id derived).
ROW_INDEX = "row_index"
PARTITION_ID = "partition_id"

VALID_LANGS = ("en", "de", "fr", "es", "zh", "ru", "ja", "pt", "und")


def schema_mismatches(actual: pa.Schema, expected: pa.Schema = WEBPAGES_SCHEMA,
                      ignore_extra: tuple[str, ...] = (ROW_INDEX, PARTITION_ID)) -> list[str]:
    """Compare a batch/table schema against the expected one.

    Returns a list of human-readable mismatch strings (empty = pass).
    Extra engine-added columns are ignored. Nullability is checked only
    in the strict direction (actual nullable where expected non-null).
    """
    problems = []
    actual_fields = {f.name: f for f in actual}
    for f in expected:
        a = actual_fields.get(f.name)
        if a is None:
            problems.append(f"missing column {f.name}")
            continue
        if a.type != f.type:
            problems.append(f"column {f.name}: type {a.type} != expected {f.type}")
    for name in actual.names:
        if name not in expected.names and name not in ignore_extra:
            problems.append(f"unexpected column {name}")
    return problems
