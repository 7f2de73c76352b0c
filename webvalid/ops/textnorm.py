"""Text normalization — the standard first stage of corpus prep.

Pure streaming map over Arrow string kernels (utf8_lower, one
compiled-once RE2 whitespace collapse, trim): no state, no shuffle,
zero-copy in/out of the object store. At 100 TB this runs at read
bandwidth alongside the scan.

SQL twin: TRIM(regexp_replace(lower(text), '\\s+', ' ', 'g')).
No reference analogue; training-data addition.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def normalize_text_column(col):
    """Arrow kernel chain: lowercase → collapse runs of whitespace to
    one space → strip leading/trailing whitespace. Null-preserving."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    low = pc.utf8_lower(col)
    collapsed = pc.replace_substring_regex(low, r"\s+", " ")
    return pc.utf8_trim_whitespace(collapsed)


def normalize_text(ds, text_col: str = "text", out_col: str = "norm_text",
                   keep: list[str] | None = None):
    """Dataset with `out_col` = normalized `text_col`; `keep` columns
    carried through (default: all others)."""

    def fn(t: pa.Table) -> pa.Table:
        cols = keep if keep is not None else [c for c in t.column_names
                                              if c != text_col]
        out = {c: t[c] for c in cols}
        out[out_col] = normalize_text_column(t[text_col])
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow")
