"""Logical partitioning helpers.

The reference's "block" — a tumbling count window of blockSize records
(reference: CDCStream/DriftDetector.java:60-61, Main.java:27,35) —
becomes an explicit `partition_id = row_index // block_size` column.
Windows are *data*, never Ray's physical block boundaries, so all
semantics survive arbitrary scheduling (SURVEY.md §1.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webvalid.schema import PARTITION_ID, ROW_INDEX

_HOST_RE = r"^[a-z]+://(?P<host>[^/]+)"


def add_partition_id(batch: pa.Table, block_size: int) -> pa.Table:
    """Derive partition_id from the baked-in row_index column."""
    pid = pc.divide(batch[ROW_INDEX], pa.scalar(block_size, pa.int64()))
    return batch.append_column(PARTITION_ID, pid)


def add_host(batch: pa.Table, url_col: str = "url", out_col: str = "host") -> pa.Table:
    """Vectorized host extraction from url (no per-row Python)."""
    extracted = pc.extract_regex(batch[url_col], _HOST_RE)
    host = pc.struct_field(extracted, "host")
    return batch.append_column(out_col, host)


def partition_slices(batch: pa.Table, pid_col: str = PARTITION_ID):
    """Yield (partition_id, sub_table) for each contiguous partition run.

    Batches normally cover 1-2 partitions (contiguous row_index ranges);
    if a batch interleaves partitions the same id is yielded more than
    once — harmless, because every partial state is mergeable.
    """
    pids = batch[pid_col].to_numpy()
    if len(pids) == 0:
        return
    change = np.flatnonzero(np.diff(pids)) + 1
    bounds = np.concatenate([[0], change, [len(pids)]])
    for s, e in zip(bounds[:-1], bounds[1:]):
        yield int(pids[s]), batch.slice(s, e - s)
