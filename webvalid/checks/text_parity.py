"""Byte-identical-text-per-url parity check (BASELINE.json input_hint).

Verifies that the `text` column is byte-identical per `url` to the
reference fixture's extracted text, via md5 fingerprints. The expected
(url → md5) table is broadcast once (`ray.put`) and each batch is
checked vectorized-ish (md5 per non-null row — hashlib's C core — no
reference dict copies per batch). For fixture tables too large to
broadcast, co-partition both sides by `hash(url)` instead
(webvalid/ops/joins.py).

Also emits row-level warc_ts window violations in the same pass (the
row-scan twin of the per-partition ts_range verdict in column_stats).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray


class TextParityBatcher:
    """Actor-pool callable: text md5 mismatches + ts-window violations."""

    def __init__(self, expected_ref, ts_range: tuple[int, int] | None = None):
        self.expected: dict[str, str] = ray.get(expected_ref)
        self.ts_range = ts_range

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        pids = batch["partition_id"].to_numpy()
        out_pid: list[int] = []
        out_check: list[str] = []
        out_url: list[str] = []
        out_reason: list[str] = []
        exp = self.expected
        for i, (u, t) in enumerate(zip(urls, texts)):
            if t is None:
                continue
            e = exp.get(u)
            if e is None:
                continue
            h = hashlib.md5(t.encode()).hexdigest()
            if h != e:
                out_pid.append(int(pids[i]))
                out_check.append("text_parity")
                out_url.append(u)
                out_reason.append(f"md5 {h} != expected {e}")
        if self.ts_range is not None:
            lo, hi = self.ts_range
            ts = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            bad = np.flatnonzero((ts < lo) | (ts >= hi))
            for i in bad:
                out_pid.append(int(pids[i]))
                out_check.append("ts_window")
                out_url.append(urls[int(i)])
                out_reason.append(f"warc_ts {int(ts[i])} outside [{lo},{hi})")
        return pa.table(
            {
                "partition_id": pa.array(out_pid, pa.int64()),
                "check": pa.array(out_check, pa.string()),
                "url": pa.array(out_url, pa.string()),
                "reason": pa.array(out_reason, pa.string()),
            }
        )
