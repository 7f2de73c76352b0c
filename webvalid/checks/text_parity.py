"""Byte-identical-text-per-url parity check (BASELINE.json input_hint).

Verifies that the `text` column is byte-identical per `url` to the
reference fixture's extracted text, via md5 fingerprints.

Broadcast representation matters at scale: a Python dict of
url → md5 would be re-deserialized by every actor (seconds each, and
O(fixture) heap per actor). Instead the driver ships two SORTED uint64
numpy arrays — hash64(url) and hash64(url + ":" + md5) — which
`ray.get` maps zero-copy from the object store; membership is a
vectorized binary search (np.searchsorted). A row violates when its
url is in the fixture but its (url, md5(text)) pair hash is not.
Collision risk is the usual 64-bit birthday bound (~1e-7 at 10^6
fixture rows) and only ever *hides* a violation, never invents one.

Also emits row-level warc_ts window violations in the same pass (the
row-scan twin of the per-partition ts_range verdict in column_stats).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray

from webvalid.sketches import hash64


def build_expected_hashes(urls: list, md5s: list) -> tuple[np.ndarray, np.ndarray]:
    """(sorted url hashes, sorted url:md5 pair hashes) for broadcasting."""
    url_arr = np.asarray(urls, dtype=object)
    pair_arr = np.asarray([f"{u}:{m}" for u, m in zip(urls, md5s)], dtype=object)
    return np.sort(hash64(url_arr)), np.sort(hash64(pair_arr))


def _in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(sorted_arr, values)
    idx[idx >= len(sorted_arr)] = len(sorted_arr) - 1 if len(sorted_arr) else 0
    if len(sorted_arr) == 0:
        return np.zeros(len(values), dtype=bool)
    return sorted_arr[idx] == values


class TextParityBatcher:
    """Actor-pool callable: text md5 mismatches + ts-window violations."""

    def __init__(self, expected_ref, ts_range: tuple[int, int] | None = None):
        self.url_hashes, self.pair_hashes = ray.get(expected_ref)  # zero-copy
        self.ts_range = ts_range

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        pids = batch["partition_id"].to_numpy()
        out_pid: list[int] = []
        out_check: list[str] = []
        out_url: list[str] = []
        out_reason: list[str] = []

        has_text = np.array([t is not None for t in texts], dtype=bool)
        if has_text.any():
            # pair check first — it must run for every non-null row anyway;
            # the url-membership search then runs only on the (rare) pair
            # misses, halving the binary-search work on the big arrays
            pair_strs = np.asarray(
                [
                    f"{u}:{hashlib.md5(t.encode()).hexdigest()}" if k else ""
                    for u, t, k in zip(urls, texts, has_text)
                ],
                dtype=object,
            )
            pair_ok = _in_sorted(hash64(pair_strs), self.pair_hashes)
            suspects = np.flatnonzero(has_text & ~pair_ok)
            if len(suspects):
                url_h = hash64(np.asarray(urls, dtype=object)[suspects])
                known = _in_sorted(url_h, self.url_hashes)
                for i in suspects[known]:
                    out_pid.append(int(pids[i]))
                    out_check.append("text_parity")
                    out_url.append(urls[int(i)])
                    out_reason.append("text md5 differs from fixture")

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
