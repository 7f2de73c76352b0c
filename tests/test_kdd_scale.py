"""KDD-Cup-'99-scale CSV drift replay (reference input shape & size).

The reference was built for kddcup.data_10_percent: 494,021 rows × 42
categorical columns (Main.java reads a headerless CSV). This test
generates a seeded categorical table of exactly that shape with
concept shifts planted at known blocks, runs the engine's full
Main.java-equivalent pipeline (`sources.csv_drift_segments` — Ray read
→ per-partition count partials → merge → DILCA/CDDA folds), and
asserts BOTH detectors' segment boundaries equal the naive oracle's.

The oracle keeps tests/oracle.py's transliterated DILCA/fold math
untouched; only the per-block count tables are built vectorized
(np.add.at over factorized codes — counting is exact integer math, the
parity-sensitive float work all stays in oracle.py), plus the SU
memoization hook, because the O(n·m²) per-record loops would take tens
of minutes at 494k×42.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests import oracle

N_ROWS = 494_021
N_COLS = 42
BLOCK = 4_940  # 100 full blocks + a 21-row tail (short-block path)


def _gen_kdd_rows(path: str) -> np.ndarray:
    """Seeded 494k×42 categorical matrix with two planted shifts;
    written as a headerless CSV. Returns the (N_ROWS, N_COLS) array of
    small-int codes (as strings it would be 'v0'..'v7')."""
    rng = np.random.default_rng(99)
    domains = rng.integers(2, 8, N_COLS)  # per-column domain sizes

    def concept(seed: int) -> list[np.ndarray]:
        r = np.random.default_rng(seed)
        return [r.dirichlet(np.ones(d) * 0.7) for d in domains]

    # three concepts: shift at block 40 and block 70
    bounds = [0, 40 * BLOCK, 70 * BLOCK, N_ROWS]
    codes = np.empty((N_ROWS, N_COLS), dtype=np.int8)
    for ci, seed in enumerate((1, 2, 3)):
        lo, hi = bounds[ci], bounds[ci + 1]
        probs = concept(seed)
        for j in range(N_COLS):
            codes[lo:hi, j] = rng.choice(len(probs[j]), size=hi - lo,
                                         p=probs[j])
    with open(path, "w") as f:
        for i in range(0, N_ROWS, 10_000):
            chunk = codes[i:i + 10_000]
            lines = ["," .join(f"v{v}" for v in row) for row in chunk]
            f.write("\n".join(lines) + "\n")
    return codes


class _FastOracleStats:
    """OracleStatistics-compatible count tables built vectorized.

    Same interface (num_attributes / domain_size / cooccurrences_for
    returning lists-of-lists) and the same first-appearance domain
    order; counting is exact integers so the naive DILCA float math in
    oracle.py is untouched. `_su_cache` enables oracle.py's SU memo."""

    def __init__(self, block_codes: np.ndarray):
        n, m = block_codes.shape
        self.num_attributes = m
        self._su_cache: dict = {}
        self._codes = []
        self._sizes = []
        for j in range(m):
            c, uniq = pd.factorize(block_codes[:, j])  # first appearance
            self._codes.append(c.astype(np.int64))
            self._sizes.append(len(uniq))
        self._cooc_cache: dict = {}

    def domain_size(self, i):
        return self._sizes[i]

    def cooccurrences_for(self, i, j):
        key = (i, j)
        got = self._cooc_cache.get(key)
        if got is not None:
            return got
        di, dj = self._sizes[i], self._sizes[j]
        mat = np.zeros((di, dj), dtype=np.int64)
        np.add.at(mat, (self._codes[i], self._codes[j]), 1)
        as_lists = mat.tolist()
        self._cooc_cache[key] = as_lists
        return as_lists


@pytest.mark.slow
def test_kdd_scale_csv_replay_matches_oracle(ray_session, tmp_path):
    from webvalid.sources import csv_drift_segments

    path = str(tmp_path / "kdd_shape.csv")
    codes = _gen_kdd_rows(path)

    got = csv_drift_segments(path, block_size=BLOCK)

    # --- oracle: same folds, naive math, vectorized count tables ---
    blocks = [codes[i:i + BLOCK] for i in range(0, N_ROWS, BLOCK)]
    block_summaries = [
        oracle.summary_of_statistics(_FastOracleStats(b)) for b in blocks
    ]
    it = iter(block_summaries)

    def next_summary(_block):
        return next(it)

    # rows only carry per-block lengths for the fold bookkeeping
    pseudo_rows = [(0,)] * N_ROWS
    exp_cdc = oracle.cdcstream_run(pseudo_rows, BLOCK, 3.0,
                                   summary_fn=next_summary)
    assert got["cdcstream"] == exp_cdc

    # CDDA from the same count tables (naive change-degree math on
    # per-column value-count dicts, oracle.py formula inlined on counts)
    def eq_counts(b):
        out = []
        for j in range(N_COLS):
            vals, cnts = np.unique(b[:, j], return_counts=True)
            out.append(dict(zip(vals.tolist(), cnts.tolist())))
        return out

    import math

    def degree(first_eqs, second_eqs):
        total_emerging = total_fading = 0.0
        for first_eq, second_eq in zip(first_eqs, second_eqs):
            fl = fu = sl = su = 0.0
            for value in set(first_eq) | set(second_eq):
                fc = first_eq.get(value, 0)
                sc = second_eq.get(value, 0)
                if fc > 0:
                    if sc > 0:
                        fu += fc
                        su += sc
                    else:
                        fl += fc
                elif sc > 0:
                    sl += sc
            total_fading += fl / fu if fu else (math.inf if fl else math.nan)
            total_emerging += sl / su if su else (math.inf if sl else math.nan)
        return (total_emerging + total_fading) / (2 * N_COLS)

    eqs = [eq_counts(b) for b in blocks]
    segments = []
    last_count = 0
    consumed = len(blocks[0])
    for bi in range(1, len(blocks)):
        current_count = consumed
        consumed += len(blocks[bi])
        if degree(eqs[bi - 1], eqs[bi]) >= 0.1:
            segments.append((last_count, current_count))
            last_count = current_count + 1
    # terminal flush: the oracle's StopIteration fires AFTER consuming
    # the final block, so the closing segment ends at the total rows
    current_count = consumed
    if current_count >= last_count:
        segments.append((last_count, current_count))
    assert got["cdda"] == segments

    # the planted shifts (blocks 40 and 70) must surface as CDCStream
    # segment boundaries; the chart needs a few blocks to re-settle
    # after a reset, so allow a short detection lag
    cdc_bounds = {e for _, e in exp_cdc}
    assert any(abs(b - 40 * BLOCK) <= BLOCK for b in cdc_bounds)
    assert any(0 <= b - 70 * BLOCK <= 5 * BLOCK for b in cdc_bounds)
