"""Parity of vectorized drift math (webvalid.drift) vs the naive oracle.

The oracle (tests/oracle.py) is a direct transliteration of the
reference Java; these tests lock the engine's per-block summaries,
change degrees, and fold segment output against it, including the
numerical quirks catalogued in SURVEY.md §2.9/§7.5.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from webvalid.drift import (
    block_summary,
    cdda_fold,
    change_degree,
    column_histograms,
    control_chart_fold,
)
from tests import oracle


def random_rows(rng, n, m, domain_sizes=None, phase=0):
    """Rows of categorical tokens; `phase` shifts the value distribution."""
    if domain_sizes is None:
        domain_sizes = [rng.randint(2, 6) for _ in range(m)]
    rows = []
    for _ in range(n):
        row = tuple(
            f"v{phase}_{rng.randint(0, d - 1)}" if rng.random() < 0.8 else f"c{rng.randint(0, d - 1)}"
            for d in domain_sizes
        )
        rows.append(row)
    return rows


def columns_of(rows):
    m = len(rows[0])
    return [np.array([r[i] for r in rows], dtype=object) for i in range(m)]


@pytest.mark.parametrize("seed", range(8))
def test_block_summary_matches_oracle(seed):
    rng = random.Random(seed)
    n = rng.randint(5, 60)
    m = rng.randint(2, 6)
    rows = random_rows(rng, n, m)
    expected = oracle.summary_of(rows)
    actual = block_summary(columns_of(rows))
    assert actual == pytest.approx(expected, rel=1e-12, abs=1e-13)


def test_block_summary_single_value_columns_is_zero():
    # Every domain has size 1 → empty distance matrices → summary 0
    # (DILCA.java:204-205 zero guard).
    rows = [("a", "x")] * 10
    assert oracle.summary_of(rows) == 0.0
    assert block_summary(columns_of(rows)) == 0.0


def test_block_summary_single_column_is_nan():
    # m == 1 → no context attributes → 0/0 normalization → NaN,
    # matching Java double semantics (DILCA.java:64-76).
    rows = [("a",), ("b",), ("a",), ("c",)]
    assert math.isnan(oracle.summary_of(rows))
    assert math.isnan(block_summary(columns_of(rows)))


@pytest.mark.parametrize("seed", range(6))
def test_change_degree_matches_oracle(seed):
    rng = random.Random(100 + seed)
    m = rng.randint(2, 5)
    sizes = [rng.randint(2, 6) for _ in range(m)]
    b1 = random_rows(rng, rng.randint(4, 40), m, sizes, phase=0)
    b2 = random_rows(rng, rng.randint(4, 40), m, sizes, phase=rng.choice([0, 1]))
    expected = oracle.change_degree_for(b1, b2)
    actual = change_degree(column_histograms(columns_of(b1)), column_histograms(columns_of(b2)))
    if math.isnan(expected):
        assert math.isnan(actual)
    else:
        assert actual == pytest.approx(expected, rel=1e-12)


def test_change_degree_total_vanish_is_inf():
    # Every value of block 1 disappears in block 2 → upper approx 0 with
    # positive lower approx → +inf (CDDA/DriftDetector.java:137-138).
    b1 = [("a", "p")] * 5
    b2 = [("b", "q")] * 5
    expected = oracle.change_degree_for(b1, b2)
    actual = change_degree(column_histograms(columns_of(b1)), column_histograms(columns_of(b2)))
    assert math.isinf(expected) and math.isinf(actual)


def drifting_rows(seed, n_blocks, block_size, m=4, shift_at=()):
    """Stream with abrupt distribution shifts at the given block indexes."""
    rng = random.Random(seed)
    rows = []
    phase = 0
    for b in range(n_blocks):
        if b in shift_at:
            phase += 1
        size = block_size if b < n_blocks - 1 else rng.randint(1, block_size)
        rows.extend(random_rows(rng, size, m, [3, 4, 2, 5][:m], phase=phase))
    return rows


@pytest.mark.parametrize(
    "n_blocks,shift_at",
    [(6, ()), (8, (4,)), (10, (3, 7)), (3, ()), (2, ()), (1, ()), (0, ())],
)
def test_cdcstream_fold_matches_oracle(n_blocks, shift_at):
    block_size = 30
    rows = drifting_rows(7, n_blocks, block_size, shift_at=shift_at)
    expected_segments = oracle.cdcstream_run(rows, block_size)

    blocks = [rows[i: i + block_size] for i in range(0, len(rows), block_size)]
    summaries = [block_summary(columns_of(b)) for b in blocks]
    sizes = [len(b) for b in blocks]
    segments, flags = control_chart_fold(summaries, sizes, drift_coefficient=3.0)
    assert segments == expected_segments


@pytest.mark.parametrize(
    "n_blocks,shift_at",
    [(6, ()), (8, (4,)), (10, (3, 7)), (2, ()), (1, ()), (0, ())],
)
def test_cdda_fold_matches_oracle(n_blocks, shift_at):
    block_size = 25
    rows = drifting_rows(11, n_blocks, block_size, shift_at=shift_at)
    expected_segments = oracle.cdda_run(rows, block_size)

    blocks = [rows[i: i + block_size] for i in range(0, len(rows), block_size)]
    histograms = [column_histograms(columns_of(b)) for b in blocks]
    sizes = [len(b) for b in blocks]
    segments, flags, degrees = cdda_fold(histograms, sizes, min_change_degree=0.1)
    assert segments == expected_segments


def test_cdcstream_constant_stream_fires_every_tested_block():
    # sigma == 0 and |diff| == 0 → 0 >= 0 fires (>= at DriftDetector.java:102).
    rows = [("a", "b")] * 100
    expected = oracle.cdcstream_run(rows, 10)
    blocks = [rows[i: i + 10] for i in range(0, 100, 10)]
    summaries = [block_summary(columns_of(b)) for b in blocks]
    segments, flags = control_chart_fold(summaries, [10] * 10)
    assert segments == expected
    assert all(flags[2:])  # every post-warm-up block drifts


def test_chart_sigma_fallback_after_drift_uses_global_extrema():
    # After a drift the history has one summary; sigma must fall back to
    # (min_sd + max_sd) / 2 with Double.MIN_VALUE/MAX_VALUE initials
    # surviving resets (DriftDetector.java:50,95-98).
    summaries = [0.1, 0.2, 0.15, 5.0, 5.0, 5.0]
    sizes = [10] * 6
    segments, flags = control_chart_fold(summaries, sizes, drift_coefficient=3.0)
    # Block 2 is within 3 sigma of the [0.1, 0.2] warm-up. Block 3 jumps
    # far outside → fires, clearing history. Block 4 then tests with
    # len(history) == 1 → sigma falls back to (min_sd + max_sd) / 2 over
    # the extrema recorded BEFORE the reset (≈0.045), and |5.0 − 5.0| = 0
    # does not reach 3 * 0.045 → no fire; the (MIN_VALUE, MAX_VALUE)
    # initials were overwritten by real sigmas, as in Java. Block 5 then
    # sees history [5.0, 5.0] → sigma 0 → 0 >= 0 fires again.
    assert not flags[2] and flags[3] and not flags[4] and flags[5]
    assert segments == [(0, 30), (31, 50), (51, 60)]


def test_drift_partial_capped_histograms_other_bucket():
    """DriftPartial(max_keys=K) bounds every column's domain at K+1 with
    the tail collapsed into OTHER_BUCKET; totals are preserved and the
    CDDA fold still runs on the capped states (documented deviation from
    reference parity — tail churn is invisible, tail mass is not)."""
    import pickle

    import pyarrow as pa

    from webvalid.checks.drift_check import OTHER_BUCKET, DriftPartial

    n = 500
    rng = random.Random(3)
    # high-cardinality column: ~200 distinct "hosts", skewed
    hosts = [f"h{rng.randint(0, 40) if rng.random() < 0.7 else rng.randint(0, 199)}"
             for _ in range(n)]
    langs = [f"l{rng.randint(0, 3)}" for _ in range(n)]
    batch = pa.table(
        {
            "partition_id": pa.array([0] * (n // 2) + [1] * (n - n // 2), pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "host": pa.array(hosts, pa.string()),
        }
    )
    out = DriftPartial(("lang", "host"), max_keys=16)(batch)
    states = [pickle.loads(b) for b in out["state"].to_pylist()]
    assert len(states) == 2
    for s in states:
        lang_counts, host_counts = s["value_counts"]
        assert len(host_counts) <= 17  # 16 kept + OTHER
        assert OTHER_BUCKET in host_counts and host_counts[OTHER_BUCKET] > 0
        assert OTHER_BUCKET not in lang_counts  # low-card column untouched
        assert sum(host_counts.values()) == s["n"]
        assert sum(lang_counts.values()) == s["n"]
        # pair co-occurrences are capped consistently with the domains
        assert sum(s["pairs"][(0, 1)].values()) == s["n"]
    # the capped states still feed the CDDA fold
    segments, flags, degrees = cdda_fold(
        [s["value_counts"] for s in states], [s["n"] for s in states], 0.1
    )
    assert len(flags) == 2 and degrees[1] is not None


def test_drift_partial_uncapped_by_default():
    import pickle

    import pyarrow as pa

    from webvalid.checks.drift_check import OTHER_BUCKET, DriftPartial

    vals = [f"v{i}" for i in range(100)]
    batch = pa.table(
        {
            "partition_id": pa.array([0] * 100, pa.int64()),
            "x": pa.array(vals, pa.string()),
        }
    )
    out = DriftPartial(("x",))(batch)
    s = pickle.loads(out["state"][0].as_py())
    assert len(s["value_counts"][0]) == 100
    assert OTHER_BUCKET not in s["value_counts"][0]
