"""CDDA rough-set change-degree detector over consecutive block pairs.

Replicates the reference (reference: CDDA/DriftDetector.java:45-143)
as pure functions of per-block value histograms: the engine never
carries raw blocks between partitions — only the tiny per-partition
per-column value-count maps (A9 in SURVEY.md §2.5), computed
distributed, then folded pairwise here.

Replicated semantics:
- Per attribute, values are bucketed into equivalence classes by exact
  string equality (CDDA/DriftDetector.java:106-116).
- Over the union of both blocks' values (:119-134): values present in
  both contribute their counts to the *upper* approximations; values
  only in block1 to `firstLowerApprox`; only in block2 to
  `secondLowerApprox`.
- fading = firstLower/firstUpper, emerging = secondLower/secondUpper
  (:137-138); change degree = sum over attributes of
  (fading + emerging) / (2 m) (:142). Java double division by zero is
  preserved: x/0 → +inf for x > 0 and NaN for x == 0, and NaN compares
  False against the threshold while inf compares True (:63).
- Blocks must be non-empty and agree on column count (:84-91).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def column_histograms(columns) -> list[dict]:
    """Per-column value -> count maps for one block (CDDA/DriftDetector.java:106-116).

    Vectorized per column; nulls become their own equivalence class
    (the reference reads CSV strings and cannot see nulls).
    """
    out = []
    for col in columns:
        arr = np.asarray(col)
        codes, uniques = pd.factorize(arr, use_na_sentinel=False)
        counts = np.bincount(codes, minlength=len(uniques))
        out.append({u: int(c) for u, c in zip(uniques, counts)})
    return out


def merge_histograms(a: list[dict], b: list[dict]) -> list[dict]:
    """Merge two per-column histogram lists (for partial -> partition merge)."""
    if not a:
        return b
    if not b:
        return a
    assert len(a) == len(b), "Number of features should match."
    out = []
    for ha, hb in zip(a, b):
        merged = dict(ha)
        for v, c in hb.items():
            merged[v] = merged.get(v, 0) + c
        out.append(merged)
    return out


def _java_div(num: float, den: float) -> float:
    """Java double division semantics for possibly-zero denominators."""
    if den != 0.0:
        return num / den
    if num > 0.0:
        return float("inf")
    return float("nan")


def change_degree(first: list[dict], second: list[dict]) -> float:
    """Change degree between two blocks' histograms (CDDA/DriftDetector.java:82-143)."""
    if len(first) == 0 or len(second) == 0:
        raise ValueError("Blocks should not be empty.")
    m = len(first)
    if len(second) != m:
        raise ValueError("Number of features should match.")

    total_emerging = 0.0
    total_fading = 0.0
    for a in range(m):
        f, s = first[a], second[a]
        first_lower = first_upper = second_lower = second_upper = 0.0
        for value in f.keys() | s.keys():
            fc = f.get(value, 0)
            sc = s.get(value, 0)
            if fc > 0:
                if sc > 0:
                    first_upper += fc
                    second_upper += sc
                else:
                    first_lower += fc
            elif sc > 0:
                second_lower += sc
        total_fading += _java_div(first_lower, first_upper)
        total_emerging += _java_div(second_lower, second_upper)

    return (total_emerging + total_fading) / (2 * m)


def cdda_fold(histograms, block_sizes, min_change_degree: float = 0.1):
    """Sequential CDDA loop over ordered per-partition histograms.

    Mirrors CDDA/DriftDetector.java:45-76: block 0 seeds `lastBlock`;
    from block 1 on, the pair (b-1, b) is scored with `currentCount` =
    records consumed before block b; drift emits (lastCount,
    currentCount) and sets lastCount = currentCount + 1; end-of-stream
    emits the final segment when currentCount >= lastCount (with
    currentCount = total records once any block was read, else 0).

    Returns (segments, drift_flags, degrees) where degrees[b] is the
    change degree tested at block b (None for block 0).
    """
    n = len(histograms)
    segments: list[tuple[int, int]] = []
    flags = [False] * n
    degrees: list[float | None] = [None] * n

    if n == 0:
        return [(0, 0)], flags, degrees

    last_count = 0
    rows_before = block_sizes[0]
    for b in range(1, n):
        current_count = rows_before
        d = change_degree(histograms[b - 1], histograms[b])
        degrees[b] = d
        if d >= min_change_degree:  # NaN → False, inf → True (Java parity)
            segments.append((last_count, current_count))
            last_count = current_count + 1
            flags[b] = True
        rows_before += block_sizes[b]

    current_count = rows_before
    if current_count >= last_count:
        segments.append((last_count, current_count))
    return segments, flags, degrees
