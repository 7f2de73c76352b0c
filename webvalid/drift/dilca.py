"""Vectorized DILCA block-summary math (CDCStream per-block statistic).

Reproduces the per-block summary of the reference implementation
(reference: CDCStream/DILCA.java:35-209, CDCStream/DatabaseStatistics.java:37-107,
CDCStream/DriftDetector.java:122-140) with NumPy instead of per-record
Java hash maps:

- Per column, values are dictionary-encoded to dense codes
  (DatabaseStatistics.java:50-59). Value-index *order* does not affect
  any DILCA quantity — every sum below ranges over unordered value
  pairs — so first-appearance factorization is used without further
  order guarantees.
- Co-occurrence counting (DatabaseStatistics.java:64-90) becomes one
  `np.bincount` per column pair over fused codes: O(m^2) vectorized
  passes instead of O(n*m^2) per-record map lookups.
- Symmetrical uncertainty, FCBF-style context selection, the
  sum-of-squared-differences distance matrix, and the normalized-norm
  summary follow DILCA.java:35-209 exactly, including its quirks:
  * the SU ranking sort is stable with ties keeping original attribute
    order (DILCA.java:98 `(int) Math.signum(...)` under TimSort);
  * attribute j is dropped when SU(kept_i, j) <= SU(target, j)
    (DILCA.java:107-108 — note `<=`, and the comparison direction);
  * SU is 0 when both entropies are 0 or target == attribute
    (DILCA.java:127-129, 184-188);
  * a single-valued target column yields summary 0
    (DILCA.java:204-208 zero guard);
  * with m == 1 (no context attributes) the normalization divides by a
    zero domain-size total → NaN, exactly as Java's 0.0/0.0 would.

All co-occurrence counts and squared differences are integer-valued and
far below 2^53, so the NumPy Gram-matrix formulation of the SSD step is
bit-exact with the reference's nested loops; the only rounding happens
in the same places Java rounds (entropy logs, the final sqrt/divide).
"""

from __future__ import annotations

import math

import numpy as np

_LOG2 = math.log(2.0)


def _seq_log(p: np.ndarray) -> np.ndarray:
    """Elementwise libm log (math.log), vectorized via a unique-value cache.

    np.log's SIMD kernel differs from math.log by 1 ulp on ~20% of
    inputs; the reference's tie decisions (FCBF drop, signum sort) flip
    on exactly those ulps, so every log here must be the scalar libm
    one. Probabilities repeat heavily (count ratios), so computing
    math.log once per unique value keeps this effectively vectorized.
    """
    uniq, inv = np.unique(p, return_inverse=True)
    logs = np.array([math.log(x) for x in uniq.tolist()], dtype=np.float64)
    return logs[inv]


def encode_columns(columns) -> tuple[list[np.ndarray], list[int]]:
    """Dictionary-encode each column to dense int codes.

    `columns` is a sequence of 1-D arrays/sequences (all the same
    length). Nulls (None/NaN) are treated as a regular category — the
    reference reads CSV where every field is a plain string
    (CategoricalRecordStreamReader.java:66-70), so nulls cannot occur
    there; here they become their own domain value.

    Returns (codes, domain_sizes).
    """
    import pandas as pd

    codes: list[np.ndarray] = []
    sizes: list[int] = []
    for col in columns:
        arr = np.asarray(col)
        c, uniques = pd.factorize(arr, use_na_sentinel=False)
        codes.append(c.astype(np.int64, copy=False))
        sizes.append(len(uniques))
    return codes, sizes


def _entropy(freq: np.ndarray) -> float:
    """Shannon entropy (base 2) of a count vector.

    Bit-exact mirror of DILCA.java:137-150: terms are (p*log(p))/log(2)
    (that association order), accumulated term-by-term in index order.
    np.cumsum is a sequential scan, and round-to-nearest is symmetric
    under negation, so -cumsum(terms)[-1] is bit-identical to Java's
    `entropy -= term` loop. Zero counts contribute an exact 0.0 term,
    which is an identity add, matching Java's `continue`.
    """
    total = float(freq.sum())  # integer-valued: exact in any order
    mask = freq > 0
    p = freq / total
    terms = np.zeros_like(p)
    terms[mask] = (p[mask] * _seq_log(p[mask])) / _LOG2
    return float(-np.cumsum(terms)[-1])


def _cooccurrence(ci: np.ndarray, cj: np.ndarray, di: int, dj: int) -> np.ndarray:
    """Joint count matrix of two code arrays (DatabaseStatistics.java:79-90)."""
    fused = ci * dj + cj
    return (
        np.bincount(fused, minlength=di * dj)
        .reshape(di, dj)
        .astype(np.float64)
    )


def _conditional_entropy(c_at: np.ndarray, freq_a: np.ndarray) -> float:
    """H(target | attribute) from the (attr x target) count matrix.

    Bit-exact mirror of DILCA.java:167-181: per attribute-value row,
    `current -= (p*log(p))/log(2)` term-by-term over target values in
    index order, then `conditional += (row_total/total)*current` in row
    order. Sequential order is reproduced with cumsum scans (see
    _entropy for why that is bit-identical).
    """
    total_a = float(freq_a.sum())  # integer-valued: exact
    mask = c_at > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        p = c_at / freq_a[:, None]
    terms = np.zeros_like(p)
    terms[mask] = (p[mask] * _seq_log(p[mask])) / _LOG2
    row_entropy = -np.cumsum(terms, axis=1)[:, -1]
    contrib = (freq_a / total_a) * row_entropy
    return float(np.cumsum(contrib)[-1])


class BlockStatistics:
    """Per-block dictionary codes + lazily computed pair count matrices.

    The Ray-friendly analogue of DatabaseStatistics: built once per
    logical partition inside `map_groups`, entirely NumPy.
    """

    def __init__(self, columns):
        if len(columns) == 0 or len(np.asarray(columns[0])) == 0:
            raise ValueError("Block should not be empty.")
        self.codes, self.sizes = encode_columns(columns)
        self.m = len(self.codes)
        self.n = len(self.codes[0])
        self.freq = [
            np.bincount(self.codes[i], minlength=self.sizes[i]).astype(np.float64)
            for i in range(self.m)
        ]
        self._pair_cache: dict[tuple[int, int], np.ndarray] = {}

    @classmethod
    def from_counts(cls, value_counts: list[dict], pair_counts: dict) -> "BlockStatistics":
        """Build from mergeable count dicts instead of raw columns.

        `value_counts[i]` maps value → count for column i;
        `pair_counts[(i, j)]` (i < j) maps (value_i, value_j) → joint
        count. This is how the Ray pipeline reconstructs per-partition
        statistics from per-batch partials without shuffling rows —
        co-occurrence counts are additive across batches
        (DatabaseStatistics.java:82-90 is a pure sum).
        """
        self = cls.__new__(cls)
        self.m = len(value_counts)
        # canonical per-column value order: the merged partial dicts
        # carry block-ARRIVAL insertion order, which varies run to run
        # — and entropy/SU accumulate floats in this order, so unsorted
        # maps made the cdcstream metric wobble in the last ulp across
        # runs (caught by tools/check_determinism.py at sf0.1)
        orders = [sorted(vc, key=lambda v: (v is None, type(v).__name__,
                                            str(v)))
                  for vc in value_counts]
        index_maps = [{v: k for k, v in enumerate(vals)} for vals in orders]
        self.sizes = [len(vc) for vc in value_counts]
        self.freq = [
            np.array([vc[v] for v in vals], dtype=np.float64)
            for vc, vals in zip(value_counts, orders)
        ]
        self.codes = None
        self.n = int(self.freq[0].sum()) if self.m else 0
        self._pair_cache = {}
        for (i, j), d in pair_counts.items():
            assert i < j
            mat = np.zeros((self.sizes[i], self.sizes[j]))
            for (vi, vj), c in d.items():
                mat[index_maps[i][vi], index_maps[j][vj]] = c
            self._pair_cache[(i, j)] = mat
        return self

    def cooccurrences(self, i: int, j: int) -> np.ndarray:
        """Count matrix indexed (value of col i, value of col j)."""
        if i == j:
            return np.diag(self.freq[i])
        key = (min(i, j), max(i, j))
        c = self._pair_cache.get(key)
        if c is None:
            c = _cooccurrence(
                self.codes[key[0]], self.codes[key[1]], self.sizes[key[0]], self.sizes[key[1]]
            )
            self._pair_cache[key] = c
        return c if i < j else c.T

    def su_matrix(self) -> np.ndarray:
        """SU[t, a] = symmetrical uncertainty with target t, attribute a.

        Computed exactly as DILCA.java:124-188 (conditional entropy of t
        given a), not via the symmetric closed form, so float rounding
        matches the reference's asymmetric evaluation order.
        """
        m = self.m
        H = np.array([_entropy(self.freq[i]) for i in range(m)])
        su = np.zeros((m, m))
        for t in range(m):
            for a in range(m):
                if t == a:
                    continue
                if H[t] == 0.0 and H[a] == 0.0:
                    continue
                cond = _conditional_entropy(self.cooccurrences(a, t), self.freq[a])
                su[t, a] = 2.0 * (H[t] - cond) / (H[t] + H[a])
        return su


def context_attributes(su: np.ndarray, target: int) -> list[int]:
    """FCBF-style context selection (DILCA.java:83-122).

    Rank non-target attributes by SU(target, .) descending (stable,
    ties keep ascending attribute order — DILCA.java:98); then drop j
    if an earlier kept i has SU(i, j) <= SU(target, j)
    (DILCA.java:102-113). Returns kept attributes in rank order
    (ImmutableSet preserves insertion order, DILCA.java:115-121).
    """
    m = su.shape[0]
    idxs = [i for i in range(m) if i != target]
    idxs.sort(key=lambda i: -su[target, i])  # stable, like TimSort with signum comparator
    for i in range(len(idxs)):
        first = idxs[i]
        if first == -1:
            continue
        for j in range(i + 1, len(idxs)):
            second = idxs[j]
            if second != -1 and su[first, second] <= su[target, second]:
                idxs[j] = -1
    return [i for i in idxs if i != -1]


def distance_summary(stats: BlockStatistics, su: np.ndarray, target: int) -> float:
    """normalizedSquaredSumRoot of the DILCA distance matrix for `target`.

    SSD step (DILCA.java:51-62) vectorized via Gram matrices: for a
    context count matrix C (d_c x d_t), the pairwise column SSD is
    diag(G) + diag(G)' - 2G with G = C^T C — exact in float64 because
    every entry is an integer < 2^53. Normalization and the final norm
    follow DILCA.java:64-76, 195-209.
    """
    d_t = stats.sizes[target]
    if d_t <= 1:
        return 0.0  # distances array is empty → sum 0 → guard at DILCA.java:204-205

    context = context_attributes(su, target)
    ssd = np.zeros((d_t, d_t))
    total_context_sizes = 0.0
    for c in context:
        mat = stats.cooccurrences(c, target)
        g = mat.T @ mat
        diag = np.diag(g)
        ssd += diag[:, None] + diag[None, :] - 2.0 * g
        total_context_sizes += stats.sizes[c]

    with np.errstate(divide="ignore", invalid="ignore"):
        dist = np.sqrt(ssd / total_context_sizes)  # 0/0 → NaN, matching Java

    iu = np.triu_indices(d_t, k=1)
    vals = dist[iu]
    s = float((vals * vals).sum())
    if s == 0.0:
        return 0.0
    length = d_t - 1
    return (2.0 * np.sqrt(s)) / (length * (length + 1))


def summary_of_stats(stats: BlockStatistics) -> float:
    """Mean DILCA norm over all attributes (CDCStream/DriftDetector.java:122-140)."""
    su = stats.su_matrix()
    summary = 0.0
    for t in range(stats.m):
        summary += distance_summary(stats, su, t)
    return summary / stats.m


def block_summary(columns) -> float:
    """Block summary from raw columns (test/oracle path)."""
    return summary_of_stats(BlockStatistics(columns))
