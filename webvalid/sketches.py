"""Mergeable sketches: HyperLogLog, TDigest, fixed-bin histograms.

Pure NumPy, serializable, associative/commutative merges — designed for
the two-phase aggregation pattern (partial per Arrow batch inside
`map_batches`, merge per logical partition in a `groupby`), per
SURVEY.md §2.5 (north_rule additions: HLL distinct, TDigest quantiles,
histograms feeding KS / chi-squared drift tests). The reference's
analogue is the exact per-block domain dictionary
(reference: CDCStream/DatabaseStatistics.java:50-59); HLL replaces it
for cross-partition distinct counts at scale.

Also includes self-contained KS and chi-squared test statistics with
p-values (no scipy in the sandbox): the chi-squared survival function
uses a regularized incomplete-gamma continued fraction/series, the KS
p-value the asymptotic Kolmogorov distribution.
"""

from __future__ import annotations

import math
import pickle

import numpy as np


def hash64(values) -> np.ndarray:
    """Stable 64-bit hashes of an array-like (strings or numerics).

    Uses pandas' siphash-based `hash_array` with the default fixed key,
    deterministic across processes and machines.
    """
    import pandas as pd

    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        return pd.util.hash_array(arr.astype(object), categorize=False).astype(np.uint64)
    return pd.util.hash_array(arr, categorize=False).astype(np.uint64)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def hll_idx_rank(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) pairs for 64-bit hashes — the shared HLL
    update kernel (used per-sketch by HyperLogLog.add_hashes and in
    one flat `np.maximum.at` by the grouped path in ops/agg.py)."""
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest_bits = 64 - p
    rest = h & np.uint64((1 << rest_bits) - 1)
    # rank = (#leading zeros of the rest_bits-bit value) + 1
    #      = rest_bits - bit_length(rest) + 1. Bit length is
    # computed in the INTEGER domain (6 shift/compare steps):
    # np.frexp rounds a rest near a power of two UP once it
    # exceeds float64's 53-bit mantissa (p <= 10), silently
    # biasing the rank by one.
    bl = np.zeros(len(rest), dtype=np.uint64)
    r = rest.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = r >= np.uint64(1 << s)
        bl[m] += np.uint64(s)
        r[m] >>= np.uint64(s)
    bl += (r > 0).astype(np.uint64)
    rank = (np.uint64(rest_bits) - bl + np.uint64(1)).astype(np.uint8)
    return idx, rank


class HyperLogLog:
    """Dense HLL with 2**p uint8 registers (default p=12 → ~1.6% rel err)."""

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashes(self, hashes: np.ndarray) -> "HyperLogLog":
        idx, rank = hll_idx_rank(hashes, self.p)
        np.maximum.at(self.registers, idx, rank)
        return self

    def add(self, values) -> "HyperLogLog":
        return self.add_hashes(hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros > 0:
                return m * math.log(m / zeros)
        return float(e)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "HyperLogLog":
        p = blob[0]
        regs = np.frombuffer(blob[1:], dtype=np.uint8).copy()
        return cls(p=p, registers=regs)


# ---------------------------------------------------------------------------
# TDigest (merging digest, k1 scale function)
# ---------------------------------------------------------------------------

class TDigest:
    """Merging t-digest for streaming quantiles; mergeable + serializable."""

    __slots__ = ("delta", "means", "weights", "_buf_v", "_buf_w", "count", "v_min", "v_max")

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []
        self.count = 0.0
        self.v_min = math.inf
        self.v_max = -math.inf

    def add_array(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.v_min = min(self.v_min, float(v.min()))
        self.v_max = max(self.v_max, float(v.max()))
        self.count += len(v)
        self._buf_v.append(v)
        self._buf_w.append(np.ones(len(v)))
        if sum(len(b) for b in self._buf_v) > max(65_536, 8 * self.delta):
            self._compress()
        return self

    def _k(self, q: float) -> float:
        return (self.delta / (2 * math.pi)) * math.asin(2 * q - 1)

    def _compress(self) -> None:
        """Greedy k-scale clustering, one step per OUTPUT centroid.

        The textbook per-point loop ("add point i while
        k(cum_q) <= k_limit") costs O(n) Python-level asin calls and
        dominated the whole merge pass (measured: 11.8M _k calls /
        8.9 s for one checkpoint-group merge). Because k is monotone in
        q, the per-point test inverts to a weight threshold:
        points join the current centroid while their cumulative weight
        stays <= q_inv(k_limit)·total with q_inv(k) = (sin(2πk/δ)+1)/2.
        So each output centroid is one searchsorted over the cumulative
        weights (≤ ~2δ iterations total), and the cluster means reduce
        with np.add.reduceat — same clustering, same guarantees, the
        only deltas vs the loop are float-associativity ulps.
        """
        if not self._buf_v and len(self.means) <= self.delta:
            return
        vs = np.concatenate([self.means] + self._buf_v) if self._buf_v else self.means
        ws = np.concatenate([self.weights] + self._buf_w) if self._buf_w else self.weights
        self._buf_v, self._buf_w = [], []
        order = np.argsort(vs, kind="mergesort")
        vs = vs[order]
        ws = ws[order]
        n = len(vs)
        cum = np.cumsum(ws)
        total = float(cum[-1])
        half_pi = math.pi / 2.0
        starts: list[int] = []
        i = 0
        q0 = 0.0
        qref = 1e-12  # the loop version seeded the first limit at q0+1e-12
        while i < n:
            k_limit = self._k(min(1.0, qref)) + 1.0
            ang = (2.0 * math.pi) * k_limit / self.delta
            if ang >= half_pi:  # limit beyond k(1.0): everything fits
                j = n - 1
            else:
                c_max = (math.sin(ang) + 1.0) / 2.0 * total
                j = int(np.searchsorted(cum, c_max, side="right")) - 1
                if j < i:  # a single point may exceed the bound; take it
                    j = i
            starts.append(i)
            q0 = float(cum[j])
            qref = q0 / total
            i = j + 1
        idx = np.asarray(starts, dtype=np.int64)
        w_sums = np.add.reduceat(ws, idx)
        self.means = np.add.reduceat(vs * ws, idx) / w_sums
        self.weights = w_sums

    def merge(self, other: "TDigest") -> "TDigest":
        assert self.delta == other.delta, \
            "merging TDigests with different delta silently recompresses " \
            "at self.delta — construct both sides with one delta"
        if other.count == 0:
            return self
        # note: compresses `other` in place (distribution-preserving;
        # semantically idempotent, but the argument's internal centroid
        # layout changes)
        other._compress()
        self.count += other.count
        self.v_min = min(self.v_min, other.v_min)
        self.v_max = max(self.v_max, other.v_max)
        self._buf_v.append(other.means.copy())
        self._buf_w.append(other.weights.copy())
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        self._compress()
        if self.count == 0:
            return math.nan
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.count
        return float(np.interp(target, cum, self.means, left=self.v_min, right=self.v_max))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def serialize(self) -> bytes:
        self._compress()
        return pickle.dumps(
            (self.delta, self.means, self.weights, self.count, self.v_min, self.v_max)
        )

    @classmethod
    def deserialize(cls, blob: bytes) -> "TDigest":
        delta, means, weights, count, v_min, v_max = pickle.loads(blob)
        td = cls(delta=delta)
        td.means, td.weights, td.count, td.v_min, td.v_max = means, weights, count, v_min, v_max
        return td


# ---------------------------------------------------------------------------
# Histograms
# ---------------------------------------------------------------------------

class CategoricalHistogram:
    """value → count map with a mergeable top-K + overflow design."""

    __slots__ = ("counts", "max_keys", "other")

    def __init__(self, max_keys: int = 4096):
        self.counts: dict = {}
        self.max_keys = max_keys
        self.other = 0

    def add(self, values, counts=None) -> "CategoricalHistogram":
        import pandas as pd

        arr = np.asarray(values)
        if counts is None:
            codes, uniques = pd.factorize(arr, use_na_sentinel=False)
            cnt = np.bincount(codes, minlength=len(uniques))
            items = zip(uniques, cnt)
        else:
            items = zip(arr, np.asarray(counts))
        for v, c in items:
            key = None if (v is None or (isinstance(v, float) and math.isnan(v))) else v
            self.counts[key] = self.counts.get(key, 0) + int(c)
        self._cap()
        return self

    def _cap(self) -> None:
        if len(self.counts) > self.max_keys:
            items = sorted(self.counts.items(), key=lambda kv: -kv[1])
            for k, c in items[self.max_keys:]:
                self.other += c
                del self.counts[k]

    def merge(self, other: "CategoricalHistogram") -> "CategoricalHistogram":
        for v, c in other.counts.items():
            self.counts[v] = self.counts.get(v, 0) + c
        self.other += other.other
        self._cap()
        return self

    def total(self) -> int:
        return sum(self.counts.values()) + self.other

    def serialize(self) -> bytes:
        return pickle.dumps((self.counts, self.max_keys, self.other))

    @classmethod
    def deserialize(cls, blob: bytes) -> "CategoricalHistogram":
        counts, max_keys, other = pickle.loads(blob)
        h = cls(max_keys=max_keys)
        h.counts, h.other = counts, other
        return h


class NumericHistogram:
    """Fixed-bin histogram over [lo, hi] with under/overflow bins."""

    __slots__ = ("lo", "hi", "bins", "counts", "underflow", "overflow", "n_nan")

    def __init__(self, lo: float, hi: float, bins: int = 64):
        self.lo, self.hi, self.bins = float(lo), float(hi), bins
        self.counts = np.zeros(bins, dtype=np.int64)
        self.underflow = 0
        self.overflow = 0
        self.n_nan = 0

    def add_array(self, values: np.ndarray) -> "NumericHistogram":
        v = np.asarray(values, dtype=np.float64)
        nan = np.isnan(v)
        self.n_nan += int(nan.sum())
        v = v[~nan]
        under = v < self.lo
        over = v >= self.hi
        self.underflow += int(under.sum())
        self.overflow += int(over.sum())
        mid = v[~under & ~over]
        if len(mid):
            idx = ((mid - self.lo) / (self.hi - self.lo) * self.bins).astype(np.int64)
            np.clip(idx, 0, self.bins - 1, out=idx)
            self.counts += np.bincount(idx, minlength=self.bins)
        return self

    def merge(self, other: "NumericHistogram") -> "NumericHistogram":
        assert (self.lo, self.hi, self.bins) == (other.lo, other.hi, other.bins)
        self.counts += other.counts
        self.underflow += other.underflow
        self.overflow += other.overflow
        self.n_nan += other.n_nan
        return self

    def total(self) -> int:
        return int(self.counts.sum()) + self.underflow + self.overflow

    def serialize(self) -> bytes:
        return pickle.dumps(
            (self.lo, self.hi, self.bins, self.counts, self.underflow, self.overflow, self.n_nan)
        )

    @classmethod
    def deserialize(cls, blob: bytes) -> "NumericHistogram":
        lo, hi, bins, counts, under, over, n_nan = pickle.loads(blob)
        h = cls(lo, hi, bins)
        h.counts, h.underflow, h.overflow, h.n_nan = counts.copy(), under, over, n_nan
        return h


# ---------------------------------------------------------------------------
# Statistical tests (self-contained, no scipy)
# ---------------------------------------------------------------------------

def _gammainc_upper_reg(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) (series / continued fraction)."""
    if x < 0 or a <= 0:
        return math.nan
    if x == 0:
        return 1.0
    lg = math.lgamma(a)
    if x < a + 1:
        # lower series
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        p = total * math.exp(-x + a * math.log(x) - lg)
        return max(0.0, 1.0 - p)
    # continued fraction for Q
    tiny = 1e-300
    b = x + 1 - a
    c = 1 / tiny
    d = 1 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h * math.exp(-x + a * math.log(x) - lg)


def chi2_sf(stat: float, df: int) -> float:
    """Chi-squared survival function P(X >= stat)."""
    if df <= 0 or math.isnan(stat):
        return math.nan
    return _gammainc_upper_reg(df / 2.0, stat / 2.0)


def chi2_two_sample(counts1: np.ndarray, counts2: np.ndarray) -> tuple[float, int, float]:
    """Two-sample chi-squared homogeneity test over aligned category counts.

    Returns (statistic, dof, p_value). Categories with zero total count
    are dropped.
    """
    c1 = np.asarray(counts1, dtype=np.float64)
    c2 = np.asarray(counts2, dtype=np.float64)
    keep = (c1 + c2) > 0
    c1, c2 = c1[keep], c2[keep]
    if len(c1) < 2:
        return 0.0, 0, 1.0
    n1, n2 = c1.sum(), c2.sum()
    if n1 == 0 or n2 == 0:
        return math.nan, 0, math.nan
    total = c1 + c2
    e1 = total * (n1 / (n1 + n2))
    e2 = total * (n2 / (n1 + n2))
    stat = float((((c1 - e1) ** 2) / e1).sum() + (((c2 - e2) ** 2) / e2).sum())
    df = len(c1) - 1
    return stat, df, chi2_sf(stat, df)


def psi_two_sample(counts1: np.ndarray, counts2: np.ndarray,
                   smooth: float = 0.5) -> float:
    """Population Stability Index over aligned category counts —
    the industry-standard drift magnitude (rule of thumb: < 0.1
    stable, 0.1-0.25 moderate, > 0.25 major shift).

    PSI = sum (p - q) * ln(p / q) with Laplace smoothing `smooth`
    added per bin so empty bins stay finite. Bins empty on BOTH sides
    are DROPPED before smoothing: when the two totals differ, a
    both-empty bin's smoothed p and q differ, so keeping such padding
    bins would inflate PSI by the dead-bin count (measured: 0.25 of
    pure padding on identical one-category distributions) — dropping
    them makes the result depend only on the OBSERVED category set."""
    c1 = np.asarray(counts1, dtype=np.float64)
    c2 = np.asarray(counts2, dtype=np.float64)
    seen = (c1 > 0) | (c2 > 0)
    c1, c2 = c1[seen], c2[seen]
    if len(c1) == 0:
        return math.nan
    k = len(c1)
    p = (c1 + smooth) / (c1.sum() + smooth * k)
    q = (c2 + smooth) / (c2.sum() + smooth * k)
    return float(((p - q) * np.log(p / q)).sum())


def ks_two_sample_from_hist(h1: NumericHistogram, h2: NumericHistogram) -> tuple[float, float]:
    """Approximate two-sample KS over binned CDFs; returns (D, p_value)."""
    assert (h1.lo, h1.hi, len(h1.counts)) == (h2.lo, h2.hi, len(h2.counts)), \
        "KS needs histograms over the SAME (lo, hi, bins) — positional " \
        "bin comparison over different ranges is meaningless"
    # total() already excludes NaNs (counts + underflow + overflow)
    n1, n2 = h1.total(), h2.total()
    if n1 == 0 or n2 == 0:
        return math.nan, math.nan
    c1 = np.concatenate([[h1.underflow], h1.counts, [h1.overflow]]).astype(np.float64)
    c2 = np.concatenate([[h2.underflow], h2.counts, [h2.overflow]]).astype(np.float64)
    cdf1 = np.cumsum(c1) / n1
    cdf2 = np.cumsum(c2) / n2
    d = float(np.abs(cdf1 - cdf2).max())
    en = math.sqrt(n1 * n2 / (n1 + n2))
    lam = (en + 0.12 + 0.11 / en) * d
    p = 2.0 * sum((-1) ** (k - 1) * math.exp(-2 * (k * lam) ** 2) for k in range(1, 101))
    return d, float(min(1.0, max(0.0, p)))


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters
# ---------------------------------------------------------------------------

class MisraGries:
    """Heavy-hitter summary with k counters (Misra–Gries).

    Deterministic guarantee: after summarizing a stream of N items,
    every stored count c(x) satisfies f(x) - N/(k+1) <= c(x) <= f(x),
    so any item with true frequency above N/(k+1) is guaranteed
    present. Mergeable (Agarwal et al., "Mergeable Summaries",
    PODS'12): merge = add counts, then subtract the (k+1)-th largest
    count from everything and drop non-positives — the union keeps the
    same error bound. This is the bounded-memory path for corpus
    n-gram/top-k statistics when the vocabulary exceeds memory
    (`ops/ngrams.ngram_counts(strategy="driver")` assumes it fits).
    """

    __slots__ = ("k", "counts", "n", "err")

    def __init__(self, k: int = 1024):
        self.k = k
        self.counts: dict = {}
        self.n = 0
        # actual max undercount: the sum of thresholds subtracted by
        # shrinks along this sketch's merge history. Always <= n/(k+1);
        # EXACTLY 0 when the vocabulary never exceeded k (sketch is
        # then a plain exact count table).
        self.err = 0

    def add(self, values, counts=None) -> "MisraGries":
        """Add values (optionally pre-aggregated with counts) —
        pre-aggregate per batch so the Python dict work is
        O(batch vocab), not O(batch items)."""
        import pandas as pd

        arr = np.asarray(values, dtype=object)
        if counts is None:
            codes, uniques = pd.factorize(arr, use_na_sentinel=False)
            cs = np.bincount(codes, minlength=len(uniques))
            items = zip(uniques, cs)
        else:
            items = zip(arr, np.asarray(counts))
        for v, c in items:
            # normalize null-likes to ONE key: distinct NaN objects
            # hash by identity and would accumulate as separate
            # counters (same normalization as CategoricalHistogram)
            if v is None or (isinstance(v, float) and math.isnan(v)):
                v = None
            c = int(c)
            self.n += c
            self.counts[v] = self.counts.get(v, 0) + c
        self._shrink()
        return self

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = np.fromiter(self.counts.values(), dtype=np.int64,
                           count=len(self.counts))
        # subtract the (k+1)-th largest count; at most k survive
        thresh = int(np.partition(vals, -self.k - 1)[-self.k - 1])
        self.err += thresh
        self.counts = {key: c - thresh for key, c in self.counts.items()
                       if c > thresh}

    def merge(self, other: "MisraGries") -> "MisraGries":
        self.n += other.n
        self.err += other.err
        for v, c in other.counts.items():
            self.counts[v] = self.counts.get(v, 0) + c
        self._shrink()
        return self

    def top(self, m: int) -> list[tuple]:
        """Top-m surviving items by retained count (a LOWER bound on
        true frequency; upper bound adds n/(k+1))."""
        # tie-break on str(key): raw keys of mixed types (str vs the
        # normalized None) are not mutually comparable
        return sorted(self.counts.items(),
                      key=lambda kv: (-kv[1], str(kv[0])))[:m]

    def error_bound(self) -> float:
        """Max undercount of any stored counter (sum of subtracted
        shrink thresholds; 0 when the vocab never exceeded k, and
        always <= n/(k+1))."""
        return float(min(self.err, self.n / (self.k + 1)))

    def serialize(self) -> bytes:
        return pickle.dumps((self.k, self.counts, self.n, self.err))

    @classmethod
    def deserialize(cls, blob: bytes) -> "MisraGries":
        mg = cls()
        mg.k, mg.counts, mg.n, mg.err = pickle.loads(blob)
        return mg


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

class BloomFilter:
    """Mergeable Bloom filter over 64-bit element hashes.

    The broadcast-membership alternative for reference key sets too
    large to ship as sorted uint64 arrays (8 B/key): ~1.2 bytes/key at
    1% FPR. One-sided by construction — `contains` is NEVER false for
    an added element, so an anti-join driven by it can only MISS
    violations (absent keys that collide), never invent them; the same
    guarantee direction as the engine's 64-bit fingerprint checks.

    k probe positions per element via double hashing
    (h1 + i·h2, Kirsch–Mitzenmacher); add/contains are fully
    vectorized; merge is a bitwise OR of equal-shaped bit arrays.
    """

    __slots__ = ("n_bits", "k", "bits")

    def __init__(self, n_bits: int = 1 << 20, k: int = 7,
                 bits: np.ndarray | None = None):
        assert n_bits % 64 == 0
        self.n_bits = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(n_bits // 64, np.uint64)

    @classmethod
    def for_capacity(cls, n: int, fpr: float = 0.01) -> "BloomFilter":
        """Size for `n` elements at target false-positive rate."""
        n = max(n, 1)
        n_bits = int(-n * math.log(fpr) / (math.log(2) ** 2))
        n_bits = max(256, (n_bits + 63) // 64 * 64)
        # cap k: the 256-bit floor with tiny n would otherwise yield
        # absurd probe counts (n=1 → k=177 hash positions per element)
        k = min(32, max(1, round(n_bits / n * math.log(2))))
        return cls(n_bits=n_bits, k=k)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h1 = h
            h2 = (h >> np.uint64(32)) | (h << np.uint64(32)) | np.uint64(1)
            ks = np.arange(self.k, dtype=np.uint64)[:, None]
            return ((h1[None, :] + ks * h2[None, :])
                    % np.uint64(self.n_bits))  # (k, n)

    def add_hashes(self, hashes: np.ndarray) -> "BloomFilter":
        if len(hashes) == 0:
            return self
        pos = self._positions(hashes).ravel()
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self.bits, word, bit)
        return self

    def add(self, values) -> "BloomFilter":
        return self.add_hashes(hash64(values))

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        return ((self.bits[word] & bit) != 0).all(axis=0)

    def contains(self, values) -> np.ndarray:
        return self.contains_hashes(hash64(values))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def serialize(self) -> bytes:
        return pickle.dumps((self.n_bits, self.k, self.bits))

    @classmethod
    def deserialize(cls, blob: bytes) -> "BloomFilter":
        n_bits, k, bits = pickle.loads(blob)
        return cls(n_bits=n_bits, k=k, bits=bits.copy())
