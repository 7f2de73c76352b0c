"""Sketch correctness: accuracy bounds + merge associativity (SURVEY.md §5.2.4)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from webvalid.sketches import (
    CategoricalHistogram,
    HyperLogLog,
    NumericHistogram,
    TDigest,
    chi2_sf,
    chi2_two_sample,
    hash64,
    ks_two_sample_from_hist,
)


def test_hash64_deterministic():
    a = hash64(np.array(["a", "b", "a"], dtype=object))
    b = hash64(np.array(["a", "b", "a"], dtype=object))
    assert (a == b).all() and a[0] == a[2] and a[0] != a[1]


@pytest.mark.parametrize("n", [100, 5_000, 50_000])
def test_hll_accuracy(n):
    rng = np.random.default_rng(n)
    vals = rng.integers(0, 1 << 62, size=n).astype(np.uint64)
    hll = HyperLogLog(p=12).add_hashes(hash64(vals))
    exact = len(np.unique(vals))
    assert hll.estimate() == pytest.approx(exact, rel=0.06)


def test_hll_merge_equals_union():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 10_000, size=20_000)
    b = rng.integers(5_000, 15_000, size=20_000)
    h1 = HyperLogLog().add(a)
    h2 = HyperLogLog().add(b)
    merged = HyperLogLog.deserialize(h1.serialize()).merge(h2)
    whole = HyperLogLog().add(np.concatenate([a, b]))
    assert merged.estimate() == whole.estimate()  # register-exact


@pytest.mark.parametrize("seed", [0, 1])
def test_tdigest_quantiles(seed):
    rng = np.random.default_rng(seed)
    data = rng.lognormal(0, 1, size=50_000)
    td = TDigest()
    for chunk in np.array_split(data, 23):
        td.add_array(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(data, q)
        assert td.quantile(q) == pytest.approx(exact, rel=0.05), q


def test_tdigest_merge_close_to_whole():
    rng = np.random.default_rng(9)
    data = rng.normal(10, 3, size=30_000)
    parts = np.array_split(data, 7)
    digests = [TDigest().add_array(p) for p in parts]
    merged = TDigest.deserialize(digests[0].serialize())
    for d in digests[1:]:
        merged.merge(TDigest.deserialize(d.serialize()))
    assert merged.count == len(data)
    for q in (0.1, 0.5, 0.9):
        assert merged.quantile(q) == pytest.approx(np.quantile(data, q), rel=0.05)
    assert merged.quantile(0.0) <= data.min() + 1e-9
    assert merged.quantile(1.0) >= data.max() - 1e-9


def test_categorical_histogram_merge():
    h1 = CategoricalHistogram().add(np.array(["en", "en", "de"], dtype=object))
    h2 = CategoricalHistogram().add(np.array(["en", "fr"], dtype=object))
    m = CategoricalHistogram.deserialize(h1.serialize()).merge(h2)
    assert m.counts == {"en": 3, "de": 1, "fr": 1}
    assert m.total() == 5


def test_numeric_histogram_merge_and_overflow():
    h1 = NumericHistogram(0, 10, bins=10).add_array(np.array([1.0, 2.0, 11.0]))
    h2 = NumericHistogram(0, 10, bins=10).add_array(np.array([-5.0, 3.0, float("nan")]))
    m = NumericHistogram.deserialize(h1.serialize()).merge(h2)
    assert m.total() == 5 and m.overflow == 1 and m.underflow == 1 and m.n_nan == 1


def test_chi2_sf_known_values():
    # Known chi-squared critical points: P(X >= 3.841 | df=1) ≈ 0.05,
    # P(X >= 18.307 | df=10) ≈ 0.05.
    assert chi2_sf(3.841, 1) == pytest.approx(0.05, abs=0.002)
    assert chi2_sf(18.307, 10) == pytest.approx(0.05, abs=0.002)
    assert chi2_sf(0.0, 5) == 1.0


def test_chi2_two_sample_detects_shift():
    same1 = np.array([500, 300, 200])
    same2 = np.array([510, 290, 200])
    stat, df, p = chi2_two_sample(same1, same2)
    assert p > 0.5
    shifted = np.array([200, 300, 500])
    stat2, df2, p2 = chi2_two_sample(same1, shifted)
    assert p2 < 1e-6 and stat2 > stat


def test_ks_from_histograms():
    rng = np.random.default_rng(5)
    h1 = NumericHistogram(-5, 5, 64).add_array(rng.normal(0, 1, 20_000))
    h2 = NumericHistogram(-5, 5, 64).add_array(rng.normal(0, 1, 20_000))
    d_same, p_same = ks_two_sample_from_hist(h1, h2)
    h3 = NumericHistogram(-5, 5, 64).add_array(rng.normal(1, 1, 20_000))
    d_shift, p_shift = ks_two_sample_from_hist(h1, h3)
    assert p_same > 0.01 and p_shift < 1e-10 and d_shift > d_same


def test_hll_serialize_roundtrip():
    h = HyperLogLog().add(np.arange(1000))
    r = HyperLogLog.deserialize(h.serialize())
    assert r.estimate() == h.estimate() and (r.registers == h.registers).all()


# ---------- Misra–Gries heavy hitters ----------


def test_misra_gries_guarantee_and_merge():
    import numpy as np

    from webvalid.sketches import MisraGries

    rng = np.random.default_rng(3)
    # zipf-ish stream over 5000 distinct items
    items = [f"item{int(v)}" for v in rng.zipf(1.3, 40_000) % 5000]
    from collections import Counter

    truth = Counter(items)
    n = len(items)
    k = 256

    # split into chunks, sketch each, merge — the mergeable-summaries path
    mg = MisraGries(k=k)
    chunk = len(items) // 7
    parts = [items[i:i + chunk] for i in range(0, len(items), chunk)]
    sketches = []
    for p in parts:
        s = MisraGries(k=k)
        s.add(np.asarray(p, dtype=object))
        sketches.append(s)
    for s in sketches:
        mg.merge(s)

    assert mg.n == n
    assert len(mg.counts) <= k
    bound = mg.error_bound()
    for item, c in mg.counts.items():
        assert c <= truth[item]            # never overcount
        assert truth[item] - c <= bound + 1e-9  # bounded undercount
    # every item with true frequency above the bound must survive
    for item, f in truth.items():
        if f > bound:
            assert item in mg.counts, (item, f, bound)


def test_misra_gries_serialize_roundtrip():
    import numpy as np

    from webvalid.sketches import MisraGries

    mg = MisraGries(k=8)
    mg.add(np.asarray(list("aabbbbcccccxyz"), dtype=object))
    back = MisraGries.deserialize(mg.serialize())
    assert back.counts == mg.counts and back.n == mg.n and back.k == mg.k


# ---------- Bloom filter ----------


def test_bloom_no_false_negatives_and_fpr():
    import numpy as np

    from webvalid.sketches import BloomFilter

    rng = np.random.default_rng(1)
    members = np.asarray([f"key{i}" for i in range(20_000)], dtype=object)
    others = np.asarray([f"other{i}" for i in range(20_000)], dtype=object)
    bf = BloomFilter.for_capacity(len(members), fpr=0.01)
    bf.add(members)
    assert bf.contains(members).all()          # NEVER a false negative
    fpr = bf.contains(others).mean()
    assert fpr < 0.03                          # near the 1% design point


def test_bloom_merge_equals_union_and_roundtrip():
    import numpy as np

    from webvalid.sketches import BloomFilter

    a_keys = np.asarray([f"a{i}" for i in range(5000)], dtype=object)
    b_keys = np.asarray([f"b{i}" for i in range(5000)], dtype=object)
    whole = BloomFilter(n_bits=1 << 17, k=5).add(np.concatenate([a_keys, b_keys]))
    pa_ = BloomFilter(n_bits=1 << 17, k=5).add(a_keys)
    pb_ = BloomFilter(n_bits=1 << 17, k=5).add(b_keys)
    merged = pa_.merge(pb_)
    assert (merged.bits == whole.bits).all()
    back = BloomFilter.deserialize(merged.serialize())
    assert (back.bits == merged.bits).all() and back.k == merged.k
