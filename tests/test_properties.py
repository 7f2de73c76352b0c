"""Property-style tests: sketch merge laws + drift math invariants
(SURVEY.md §5.2.4) using hypothesis."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from webvalid.sketches import CategoricalHistogram, HyperLogLog, NumericHistogram, TDigest
from webvalid.drift.dilca import block_summary
from webvalid.drift.cdda import change_degree, column_histograms, merge_histograms
from tests import oracle


values_arrays = st.lists(
    st.integers(min_value=0, max_value=500), min_size=1, max_size=300
)


@settings(max_examples=30, deadline=None)
@given(values_arrays, values_arrays, values_arrays)
def test_hll_merge_associative_commutative(a, b, c):
    def h(vals):
        return HyperLogLog(p=8).add(np.asarray(vals))

    left = h(a).merge(h(b)).merge(h(c))
    right = h(c).merge(h(a).merge(h(b)))
    together = HyperLogLog(p=8).add(np.asarray(a + b + c))
    assert (left.registers == right.registers).all()
    assert (left.registers == together.registers).all()


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
             min_size=1, max_size=400),
    st.integers(min_value=1, max_value=5),
)
def test_tdigest_merge_order_independent_quantiles(data, n_splits):
    arr = np.asarray(data)
    parts = np.array_split(arr, n_splits)
    fwd = TDigest(delta=100)
    for p in parts:
        fwd.merge(TDigest(delta=100).add_array(p))
    rev = TDigest(delta=100)
    for p in reversed(parts):
        rev.merge(TDigest(delta=100).add_array(p))
    assert fwd.count == rev.count == len(arr)
    # rank-window bound: the digest's q-quantile must fall between the
    # exact (q ± 0.25)-quantiles (tiny samples make point comparisons
    # meaningless — numpy interpolates, digests snap to centroids)
    for q in (0.1, 0.5, 0.9):
        lo_b = float(np.quantile(arr, max(0.0, q - 0.25)))
        hi_b = float(np.quantile(arr, min(1.0, q + 0.25)))
        for d in (fwd, rev):
            v = d.quantile(q)
            assert lo_b - 1e-9 <= v <= hi_b + 1e-9


@settings(max_examples=30, deadline=None)
@given(values_arrays, values_arrays)
def test_numeric_histogram_merge_equals_whole(a, b):
    h1 = NumericHistogram(0, 500, 32).add_array(np.asarray(a, dtype=float))
    h2 = NumericHistogram(0, 500, 32).add_array(np.asarray(b, dtype=float))
    whole = NumericHistogram(0, 500, 32).add_array(np.asarray(a + b, dtype=float))
    h1.merge(h2)
    assert (h1.counts == whole.counts).all()
    assert h1.total() == whole.total()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.sampled_from("abcde"), min_size=1, max_size=100),
    st.lists(st.sampled_from("abcde"), min_size=1, max_size=100),
)
def test_categorical_histogram_merge_equals_whole(a, b):
    h1 = CategoricalHistogram().add(np.array(a, dtype=object))
    h2 = CategoricalHistogram().add(np.array(b, dtype=object))
    whole = CategoricalHistogram().add(np.array(a + b, dtype=object))
    h1.merge(h2)
    assert h1.counts == whole.counts


rows_strategy = st.lists(
    st.tuples(st.sampled_from("abc"), st.sampled_from("xyz"), st.sampled_from("pq")),
    min_size=2,
    max_size=60,
)


@settings(max_examples=25, deadline=None)
@given(rows_strategy)
def test_block_summary_matches_oracle_property(rows):
    cols = [np.array([r[i] for r in rows], dtype=object) for i in range(3)]
    expected = oracle.summary_of(rows)
    actual = block_summary(cols)
    if math.isnan(expected):
        assert math.isnan(actual)
    else:
        assert actual == pytest.approx(expected, rel=1e-10, abs=1e-12)


@settings(max_examples=25, deadline=None)
@given(rows_strategy, rows_strategy)
def test_change_degree_matches_oracle_property(r1, r2):
    c1 = [np.array([r[i] for r in r1], dtype=object) for i in range(3)]
    c2 = [np.array([r[i] for r in r2], dtype=object) for i in range(3)]
    expected = oracle.change_degree_for(r1, r2)
    actual = change_degree(column_histograms(c1), column_histograms(c2))
    if math.isnan(expected):
        assert math.isnan(actual)
    elif math.isinf(expected):
        assert math.isinf(actual)
    else:
        assert actual == pytest.approx(expected, rel=1e-12)


@settings(max_examples=25, deadline=None)
@given(rows_strategy, rows_strategy)
def test_histogram_merge_equals_concat_block(r1, r2):
    """Per-column histogram of concatenated rows == merged histograms —
    the invariant the per-batch drift partials rely on."""
    c1 = [np.array([r[i] for r in r1], dtype=object) for i in range(3)]
    c2 = [np.array([r[i] for r in r2], dtype=object) for i in range(3)]
    both = [np.concatenate([a, b]) for a, b in zip(c1, c2)]
    merged = merge_histograms(column_histograms(c1), column_histograms(c2))
    assert merged == column_histograms(both)


# ---------------------------------------------------------------------------
# Vectorized dedup kernels vs naive per-doc references
# ---------------------------------------------------------------------------

texts_strategy = st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet="abcdef ghij", min_size=0, max_size=60),
    ),
    min_size=1, max_size=12,
)


@settings(max_examples=30, deadline=None)
@given(texts_strategy)
def test_minhash_batch_kernel_matches_naive(texts):
    """The batched rolling-hash signature kernel must equal a per-doc
    naive computation with the same permutations and window hashes."""
    from webvalid.ops.dedup import MinHasher, _batch_shingle_hashes

    mh = MinHasher(num_perm=16, bands=4, shingle_k=5)
    keep, sig = mh.signatures(texts)
    kept = 0
    for i, t in enumerate(texts):
        counts, h = _batch_shingle_hashes([t], 5)
        if counts[0] == 0:
            assert not keep[i]
            continue
        assert keep[i]
        with np.errstate(over="ignore"):
            vals = mh.a[:, None] * h[None, :] + mh.b[:, None]
        naive = vals.min(axis=1)
        assert (sig[kept] == naive).all()
        kept += 1
    assert kept == int(keep.sum())


@settings(max_examples=30, deadline=None)
@given(texts_strategy)
def test_simhash_batch_kernel_matches_naive(texts):
    """The batched unpackbits/reduceat simhash must equal a naive
    per-doc majority-bit computation over the same token hashes."""
    import re

    from webvalid.ops.dedup import SimHasher
    from webvalid.sketches import hash64

    token_re = re.compile(r"\w+", re.UNICODE)
    sh = SimHasher()
    keep, out = sh.simhashes(texts)
    kept = 0
    for i, t in enumerate(texts):
        toks = token_re.findall(t.lower()) if t else []
        if not toks:
            assert not keep[i]
            continue
        assert keep[i]
        h = hash64(np.array(toks, dtype=object))
        naive = 0
        for bit in range(64):
            ones = int(((h >> np.uint64(bit)) & np.uint64(1)).sum())
            if 2 * ones > len(toks):
                naive |= 1 << bit
        assert int(out[kept]) == naive
        kept += 1


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=0, max_size=50))
def test_popcount64_matches_python(vals):
    from webvalid.ops.dedup import _popcount64

    arr = np.array(vals, dtype=np.uint64)
    got = _popcount64(arr)
    assert list(got) == [bin(v).count("1") for v in vals]


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=0, max_value=2**31))
def test_minhash_est_jaccard_tracks_exact(seed):
    """est_jaccard ≈ exact shingle-set Jaccard (within LSH noise) for a
    pair of overlapping documents."""
    from webvalid.ops.dedup import MinHasher, _batch_shingle_hashes

    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    base = " ".join(rng.choice(words, size=60))
    mutated = base.split(" ")
    for i in rng.choice(60, size=6, replace=False):
        mutated[i] = "OMEGA"
    other = " ".join(mutated)
    mh = MinHasher(num_perm=128, bands=8)
    keep, sig = mh.signatures([base, other])
    assert keep.all()
    est = float((sig[0] == sig[1]).mean())

    def shingle_set(t):
        _, h = _batch_shingle_hashes([t], 5)
        return set(h.tolist())

    sa, sb = shingle_set(base), shingle_set(other)
    exact = len(sa & sb) / len(sa | sb)
    assert abs(est - exact) < 0.2  # 128 permutations → σ ≈ 0.044


# ---- sampling / ngrams / graph kernel properties (no Ray needed) ----

edges_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=60),
              st.integers(min_value=0, max_value=60)),
    min_size=0, max_size=80,
)


@given(edges_strategy, st.integers(min_value=1, max_value=5))
@settings(max_examples=60, deadline=None)
def test_dsu_forest_contraction_associative(edges, n_chunks):
    """components(forest(E₁) ∪ … ∪ forest(Eₖ)) == components(E) for any
    chunking — the invariant the distributed merge rounds rely on."""
    from webvalid.ops.graph import _DSU

    whole = _DSU()
    for a, b in edges:
        whole.union(a, b)
    expect = {n: whole.find(n) for n in sorted(whole.parent)}

    merged = _DSU()
    k = max(1, len(edges) // n_chunks) if edges else 1
    for i in range(0, max(len(edges), 1), k):
        part = _DSU()
        for a, b in edges[i:i + k]:
            part.union(a, b)
        ft = part.forest_table()
        for a, b in zip(ft["src"].to_pylist(), ft["dst"].to_pylist()):
            merged.union(a, b)
    got = {n: merged.find(n) for n in sorted(merged.parent)}
    assert got == expect


texts_lists = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=20), min_size=1, max_size=30
)


@given(texts_lists, st.integers(min_value=1, max_value=3))
@settings(max_examples=60, deadline=None)
def test_batch_ngram_counts_match_naive_property(texts, n):
    from collections import Counter

    import pyarrow as pa

    from webvalid.ops.ngrams import _batch_ngram_counts

    batch = pa.table({"text": pa.array(texts, pa.string())})
    got = _batch_ngram_counts(batch, "text", n)
    gotd = dict(zip(got["ngram"].to_pylist(), got["cnt"].to_pylist()))
    naive = Counter()
    for t in texts:
        toks = t.split(" ")
        for i in range(len(toks) - n + 1):
            naive[" ".join(toks[i:i + n])] += 1
    assert gotd == dict(naive)


@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=50))
@settings(max_examples=60, deadline=None)
def test_split_column_partitions_every_row(texts):
    """Every row gets exactly one split; assignment matches the pure
    md5-bucket rule; fractions are honored at the bucket level."""
    import hashlib

    import pyarrow as pa

    from webvalid.ops.sampling import add_split_column, split_thresholds

    th = split_thresholds({"train": 0.8, "valid": 0.1, "test": 0.1})
    batch = pa.table({"text": pa.array(texts, pa.string())})
    out = add_split_column(batch, "text", th)
    for t, s in zip(texts, out["split"].to_pylist()):
        b = int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
        expect = "train" if b < th[0][1] else ("valid" if b < th[1][1] else "test")
        assert s == expect


@given(
    st.lists(st.one_of(st.none(), st.text(alphabet="ab x", max_size=16)),
             min_size=1, max_size=25),
    st.lists(st.text(alphabet="ab x", min_size=1, max_size=3).map(str.strip)
             .filter(lambda t: t and " " not in t), max_size=3),
)
@settings(max_examples=60, deadline=None)
def test_rewrite_without_hot_matches_naive(texts, hot_tokens):
    """The Arrow-offset rewrite kernel == the obvious Python rewrite,
    over adversarial inputs: nulls anywhere, empty strings, runs of
    spaces (empty tokens), hot sets that may match '' or nothing."""
    import pyarrow as pa

    from webvalid.ops.boilerplate import rewrite_without_hot
    from webvalid.sketches import hash64

    hot = sorted(set(hot_tokens))
    hot_sorted = (np.sort(hash64(np.asarray(hot, dtype=object)))
                  if hot else np.empty(0, dtype=np.uint64))
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = rewrite_without_hot(batch, "text", hot_sorted, ["doc_id"])
    got = dict(zip(out["doc_id"].to_pylist(), out["clean_text"].to_pylist()))

    expect = {}
    hotset = set(hot)
    for i, t in enumerate(texts):
        if t is None:
            continue  # null docs drop
        kept = [tok for tok in t.split(" ") if tok not in hotset]
        if kept:
            expect[i] = " ".join(kept)
    assert got == expect


# ---------------------------------------------------------------------------
# Session-6 kernel properties (pure-function parts, no Ray needed)
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=200), min_size=1,
                max_size=120),
       st.integers(min_value=1, max_value=50))
def test_interval_island_math_matches_bruteforce(starts, dur):
    """The gaps-and-islands covered-length arithmetic used by
    interval_coverage_per_key, replicated on raw numpy vs a brute
    boolean-line oracle."""
    s = np.sort(np.asarray(starts, dtype=np.int64), kind="mergesort")
    e = s + dur
    pmax = np.maximum.accumulate(e)
    new = np.concatenate([[True], s[1:] > pmax[:-1]])
    islands_start = s[new]
    islands_end = np.maximum.reduceat(e, np.flatnonzero(new))
    covered = int((islands_end - islands_start).sum())
    line = np.zeros(int(e.max()) + 1, dtype=bool)
    for a in s:
        line[a:a + dur] = True
    assert covered == int(line.sum())
    assert int(new.sum()) >= 1


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                max_size=200),
       st.integers(min_value=1, max_value=300))
def test_systematic_weight_selection_matches_bruteforce(weights, step):
    """Boundary-crossing selection = 'which rows own a multiple of
    step laid along the cumulative weight axis'."""
    w = np.asarray(weights, dtype=np.int64)
    cum = np.cumsum(w)
    before = cum - w
    keep = (before // step) < (cum // step)
    # oracle: multiples of step in (0, total] land in exactly one row's
    # (before, cum] span
    total = int(cum[-1]) if len(cum) else 0
    marks = list(range(step, total + 1, step))
    owner = set()
    for m in marks:
        owner.add(int(np.searchsorted(cum, m, side="left")))
    assert set(np.flatnonzero(keep)) == owner
    # zero-weight rows are never selected
    assert not keep[w == 0].any()


def test_asof_matches_duckdb_over_seeds(ray_session):
    """Randomized engine-vs-DuckDB ASOF JOIN parity: both as-of paths
    must reproduce DuckDB's greatest-r.ts<=l.ts semantics on random
    data (unique right (k, ts) pairs — tie order among duplicate right
    timestamps is engine-defined, pinned by its own dedicated test)."""
    import duckdb
    import pandas as pd
    import ray.data

    from webvalid.ops.asof import asof_join_broadcast, asof_join_partitioned

    for seed in (3, 11, 42):
        rng = np.random.default_rng(seed)
        n_l, n_r = 300, 120
        lf = pd.DataFrame({
            "lid": np.arange(n_l, dtype=np.int64),
            "k": rng.integers(0, 12, n_l),
            "ts": rng.integers(0, 2000, n_l).astype(np.int64),
        })
        r = pd.DataFrame({
            "k": rng.integers(0, 12, n_r),
            "ts": rng.integers(0, 2000, n_r).astype(np.int64),
        }).drop_duplicates(["k", "ts"]).reset_index(drop=True)
        r["val"] = np.arange(len(r), dtype=np.int64)
        exp = duckdb.connect().execute("""
            SELECT l.lid, r.val FROM lf l
            ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
            ORDER BY l.lid""").df()
        lds = ray.data.from_pandas(lf).repartition(4)
        for name, got in (
            ("bcast", asof_join_broadcast(lds, r, on="ts", by="k")),
            ("part", asof_join_partitioned(
                lds, ray.data.from_pandas(r).repartition(3),
                on="ts", by="k", num_buckets=5)),
        ):
            g = got.to_pandas().sort_values("lid").reset_index(drop=True)
            assert g["val"].astype("float64").equals(
                exp["val"].astype("float64")), (seed, name)


def test_grouped_kth_matches_numpy_over_seeds(ray_session):
    """Randomized grouped-bisection parity vs numpy per-key sorted
    selection, with NaNs, negative values, constant groups, and a
    collect_limit forcing real bisection rounds."""
    import pandas as pd
    import ray.data

    from webvalid.ops.selection import grouped_kth_smallest_multi

    for seed in (5, 19):
        rng = np.random.default_rng(seed)
        n = 1500
        df = pd.DataFrame({
            "k": rng.integers(0, 6, n),
            "v": np.round(rng.normal(-50, 300, n), 2),
        })
        df.loc[rng.random(n) < 0.05, "v"] = np.nan
        df.loc[df.k == 3, "v"] = -7.25  # constant group
        ds = ray.data.from_pandas(df).repartition(5)
        got = grouped_kth_smallest_multi(
            ds, "k", "v", ks_of_n=lambda m: [1, (m + 1) // 2, m],
            collect_limit=40, bins=16)
        for kv, vals in got.items():
            s = np.sort(df.loc[(df.k == kv) & df.v.notna(), "v"].to_numpy())
            exp = [s[0], s[(len(s) + 1) // 2 - 1], s[-1]]
            assert np.allclose(vals, exp, atol=1e-12), (seed, kv)
