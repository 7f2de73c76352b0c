"""Tests for the sampling / n-gram / connected-components operator
families (ops/sampling.py, ops/ngrams.py, ops/graph.py)."""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------- sampling ----------


def test_md5_bucket16_matches_hashlib():
    from webvalid.ops.sampling import md5_bucket16

    texts = ["hello", "", "naïve café — ünïcode", "a" * 10_000, None, "x"]
    col = pa.array(texts, pa.string())
    valid, bucket = md5_bucket16(col)
    assert list(valid) == [True, True, True, True, False, True]
    for i, t in enumerate(texts):
        if t is None:
            continue
        expect = int(hashlib.md5(t.encode()).hexdigest()[:4], 16)
        assert int(bucket[i]) == expect, (t, int(bucket[i]), expect)


def test_hash_split_fractions_and_determinism(ray_session):
    import ray.data

    from webvalid.ops.sampling import hash_split

    texts = [f"document number {i} with content {i * 17}" for i in range(4000)]
    ds = ray.data.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    out = hash_split(ds).to_pandas().sort_values("doc_id")
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["valid"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
    # content-keyed: identical assignment under a different partitioning
    out2 = hash_split(ds.repartition(7)).to_pandas().sort_values("doc_id")
    assert out["split"].tolist() == out2["split"].tolist()


def test_hash_split_matches_duckdb(ray_session):
    import duckdb

    import ray.data

    from webvalid.ops.sampling import hash_split

    pdf = pd.DataFrame({
        "doc_id": range(300),
        "text": [f"doc {i} payload {i * i}" for i in range(300)],
    })
    got = (
        hash_split(ray.data.from_pandas(pdf))
        .to_pandas().sort_values("doc_id")["split"].tolist()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql("""
        SELECT CASE WHEN substr(md5(text),1,4) < 'cccc' THEN 'train'
                    WHEN substr(md5(text),1,4) < 'e666' THEN 'valid'
                    ELSE 'test' END
        FROM t ORDER BY doc_id
    """).df().iloc[:, 0].tolist()
    assert got == exp


def test_stratified_sample_rates_and_subset(ray_session):
    import ray.data

    from webvalid.ops.sampling import BUCKETS, md5_bucket16, stratified_sample

    rng = random.Random(5)
    rows = [
        {"doc_id": i, "lang": rng.choice(["en", "en", "en", "de", "fr"]),
         "text": f"text {i} body {i * 13}"}
        for i in range(3000)
    ]
    pdf = pd.DataFrame(rows)
    ds = ray.data.from_pandas(pdf)
    out = stratified_sample(ds, rates={"en": 0.1, "de": 0.5}).to_pandas()
    # exact expected set computed directly from the bucket rule
    _, bucket = md5_bucket16(pa.array(pdf["text"].tolist()))
    th = pdf["lang"].map({"en": int(0.1 * BUCKETS), "de": int(0.5 * BUCKETS)}) \
        .fillna(BUCKETS).to_numpy()
    expect_ids = pdf.loc[bucket < th, "doc_id"].tolist()
    assert sorted(out["doc_id"].tolist()) == sorted(expect_ids)
    by_lang = out["lang"].value_counts()
    n_en = (pdf["lang"] == "en").sum()
    assert by_lang["en"] < 0.15 * n_en  # hot stratum actually capped
    assert by_lang["fr"] == (pdf["lang"] == "fr").sum()  # default 1.0 keeps all


# ---------- n-grams ----------


def _naive_ngrams(texts, n):
    from collections import Counter

    c = Counter()
    for t in texts:
        toks = t.split(" ")
        for i in range(len(toks) - n + 1):
            c[" ".join(toks[i:i + n])] += 1
    return c


@pytest.mark.parametrize("n", [1, 2, 3])
def test_ngram_counts_match_naive(ray_session, n):
    import ray.data

    from webvalid.ops.ngrams import ngram_counts

    rng = random.Random(n)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
             for _ in range(400)]
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(5)
    got = ngram_counts(ds, n=n)
    naive = _naive_ngrams(texts, n)
    assert dict(zip(got["ngram"], got["cnt"])) == dict(naive)


def test_bigrams_never_cross_documents(ray_session):
    import ray.data

    from webvalid.ops.ngrams import ngram_counts

    # if windows crossed doc boundaries we'd see the bigram "end start"
    ds = ray.data.from_items([{"text": "start middle end"}] * 50)
    got = ngram_counts(ds, n=2)
    assert set(got["ngram"]) == {"start middle", "middle end"}
    assert got["cnt"].tolist() == [50, 50]


def test_ngram_shuffle_strategy_matches_driver(ray_session):
    import ray.data

    from webvalid.ops.ngrams import ngram_counts

    texts = [f"tok{i % 7} tok{i % 3} tok{i % 5}" for i in range(500)]
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(4)
    a = ngram_counts(ds, n=2, strategy="driver")
    b = ngram_counts(ds, n=2, strategy="shuffle")
    assert dict(zip(a["ngram"], a["cnt"])) == dict(zip(b["ngram"], b["cnt"]))
    # top-k through the shuffle path (local-topk cut per combined
    # block) must equal the driver path's global cut
    ta = ngram_counts(ds, n=2, top_k=5, strategy="driver")
    tb = ngram_counts(ds, n=2, top_k=5, strategy="shuffle")
    pd.testing.assert_frame_equal(ta, tb)


def test_bigram_lm_min_count_prunes_to_laplace_floor(ray_session):
    import ray.data

    from webvalid.ops.lm import bigram_lm_scores

    rows = [{"doc_id": i, "text": "a b a b"} for i in range(20)]
    rows.append({"doc_id": 99, "text": "a z"})  # 'a z' occurs once
    ds = ray.data.from_items(rows).repartition(3)
    full = bigram_lm_scores(ds, ndigits=None)
    pruned = bigram_lm_scores(ds, ndigits=None, min_count=2)
    # frequent docs: every bigram survives the prune → identical score
    f = full.set_index("doc_id")["avg_logp"]
    p = pruned.set_index("doc_id")["avg_logp"]
    assert abs(f.loc[0] - p.loc[0]) < 1e-12
    # the rare 'a z' bigram drops to the Laplace floor count 0:
    # logp = ln(1 / (c(a) + V)) < its unpruned score
    assert p.loc[99] < f.loc[99]
    import math
    v = 3.0  # vocabulary: a, b, z
    c_a = 41.0  # 'a' occurs 2x in 20 docs + once
    assert abs(p.loc[99] - math.log(1.0 / (c_a + v))) < 1e-12


# ---------- connected components ----------


def _naive_components(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in list(parent)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_random_graphs(ray_session, seed):
    import ray.data

    from webvalid.ops.graph import connected_components

    rng = random.Random(seed)
    n_nodes = 500
    edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
             for _ in range(n_nodes // 2)]
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges]).repartition(6)
    got = connected_components(ds)
    exp = _naive_components(edges)
    assert dict(zip(got["node"], got["component"])) == exp


def test_connected_components_chain_across_batches(ray_session):
    """A single 600-node chain sliced into many batches — every batch
    boundary must be bridged by the merge rounds."""
    import ray.data

    from webvalid.ops.graph import connected_components

    edges = [{"src": i, "dst": i + 1} for i in range(600)]
    ds = ray.data.from_items(edges).repartition(12)
    got = connected_components(ds)
    assert got["component"].nunique() == 1
    assert set(got["component"]) == {0}
    assert len(got) == 601


def test_dedup_components_labels_by_min_doc(ray_session):
    import ray.data

    from webvalid.ops.graph import dedup_components

    pairs = pd.DataFrame({"doc_a": [10, 20, 30, 50], "doc_b": [20, 30, 10, 60]})
    got = dedup_components(ray.data.from_pandas(pairs))
    m = dict(zip(got["node"], got["component"]))
    assert m == {10: 10, 20: 10, 30: 10, 50: 50, 60: 50}


# ---------- contamination ----------


def test_ngram_contamination_matches_naive(ray_session):
    import ray.data

    from webvalid.ops.ngrams import ngram_contamination

    rng = random.Random(7)
    vocab = ["q", "w", "e", "r", "t", "y"]
    bench = [" ".join(rng.choice(vocab) for _ in range(10)) for _ in range(3)]
    corpus = [" ".join(rng.choice(vocab) for _ in range(15)) for _ in range(200)]

    def bigrams(t):
        toks = t.split(" ")
        return {f"{a} {b}" for a, b in zip(toks, toks[1:])}

    bench_set = set().union(*(bigrams(t) for t in bench))
    expect = {}
    for i, t in enumerate(corpus):
        hits = len(bigrams(t) & bench_set)
        if hits:
            expect[i] = hits

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(corpus)]
    ).repartition(5)
    got = ngram_contamination(ds, bench, n=2)
    assert dict(zip(got["doc_id"], got["n_hits"])) == expect


def test_ngram_contamination_clean_corpus(ray_session):
    import ray.data

    from webvalid.ops.ngrams import ngram_contamination

    ds = ray.data.from_items(
        [{"doc_id": i, "text": "safe tokens only here"} for i in range(50)]
    )
    got = ngram_contamination(ds, ["totally different benchmark text"], n=2)
    assert len(got) == 0


def test_stratified_sample_null_stratum_uses_default_rate(ray_session):
    import ray.data

    from webvalid.ops.sampling import stratified_sample

    rows = [{"doc_id": i, "lang": None if i % 3 == 0 else "en",
             "text": f"payload {i}"} for i in range(300)]
    ds = ray.data.from_items(rows)
    # en fully sampled away, null strata keep the default rate 1.0
    out = stratified_sample(ds, rates={"en": 0.0}, default_rate=1.0).to_pandas()
    assert sorted(out["doc_id"]) == [i for i in range(300) if i % 3 == 0]
    # and with default 0.0, nothing survives
    out2 = stratified_sample(ds, rates={"en": 1.0}, default_rate=0.0).to_pandas()
    assert sorted(out2["doc_id"]) == [i for i in range(300) if i % 3 != 0]


def test_ngram_topk_sketch_equals_exact(ray_session):
    import numpy as np

    import ray.data

    from webvalid.ops.ngrams import ngram_counts, ngram_topk_sketch

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(400)]
    texts = [" ".join(vocab[int(v) % 400] for v in rng.zipf(1.4, 12))
             for _ in range(800)]
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(6)
    exact = ngram_counts(ds, n=1, top_k=20)
    sk = ngram_topk_sketch(ds, n=1, top_k=20, k_counters=512)
    assert sk["ngram"].tolist() == exact["ngram"].tolist()
    assert sk["cnt"].tolist() == exact["cnt"].tolist()


def test_ngram_topk_sketch_refuses_uncertifiable(ray_session):
    import pytest as _pytest

    import ray.data

    from webvalid.ops.ngrams import ngram_topk_sketch

    # 3000 distinct singleton tokens, only 4 counters: the k-th count
    # (1) cannot beat the error bound -> must raise, never silently
    # return an approximate answer
    ds = ray.data.from_items([{"text": f"unique{i}"} for i in range(3000)])
    with _pytest.raises(ValueError, match="not certifiable"):
        ngram_topk_sketch(ds, n=1, top_k=10, k_counters=4)


@pytest.mark.parametrize("seed", [0])
def test_starlike_components_match_dsu(ray_session, seed):
    """The fully-distributed alternating-star path must agree with the
    forest-contraction path on random graphs."""
    import ray.data

    from webvalid.ops.graph import connected_components, connected_components_starlike

    rng = random.Random(seed)
    n_nodes = 200
    edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
             for _ in range(150)]
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges]).repartition(4)
    dsu = connected_components(ds)
    star = connected_components_starlike(ds)
    assert dict(zip(star["node"], star["component"])) == \
           dict(zip(dsu["node"], dsu["component"]))


def test_starlike_components_chain(ray_session):
    import ray.data

    from webvalid.ops.graph import connected_components_starlike

    edges = [{"src": i, "dst": i + 1} for i in range(60)]
    ds = ray.data.from_items(edges).repartition(6)
    got = connected_components_starlike(ds)
    assert set(got["component"]) == {0}
    assert len(got) == 61


def test_starlike_components_empty_edges(ray_session):
    import pyarrow as pa
    import ray.data

    from webvalid.ops.graph import connected_components_starlike

    empty = ray.data.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                          "dst": pa.array([], pa.int64())}))
    out = connected_components_starlike(empty)
    assert len(out) == 0 and list(out.columns) == ["node", "component"]
