"""Tests for corpus-DF boilerplate removal (ops/boilerplate.py)."""

from __future__ import annotations

import random

import pandas as pd
import pytest


def _mk_ds(texts):
    import ray.data

    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(4)


def test_document_frequencies_match_naive(ray_session):
    from collections import Counter

    from webvalid.ops.boilerplate import document_frequencies

    rng = random.Random(3)
    vocab = ["nav", "menu", "body", "story", "unique"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8)))
             for _ in range(300)]
    got = document_frequencies(_mk_ds(texts))
    naive = Counter()
    for t in texts:
        for tok in set(t.split(" ")):
            naive[tok] += 1
    assert dict(zip(got["token"], got["df"])) == dict(naive)


def test_remove_boilerplate_strips_hot_tokens(ray_session):
    from webvalid.ops.boilerplate import remove_boilerplate

    # "banner" is in every doc; payload tokens are rare
    texts = [f"banner cookie doc{i} payload{i % 7}" for i in range(100)]
    out = remove_boilerplate(_mk_ds(texts), max_df_frac=0.5).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 100
    for i, clean in zip(out["doc_id"], out["clean_text"]):
        assert clean == f"doc{i} payload{i % 7}"  # order preserved, hot gone


def test_remove_boilerplate_drops_all_hot_docs(ray_session):
    from webvalid.ops.boilerplate import remove_boilerplate

    texts = ["banner cookie"] * 50 + ["banner cookie real content here"] * 10
    out = remove_boilerplate(_mk_ds(texts), max_df_frac=0.9).to_pandas()
    # the 50 all-boilerplate docs vanish; the 10 real ones survive
    assert sorted(out["doc_id"]) == list(range(50, 60))
    assert set(out["clean_text"]) == {"real content here"}


def test_remove_boilerplate_stable_under_repartition(ray_session):
    import ray.data

    from webvalid.ops.boilerplate import remove_boilerplate

    rng = random.Random(9)
    vocab = ["hot1", "hot2", "cold1", "cold2", "cold3"]
    texts = ["hot1 hot2 " + " ".join(rng.choice(vocab) for _ in range(5))
             for _ in range(200)]
    base = ray.data.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    # hot1/hot2 have df=1.0; each cold token lands in ~67% of docs
    a = remove_boilerplate(base.repartition(2), max_df_frac=0.9).to_pandas()
    b = remove_boilerplate(base.repartition(11), max_df_frac=0.9).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_remove_boilerplate_null_and_empty_text(ray_session):
    """Null-text docs must be dropped (not crash the offset math —
    trailing nulls previously made reduceat index past the buffer);
    empty strings keep DuckDB semantics ('' is a token)."""
    import ray.data

    from webvalid.ops.boilerplate import remove_boilerplate

    rows = [{"doc_id": 0, "text": "keep these tokens"},
            {"doc_id": 1, "text": None},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "keep more tokens"},
            {"doc_id": 4, "text": None}]  # trailing null in final batch
    ds = ray.data.from_items(rows).repartition(2)
    out = remove_boilerplate(ds, max_df_frac=0.99).to_pandas()
    got = dict(zip(out["doc_id"], out["clean_text"]))
    assert got == {0: "keep these tokens", 2: "", 3: "keep more tokens"}


def test_document_frequencies_doc_count_includes_nulls(ray_session):
    import ray.data

    from webvalid.ops.boilerplate import document_frequencies

    rows = [{"text": "a b"}, {"text": None}, {"text": "a"}]
    dfs, n = document_frequencies(ray.data.from_items(rows),
                                  return_doc_count=True)
    assert n == 3  # COUNT(*) semantics — null docs count in the denominator
    assert dict(zip(dfs["token"], dfs["df"])) == {"a": 2, "b": 1}
