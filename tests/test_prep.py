"""Tests for the composed corpus-prep pipeline (ops/prep.py)."""

from __future__ import annotations

import random

import pandas as pd


def _mk(texts):
    import ray.data

    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(4)


def test_prep_corpus_dedups_by_min_id(ray_session):
    from webvalid.ops.prep import prep_corpus

    rng = random.Random(2)
    vocab = ["cold1", "cold2", "cold3", "cold4", "cold5", "cold6"]
    uniq = [" ".join(rng.choice(vocab) for _ in range(8)) for _ in range(200)]
    # plant duplicates: docs 200-219 repeat docs 0-19; 220 repeats 0 again
    texts = uniq + uniq[:20] + [uniq[0]]
    out = prep_corpus(_mk(texts), max_df_frac=0.99).to_pandas()
    kept = set(out["doc_id"])
    assert kept == set(range(200))  # every duplicate dropped, keepers kept
    # clean_text survives untouched (no token is hot at 0.99)
    m = dict(zip(out["doc_id"], out["clean_text"]))
    assert all(m[i] == uniq[i] for i in range(200))


def test_prep_corpus_matches_composed_duckdb(ray_session):
    import duckdb

    import ray.data

    from webvalid.ops.prep import prep_corpus

    rng = random.Random(4)
    vocab = ["hot", "warm", "w1", "w2", "w3", "w4", "w5", "w6", "w7"]
    texts = ["hot " + " ".join(rng.choice(vocab) for _ in range(6))
             for _ in range(300)]
    texts += texts[:30]  # planted dups
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = prep_corpus(ray.data.from_pandas(pdf), max_df_frac=0.78).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", pdf)
    exp = con.sql("""
        WITH kept_ids AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        kd AS (SELECT d.doc_id, d.text FROM documents d JOIN kept_ids k USING (doc_id)),
        n AS (SELECT COUNT(*) AS n_docs FROM kd),
        df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM (
                 SELECT doc_id, unnest(str_split(text,' ')) AS token FROM kd) GROUP BY token),
        hot AS (SELECT token FROM df, n WHERE df > 0.78 * n_docs),
        tok AS (SELECT doc_id, unnest(str_split(text,' ')) AS token,
                       unnest(generate_series(1, len(str_split(text,' ')))) AS ord FROM kd),
        clean AS (SELECT t.doc_id, string_agg(t.token, ' ' ORDER BY t.ord) AS clean_text
                  FROM tok t LEFT JOIN hot h ON t.token = h.token
                  WHERE h.token IS NULL GROUP BY t.doc_id)
        SELECT c.doc_id,
               CASE WHEN substr(md5(d.text),1,4) < 'cccc' THEN 'train'
                    WHEN substr(md5(d.text),1,4) < 'e666' THEN 'valid'
                    ELSE 'test' END AS split,
               c.clean_text
        FROM clean c JOIN documents d USING (doc_id) ORDER BY c.doc_id
    """).df()
    pd.testing.assert_frame_equal(got, exp)


def test_prep_corpus_tolerates_null_text(ray_session):
    import ray.data

    from webvalid.ops.prep import prep_corpus

    rows = [{"doc_id": 0, "text": "alpha beta"},
            {"doc_id": 1, "text": None},
            {"doc_id": 2, "text": "alpha beta"},   # dup of 0
            {"doc_id": 3, "text": "gamma delta"},
            {"doc_id": 4, "text": None}]
    out = prep_corpus(ray.data.from_items(rows).repartition(2),
                      max_df_frac=0.99).to_pandas()
    assert sorted(out["doc_id"]) == [0, 3]  # dup and null docs dropped


def test_keep_filter_prefix_collision_never_drops_unique_doc(ray_session):
    """An 8-byte md5-prefix collision with a dup group must NOT drop a
    unique document: the exact-digest confirmation retains it."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray

    from webvalid.ops.prep import _keep_filter

    victim = "a unique document that merely shares a hash prefix"
    v_prefix = np.frombuffer(
        hashlib.md5(victim.encode()).digest()[:8], dtype=np.uint64
    )
    dup_text = "the actually duplicated text"
    dup_digest = hashlib.md5(dup_text.encode()).digest()
    # hostile broadcast: the victim's prefix listed as a dup group with
    # keeper 999, full-digest map only knows the REAL dup text
    prefixes = np.sort(np.concatenate(
        [v_prefix, np.frombuffer(dup_digest[:8], dtype=np.uint64)]))
    keepers = np.asarray([999, 7], dtype=np.int64)[np.argsort(np.concatenate(
        [v_prefix, np.frombuffer(dup_digest[:8], dtype=np.uint64)]))]
    ref = ray.put((prefixes, keepers, {dup_digest: 7}))
    batch = pa.table({
        "doc_id": pa.array([1, 7, 8], pa.int64()),
        "text": pa.array([victim, dup_text, dup_text], pa.string()),
    })
    out = _keep_filter(ref, "text", "doc_id")(batch)
    # victim kept (prefix hit, digest mismatch), keeper kept, dup dropped
    assert out["doc_id"].to_pylist() == [1, 7]
