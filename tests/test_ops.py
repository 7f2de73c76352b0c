"""Tests for dedup / similarity / text / multimodal ops (planted cases)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _docs_ds(ray_session, rows):
    import ray.data

    return ray.data.from_pandas(pd.DataFrame(rows))


BASE = ("the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the ancient mountain range casting long shadows")


@pytest.fixture(scope="module")
def docs(ray_session):
    rows = [
        {"doc_id": 0, "text": BASE},
        {"doc_id": 1, "text": BASE},  # exact dup of 0
        {"doc_id": 2, "text": BASE.replace("lazy", "sleepy")},  # near dup of 0
        {"doc_id": 3, "text": "completely different content about database systems "
                              "and distributed query processing engines at scale"},
        {"doc_id": 4, "text": "yet another unrelated snippet regarding neural "
                              "machine translation quality estimation research"},
    ]
    return _docs_ds(ray_session, rows)


def test_exact_dedup(docs):
    from webvalid.ops.dedup import exact_dedup_groups

    out = exact_dedup_groups(docs).to_pandas()
    dup = out[out["cnt"] > 1]
    assert len(dup) == 1 and dup.iloc[0]["keeper"] == 0 and dup.iloc[0]["cnt"] == 2
    assert len(out) == 4  # 4 distinct contents


def test_minhash_finds_planted_near_dups(docs):
    from webvalid.ops.dedup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(docs, min_est_jaccard=0.4).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 1) in got  # exact dup
    assert (0, 2) in got or (1, 2) in got  # near dup
    # unrelated docs must not pair with the BASE cluster
    for a, b in got:
        assert not (b in (3, 4) or a in (3, 4))


def test_minhash_estimates_jaccard(docs):
    from webvalid.ops.dedup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(docs, min_est_jaccard=0.0).to_pandas()
    exact_pair = pairs[(pairs["doc_a"] == 0) & (pairs["doc_b"] == 1)]
    assert len(exact_pair) == 1 and exact_pair.iloc[0]["est_jaccard"] == 1.0


def test_minhash_shuffle_strategy_matches_driver(docs):
    from webvalid.ops.dedup import minhash_lsh_candidates

    drv = minhash_lsh_candidates(docs, min_est_jaccard=0.4).to_pandas()
    shf = minhash_lsh_candidates(docs, min_est_jaccard=0.4,
                                 strategy="shuffle").to_pandas()
    key = lambda df: sorted(zip(df["doc_a"], df["doc_b"], df["est_jaccard"].round(9)))
    assert key(drv) == key(shf)


def test_simhash_shuffle_strategy_matches_driver(docs):
    from webvalid.ops.dedup import simhash_near_dups

    drv = simhash_near_dups(docs, max_hamming=6).to_pandas()
    shf = simhash_near_dups(docs, max_hamming=6, strategy="shuffle").to_pandas()
    key = lambda df: sorted(zip(df["doc_a"], df["doc_b"], df["hamming"]))
    assert key(drv) == key(shf)


def test_ngram_jaccard():
    from webvalid.ops.dedup import ngram_jaccard

    assert ngram_jaccard(BASE, BASE) == 1.0
    near = ngram_jaccard(BASE, BASE.replace("lazy", "sleepy"))
    far = ngram_jaccard(BASE, "unrelated text entirely")
    assert 0.5 < near < 1.0 and far < 0.2


def test_simhash_near_dups(docs):
    from webvalid.ops.dedup import simhash_near_dups

    pairs = simhash_near_dups(docs, max_hamming=6).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 1) in got
    ham = dict(zip(zip(pairs["doc_a"], pairs["doc_b"]), pairs["hamming"]))
    assert ham[(0, 1)] == 0


def test_embedding_near_dups(ray_session):
    import ray.data

    from webvalid.ops.dedup import embedding_near_dups

    rng = np.random.default_rng(0)
    base = rng.normal(size=8)
    rows = [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": (base + rng.normal(scale=0.01, size=8)).tolist()},
        {"vec_id": 2, "embedding": rng.normal(size=8).tolist()},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    pairs = embedding_near_dups(ds, threshold=0.99).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert got == {(0, 1)}


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data

    from webvalid.ops.similarity import brute_force_topk

    rng = np.random.default_rng(1)
    mat = rng.normal(size=(200, 16))
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": range(200), "embedding": [v.tolist() for v in mat]})
    )
    qids = [0, 5]
    out = brute_force_topk(ds, qids, mat[qids], k=5).to_pandas()

    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qi in qids:
        sims = norm @ norm[qi]
        expected = set(np.argsort(-sims)[:5])
        got = set(out[out["query_id"] == qi]["vec_id"])
        assert got == expected


def test_ivf_topk_recall(ray_session):
    import ray.data

    from webvalid.ops.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(2)
    mat = rng.normal(size=(500, 16))
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": range(500), "embedding": [v.tolist() for v in mat]})
    )
    qids = [3, 7, 11]
    exact = brute_force_topk(ds, qids, mat[qids], k=10).to_pandas()
    approx = ivf_topk(ds, qids, mat[qids], k=10, nlist=8, nprobe=4).to_pandas()
    recalls = []
    for qi in qids:
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # nprobe=4/8 clusters


def test_quality_scorer_ranks_text(ray_session):
    import ray.data

    from webvalid.ops.textstats import QualityScorer

    rows = [
        {"doc_id": 0, "text": "The quick brown fox jumps over the lazy dog and "
                              "runs far into the quiet forest for a long time."},
        {"doc_id": 1, "text": "!!! ??? ### 123 456 789 000 !!!"},
        {"doc_id": 2, "text": None},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = ds.map_batches(QualityScorer, batch_format="pyarrow",
                         concurrency=1).to_pandas().set_index("doc_id")
    assert out.loc[0, "quality_score"] > out.loc[1, "quality_score"]
    assert out.loc[2, "quality_score"] == 0.0
    assert out.loc[1, "digit_ratio"] > 0.3


def test_langid(ray_session):
    import ray.data

    from webvalid.ops.textstats import LangId

    rows = [
        {"doc_id": 0, "text": "the cat is in the house and it is warm for the winter"},
        {"doc_id": 1, "text": "der Hund ist nicht in das Haus und die Katze ist zu alt"},
        {"doc_id": 2, "text": "это не просто текст на русском что и как надо по делу"},
        {"doc_id": 3, "text": "这是一个中文文本的例子非常好的内容这里还有更多的汉字用来测试语言识别"},
        {"doc_id": 4, "text": "zzz qqq xxx"},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=1).to_pandas()
    pred = dict(zip(out["doc_id"], out["lang_pred"]))
    assert pred[0] == "en" and pred[1] == "de" and pred[2] == "ru"
    assert pred[3] == "zh" and pred[4] == "und"


def test_fingerprinter_deterministic(ray_session):
    import ray.data

    from webvalid.ops.textstats import Fingerprinter

    rows = [
        {"doc_id": 0, "text": BASE},
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": "other words entirely different from the base text here"},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = ds.map_batches(Fingerprinter, batch_format="pyarrow",
                         concurrency=1).to_pandas().set_index("doc_id")
    assert out.loc[0, "fingerprint_xor"] == out.loc[1, "fingerprint_xor"]
    assert out.loc[0, "fingerprint_xor"] != out.loc[2, "fingerprint_xor"]
    assert out.loc[0, "n_fingerprints"] > 0


def test_multimodal_decode_and_frames(ray_session):
    import ray.data

    from webvalid.ops.multimodal import FEATURE_DIM, decode_images, sample_frames

    rows = [
        {"url": "a", "html": b"<html>" + b"x" * 10_000 + b"</html>"},
        {"url": "b", "html": None},
        {"url": "c", "html": b"<html>tiny</html>"},
    ]
    ds = ray.data.from_arrow(
        __import__("pyarrow").table(
            {
                "url": ["a", "b", "c"],
                "html": __import__("pyarrow").array(
                    [r["html"] for r in rows], __import__("pyarrow").binary()
                ),
            }
        )
    )
    dec = decode_images(ds, concurrency=1).to_pandas().set_index("url")
    assert dec.loc["a", "width"] > 0 and dec.loc["b", "width"] == 0
    assert len(dec.loc["a", "features"]) == FEATURE_DIM
    # determinism: same payload → same decode
    dec2 = decode_images(ds, concurrency=1).to_pandas().set_index("url")
    assert dec.loc["a", "width"] == dec2.loc["a", "width"]

    fr = sample_frames(ds, concurrency=1).to_pandas()
    assert set(fr["url"]) == {"a", "c"}  # null payload skipped
    assert (fr[fr["url"] == "a"]["frame_idx"] % 4 == 0).all()


def test_asof_join_matches_pandas(ray_session):
    """asof_join_broadcast == a single global pandas merge_asof."""
    import pandas as pd
    import ray.data

    from webvalid.ops.asof import asof_join_broadcast

    rng = np.random.default_rng(5)
    left = pd.DataFrame({
        "lid": np.arange(200),
        "ts": rng.integers(0, 10_000, size=200),
        "uid": rng.integers(0, 8, size=200),
    })
    right = pd.DataFrame({
        "ts": np.sort(rng.integers(0, 10_000, size=50)),
        "uid": rng.integers(0, 8, size=50),
        "rid": np.arange(50),
    })
    got = asof_join_broadcast(
        ray.data.from_pandas(left.copy()), right, on="ts", by="uid"
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    exp = pd.merge_asof(
        left.sort_values("ts", kind="stable"), right.sort_values("ts"),
        on="ts", by="uid", direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    assert got["rid"].fillna(-1).tolist() == exp["rid"].fillna(-1).tolist()
    # at least one unmatched (null) and one matched row in the fixture
    assert got["rid"].isna().any() and got["rid"].notna().any()


def test_top_n_per_key_matches_pandas(ray_session):
    import pandas as pd
    import ray.data

    from webvalid.ops.rank import top_n_per_key

    rng = np.random.default_rng(6)
    df = pd.DataFrame({
        "k": rng.integers(0, 10, size=500),
        "v": rng.integers(0, 50, size=500),  # ties guaranteed
        "id": np.arange(500),
    })
    got = top_n_per_key(ray.data.from_pandas(df.copy()), key="k",
                        order_col="v", n=3, tiebreak="id")
    exp = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
        .groupby("k", sort=False).head(3)
        .sort_values(["k", "v", "id"], ascending=[True, False, True],
                     kind="mergesort").reset_index(drop=True)
    )
    assert got[["k", "v", "id"]].values.tolist() == exp[["k", "v", "id"]].values.tolist()
    assert (got.groupby("k")["rn"].max() <= 3).all()
    assert (got.groupby("k")["rn"].min() == 1).all()


def test_decode_pnm_real_formats(ray_session):
    """PGM/PPM payloads decode for REAL (pure-numpy PNM parser);
    non-PNM payloads keep the deterministic stub path."""
    import numpy as np
    import ray.data

    from webvalid.ops.multimodal import decode_images, decode_pnm

    # 4x2 grayscale PGM, all pixels 100 (with a header comment)
    pgm = b"P5\n# comment\n4 2\n255\n" + bytes([100] * 8)
    # 2x2 RGB PPM, pixels (255, 0, 0)
    ppm = b"P6\n2 2\n255\n" + bytes([255, 0, 0] * 4)
    assert decode_pnm(pgm) == (4, 2, 100 / 255)
    w, h, m = decode_pnm(ppm)
    assert (w, h) == (2, 2) and abs(m - (255 + 0 + 0) / 3 / 255) < 1e-12
    assert decode_pnm(b"\x89PNG????????????") is None
    assert decode_pnm(b"P6\n2 2\n255\n" + b"\x00") is None  # truncated raster

    ds = ray.data.from_items([
        {"url": "a", "html": pgm},
        {"url": "b", "html": ppm},
        {"url": "c", "html": b"not an image at all, hits the stub"},
        {"url": "d", "html": None},
    ])
    out = decode_images(ds, concurrency=1, batch_size=4).to_pandas()
    m = out.set_index("url")
    assert (m.loc["a", "width"], m.loc["a", "height"]) == (4, 2)
    assert abs(m.loc["a", "mean_intensity"] - 100 / 255) < 1e-12
    assert (m.loc["b", "width"], m.loc["b", "height"]) == (2, 2)
    assert m.loc["c", "width"] > 0          # stub still produces metadata
    assert m.loc["d", "width"] == 0         # null payload marked undecoded
    assert all(len(f) == 32 for f in out["features"])


def test_decode_pnm_never_hangs_on_truncated_headers():
    """Truncated/hostile P5/P6 headers must return None, not spin
    (the unbounded token scan previously looped forever: slicing past
    the buffer yields b'' and b''.isspace() is False)."""
    from webvalid.ops.multimodal import decode_pnm

    hostiles = [
        b"P5\n44 22\n2",             # header token runs to end-of-buffer
        b"P6" + b"x" * 10,           # no whitespace at all
        b"P5\n# comment only",       # comment, then nothing
        b"P5\n12 ",                  # trailing whitespace, missing fields
        b"P5\n1 1\n999\n" + b"\x00", # maxval out of range
    ]
    for p in hostiles:
        assert decode_pnm(p) is None, p


def test_decode_pnm_crlf_header():
    from webvalid.ops.multimodal import decode_pnm

    crlf = b"P5\r\n4 2\r\n255\r\n" + bytes([10] * 8)
    assert decode_pnm(crlf) == (4, 2, 10 / 255)


def test_force_stub_bypasses_pnm(monkeypatch):
    import importlib

    from webvalid.ops import multimodal

    monkeypatch.setenv("WEBVALID_FORCE_STUB", "1")
    stub = multimodal.DecodeImageStub()
    pgm = b"P5\n4 2\n255\n" + bytes([100] * 8)
    w, h, m = stub._decode_impl(pgm)
    assert (w, h, m) != (4, 2, 100 / 255)  # fake, not the real decode
    assert (w, h, m) == multimodal._fake_decode(pgm)


def test_minhash_duplicate_heavy_corpus_stars_not_quadratic(ray_session):
    """A bucket of ~1500 identical docs must emit O(n) star pairs, not
    O(n^2) all-pairs — and the pairs must still connect every copy
    into ONE dedup component."""
    import time

    import ray.data

    from webvalid.ops.dedup import minhash_lsh_candidates
    from webvalid.ops.graph import dedup_components

    n = 1500
    docs = [{"doc_id": i, "text": "exactly the same contents everywhere " * 3}
            for i in range(n)]
    ds = ray.data.from_items(docs).repartition(4)
    t0 = time.time()
    pairs = minhash_lsh_candidates(ds, min_est_jaccard=0.5).to_pandas()
    dt = time.time() - t0
    assert len(pairs) < 5 * n          # star, not ~1.1M all-pairs
    assert dt < 60
    comp = dedup_components(ray.data.from_pandas(pairs[["doc_a", "doc_b"]]))
    assert comp["component"].nunique() == 1
    assert len(comp) == n


def test_sorted_run_pairs_uint64_straddle_and_self_pairs(ray_session):
    """Keys clustered around 2^63 (the uint64/int64 sign boundary):
    Ray's range sort is unsigned, so edge detection must use the native
    key dtype — a signed bit-view would misplace the straddling block's
    boundary keys and silently drop cross-block pairs. Duplicate
    (key, id) rows must not emit self-pairs."""
    import pyarrow as pa
    import ray.data

    from webvalid.ops.dedup import _sorted_run_pairs

    rng = np.random.default_rng(0)
    base = np.uint64(1 << 63)
    keys = base + rng.integers(-50, 50, 4000).astype(np.int64).view(np.uint64)
    ids = rng.integers(0, 1000, 4000)  # repeats → self-pair candidates
    t = pa.table({"k": pa.array(keys, pa.uint64()),
                  "i": pa.array(ids, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(8)
    got = _sorted_run_pairs(ds, "k", "i", star_cap=256)
    got_set = set(zip(got["doc_a"], got["doc_b"]))
    assert all(a != b for a, b in got_set)

    order = np.lexsort((ids, keys))
    ks, is_ = keys[order], ids[order]
    bnd = np.flatnonzero(ks[1:] != ks[:-1]) + 1
    bounds = np.concatenate([[0], bnd, [len(ks)]])
    exp = set()
    for s, e in zip(bounds[:-1], bounds[1:]):
        grp = sorted(set(is_[s:e]))
        for x in range(len(grp)):
            for y in range(x + 1, len(grp)):
                exp.add((grp[x], grp[y]))
    assert exp - got_set == set()


def test_sorted_run_pairs_giant_fragment_local_star(ray_session):
    """A bucket far larger than star_cap spanning many blocks: driver
    forwards stay bounded (local fragment stars), and every member
    still reaches the bucket through star pairs (connectivity)."""
    import pyarrow as pa
    import ray.data

    from webvalid.ops.dedup import _sorted_run_pairs

    n = 5000
    t = pa.table({"k": pa.array(np.zeros(n, np.uint64), pa.uint64()),
                  "i": pa.array(np.arange(n, dtype=np.int64), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(10)
    got = _sorted_run_pairs(ds, "k", "i", star_cap=64)
    # every id appears in at least one pair (one verify partner each)
    seen = set(got["doc_a"]) | set(got["doc_b"])
    assert seen == set(range(n))
    # and the pair list stays far below all-pairs (n*(n-1)/2)
    assert len(got) < 3 * n
