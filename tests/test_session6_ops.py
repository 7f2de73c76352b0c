"""Tests for session-6 operator families: paragraph(chunk)-level dedup
with rebuild, gaps-and-islands streaks, winsorized grouped mean, and
per-key least-squares trend."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _ds(ray_session, df: pd.DataFrame, blocks: int = 4):
    import ray.data

    return ray.data.from_pandas(df).repartition(blocks)


# ---------------------------------------------------------------------------
# chunk_dedup_rebuild
# ---------------------------------------------------------------------------


def _naive_chunk_dedup(df: pd.DataFrame, k: int) -> pd.DataFrame:
    seen: dict[str, tuple[int, int]] = {}
    rows = []
    for _, r in df.sort_values("doc_id").iterrows():
        if r["text"] is None:
            continue
        w = r["text"].split(" ")
        chunks = [" ".join(w[i:i + k]) for i in range(0, max(len(w), 1), k)]
        for ci, c in enumerate(chunks):
            seen.setdefault(c, (r["doc_id"], ci))
    for _, r in df.sort_values("doc_id").iterrows():
        if r["text"] is None:
            continue
        w = r["text"].split(" ")
        chunks = [" ".join(w[i:i + k]) for i in range(0, max(len(w), 1), k)]
        kept = [c for ci, c in enumerate(chunks)
                if seen[c] == (r["doc_id"], ci)]
        if kept:
            rows.append({"doc_id": r["doc_id"], "n_kept": len(kept),
                         "text_dedup": " ".join(kept)})
    return pd.DataFrame(rows)


def test_chunk_dedup_rebuild_matches_naive(ray_session):
    from webvalid.ops.paradedup import chunk_dedup_rebuild

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 30)))
             for _ in range(120)]
    # plant exact cross-doc chunk duplication: doc 7 & 90 share text,
    # doc 40 repeats doc 7's first 4 tokens as its own prefix
    texts[90] = texts[7]
    texts[40] = " ".join(texts[7].split(" ")[:4])
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                       "text": texts})
    got = (chunk_dedup_rebuild(_ds(ray_session, df, blocks=5),
                               chunk_tokens=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = _naive_chunk_dedup(df, 4).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_chunk_dedup_drops_fully_duplicated_and_null_docs(ray_session):
    from webvalid.ops.paradedup import chunk_dedup_rebuild

    df = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2], dtype="int64"),
        "text": ["a b c d", "a b c d", None],
    })
    got = (chunk_dedup_rebuild(_ds(ray_session, df, blocks=2),
                               chunk_tokens=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [0]
    assert got["text_dedup"].tolist() == ["a b c d"]


def test_chunk_dedup_empty_text_forms_one_chunk(ray_session):
    from webvalid.ops.paradedup import chunk_dedup_rebuild

    df = pd.DataFrame({"doc_id": pd.array([5, 9], dtype="int64"),
                       "text": ["", ""]})
    got = (chunk_dedup_rebuild(_ds(ray_session, df, blocks=2),
                               chunk_tokens=4).to_pandas())
    # the empty chunk's first occurrence (doc 5) wins; doc 9 drops
    assert got["doc_id"].tolist() == [5]
    assert got["text_dedup"].tolist() == [""]


# ---------------------------------------------------------------------------
# streaks_per_key
# ---------------------------------------------------------------------------


def test_streaks_matches_duckdb(ray_session):
    import duckdb

    from webvalid.ops.rank import streaks_per_key

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.integers(0, 7, 500),
        "o": rng.integers(0, 40, 500),
        "tb": np.arange(500, dtype=np.int64),
        "v": rng.choice(["x", "y", "z"], 500),
    })
    got = (streaks_per_key(_ds(ray_session, df, blocks=5), "k", "o", "tb", "v")
           .sort_values("k").reset_index(drop=True))
    exp = duckdb.connect().execute("""
        WITH e AS (
            SELECT k, v,
                   ROW_NUMBER() OVER (PARTITION BY k ORDER BY o, tb) rn,
                   ROW_NUMBER() OVER (PARTITION BY k, v ORDER BY o, tb) rnt
            FROM df
        ), isl AS (
            SELECT k, COUNT(*) len FROM e GROUP BY k, v, rn - rnt
        )
        SELECT k, MAX(len) max_streak, COUNT(*) n_runs
        FROM isl GROUP BY k ORDER BY k""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# ---------------------------------------------------------------------------
# winsorized_mean
# ---------------------------------------------------------------------------


def test_winsorized_mean_matches_duckdb(ray_session):
    import duckdb

    from webvalid.ops.agg import winsorized_mean

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], 800),
        "x": np.round(rng.lognormal(3, 1, 800), 2),
    })
    got = winsorized_mean(_ds(ray_session, df, blocks=6), "k", "x")
    exp = duckdb.connect().execute("""
        WITH f AS (SELECT quantile_cont(x, 0.05) lo,
                          quantile_cont(x, 0.95) hi FROM df)
        SELECT k, ROUND(AVG(LEAST(GREATEST(x, f.lo), f.hi)) + 1e-9, 6) wmean,
               COUNT(x) n
        FROM df, f GROUP BY k ORDER BY k""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_winsorized_mean_clips_outliers(ray_session):
    from webvalid.ops.agg import winsorized_mean

    x = np.concatenate([np.full(98, 10.0), [1e9, -1e9]])
    df = pd.DataFrame({"k": ["g"] * 100, "x": x})
    got = winsorized_mean(_ds(ray_session, df, blocks=3), "k", "x")
    # fences are both 10.0 → the two extremes clip to 10
    assert got["wmean"].iloc[0] == pytest.approx(10.0)
    assert int(got["n"].iloc[0]) == 100


# ---------------------------------------------------------------------------
# grouped_regr_slope
# ---------------------------------------------------------------------------


def test_grouped_regr_slope_matches_polyfit(ray_session):
    from webvalid.ops.agg import grouped_regr_slope

    rng = np.random.default_rng(13)
    frames = []
    for k, (a, b) in {"p": (0.5, 3.0), "q": (-1.25, 10.0)}.items():
        x = rng.integers(0, 500, 400).astype(np.float64)
        y = a * x + b + rng.normal(0, 2, 400)
        frames.append(pd.DataFrame({"k": k, "x": x, "y": y}))
    df = pd.concat(frames, ignore_index=True)
    got = grouped_regr_slope(_ds(ray_session, df, blocks=5), "k", "x", "y")
    for _, row in got.iterrows():
        sub = df[df.k == row["k"]]
        slope, icept = np.polyfit(sub.x, sub.y, 1)
        assert row["slope"] == pytest.approx(slope, abs=1e-5)
        assert row["icept"] == pytest.approx(icept, abs=1e-5)


def test_grouped_regr_slope_zero_variance_is_null(ray_session):
    from webvalid.ops.agg import grouped_regr_slope

    df = pd.DataFrame({"k": ["z"] * 10, "x": np.full(10, 4.0),
                       "y": np.arange(10, dtype=np.float64)})
    got = grouped_regr_slope(_ds(ray_session, df, blocks=2), "k", "x", "y")
    assert np.isnan(got["slope"].iloc[0])
