"""Tests for session-6 operator families: paragraph(chunk)-level dedup
with rebuild, gaps-and-islands streaks, winsorized grouped mean, and
per-key least-squares trend."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
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
           .to_pandas().sort_values("k").reset_index(drop=True))
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


# ---------------------------------------------------------------------------
# real BMP / WAV decoders (multimodal)
# ---------------------------------------------------------------------------


def _make_bmp(width: int, height: int, value: int) -> bytes:
    import struct

    row_bytes = (width * 3 + 3) & ~3
    need = row_bytes * height
    header = (b"BM" + struct.pack("<IHHI", 54 + need, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            need, 2835, 2835, 0, 0))
    rows = np.zeros((height, row_bytes), np.uint8)
    rows[:, : width * 3] = value
    return header + rows.tobytes()


def _make_wav(rate: int, samples: np.ndarray, channels: int = 1) -> bytes:
    import struct

    data = (samples * 32767).astype(np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_decode_bmp_real():
    from webvalid.ops.multimodal import decode_bmp

    assert decode_bmp(_make_bmp(5, 3, 200)) == (5, 3, 200 / 255)
    assert decode_bmp(b"BM" + b"\x00" * 60) is None  # zero dims
    assert decode_bmp(_make_bmp(5, 3, 10)[:-4]) is None  # truncated raster
    assert decode_bmp(b"\x89PNG" + b"\x00" * 60) is None


def test_decode_wav_real_and_features(ray_session):
    import ray.data

    from webvalid.ops.multimodal import audio_features, decode_wav

    t = np.arange(8000, dtype=np.float64) / 8000
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    wav = _make_wav(8000, sine)
    rate, ch, mono = decode_wav(wav)
    assert (rate, ch) == (8000, 1)
    assert len(mono) == 8000
    assert np.abs(mono - (sine * 32767).astype(np.int16) / 32768.0).max() < 1e-9

    import pandas as pd
    df = pd.DataFrame({"url": ["a", "b", "c"],
                       "audio": [wav, None, b"not a wav"]})
    out = (audio_features(ray.data.from_pandas(df), concurrency=1)
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert out.loc[0, "sample_rate"] == 8000
    assert out.loc[0, "duration_sec"] == pytest.approx(1.0)
    assert out.loc[0, "rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert out.loc[0, "peak"] == pytest.approx(0.5, rel=1e-3)
    # 440 Hz sine → ~880 sign flips per second of 8000 samples
    assert out.loc[0, "zcr"] == pytest.approx(880 / 8000, rel=0.02)
    assert out.loc[1, "sample_rate"] == 0 and out.loc[2, "sample_rate"] == 0


def test_decode_wav_walks_chunk_list():
    import struct

    from webvalid.ops.multimodal import decode_wav

    x = np.full(100, 0.25)
    base = _make_wav(4000, x)
    # splice a LIST chunk between fmt and data (odd size → padding)
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = base[:fmt_end] + junk + base[fmt_end:]
    dec = decode_wav(spliced)
    assert dec is not None and dec[0] == 4000 and len(dec[2]) == 100


# ---------------------------------------------------------------------------
# rolling_range_sum_per_key / retention_matrix / kmeans_distributed
# ---------------------------------------------------------------------------


def test_rolling_range_sum_matches_duckdb(ray_session):
    import duckdb

    from webvalid.ops.rank import rolling_range_sum_per_key

    rng = np.random.default_rng(17)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 400),
        "o": rng.integers(0, 120, 400).astype(np.int64),  # ties => peers
        "tb": np.arange(400, dtype=np.int64),
        "v": np.round(rng.normal(10, 3, 400), 2),
    })
    got = (rolling_range_sum_per_key(_ds(ray_session, df, blocks=5),
                                     "k", "o", "v", "tb", span=10)
           .to_pandas().sort_values("tb").reset_index(drop=True))
    exp = duckdb.connect().execute("""
        SELECT k, o, tb, v,
               ROUND(SUM(v) OVER (PARTITION BY k ORDER BY o
                     RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)
                     + 1e-9, 6) AS range_sum
        FROM df ORDER BY tb""").df()
    pd.testing.assert_series_equal(got["range_sum"], exp["range_sum"],
                                   check_dtype=False)


def test_retention_matrix_matches_duckdb(ray_session):
    import duckdb

    from webvalid.ops.retention import retention_matrix

    rng = np.random.default_rng(19)
    base = pd.Timestamp("2024-01-01").value // 1000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, 2000),
        "ts": pd.to_datetime(
            base + rng.integers(0, 20 * 86_400_000_000, 2000), unit="us"),
    })
    got = retention_matrix(_ds(ray_session, df, blocks=6), "user_id", "ts")
    exp = duckdb.connect().execute("""
        WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM df),
        f AS (SELECT user_id, MIN(day) cohort_day FROM d GROUP BY user_id)
        SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
               COUNT(DISTINCT d.user_id) AS n_users
        FROM d JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _naive_lloyd(x: np.ndarray, cent: np.ndarray, iters: int, tol: float):
    hist = []
    prev = np.inf
    for it in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        inertia = float(d2[np.arange(len(x)), assign].sum())
        cent = cent.copy()
        for c in range(len(cent)):
            m = x[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
        hist.append(inertia)
        if prev < np.inf and prev - inertia <= tol * prev:
            break
        prev = inertia
    return cent, hist, np.bincount(assign, minlength=len(cent))


def test_kmeans_distributed_matches_naive(ray_session):
    from webvalid.ops.kmeans import kmeans_distributed

    rng = np.random.default_rng(23)
    # three well-separated blobs
    x = np.concatenate([rng.normal(c, 0.3, (60, 4))
                        for c in (0.0, 5.0, 10.0)])
    ids = rng.permutation(len(x)).astype(np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(x)})
    cent, hist, sizes = kmeans_distributed(
        _ds(ray_session, df, blocks=5), k=3, iters=8)
    order = np.argsort(ids, kind="stable")[:3]
    ncent, nhist, nsizes = _naive_lloyd(x, x[np.sort(order)], 8, 1e-6)
    assert len(hist) == len(nhist)
    np.testing.assert_allclose(hist["inertia"].to_numpy(), nhist, rtol=1e-9)
    np.testing.assert_allclose(np.sort(cent, axis=0), np.sort(ncent, axis=0),
                               rtol=1e-9)
    assert sorted(sizes.tolist()) == sorted(nsizes.tolist()) == [60, 60, 60]


# ---------------------------------------------------------------------------
# PSI / interval coverage / Benford
# ---------------------------------------------------------------------------


def test_psi_two_sample_properties():
    from webvalid.sketches import psi_two_sample

    same = psi_two_sample(np.array([50, 50]), np.array([500, 500]))
    assert same == pytest.approx(0.0, abs=1e-6)
    shifted = psi_two_sample(np.array([50, 50]), np.array([90, 10]))
    assert shifted > 0.25  # a major shift scores above the threshold
    # symmetric in (p, q)
    rev = psi_two_sample(np.array([90, 10]), np.array([50, 50]))
    assert shifted == pytest.approx(rev)
    # empty bins stay finite thanks to smoothing
    assert np.isfinite(psi_two_sample(np.array([100, 0]), np.array([0, 100])))


def test_drift_fold_emits_psi_verdicts():
    import pickle

    from webvalid.checks.base import CheckConfig
    from webvalid.checks.drift_check import drift_fold

    def st(pid, counts):
        return {"partition_id": pid, "state": pickle.dumps(
            {"n": sum(counts.values()), "value_counts": [counts],
             "pairs": {}})}

    stable = {"en": 90, "de": 10}
    shifted = {"en": 10, "de": 90}
    cfg = CheckConfig(drift_columns=("lang",))
    verdicts, _ = drift_fold(
        [st(0, stable), st(1, dict(stable)), st(2, shifted)], cfg)
    psi = [v for v in verdicts if v["check"] == "drift_psi"]
    assert [v["partition_id"] for v in psi] == [0, 1, 2]
    assert psi[0]["pass"] and psi[1]["pass"]          # first + unchanged
    assert not psi[2]["pass"] and psi[2]["metric"] > 0.25


def test_interval_coverage_matches_duckdb(ray_session):
    import duckdb

    from webvalid.ops.windows import interval_coverage_per_key

    rng = np.random.default_rng(29)
    df = pd.DataFrame({
        "k": rng.integers(0, 6, 300),
        "s": rng.integers(0, 5000, 300).astype(np.int64),
    })
    got = interval_coverage_per_key(_ds(ray_session, df, blocks=4),
                                    "k", "s", dur_us=100,
                                    tiebreak=None).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = duckdb.connect().execute("""
        WITH iv AS (SELECT k, s, s + 100 AS e FROM df),
        m AS (SELECT k, s, e, MAX(e) OVER (PARTITION BY k ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pmax FROM iv),
        g AS (SELECT k, s, e, SUM(CASE WHEN pmax IS NULL OR s > pmax
              THEN 1 ELSE 0 END) OVER (PARTITION BY k ORDER BY s, e) grp
              FROM m),
        isl AS (SELECT k, grp, MIN(s) s0, MAX(e) e1 FROM g GROUP BY k, grp)
        SELECT k, SUM(e1 - s0) covered_us, COUNT(*) n_intervals
        FROM isl GROUP BY k ORDER BY k""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_interval_coverage_merges_touching():
    # touching intervals ([0,10) then start 10) do NOT merge: s > pmax
    # is strict, [0,10)+[10,20) → islands split only when s > end
    import ray.data

    from webvalid.ops.windows import interval_coverage_per_key

    df = pd.DataFrame({"k": [1, 1, 1], "s": np.array([0, 10, 25], np.int64)})
    out = interval_coverage_per_key(ray.data.from_pandas(df), "k", "s",
                                    10).to_pandas()
    # [0,10) and [10,20) touch (s == pmax → merged), [25,35) separate
    assert out["covered_us"].iloc[0] == 30
    assert out["n_intervals"].iloc[0] == 2


def test_benford_digits_exact(ray_session):
    from webvalid.queries import benford_price_lineitem

    out = benford_price_lineitem("/root/testdata/sf0.001")
    assert out["digit"].tolist() == list(range(1, 10))
    assert int(out["n"].sum()) > 0
    assert out["expected"].iloc[0] == pytest.approx(np.log10(2), abs=1e-6)


# ---------------------------------------------------------------------------
# EWMA / systematic weighted sampling / new users daily
# ---------------------------------------------------------------------------


def test_ewma_per_key_matches_naive(ray_session):
    from webvalid.ops.rank import ewma_per_key

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "k": rng.integers(0, 6, 300),
        "o": rng.integers(0, 1000, 300).astype(np.int64),
        "tb": np.arange(300, dtype=np.int64),
        "v": rng.normal(50, 10, 300),
    })
    a = 0.3
    got = (ewma_per_key(_ds(ray_session, df, blocks=5), "k", "o", "tb",
                        "v", alpha=a, ndigits=None)
           .to_pandas().sort_values("tb").reset_index(drop=True))
    for k, sub in df.sort_values(["o", "tb"]).groupby("k"):
        y = None
        exp = []
        for x in sub["v"]:
            y = x if y is None else (1 - a) * y + a * x
            exp.append(y)
        g = got[got.k == k].sort_values(["o", "tb"])["ewma"].to_numpy()
        np.testing.assert_allclose(g, exp, rtol=1e-12)


def test_systematic_weighted_sample_exact_and_layout_stable(ray_session):
    from webvalid.ops.sampling import systematic_weighted_sample

    rng = np.random.default_rng(37)
    df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64),
                       "w": rng.integers(0, 200, 500).astype(np.int64)})
    step = 300

    def naive(df):
        cb = df["w"].cumsum().shift(fill_value=0)
        keep = (cb // step) < ((cb + df["w"]) // step)
        return df[keep]["doc_id"].tolist()

    exp = naive(df.sort_values("doc_id"))
    for blocks in (3, 11):
        got = systematic_weighted_sample(
            _ds(ray_session, df.sample(frac=1, random_state=blocks), blocks),
            "doc_id", "w", step).to_pandas()
        assert sorted(got["doc_id"].tolist()) == exp
    # a row heavier than step is always kept
    big = pd.DataFrame({"doc_id": np.array([0, 1], np.int64),
                        "w": np.array([1, 10 * step], np.int64)})
    got = systematic_weighted_sample(_ds(ray_session, big, 2),
                                     "doc_id", "w", step).to_pandas()
    assert 1 in got["doc_id"].tolist()


def test_new_users_daily_matches_duckdb(ray_session):
    import duckdb

    from webvalid.ops.retention import new_users_daily

    rng = np.random.default_rng(41)
    base = pd.Timestamp("2024-01-01").value // 1000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 60, 1500),
        "ts": pd.to_datetime(
            base + rng.integers(0, 15 * 86_400_000_000, 1500), unit="us"),
    })
    got = new_users_daily(_ds(ray_session, df, blocks=5), "user_id", "ts")
    exp = duckdb.connect().execute("""
        WITH f AS (SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS day
                   FROM df GROUP BY user_id)
        SELECT day, COUNT(*) AS n_new,
               CAST(SUM(COUNT(*)) OVER (ORDER BY day) AS BIGINT) AS n_cum
        FROM f GROUP BY day ORDER BY day""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_chi2_independence_matches_scipy_formula(ray_session):
    from webvalid.ops.agg import chi2_independence

    rng = np.random.default_rng(43)
    df = pd.DataFrame({"a": rng.choice(["x", "y", "z"], 900),
                       "b": rng.choice(["p", "q"], 900)})
    got = chi2_independence(_ds(ray_session, df, blocks=5), "a", "b",
                            ndigits=None)
    obs = pd.crosstab(df.a, df.b).to_numpy(np.float64)
    n = obs.sum()
    exp = obs.sum(1, keepdims=True) @ obs.sum(0, keepdims=True) / n
    stat = ((obs - exp) ** 2 / exp).sum()
    assert got["chi2"].iloc[0] == pytest.approx(stat, rel=1e-12)
    assert int(got["dof"].iloc[0]) == 2
    assert got["cramers_v"].iloc[0] == pytest.approx(
        np.sqrt(stat / (n * 1)), rel=1e-12)
    assert 0.0 <= got["p_value"].iloc[0] <= 1.0


def test_grouped_harmonic_mean_matches_naive(ray_session):
    from webvalid.ops.agg import grouped_harmonic_mean

    rng = np.random.default_rng(47)
    df = pd.DataFrame({"k": rng.choice(["a", "b"], 300),
                       "x": rng.integers(-5, 100, 300).astype(np.float64)})
    got = grouped_harmonic_mean(_ds(ray_session, df, blocks=4), "k", "x",
                                ndigits=None)
    for _, row in got.iterrows():
        x = df.loc[(df.k == row["k"]) & (df.x > 0), "x"].to_numpy()
        assert row["hmean"] == pytest.approx(len(x) / (1.0 / x).sum(),
                                             rel=1e-12)


def test_snapshot_diff_classifies_all_three(ray_session):
    import ray.data

    from webvalid.ops.tablediff import snapshot_diff

    old = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                        "text": [f"t{i}" for i in range(10)],
                        "x": np.arange(10, dtype=np.float64)})
    new = old[old.k != 3].copy()          # 3 removed
    new.loc[new.k == 5, "text"] = "edited"  # 5 changed
    new.loc[new.k == 7, "x"] = 99.5         # 7 changed (float col)
    new = pd.concat([new, pd.DataFrame(
        {"k": [100], "text": ["fresh"], "x": [0.0]})], ignore_index=True)
    got = snapshot_diff(ray.data.from_pandas(old).repartition(3),
                        ray.data.from_pandas(new).repartition(4),
                        "k", ["text", "x"])
    assert got.set_index("key")["status"].to_dict() == {
        3: "removed", 5: "changed", 7: "changed", 100: "added"}


def test_snapshot_diff_rejects_duplicate_keys(ray_session):
    import ray.data

    from webvalid.ops.tablediff import snapshot_diff

    old = pd.DataFrame({"k": np.array([1, 1], np.int64), "t": ["a", "b"]})
    new = pd.DataFrame({"k": np.array([1], np.int64), "t": ["a"]})
    with pytest.raises(ValueError, match="unique keys"):
        snapshot_diff(ray.data.from_pandas(old), ray.data.from_pandas(new),
                      "k", ["t"])


def test_ranksum_matches_naive_rank_math(ray_session):
    from webvalid.ops.rank import rank_per_key  # noqa: F401 (module warm)
    from webvalid.ops.agg import ranksum_test

    rng = np.random.default_rng(53)
    df = pd.DataFrame({
        "v": np.round(rng.normal(10, 2, 600), 1),  # heavy ties
        "f": rng.random(600) < 0.3,
    })
    df.loc[df.f, "v"] += 1.5  # plant a shift
    got = ranksum_test(_ds(ray_session, df, blocks=5), "v", "f",
                       ndigits=None)
    ranks = pd.Series(df.v).rank(method="average").to_numpy()
    n1 = int(df.f.sum())
    n = len(df)
    n2 = n - n1
    r1 = ranks[df.f.to_numpy()].sum()
    u1 = r1 - n1 * (n1 + 1) / 2
    _, t = np.unique(df.v.to_numpy(), return_counts=True)
    tie = float((t.astype(np.float64) ** 3 - t).sum())
    var = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / np.sqrt(var)
    assert got["u1"].iloc[0] == pytest.approx(u1, rel=1e-12)
    assert got["z"].iloc[0] == pytest.approx(z, rel=1e-9)
    assert abs(z) > 3  # the planted shift is detected


def test_mutual_information_matches_closed_form(ray_session):
    from webvalid.ops.agg import mutual_information

    rng = np.random.default_rng(59)
    # dependent pair: b correlates with a
    a = rng.choice(["x", "y"], 800)
    b = np.where(rng.random(800) < 0.8, a, rng.choice(["x", "y"], 800))
    df = pd.DataFrame({"a": a, "b": np.char.add("b_", b)})
    got = mutual_information(_ds(ray_session, df, blocks=4), "a", "b",
                             ndigits=None)
    p = pd.crosstab(df.a, df.b).to_numpy(np.float64)
    p = p / p.sum()
    pa_ = p.sum(1, keepdims=True)
    pb = p.sum(0, keepdims=True)
    mi = np.where(p > 0, p * np.log(p / (pa_ * pb)), 0).sum()
    ha = -(pa_ * np.log(pa_)).sum()
    hb = -(pb * np.log(pb)).sum()
    assert got["mi"].iloc[0] == pytest.approx(mi, rel=1e-12)
    assert got["nmi"].iloc[0] == pytest.approx(mi / np.sqrt(ha * hb),
                                               rel=1e-12)
    assert got["mi"].iloc[0] > 0.1  # dependence detected


def test_storage_partitioned_join_matches_pandas(ray_session, tmp_path):
    import ray.data

    from webvalid.ops.joins import storage_partitioned_join, write_bucketed

    rng = np.random.default_rng(61)
    left = pd.DataFrame({"k": rng.integers(0, 50, 400).astype(np.int64),
                         "x": rng.normal(0, 1, 400)})
    right = pd.DataFrame({"k": np.arange(0, 40, dtype=np.int64),
                          "name": [f"n{i}" for i in range(40)]})
    write_bucketed(ray.data.from_pandas(left).repartition(4), "k",
                   str(tmp_path / "l"), 8)
    write_bucketed(ray.data.from_pandas(right).repartition(2), "k",
                   str(tmp_path / "r"), 8)
    got = storage_partitioned_join(str(tmp_path / "l"), str(tmp_path / "r"),
                                   "k").to_pandas() \
        .sort_values(["k", "x"]).reset_index(drop=True)
    exp = left.merge(right, on="k").sort_values(["k", "x"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "x", "name"]], exp,
                                  check_dtype=False)


def test_storage_partitioned_join_left_outer(ray_session, tmp_path):
    import ray.data

    from webvalid.ops.joins import storage_partitioned_join, write_bucketed

    left = pd.DataFrame({"k": np.arange(20, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 6, dtype=np.int64),
                          "v": np.arange(6, dtype=np.int64)})
    write_bucketed(ray.data.from_pandas(left), "k", str(tmp_path / "l"), 4)
    write_bucketed(ray.data.from_pandas(right), "k", str(tmp_path / "r"), 4)
    got = storage_partitioned_join(str(tmp_path / "l"), str(tmp_path / "r"),
                                   "k", how="left outer").to_pandas()
    assert len(got) == 20
    assert got["v"].notna().sum() == 6


def test_audio_features_gate_exact_metadata(ray_session):
    from webvalid.queries import audio_features_documents

    out = audio_features_documents("/root/testdata/sf0.001")
    assert (out["sample_rate"] == 8000).all()
    assert (out["n_channels"] == 1).all()
    assert (out["duration_sec"] == 0.25).all()
    # 0.4-amplitude sine → RMS ≈ 0.4/√2 ≈ 0.2828 for every doc
    assert out["rms"].between(0.27, 0.29).all()


def test_kth_smallest_multi_matches_single(ray_session):
    from webvalid.ops.selection import kth_smallest, kth_smallest_multi

    rng = np.random.default_rng(67)
    df = pd.DataFrame({"x": rng.normal(100, 25, 5_000)})
    df.loc[rng.choice(5_000, 50, replace=False), "x"] = np.nan
    ds = _ds(ray_session, df, blocks=6)
    ks = [1, 7, 250, 2475, 2476, 4900, 4950]
    multi = kth_smallest_multi(ds, "x", ks, collect_limit=256)
    srt = np.sort(df["x"].dropna().to_numpy())
    for k, v in zip(ks, multi):
        assert v == srt[k - 1]
    # parity with the single-rank path on one of them
    assert multi[2] == kth_smallest(ds, "x", 250, collect_limit=256)


def test_hll_overlap_inclusion_exclusion(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from webvalid.queries import overlap_users_click_purchase

    rng = np.random.default_rng(71)
    # 3000 click-only users, 2000 purchase-only, 1000 doing both
    uid = np.concatenate([np.arange(0, 3000), np.arange(5000, 7000),
                          np.arange(9000, 10000), np.arange(9000, 10000)])
    et = np.array(["click"] * 3000 + ["purchase"] * 2000
                  + ["click"] * 1000 + ["purchase"] * 1000)
    order = rng.permutation(len(uid))
    pq.write_table(pa.table({"user_id": pa.array(uid[order], pa.int64()),
                             "event_type": pa.array(et[order])}),
                   str(tmp_path / "events.parquet"))
    out = overlap_users_click_purchase(str(tmp_path))
    assert out["n_click_est"].iloc[0] == pytest.approx(4000, rel=0.03)
    assert out["n_purchase_est"].iloc[0] == pytest.approx(3000, rel=0.03)
    assert out["n_union_est"].iloc[0] == pytest.approx(6000, rel=0.03)
    assert out["n_overlap_est"].iloc[0] == pytest.approx(1000, rel=0.15)


def test_compression_ratio_detects_repetition(ray_session):
    import zlib

    from webvalid.ops.textstats import compression_ratio_batch

    rng = np.random.default_rng(73)
    rand = " ".join(rng.choice([f"w{i}" for i in range(5000)], 400))
    rep = "spam ham " * 200
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": [rand, rep, None]})
    out = compression_ratio_batch(t).to_pandas()
    # exact pinning against direct zlib
    assert out.loc[0, "compressed_bytes"] == len(zlib.compress(rand.encode(), 6))
    assert out.loc[1, "compression_ratio"] < 0.1 < out.loc[0, "compression_ratio"]
    assert np.isnan(out.loc[2, "compression_ratio"])
    assert out.loc[2, "raw_bytes"] == 0


def test_run_expectations_kinds_and_failures(ray_session):
    from webvalid.checks.expectations import run_expectations

    df = pd.DataFrame({
        "x": [1.0, 2.0, 3.0, np.nan, 100.0],
        "s": ["a", "b", "a", "zz", None],
    })
    out = run_expectations(_ds(ray_session, df, blocks=2), [
        {"kind": "null_frac_le", "column": "x", "value": 0.1},   # fails: 0.2
        {"kind": "min_ge", "column": "x", "value": 0.0},         # passes
        {"kind": "max_le", "column": "x", "value": 50.0},        # fails: 100
        {"kind": "mean_between", "column": "x", "value": [0, 30]},  # 26.5 ok
        {"kind": "in_set", "column": "s", "value": ["a", "b"]},  # fails: zz
        {"kind": "match_frac_ge", "column": "s", "pattern": "^[ab]$",
         "value": 0.9},                                          # fails: 3/4
    ])
    got = dict(zip(out["expectation"], out["pass"]))
    assert got == {"null_frac_le": False, "min_ge": True, "max_le": False,
                   "mean_between": True, "in_set": False,
                   "match_frac_ge": False}
    m = dict(zip(out["expectation"], out["metric"]))
    assert m["null_frac_le"] == pytest.approx(0.2)
    assert m["in_set"] == 1.0
    assert m["match_frac_ge"] == pytest.approx(0.75)


def test_run_expectations_rejects_unknown_kind(ray_session):
    from webvalid.checks.expectations import run_expectations

    with pytest.raises(ValueError, match="unknown expectation"):
        run_expectations(None, [{"kind": "nope", "column": "x"}])


def test_anomalous_hours_flags_planted_spike(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from webvalid.queries import anomalous_hours_events

    rng = np.random.default_rng(79)
    base = pd.Timestamp("2024-01-01").value // 1000
    HOUR = 3_600_000_000
    # steady ~50 events/hour for 72 hours, then a 20x spike in hour 60
    ts = []
    for h in range(72):
        n = 1000 if h == 60 else rng.integers(45, 55)
        ts.extend(base + h * HOUR + rng.integers(0, HOUR, n))
    pq.write_table(pa.table({"ts": pa.array(np.array(ts, np.int64),
                                            pa.timestamp("us"))}),
                   str(tmp_path / "events.parquet"))
    out = anomalous_hours_events(str(tmp_path))
    spike = out[out["window_start"] == base + 60 * HOUR]
    assert bool(spike["is_anomaly"].iloc[0])
    assert float(spike["zscore"].iloc[0]) > 10
    assert out["is_anomaly"].sum() <= 3  # quiet hours stay quiet


def test_logreg_fit_matches_local_gd_and_separates(ray_session):
    from webvalid.ops.sgd import logreg_fit

    rng = np.random.default_rng(83)
    n = 2000
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    # separable-ish: label depends on x1 strongly
    y = (x1 + 0.2 * rng.normal(0, 1, n) > 0).astype(np.float64)
    df = pd.DataFrame({"x1": x1, "x2": x2, "y": y})
    w, b, hist = logreg_fit(_ds(ray_session, df, blocks=5),
                            ["x1", "x2"], "y", iters=25, lr=0.5)
    # local replica of the SAME algorithm (standardize, full-batch GD)
    m = np.array([x1.mean(), x2.mean()])
    s = np.array([x1.std(), x2.std()])
    X = (np.stack([x1, x2], 1) - m) / s
    ww = np.zeros(2); bb = 0.0
    for _ in range(25):
        p = 1 / (1 + np.exp(-(X @ ww + bb)))
        err = p - y
        ww = ww - 0.5 * (X * err[:, None]).mean(axis=0)
        bb = bb - 0.5 * err.mean()
    np.testing.assert_allclose(w, ww, rtol=1e-9)
    assert b == pytest.approx(bb, rel=1e-9)
    assert w[0] > 5 * abs(w[1])  # x1 dominates
    assert hist["log_loss"].iloc[-1] < hist["log_loss"].iloc[0]


def test_ewma_drops_nulls_to_match_closed_form(ray_session):
    import duckdb

    from webvalid.ops.rank import ewma_per_key

    df = pd.DataFrame({
        "k": [1] * 6, "o": np.arange(6, dtype=np.int64),
        "tb": np.arange(6, dtype=np.int64),
        "v": [10.0, np.nan, 20.0, 30.0, np.nan, 40.0],
    })
    got = (ewma_per_key(_ds(ray_session, df, blocks=2), "k", "o", "tb",
                        "v", alpha=0.25)
           .to_pandas().sort_values("o").reset_index(drop=True))
    exp = duckdb.connect().execute("""
        WITH e AS (SELECT o, v,
                   ROW_NUMBER() OVER (ORDER BY o, tb) rn
                   FROM df WHERE v IS NOT NULL)
        SELECT a.o, ROUND(SUM(CASE WHEN b.rn = 1
                    THEN POWER(0.75, a.rn - 1) * b.v
                    ELSE 0.25 * POWER(0.75, a.rn - b.rn) * b.v END)
                    + 1e-9, 6) ewma
        FROM e a JOIN e b ON b.rn <= a.rn GROUP BY a.o ORDER BY a.o""").df()
    assert len(got) == 4  # null rows dropped
    np.testing.assert_allclose(got["ewma"].to_numpy(),
                               exp["ewma"].to_numpy())


def test_rolling_range_sum_all_null_frame_is_null(ray_session):
    from webvalid.ops.rank import rolling_range_sum_per_key

    df = pd.DataFrame({
        "k": [1, 1, 1], "o": np.array([0, 5, 100], np.int64),
        "tb": np.arange(3, dtype=np.int64),
        "v": [np.nan, np.nan, 7.0],
    })
    got = (rolling_range_sum_per_key(_ds(ray_session, df, blocks=1),
                                     "k", "o", "v", "tb", span=10)
           .to_pandas().sort_values("o").reset_index(drop=True))
    assert np.isnan(got["range_sum"].iloc[0])  # frame = {NULL}
    assert np.isnan(got["range_sum"].iloc[1])  # frame = {NULL, NULL}
    assert got["range_sum"].iloc[2] == 7.0


def test_benford_omits_zero_count_digits(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from webvalid.queries import benford_price_lineitem

    # prices only start with digits 1-3
    pq.write_table(pa.table({"l_extendedprice": pa.array(
        [1.11, 2.22, 3.33, 10.0, 25.5, 31.4], pa.float64())}),
        str(tmp_path / "lineitem.parquet"))
    out = benford_price_lineitem(str(tmp_path))
    assert out["digit"].tolist() == [1, 2, 3]
    assert (out["n"] > 0).all()


def test_pipeline_expectations_per_partition(ray_session, tmp_path):
    from webvalid.checks.base import CheckConfig
    from webvalid.gen import generate_webpages
    from webvalid.pipeline import run_validation

    info = generate_webpages(str(tmp_path / "fix"), n_rows=2_000,
                             block_size=500, seed=11)
    cfg = CheckConfig(block_size=500, ts_range=info["ts_window"],
                      expectations=(
                          {"kind": "null_frac_le", "column": "text",
                           "value": 0.5},          # passes everywhere
                          {"kind": "min_ge", "column": "warc_ts",
                           "value": float("inf")},  # fails everywhere
                      ))
    res = run_validation(info["pages_dir"], str(tmp_path / "out"), cfg=cfg,
                         ref_langs=info["ref_langs"],
                         text_hashes=info["text_hashes"])
    v = res["verdicts"]
    nf = v[v["check"] == "expect_null_frac_le"]
    mg = v[v["check"] == "expect_min_ge"]
    assert len(nf) == 4 and nf["pass"].all()
    assert len(mg) == 4 and not mg["pass"].any()


def test_read_parquet_evolving_union_and_mismatch(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from webvalid.sources import read_parquet_evolving

    a = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": pa.array(["x", "y"])})
    b = pa.table({"k": pa.array([3], pa.int64())})  # v missing
    pq.write_table(a, str(tmp_path / "a.parquet"))
    pq.write_table(b, str(tmp_path / "b.parquet"))
    got = read_parquet_evolving([str(tmp_path / "a.parquet"),
                                 str(tmp_path / "b.parquet")]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [1, 2, 3]
    assert got["v"].tolist()[:2] == ["x", "y"] and pd.isna(got["v"].iloc[2])
    # overlapping column with a different type must refuse loudly
    c = pa.table({"k": pa.array(["oops"])})
    pq.write_table(c, str(tmp_path / "c.parquet"))
    with pytest.raises(ValueError, match="type mismatch"):
        read_parquet_evolving([str(tmp_path / "a.parquet"),
                               str(tmp_path / "c.parquet")])


def test_pipeline_expectations_distinct_and_quantile(ray_session, tmp_path):
    from webvalid.checks.base import CheckConfig
    from webvalid.gen import generate_webpages
    from webvalid.pipeline import run_validation

    info = generate_webpages(str(tmp_path / "fix"), n_rows=2_000,
                             block_size=1_000, seed=13)
    cfg = CheckConfig(block_size=1_000, ts_range=info["ts_window"],
                      expectations=(
                          {"kind": "distinct_frac_ge", "column": "url",
                           "value": 0.5},           # urls are ~unique
                          {"kind": "q50_between", "column": "warc_ts",
                           "value": [0.0, 1.0]},    # ts median >> 1 → fails
                      ))
    res = run_validation(info["pages_dir"], str(tmp_path / "out"), cfg=cfg,
                         ref_langs=info["ref_langs"],
                         text_hashes=info["text_hashes"])
    v = res["verdicts"]
    df = v[v["check"] == "expect_distinct_frac_ge"]
    qb = v[v["check"] == "expect_q50_between"]
    assert len(df) == 2 and df["pass"].all()
    assert len(qb) == 2 and not qb["pass"].any()


def test_bigram_lm_flags_gibberish(ray_session):
    from webvalid.ops.lm import bigram_lm_scores

    rng = np.random.default_rng(89)
    vocab = [f"w{i}" for i in range(30)]
    # fluent docs: markov chain favoring w_{i+1 mod 30} after w_i
    fluent = []
    for _ in range(40):
        cur = int(rng.integers(0, 30))
        words = []
        for _ in range(60):
            words.append(vocab[cur])
            cur = (cur + 1) % 30 if rng.random() < 0.9 \
                else int(rng.integers(0, 30))
        fluent.append(" ".join(words))
    # gibberish: uniform random tokens
    gib = [" ".join(rng.choice(vocab, 60)) for _ in range(5)]
    df = pd.DataFrame({"doc_id": np.arange(45, dtype=np.int64),
                       "text": fluent + gib})
    out = bigram_lm_scores(_ds(ray_session, df, blocks=4))
    f = out[out.doc_id < 40]["avg_logp"]
    g = out[out.doc_id >= 40]["avg_logp"]
    assert g.mean() < f.mean() - 0.5  # gibberish scores clearly lower
    assert (out["n_bigrams"] == 59).all()


def test_bigram_lm_drops_short_docs(ray_session):
    from webvalid.ops.lm import bigram_lm_scores

    df = pd.DataFrame({"doc_id": pd.array([0, 1, 2], dtype="int64"),
                       "text": ["only", "two words", "a b c"]})
    out = bigram_lm_scores(_ds(ray_session, df, blocks=2))
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_bigrams"].tolist() == [1, 2]


def test_containment_pairs_finds_planted_subdoc(ray_session):
    from webvalid.ops.dedup import containment_pairs

    rng = np.random.default_rng(97)
    vocab = [f"t{i}" for i in range(4000)]
    texts = [" ".join(rng.choice(vocab, 120)) for _ in range(60)]
    texts.append(" ".join(texts[3].split(" ")[:60]))   # doc 60 ⊂ doc 3
    texts.append(texts[7])                             # doc 61 == doc 7
    df = pd.DataFrame({"doc_id": np.arange(62, dtype=np.int64),
                       "text": texts})
    got = containment_pairs(_ds(ray_session, df, blocks=4), theta=0.8)
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (3, 60) in pairs and (7, 61) in pairs
    byp = got.set_index(["id_a", "id_b"])
    assert byp.loc[(7, 61), "containment"] == 1.0
    assert byp.loc[(3, 60), "containment"] >= 0.8
    # random docs don't collide
    assert len(got) <= 4


def test_trained_langid_holdout_accuracy(ray_session, tmp_path):
    """Trained char-trigram lang-ID must generalize: profiles learned
    from the fixture's train split classify the held-out test split
    with >=95% per-language accuracy; null/empty texts come out 'und'."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from webvalid.ops.langid_ngram import (NgramLangId,
                                           generate_langid_fixture,
                                           train_lang_profiles)

    path = generate_langid_fixture(str(tmp_path), n_rows=2000, seed=7)
    ds = ray.data.read_parquet(path)
    import pyarrow.compute as pc

    train = ds.map_batches(lambda t: t.filter(pc.equal(t["split"], "train")),
                           batch_format="pyarrow")
    test = ds.map_batches(lambda t: t.filter(pc.equal(t["split"], "test")),
                          batch_format="pyarrow")
    model = train_lang_profiles(train)
    assert set(model) == {"de", "en", "es", "fr", "ru", "zh"}
    ref = ray.put(model)
    pred = test.map_batches(NgramLangId(ref),
                            batch_format="pyarrow").to_pandas()
    truth = test.select_columns(["doc_id", "lang"]).to_pandas()
    m = pred.merge(truth, on="doc_id")
    acc = (m["lang_pred"] == m["lang"]).groupby(m["lang"]).mean()
    assert (acc >= 0.95).all(), acc
    # nulls / empties / sub-trigram texts classify as 'und', conf 0
    odd = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array([None, "", "ab"], pa.string())})
    out = NgramLangId(ray.put(model))(odd).to_pandas()
    assert out["lang_pred"].tolist() == ["und", "und", "und"]
    assert (out["lang_conf"] == 0).all()


def test_grouped_quantiles_bisection_parity(ray_session):
    """The scale-exact route (grouped_kth_smallest_multi: shared
    histogram-bisection, no all-to-all, no group-fits-a-worker) must
    reproduce the groupby().map_groups demo's p50/p90 exactly —
    linear-interpolated between the two bracketing ranks the same way
    np.quantile / SQL quantile_cont does."""
    from webvalid.ops.selection import grouped_kth_smallest_multi

    rng = np.random.default_rng(19)
    n = 3000
    df = pd.DataFrame({
        "k": rng.choice(list("ABCD"), n),
        "v": np.round(rng.lognormal(4, 1, n), 2),
    })

    def ks(nn: int) -> list[int]:
        out = []
        for q in (0.5, 0.9):
            pos = q * (nn - 1)
            lo = int(np.floor(pos))
            out += [lo + 1, min(lo + 2, nn)]
        return out

    got = grouped_kth_smallest_multi(
        _ds(ray_session, df, blocks=6), "k", "v", ks_of_n=ks,
        collect_limit=40, bins=64)
    for k, vals in got.items():
        v = df.loc[df.k == k, "v"].to_numpy()
        nn = len(v)
        interp = []
        for (qlo, qhi), q in zip([vals[0:2], vals[2:4]], (0.5, 0.9)):
            pos = q * (nn - 1)
            frac = pos - np.floor(pos)
            interp.append(qlo + frac * (qhi - qlo))
        exp = [float(np.quantile(v, 0.5)), float(np.quantile(v, 0.9))]
        assert interp == pytest.approx(exp, abs=1e-9), k


# ---------------------------------------------------------------------------
# grouped_distinct_hll
# ---------------------------------------------------------------------------


def test_grouped_distinct_hll_matches_per_group_sketch(ray_session):
    """The grouped flat-maximum.at path must equal building one
    HyperLogLog per group over the same values (identical registers →
    identical estimates), regardless of block split."""
    from webvalid.ops.agg import grouped_distinct_hll
    from webvalid.sketches import HyperLogLog

    rng = np.random.default_rng(9)
    n = 5000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], n),
        "v": rng.integers(0, 800, n),
    })
    got = grouped_distinct_hll(_ds(ray_session, df, blocks=7),
                               key="k", val="v", p=10)
    for k, sub in df.groupby("k"):
        # float64 is the op's canonical hash dtype for integer vals
        # (nullable-int blocks arrive float64; same value must hash
        # the same in every block)
        ref = HyperLogLog(p=10).add(sub["v"].to_numpy()
                                    .astype(np.float64))
        assert got.loc[got["k"] == k, "distinct_est"].iloc[0] == \
            pytest.approx(ref.estimate())


def test_grouped_distinct_hll_null_semantics_and_accuracy(ray_session):
    """Null values are ignored (COUNT DISTINCT semantics), null keys
    form their own group (GROUP BY semantics), and estimates sit
    within 5σ of exact on each group."""
    from webvalid.ops.agg import grouped_distinct_hll

    rng = np.random.default_rng(3)
    n = 8000
    df = pd.DataFrame({
        "k": rng.choice(["x", "y", None], n),
        "v": rng.integers(0, 1500, n).astype("float64"),
    })
    df.loc[rng.random(n) < 0.05, "v"] = np.nan
    got = grouped_distinct_hll(_ds(ray_session, df, blocks=5),
                               key="k", val="v", p=12)
    assert set(got["k"].map(lambda x: x if x is not None else "∅")) == \
        {"x", "y", "∅"}
    bound = 5 * 1.04 / np.sqrt(1 << 12)
    for k, sub in df.groupby("k", dropna=False):
        exact = sub["v"].dropna().nunique()
        key = None if (isinstance(k, float) and np.isnan(k)) else k
        row = got[got["k"].isna()] if key is None and got["k"].isna().any() \
            else got[got["k"] == key]
        est = row["distinct_est"].iloc[0]
        assert abs(est - exact) <= bound * exact
