"""Tests for session-5 operator families: grouped higher moments
(skewness/kurtosis), z-score outlier counts, interpolated quantiles,
keep-best exact dedup, per-group cap sampling."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest


def _ds(ray_session, df: pd.DataFrame, blocks: int = 4):
    import ray.data

    return ray.data.from_pandas(df).repartition(blocks)


def _naive_skew_kurt(x: np.ndarray) -> tuple[float, float]:
    n = len(x)
    m = x.mean()
    s = np.sqrt(((x - m) ** 2).sum() / (n - 1))
    skew = (n / ((n - 1) * (n - 2))) * (((x - m) / s) ** 3).sum()
    kurt = (n * (n + 1) / ((n - 1) * (n - 2) * (n - 3))) \
        * (((x - m) / s) ** 4).sum() - 3 * (n - 1) ** 2 / ((n - 2) * (n - 3))
    return skew, kurt


def test_grouped_skew_kurt_matches_naive(ray_session):
    from webvalid.ops.agg import grouped_skew_kurt

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 900),
        "x": rng.normal(100, 17, 900) ** 2,
    })
    df.loc[rng.choice(900, 30, replace=False), "x"] = np.nan
    got = grouped_skew_kurt(_ds(ray_session, df, blocks=6), "k", "x")
    for _, row in got.iterrows():
        x = df.loc[(df.k == row["k"]) & df.x.notna(), "x"].to_numpy()
        sk, ku = _naive_skew_kurt(x)
        assert row["skew"] == pytest.approx(sk, abs=2e-6)
        assert row["kurt"] == pytest.approx(ku, abs=2e-6)


def test_grouped_skew_kurt_matches_duckdb(ray_session):
    import duckdb

    from webvalid.ops.agg import grouped_skew_kurt

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.choice(["p", "q"], 400),
                       "x": rng.exponential(5.0, 400)})
    got = grouped_skew_kurt(_ds(ray_session, df, blocks=5), "k", "x")
    exp = duckdb.connect().execute(
        "SELECT k, ROUND(skewness(x),6) skew, ROUND(kurtosis(x),6) kurt "
        "FROM df GROUP BY k ORDER BY k").df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False, atol=1.5e-6)


def test_zscore_outlier_counts_matches_naive(ray_session):
    from webvalid.ops.agg import zscore_outlier_counts

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], 700),
        "x": rng.standard_t(3, 700),  # heavy tails → real outliers
    })
    df.loc[rng.choice(700, 20, replace=False), "x"] = np.nan
    got = zscore_outlier_counts(_ds(ray_session, df, blocks=5), "k", "x",
                                z=1.5)
    for _, row in got.iterrows():
        x = df.loc[(df.k == row["k"]) & df.x.notna(), "x"].to_numpy()
        z = np.abs(x - x.mean()) / x.std(ddof=1)
        assert row["n_rows"] == len(x)
        assert row["n_outliers"] == int((z > 1.5).sum())
        assert row["n_outliers"] > 0  # the fixture must exercise the branch


def test_exact_quantile_cont_matches_numpy(ray_session):
    from webvalid.ops.selection import exact_quantile_cont

    rng = np.random.default_rng(5)
    x = rng.normal(50, 20, 3001)
    df = pd.DataFrame({"x": x})
    df.loc[rng.choice(3001, 100, replace=False), "x"] = np.nan
    got = exact_quantile_cont(_ds(ray_session, df, blocks=6), "x",
                              qs=[0.0, 0.1, 0.5, 0.9, 1.0])
    clean = df["x"].dropna().to_numpy()
    for _, row in got.iterrows():
        # numpy 'linear' interpolation == SQL quantile_cont
        assert row["value"] == pytest.approx(
            np.quantile(clean, row["q"]), abs=2e-6)


def test_dedup_keep_best_prefers_longest_then_smallest_id(ray_session):
    from webvalid.ops.dedup import exact_dedup_keep_best

    texts = ["alpha beta", "alpha beta", "gamma", "delta words here",
             "gamma", "gamma"]
    df = pd.DataFrame({
        "doc_id": [10, 4, 7, 1, 9, 3],
        "text": texts,
        # duplicate content with DIFFERENT scores (e.g. post-cleanup
        # lengths): keep max score, tie → min id
        "n_chars": [10, 12, 5, 16, 5, 5],
    })
    out = exact_dedup_keep_best(_ds(ray_session, df, blocks=3)).to_pandas()
    by_md5 = {hashlib.md5(t.encode()).hexdigest(): t for t in set(texts)}
    got = {by_md5[r.text_md5]: (r.doc_id, r.n_chars, r.cnt)
           for r in out.itertuples()}
    assert got["alpha beta"] == (4, 12, 2)      # higher score wins
    assert got["gamma"] == (3, 5, 3)            # tie → smallest id
    assert got["delta words here"] == (1, 16, 1)


def test_dedup_keep_best_rejects_out_of_range_scores(ray_session):
    from webvalid.ops.dedup import exact_dedup_keep_best

    df = pd.DataFrame({"doc_id": [1], "text": ["x"], "n_chars": [-2]})
    with pytest.raises(Exception, match="keep_best encoding"):
        exact_dedup_keep_best(_ds(ray_session, df, blocks=1)).to_pandas()


def test_cap_per_group_matches_sql_order(ray_session):
    from webvalid.ops.sampling import cap_per_group

    rng = np.random.default_rng(19)
    langs = rng.choice(["en", "de", "fr"], 300)
    texts = [f"doc {i} {rng.integers(0, 9)}" for i in range(300)]
    df = pd.DataFrame({"doc_id": np.arange(300), "lang": langs,
                       "text": texts})
    k = 7
    got = cap_per_group(_ds(ray_session, df, blocks=5), group_col="lang",
                        k=k)
    # naive oracle: per-lang smallest k by (md5(text), doc_id)
    df["_md5"] = [hashlib.md5(t.encode()).hexdigest() for t in df["text"]]
    exp = df.sort_values(["lang", "_md5", "doc_id"], kind="mergesort") \
            .groupby("lang", sort=False).head(k) \
            .sort_values(["lang", "doc_id"], kind="mergesort")
    assert got[["lang", "doc_id"]].reset_index(drop=True).equals(
        exp[["lang", "doc_id"]].reset_index(drop=True))
    assert (got.groupby("lang").size() == k).all()


def test_cap_per_group_keeps_small_groups_whole(ray_session):
    from webvalid.ops.sampling import cap_per_group

    df = pd.DataFrame({"doc_id": [1, 2, 3], "lang": ["en", "en", "fr"],
                       "text": ["a", "b", "c"]})
    got = cap_per_group(_ds(ray_session, df, blocks=2), group_col="lang",
                        k=10)
    assert len(got) == 3


def test_fill_forward_per_key_matches_pandas(ray_session):
    from webvalid.ops.impute import fill_forward_per_key

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "k": rng.integers(0, 8, 400),
        "o": rng.permutation(400),
        "v": rng.normal(0, 1, 400),
    })
    df.loc[rng.choice(400, 150, replace=False), "v"] = np.nan
    got = fill_forward_per_key(_ds(ray_session, df, blocks=5), key="k",
                               order_col="o", tiebreak="o",
                               value_col="v").to_pandas()
    exp = df.sort_values(["k", "o"], kind="mergesort")
    exp["filled"] = exp.groupby("k")["v"].ffill()
    g = got.sort_values(["k", "o"], kind="mergesort").reset_index(drop=True)
    e = exp.reset_index(drop=True)
    pd.testing.assert_series_equal(g["filled"], e["filled"])
    # leading nulls must remain null somewhere in the fixture
    assert g["filled"].isna().any()


def test_fill_group_mean_matches_pandas(ray_session):
    from webvalid.ops.impute import fill_group_mean

    rng = np.random.default_rng(29)
    df = pd.DataFrame({
        "k": rng.integers(0, 6, 300),
        "v": rng.normal(10, 2, 300),
    })
    df.loc[rng.choice(300, 90, replace=False), "v"] = np.nan
    # one all-null group must stay null
    df.loc[df.k == 5, "v"] = np.nan
    got = fill_group_mean(_ds(ray_session, df, blocks=4), key="k",
                          value_col="v", ndigits=None).to_pandas()
    means = df.groupby("k")["v"].mean()
    exp = df["v"].fillna(df["k"].map(means))
    assert np.allclose(got["filled"].to_numpy(),
                       exp.to_numpy(), equal_nan=True)
    assert got.loc[got.k == 5, "filled"].isna().all()


def test_grouped_geomean_matches_naive(ray_session):
    from webvalid.ops.agg import grouped_geomean

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], 200),
        "v": rng.lognormal(3, 1, 200),
    })
    df.loc[rng.choice(200, 10, replace=False), "v"] = 0.0   # excluded
    df.loc[rng.choice(200, 5, replace=False), "v"] = np.nan
    got = grouped_geomean(_ds(ray_session, df, blocks=4), "k", "v")
    for _, row in got.iterrows():
        x = df.loc[(df.k == row["k"]) & (df.v > 0), "v"].to_numpy()
        assert row["geomean"] == pytest.approx(
            np.exp(np.log(x).mean()), abs=2e-6)


def test_levenshtein_kernel_fuzz_vs_duckdb():
    import random

    import duckdb

    from webvalid.ops.editdist import levenshtein

    con = duckdb.connect()
    random.seed(47)
    for _ in range(120):
        a = "".join(random.choice("abxy ") for _ in range(random.randint(0, 25)))
        b = "".join(random.choice("abxy ") for _ in range(random.randint(0, 25)))
        exp = con.sql("SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        assert levenshtein(a, b) == exp, (a, b)
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("abcdef", "abcdef", max_chars=3) == 0  # truncation


def test_adjacent_edit_distances_matches_naive(ray_session):
    from webvalid.ops.editdist import adjacent_edit_distances, levenshtein

    rng = np.random.default_rng(53)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], 60),
        "i": np.arange(60),
        "t": ["word " * rng.integers(1, 6) + str(rng.integers(0, 99))
              for _ in range(60)],
    })
    got = adjacent_edit_distances(_ds(ray_session, df, blocks=4), key="k",
                                  order_col="i", text_col="t",
                                  max_chars=30).to_pandas()
    for k, g in df.groupby("k"):
        g = g.sort_values("i")
        exp = [levenshtein(g.t.iloc[j], g.t.iloc[j + 1], 30)
               for j in range(len(g) - 1)]
        sub = got[got.k == k].sort_values("i")
        assert sub["dist"].tolist() == exp
        assert sub["next_id"].tolist() == g["i"].iloc[1:].tolist()


def test_grouped_median_mad_matches_numpy(ray_session):
    from webvalid.ops.agg import grouped_median_mad

    rng = np.random.default_rng(59)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 501),
        "v": np.round(rng.normal(50, 20, 501), 2),
    })
    df.loc[rng.choice(501, 20, replace=False), "v"] = np.nan
    got = grouped_median_mad(_ds(ray_session, df, blocks=5), "k", "v")
    for _, row in got.iterrows():
        v = df.loc[(df.k == row["k"]) & df.v.notna(), "v"].to_numpy()
        med = np.median(v)
        assert row["median"] == pytest.approx(med, abs=1e-9)
        assert row["mad"] == pytest.approx(np.median(np.abs(v - med)),
                                           abs=1e-9)


def test_rate_per_key_matches_pandas(ray_session):
    from webvalid.ops.rank import rate_per_key

    rng = np.random.default_rng(61)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 300),
        "o": rng.integers(0, 50, 300),  # duplicate orders → dt == 0 rows
        "tb": np.arange(300),
        "v": rng.normal(0, 10, 300),
    })
    got = rate_per_key(_ds(ray_session, df, blocks=4), key="k",
                       order_col="o", value_col="v",
                       tiebreak="tb").to_pandas()
    exp = df.sort_values(["k", "o", "tb"], kind="mergesort").copy()
    dv = exp.groupby("k")["v"].diff()
    dt = exp.groupby("k")["o"].diff()
    exp["rate"] = np.where(dt == 0, np.nan, dv / dt)
    g = got.sort_values(["k", "o", "tb"], kind="mergesort")["rate"] \
           .reset_index(drop=True)
    e = exp["rate"].reset_index(drop=True)
    assert np.allclose(g.to_numpy(), e.to_numpy(), equal_nan=True)
    assert np.isnan(g.to_numpy()).sum() > 5  # dt==0 + leading rows hit


def test_windowed_distinct_matches_naive(ray_session):
    from webvalid.ops.windows import windowed_distinct

    rng = np.random.default_rng(67)
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 12 * 3600, 500) * 1_000_000
    df = pd.DataFrame({"ts": pd.to_datetime(ts, unit="us"),
                       "uid": rng.integers(0, 40, 500)})
    got = windowed_distinct(_ds(ray_session, df, blocks=5), ts_col="ts",
                            id_col="uid", bucket_us=3_600_000_000,
                            n_buckets=3)
    hb = ts // 3_600_000_000
    present = np.unique(hb)
    for _, row in got.iterrows():
        w = row["window_end"] // 3_600_000_000
        exp = len(set(df.uid[np.isin(hb, [w - 2, w - 1, w])]))
        assert row["n_ids"] == exp
    assert set(got["window_end"] // 3_600_000_000) == set(present)


def test_kth_smallest_ignores_nan_values(ray_session):
    """NaN values must not count toward n (the histogram and final
    passes drop them; a mismatched n crashed the final index)."""
    import ray.data

    from webvalid.ops.selection import kth_smallest

    df = pd.DataFrame({"x": [3.0, 1.0, np.nan, 2.0, np.nan]})
    ds = ray.data.from_pandas(df)
    assert kth_smallest(ds, "x", 1) == 1.0
    assert kth_smallest(ds, "x", 3) == 3.0
    with pytest.raises(Exception, match="out of range"):
        kth_smallest(ds, "x", 4)


def test_cap_per_group_keeps_null_group(ray_session):
    import ray.data

    from webvalid.ops.sampling import cap_per_group

    df = pd.DataFrame({"lang": ["en"] * 5 + [None] * 4,
                       "text": [f"t{i}" for i in range(9)],
                       "doc_id": np.arange(9, dtype=np.int64)})
    out = cap_per_group(ray.data.from_pandas(df), k=2)
    # null group capped at k like any other partition (SQL semantics)
    assert (out["lang"].isna()).sum() == 2
    assert (out["lang"] == "en").sum() == 2


def test_split_thresholds_rejects_bad_fractions():
    from webvalid.ops.sampling import split_thresholds

    with pytest.raises(ValueError, match="non-empty"):
        split_thresholds({})
    with pytest.raises(ValueError, match="sum"):
        split_thresholds({"a": 0.8, "b": 0.8})


def test_grouped_kth_bisection_rounds_exact(ray_session):
    """Force real bisection rounds (collect_limit smaller than the
    groups) and check exact per-key ranks against numpy, including a
    duplicate-heavy key (zero-width final intervals) and int keys."""
    from webvalid.ops.selection import grouped_kth_smallest_multi

    rng = np.random.default_rng(73)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 4, n),
        "v": np.round(rng.normal(0, 1000, n), 3),
    })
    df.loc[df.k == 2, "v"] = 7.0  # constant group: lo == hi instantly
    got = grouped_kth_smallest_multi(
        _ds(ray_session, df, blocks=6), "k", "v",
        ks_of_n=lambda n: [1, (n + 1) // 2, n // 2 + 1, n],
        collect_limit=50, bins=32)
    for k, vals in got.items():
        v = np.sort(df.loc[df.k == k, "v"].to_numpy())
        nn = len(v)
        exp = [v[0], v[(nn + 1) // 2 - 1], v[nn // 2], v[-1]]
        assert vals == pytest.approx(exp, abs=1e-12), k


def test_grouped_median_mad_keeps_all_null_group(ray_session):
    """A key whose values are ALL null must still emit a row (NaN
    median/mad) — SQL GROUP BY keeps the group; dropping it makes the
    engine's row count diverge from the oracle (r4 review repro)."""
    from webvalid.ops.agg import grouped_median_mad

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 4,
        "v": [1.0, 2.0, 3.0, 4.0, 5.0] + [np.nan] * 4,
    })
    got = grouped_median_mad(_ds(ray_session, df, blocks=3), "k", "v")
    assert got["k"].tolist() == ["a", "b"]
    assert got.loc[got.k == "a", "median"].iloc[0] == 3.0
    assert np.isnan(got.loc[got.k == "b", "median"].iloc[0])
    assert np.isnan(got.loc[got.k == "b", "mad"].iloc[0])
