"""Tests for session-4 operator families: RANK/CUME_DIST/rolling-agg
windows, grouped mode/entropy/correlation, CUBE, string_agg, range
join, token chunking, PII redaction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(ray_session, df: pd.DataFrame, blocks: int = 4):
    import ray.data

    return ray.data.from_pandas(df).repartition(blocks)


@pytest.fixture(scope="module")
def keyed(ray_session):
    rng = np.random.default_rng(41)
    df = pd.DataFrame({
        "k": rng.integers(0, 25, 600),
        # few distinct values → constant ties, incl. across block bounds
        "v": rng.integers(0, 5, 600).astype(np.float64),
        "tb": np.arange(600),
    })
    return _ds(ray_session, df, blocks=7), df


def test_rank_per_key_matches_pandas(keyed):
    from webvalid.ops.rank import rank_per_key

    ds, df = keyed
    got = rank_per_key(ds, key="k", order_col="v", tiebreak="tb",
                       out_col="rnk").to_pandas() \
        .sort_values("tb").reset_index(drop=True)
    exp = df.copy()
    exp["rnk"] = exp.groupby("k")["v"].rank(method="min").astype(np.int64)
    exp = exp.sort_values("tb").reset_index(drop=True)
    pd.testing.assert_series_equal(got["rnk"], exp["rnk"])


def test_rank_per_key_descending_single_key(ray_session):
    from webvalid.ops.rank import rank_per_key

    df = pd.DataFrame({"k": 0, "v": [3.0, 3.0, 1.0, 2.0, 2.0, 2.0],
                       "tb": range(6)})
    got = rank_per_key(_ds(ray_session, df, blocks=3), key="k",
                       order_col="v", tiebreak="tb", descending=True,
                       out_col="rnk").to_pandas() \
        .sort_values("tb").reset_index(drop=True)
    assert got["rnk"].tolist() == [1, 1, 6, 3, 3, 3]


def test_global_cume_dist_unique_composite(keyed):
    from webvalid.ops.rank import global_cume_dist

    ds, df = keyed
    got = global_cume_dist(ds, by=["v", "tb"], descending=[True, False],
                           out_col="cd").to_pandas() \
        .sort_values("tb").reset_index(drop=True)
    # unique composite → cume_dist == rn/n
    exp_rn = df.sort_values(["v", "tb"], ascending=[False, True]) \
        .reset_index().index.to_numpy() + 1
    exp = df.sort_values(["v", "tb"], ascending=[False, True]).copy()
    exp["cd"] = exp_rn / len(df)
    exp = exp.sort_values("tb").reset_index(drop=True)
    np.testing.assert_allclose(got["cd"].to_numpy(), exp["cd"].to_numpy())


def test_rolling_agg_per_key_matches_pandas(keyed):
    from webvalid.ops.rank import rolling_agg_per_key

    ds, df = keyed
    got = rolling_agg_per_key(ds, key="k", order_col="v", value_col="v",
                              window=3, tiebreak="tb",
                              aggs={"rmin": "min", "rmax": "max",
                                    "rsum": "sum"}).to_pandas() \
        .sort_values("tb").reset_index(drop=True)
    exp = df.sort_values(["k", "v", "tb"], kind="mergesort").copy()
    r = exp.groupby("k")["v"].rolling(3, min_periods=1)
    for out, how in [("rmin", "min"), ("rmax", "max"), ("rsum", "sum")]:
        exp[out] = getattr(r, how)().reset_index(level=0, drop=True)
    exp = exp.sort_values("tb").reset_index(drop=True)
    for c in ["rmin", "rmax", "rsum"]:
        np.testing.assert_allclose(got[c].to_numpy(), exp[c].to_numpy())


def test_grouped_mode_tiebreak(ray_session):
    from webvalid.ops.agg import grouped_mode

    df = pd.DataFrame({"k": [0, 0, 0, 0, 1, 1, 1],
                       "v": ["b", "b", "a", "a", "z", "y", "z"]})
    got = grouped_mode(_ds(ray_session, df, blocks=3), key="k", val="v")
    # key 0: tie 2-2 → smallest value "a"; key 1: "z" wins 2-1
    assert got.set_index("k")["mode_val"].to_dict() == {0: "a", 1: "z"}
    assert got.set_index("k")["n"].to_dict() == {0: 2, 1: 2}


def test_grouped_entropy_matches_numpy(keyed):
    from webvalid.ops.agg import grouped_entropy

    ds, df = keyed
    got = grouped_entropy(ds, key="k", val="v", ndigits=None)
    for k, g in df.groupby("k"):
        p = g["v"].value_counts().to_numpy() / len(g)
        exp = float(-(p * np.log(p)).sum())
        np.testing.assert_allclose(
            got.loc[got["k"] == k, "entropy"].iloc[0], exp, rtol=1e-12)


def test_grouped_corr_matches_pandas(ray_session):
    from webvalid.ops.agg import grouped_corr

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 4, 500),
                       "x": rng.normal(size=500),
                       "y": rng.normal(size=500)})
    df["y"] += 0.5 * df["x"]
    df.loc[::17, "x"] = np.nan  # null pairs must be excluded
    got = grouped_corr(_ds(ray_session, df, blocks=5), key="k",
                       x="x", y="y", ndigits=None)
    for k, g in df.dropna(subset=["x", "y"]).groupby("k"):
        np.testing.assert_allclose(
            got.loc[got["k"] == k, "corr_xy"].iloc[0],
            g["x"].corr(g["y"]), rtol=1e-9)
        assert got.loc[got["k"] == k, "n_pairs"].iloc[0] == len(g)


def test_cube_counts_matches_pandas(ray_session):
    from webvalid.ops.reshape import cube_counts

    rng = np.random.default_rng(6)
    df = pd.DataFrame({"a": rng.choice(["x", "y"], 200),
                       "b": rng.choice(["p", "q", "r"], 200)})
    got = cube_counts(_ds(ray_session, df, blocks=3), ["a", "b"])
    # 4 grouping sets: (a,b), (a), (b), ()
    fine = df.groupby(["a", "b"]).size()
    assert len(got) == len(fine) + df["a"].nunique() + df["b"].nunique() + 1
    assert got.loc[(got["a"] == "ALL") & (got["b"] == "ALL"),
                   "n_rows"].iloc[0] == 200
    for (a, b), n in fine.items():
        assert got.loc[(got["a"] == a) & (got["b"] == b),
                       "n_rows"].iloc[0] == n
    for b, n in df.groupby("b").size().items():
        assert got.loc[(got["a"] == "ALL") & (got["b"] == b),
                       "n_rows"].iloc[0] == n


def test_grouped_string_agg_ordered(ray_session):
    from webvalid.ops.reshape import grouped_string_agg

    df = pd.DataFrame({"g": ["a", "a", "b", "a", "b"],
                       "v": [30, 10, 2, 20, 1]})
    got = grouped_string_agg(_ds(ray_session, df, blocks=3), ["g"], "v",
                             sep=",", out_col="vals")
    assert got.set_index("g")["vals"].to_dict() == \
        {"a": "10,20,30", "b": "1,2"}


def test_grouped_string_agg_groups_span_blocks(ray_session):
    """Groups far larger than a block + tied values at run boundaries:
    the fragment stitch must reassemble each group in value order, and
    ties (equal strings) must not scramble the join."""
    from webvalid.ops.reshape import grouped_string_agg

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], size=2_000),
        # heavy duplication → tied values straddle block boundaries
        "v": rng.integers(0, 25, size=2_000),
    })
    got = grouped_string_agg(_ds(ray_session, df, blocks=13), ["g"], "v",
                             sep=",", out_col="vals")
    exp = (df.sort_values(["g", "v"], kind="mergesort")
             .groupby("g")["v"]
             .agg(lambda s: ",".join(s.astype(str))))
    assert got.set_index("g")["vals"].to_dict() == exp.to_dict()


def test_broadcast_range_join(ray_session):
    from webvalid.ops.joins import broadcast_range_join

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"ts": rng.integers(0, 1000, 400), "id": range(400)})
    intervals = pa.table({"win_start": pa.array([100, 300, 800], pa.int64()),
                          "win_end": pa.array([200, 350, 1000], pa.int64())})
    got = broadcast_range_join(_ds(ray_session, df, blocks=4), intervals,
                               ts_col="ts", start_col="win_start",
                               end_col="win_end").to_pandas()
    exp_mask = (((df.ts >= 100) & (df.ts < 200)) |
                ((df.ts >= 300) & (df.ts < 350)) |
                ((df.ts >= 800) & (df.ts < 1000)))
    assert sorted(got["id"]) == sorted(df.loc[exp_mask, "id"])
    assert ((got["ts"] >= got["win_start"]) & (got["ts"] < got["win_end"])).all()


def test_broadcast_range_join_rejects_overlap(ray_session):
    from webvalid.ops.joins import broadcast_range_join

    intervals = pa.table({"s": pa.array([0, 50], pa.int64()),
                          "e": pa.array([60, 100], pa.int64())})
    ds = _ds(ray_session, pd.DataFrame({"ts": [1, 2]}), blocks=1)
    with pytest.raises(ValueError, match="non-overlapping"):
        broadcast_range_join(ds, intervals, ts_col="ts",
                             start_col="s", end_col="e")


def test_token_chunks_matches_naive(ray_session):
    from webvalid.ops.chunking import token_chunks

    rng = np.random.default_rng(8)
    texts = [" ".join(f"w{rng.integers(0, 9)}" for _ in range(n))
             for n in rng.integers(1, 90, 50)]
    texts.append("")  # empty text → one chunk of the single '' token
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = token_chunks(_ds(ray_session, df, blocks=3), chunk_tokens=32) \
        .to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    rows = []
    for i, t in enumerate(texts):
        toks = t.split(" ")
        for c in range(-(-len(toks) // 32)):
            piece = toks[c * 32:(c + 1) * 32]
            rows.append((i, c, len(piece), " ".join(piece)))
    exp = pd.DataFrame(rows, columns=["doc_id", "chunk_id", "n_tokens",
                                      "chunk_text"])
    pd.testing.assert_frame_equal(
        got[["doc_id", "chunk_id", "n_tokens", "chunk_text"]], exp,
        check_dtype=False)


def test_redact_pii_counts_and_masks(ray_session):
    from webvalid.ops.redact import redact_pii

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["mail me at a.b-c@ex-ample.org or x@y.io thanks",
                 "call +1-555-0199 or +1-555-7777 now",
                 "nothing sensitive here"],
    })
    got = redact_pii(_ds(ray_session, df, blocks=2)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_emails"].tolist() == [2, 0, 0]
    assert got["n_phones"].tolist() == [0, 2, 0]
    assert got.loc[0, "red_text"] == "mail me at [EMAIL] or [EMAIL] thanks"
    assert got.loc[1, "red_text"] == "call [PHONE] or [PHONE] now"
    assert got.loc[2, "red_text"] == "nothing sensitive here"


def test_kth_smallest_forced_bisection(ray_session):
    from webvalid.ops.selection import kth_smallest

    rng = np.random.default_rng(9)
    vals = rng.normal(scale=100, size=5000)
    vals[::13] = np.nan  # nulls excluded
    df = pd.DataFrame({"x": vals})
    clean = np.sort(vals[~np.isnan(vals)])
    ds = _ds(ray_session, df, blocks=5)
    # collect_limit far below n forces several histogram rounds
    for k in [1, 7, len(clean) // 2, len(clean)]:
        got = kth_smallest(ds, "x", k, bins=16, collect_limit=50)
        assert got == clean[k - 1]


def test_exact_quantile_disc_semantics(ray_session):
    from webvalid.ops.selection import exact_quantile_disc

    rng = np.random.default_rng(10)
    vals = rng.integers(0, 1000, 777).astype(np.float64)
    ds = _ds(ray_session, pd.DataFrame({"x": vals}), blocks=4)
    got = exact_quantile_disc(ds, "x", qs=[0.25, 0.5, 0.9],
                              bins=32, collect_limit=64)
    s = np.sort(vals)
    for _, row in got.iterrows():
        assert row["value"] == s[int(np.floor(row["q"] * (len(s) - 1)))]


def test_grouped_count_distinct(ray_session):
    from webvalid.ops.agg import grouped_count_distinct

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.integers(0, 5, 400),
                       "v": rng.integers(0, 30, 400).astype(np.float64)})
    df.loc[::9, "v"] = np.nan
    got = grouped_count_distinct(_ds(ray_session, df, blocks=4),
                                 key="k", val="v")
    exp = df.dropna(subset=["v"]).groupby("k")["v"].nunique()
    assert got.set_index("k")["n_distinct"].to_dict() == exp.to_dict()


def test_grouped_count_distinct_sql_null_semantics(ray_session):
    """SQL GROUP BY semantics: a NULL key is its own group, and a
    group whose vals are all NULL still appears with count 0."""
    from webvalid.ops.agg import grouped_count_distinct

    df = pd.DataFrame({
        "k": ["a", "a", None, None, "b", "b"],
        "v": [1.0, 2.0, 7.0, 7.0, np.nan, np.nan],
    })
    got = grouped_count_distinct(_ds(ray_session, df, blocks=3),
                                 key="k", val="v")
    assert len(got) == 3
    by = {("∅" if pd.isna(k) else k): n
          for k, n in zip(got["k"], got["n_distinct"])}
    assert by == {"a": 2, "∅": 1, "b": 0}
    assert got["n_distinct"].dtype == np.int64


def test_grouped_minmax_normalize(ray_session):
    from webvalid.ops.agg import grouped_minmax_normalize

    rng = np.random.default_rng(12)
    df = pd.DataFrame({"k": rng.integers(0, 6, 300),
                       "v": rng.normal(size=300)})
    df.loc[df["k"] == 5, "v"] = 3.25  # zero-range key → null
    got = grouped_minmax_normalize(_ds(ray_session, df, blocks=4),
                                   key="k", val="v", out_col="nv") \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    exp = df.sort_values(["k", "v"]).reset_index(drop=True)
    g = exp.groupby("k")["v"]
    rngs = g.transform("max") - g.transform("min")
    exp["nv"] = np.where(rngs == 0, np.nan,
                         (exp["v"] - g.transform("min")) / rngs)
    np.testing.assert_allclose(got["nv"].to_numpy(), exp["nv"].to_numpy(),
                               equal_nan=True)


def test_densify_hourly_fills_gaps(ray_session):
    from webvalid.ops.windows import densify_hourly

    H = 3_600_000_000
    # hours 0, 1, 4 occupied → 2 and 3 must appear with zero counts
    ts = np.array([10, 20, H + 5, 4 * H + 1, 4 * H + 2])
    df = pd.DataFrame({"ts_us": ts})
    got = densify_hourly(_ds(ray_session, df, blocks=2))
    assert got["window_start"].tolist() == [0, H, 2 * H, 3 * H, 4 * H]
    assert got["cnt"].tolist() == [2, 1, 0, 0, 2]


def test_funnel_conversion_matches_naive(ray_session):
    from webvalid.ops.funnel import funnel_conversion

    rng = np.random.default_rng(13)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n),
        "ts": rng.integers(0, 10_000, n),
        "typ": rng.choice(["a", "b", "c"], n, p=[0.4, 0.2, 0.4]),
        "uid": np.arange(n),
    })
    H = 500
    got = funnel_conversion(_ds(ray_session, df, blocks=5), key="k",
                            ts_col="ts", type_col="typ", from_type="a",
                            to_type="b", horizon=H, tiebreak="uid")
    for k, g in df.groupby("k"):
        a = g.loc[g.typ == "a", "ts"].to_numpy()
        b = g.loc[g.typ == "b", "ts"].to_numpy()
        if len(a) == 0:
            assert k not in set(got["k"])
            continue
        n_conv = sum(bool(((b >= t) & (b <= t + H)).any()) for t in a)
        row = got[got["k"] == k].iloc[0]
        assert row["n_from"] == len(a)
        assert row["n_conversions"] == n_conv
