"""Carry-threading stress tests for ops/keyscan.py.

Tiny blocks (many more blocks than keys) force every key to span
several blocks, exercising the fold's carry logic: rolling windows
crossing edges, sessions straddling blocks, open-run merges, reverse
(lead) carries, and RANGE-frame peer groups split across blocks.
Every op is checked against a single-frame pandas oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _ds(df: pd.DataFrame, blocks: int):
    import ray.data

    # shuffle rows so sorted runs never align with input blocks
    df = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    return ray.data.from_pandas(df).repartition(blocks)


@pytest.fixture()
def frame():
    rng = np.random.default_rng(42)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 4, n),             # 4 keys over ~20 blocks
        "o": rng.integers(0, 50, n).astype(np.int64),   # heavy order ties
        "tb": np.arange(n, dtype=np.int64),
        "v": np.round(rng.normal(10, 3, n), 2),
    })
    df.loc[rng.random(n) < 0.15, "v"] = np.nan   # nulls in the value col
    return df


def _sorted(df):
    return df.sort_values(["k", "o", "tb"], kind="mergesort")


def test_rolling_agg_scan_spanning_keys(ray_session, frame):
    from webvalid.ops.keyscan import rolling_agg_scan

    got = rolling_agg_scan(_ds(frame, 20), "k", "o", "tb", "v", 4,
                           {"rmean": "mean", "rsum": "sum", "rmin": "min"}) \
        .to_pandas().sort_values("tb").reset_index(drop=True)
    exp = _sorted(frame).copy()
    g = exp.groupby("k")["v"]
    exp["rmean"] = g.transform(lambda s: s.rolling(4, min_periods=1).mean())
    exp["rsum"] = g.transform(lambda s: s.rolling(4, min_periods=1).sum())
    exp["rmin"] = g.transform(lambda s: s.rolling(4, min_periods=1).min())
    exp = exp.sort_values("tb").reset_index(drop=True)
    for c in ("rmean", "rsum", "rmin"):
        assert np.allclose(got[c], exp[c], atol=1e-9, equal_nan=True), c


def test_lag_lead_scan_spanning_keys(ray_session, frame):
    from webvalid.ops.keyscan import lag_scan, lead_scan

    for n in (1, 3):
        got = lag_scan(_ds(frame, 20), "k", "o", "tb", "v", n=n) \
            .to_pandas().sort_values("tb").reset_index(drop=True)
        exp = _sorted(frame).copy()
        exp["lagged"] = exp.groupby("k")["v"].shift(n)
        exp = exp.sort_values("tb").reset_index(drop=True)
        assert np.allclose(got["lagged"], exp["lagged"],
                           atol=0, equal_nan=True), f"lag {n}"

        got = lead_scan(_ds(frame, 20), "k", "o", "tb", "v", n=n) \
            .to_pandas().sort_values("tb").reset_index(drop=True)
        exp = _sorted(frame).copy()
        exp["led"] = exp.groupby("k")["v"].shift(-n)
        exp = exp.sort_values("tb").reset_index(drop=True)
        assert np.allclose(got["led"], exp["led"],
                           atol=0, equal_nan=True), f"lead {n}"


def test_cumsum_scan_spanning_keys(ray_session, frame):
    from webvalid.ops.keyscan import cumsum_scan

    got = cumsum_scan(_ds(frame, 20), "k", "o", "tb", "v") \
        .to_pandas().sort_values("tb").reset_index(drop=True)
    exp = _sorted(frame).copy()
    # SQL SUM OVER semantics: NULL rows carry the prior running sum
    # (pandas cumsum would emit NaN there); leading NULLs stay NULL
    exp["cum_sum"] = exp.groupby("k")["v"].cumsum()
    exp["cum_sum"] = exp.groupby("k")["cum_sum"].ffill()
    exp = exp.sort_values("tb").reset_index(drop=True)
    assert np.allclose(got["cum_sum"], exp["cum_sum"],
                       atol=1e-8, equal_nan=True)


def test_rate_scan_spanning_keys(ray_session, frame):
    from webvalid.ops.keyscan import rate_scan

    got = rate_scan(_ds(frame, 20), "k", "o", "tb", "v") \
        .to_pandas().sort_values("tb").reset_index(drop=True)
    exp = _sorted(frame).copy()
    dv = exp.groupby("k")["v"].diff()
    dt = exp.groupby("k")["o"].diff().astype(float)
    with np.errstate(invalid="ignore", divide="ignore"):
        exp["rate"] = np.where(dt == 0, np.nan, dv / dt)
    exp = exp.sort_values("tb").reset_index(drop=True)
    assert np.allclose(got["rate"], exp["rate"], atol=0, equal_nan=True)


def test_ewma_scan_spanning_keys(ray_session, frame):
    from webvalid.ops.keyscan import ewma_scan

    got = ewma_scan(_ds(frame, 20), "k", "o", "tb", "v", alpha=0.3,
                    ndigits=None).to_pandas() \
        .sort_values("tb").reset_index(drop=True)
    exp = _sorted(frame).dropna(subset=["v"]).copy()
    exp["ewma"] = exp.groupby("k")["v"].transform(
        lambda s: s.ewm(alpha=0.3, adjust=False).mean())
    exp = exp.sort_values("tb").reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.allclose(got["ewma"], exp["ewma"], rtol=1e-9)


def test_fill_forward_scan_spanning_keys(ray_session, frame):
    from webvalid.ops.keyscan import fill_forward_scan

    got = fill_forward_scan(_ds(frame, 20), "k", "o", "tb", "v") \
        .to_pandas().sort_values("tb").reset_index(drop=True)
    exp = _sorted(frame).copy()
    exp["filled"] = exp.groupby("k")["v"].ffill()
    exp = exp.sort_values("tb").reset_index(drop=True)
    assert np.allclose(got["filled"], exp["filled"], atol=0, equal_nan=True)


def test_rolling_range_sum_scan_peer_groups_across_blocks(ray_session, frame):
    import duckdb

    from webvalid.ops.keyscan import rolling_range_sum_scan

    df = frame
    got = rolling_range_sum_scan(_ds(df, 20), "k", "o", "tb", "v", span=7) \
        .to_pandas().sort_values("tb").reset_index(drop=True)
    exp = duckdb.connect().execute("""
        SELECT tb, ROUND(SUM(v) OVER (PARTITION BY k ORDER BY o
                    RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) + 1e-9, 6)
               AS range_sum
        FROM df ORDER BY tb""").df()
    assert np.allclose(got["range_sum"], exp["range_sum"],
                       atol=1e-9, equal_nan=True)


def test_streaks_scan_spanning_keys(ray_session):
    from webvalid.ops.keyscan import streaks_scan

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 5, n),
        "o": np.arange(n, dtype=np.int64),
        "v": rng.choice(list("ab"), n),        # long runs likely
    })
    got = streaks_scan(_ds(df, 25), "k", "o", "o", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    rows = []
    for k, sub in df.sort_values(["k", "o"]).groupby("k"):
        v = sub["v"].to_numpy()
        change = np.concatenate([[True], v[1:] != v[:-1]])
        lens = np.diff(np.append(np.flatnonzero(change), len(v)))
        rows.append({"k": k, "max_streak": int(lens.max()),
                     "n_runs": int(len(lens))})
    exp = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(
        got[["k", "max_streak", "n_runs"]].astype({"k": np.int64}),
        exp.astype({"k": np.int64}), check_dtype=False)


def test_sessionize_scan_sessions_across_blocks(ray_session):
    from webvalid.ops.keyscan import sessionize_scan
    import ray.data

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "u": rng.integers(0, 3, n),
        "ts": rng.integers(0, 2000, n).astype(np.int64),  # us; gaps common
        "eid": np.arange(n, dtype=np.int64),
    })
    ds = ray.data.from_pandas(
        df.sample(frac=1.0, random_state=2).reset_index(drop=True)
    ).repartition(25)
    got = sessionize_scan(ds, "u", "ts", gap_us=50, tiebreak="eid") \
        .to_pandas().sort_values(["u", "session_id"]).reset_index(drop=True)
    rows = []
    for u, sub in df.sort_values(["u", "ts"]).groupby("u"):
        ts = sub["ts"].to_numpy()
        brk = np.concatenate([[True], np.diff(ts) > 50])
        sid = np.cumsum(brk) - 1
        for s in np.unique(sid):
            m = sid == s
            rows.append({"u": u, "session_id": int(s),
                         "session_start": int(ts[m].min()),
                         "session_end": int(ts[m].max()),
                         "n_events": int(m.sum())})
    exp = pd.DataFrame(rows).sort_values(["u", "session_id"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["u", "session_id", "session_start", "session_end", "n_events"]]
        .astype(np.int64), exp.astype(np.int64))


def test_first_last_scan_spanning_keys(ray_session, frame):
    from webvalid.ops.keyscan import first_last_scan

    got = first_last_scan(_ds(frame, 20), "k", "o", "tb", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    s = _sorted(frame)
    exp_first = s.drop_duplicates("k", keep="first").set_index("k")["v"]
    exp_last = s.drop_duplicates("k", keep="last").set_index("k")["v"]
    assert len(got) == frame["k"].nunique()
    for _, r in got.iterrows():
        ef, el = exp_first[r["k"]], exp_last[r["k"]]
        assert (pd.isna(r["first_value"]) and pd.isna(ef)) or \
            r["first_value"] == ef
        assert (pd.isna(r["last_value"]) and pd.isna(el)) or \
            r["last_value"] == el


def test_interval_coverage_scan_islands_across_blocks(ray_session):
    import duckdb

    from webvalid.ops.keyscan import interval_coverage_scan

    rng = np.random.default_rng(21)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 3, n),                       # long per-key runs
        "s": np.sort(rng.integers(0, 3000, n)).astype(np.int64),
        "tb": np.arange(n, dtype=np.int64),
    })
    got = interval_coverage_scan(_ds(df, 25), "k", "s", 40, tiebreak="tb") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    exp = duckdb.connect().execute("""
        WITH iv AS (SELECT k, s, s + 40 AS e FROM df),
        m AS (SELECT k, s, e, MAX(e) OVER (PARTITION BY k ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) pmax FROM iv),
        g AS (SELECT k, s, e, SUM(CASE WHEN pmax IS NULL OR s > pmax
              THEN 1 ELSE 0 END) OVER (PARTITION BY k ORDER BY s, e) grp
              FROM m),
        isl AS (SELECT k, grp, MIN(s) s0, MAX(e) e1 FROM g GROUP BY k, grp)
        SELECT k, SUM(e1 - s0) covered_us, COUNT(*) n_intervals
        FROM isl GROUP BY k ORDER BY k""").df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_keyscan_one_key_spans_every_block(ray_session):
    """A single key across ALL blocks: the pure chain path."""
    from webvalid.ops.keyscan import (cumsum_scan, rolling_agg_scan,
                                      sessionize_scan)

    n = 300
    df = pd.DataFrame({"k": np.zeros(n, dtype=np.int64),
                       "o": np.arange(n, dtype=np.int64),
                       "tb": np.arange(n, dtype=np.int64),
                       "v": np.arange(n, dtype=np.float64)})
    got = cumsum_scan(_ds(df, 30), "k", "o", "tb", "v") \
        .to_pandas().sort_values("o").reset_index(drop=True)
    exp = np.cumsum(df["v"].to_numpy())
    assert np.allclose(got["cum_sum"], exp, atol=1e-9)

    got = rolling_agg_scan(_ds(df, 30), "k", "o", "tb", "v", 5,
                           {"rs": "sum"}).to_pandas() \
        .sort_values("o").reset_index(drop=True)
    exp = pd.Series(df["v"]).rolling(5, min_periods=1).sum().to_numpy()
    assert np.allclose(got["rs"], exp, atol=1e-9)

    import ray.data
    sdf = pd.DataFrame({"u": np.zeros(n, dtype=np.int64),
                        "ts": (np.arange(n, dtype=np.int64) * 10),
                        "eid": np.arange(n, dtype=np.int64)})
    ds = ray.data.from_pandas(sdf).repartition(30)
    out = sessionize_scan(ds, "u", "ts", gap_us=9, tiebreak="eid").to_pandas()
    # every gap is 10 > 9 → n sessions of 1 event each
    assert len(out) == n and (out["n_events"] == 1).all()
    assert sorted(out["session_id"]) == list(range(n))


def test_keyscan_singleton_keys(ray_session):
    """Every key has exactly one row — all runs are length-1."""
    from webvalid.ops.keyscan import first_last_scan, lag_scan

    n = 120
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                       "o": np.zeros(n, dtype=np.int64),
                       "tb": np.arange(n, dtype=np.int64),
                       "v": np.arange(n, dtype=np.float64)})
    got = lag_scan(_ds(df, 10), "k", "o", "tb", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert got["lagged"].isna().all()
    fl = first_last_scan(_ds(df, 10), "k", "o", "tb", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert len(fl) == n
    assert (fl["first_value"] == fl["last_value"]).all()


def test_keyscan_rejects_null_keys(ray_session):
    from webvalid.ops.keyscan import rolling_agg_scan

    df = pd.DataFrame({"k": [1.0, 2.0, np.nan, 3.0],
                       "o": np.arange(4, dtype=np.int64),
                       "tb": np.arange(4, dtype=np.int64),
                       "v": [1.0, 2.0, 3.0, 4.0]})
    with pytest.raises(Exception, match="null/NaN"):
        rolling_agg_scan(_ds(df, 2), "k", "o", "tb", "v", 2,
                         {"rm": "mean"}).to_pandas()


def test_range_sum_overflow_fallback_matches_vectorized(ray_session):
    """Orders near int64 scale force the per-run fallback (the
    monotonic lift would overflow); results must match DuckDB."""
    import duckdb

    from webvalid.ops.keyscan import rolling_range_sum_scan

    rng = np.random.default_rng(31)
    HUGE = 2_000_000_000_000_000_000  # 2e18 — extents sum past 2^62
    df = pd.DataFrame({
        "k": rng.integers(0, 3, 90),
        "o": rng.integers(0, HUGE, 90).astype(np.int64),
        "tb": np.arange(90, dtype=np.int64),
        "v": np.round(rng.normal(5, 2, 90), 2),
    })
    got = rolling_range_sum_scan(_ds(df, 5), "k", "o", "tb", "v",
                                 span=HUGE // 2) \
        .to_pandas().sort_values("tb").reset_index(drop=True)
    exp = duckdb.connect().execute(f"""
        SELECT tb, ROUND(SUM(v) OVER (PARTITION BY k ORDER BY o
                    RANGE BETWEEN {HUGE // 2} PRECEDING AND CURRENT ROW)
                    + 1e-9, 6) AS range_sum
        FROM df ORDER BY tb""").df()
    assert np.allclose(got["range_sum"], exp["range_sum"], atol=1e-9)


def test_interval_coverage_overflow_fallback(ray_session):
    from webvalid.ops.keyscan import interval_coverage_scan

    HUGE = 2_000_000_000_000_000_000
    df = pd.DataFrame({
        "k": np.repeat(np.arange(4, dtype=np.int64), 10),
        "s": np.tile(np.arange(10, dtype=np.int64) * (HUGE // 8), 4),
        "tb": np.arange(40, dtype=np.int64),
    })
    got = interval_coverage_scan(_ds(df, 4), "k", "s", HUGE // 4,
                                 tiebreak="tb").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    # dur = HUGE/4, gap between starts = HUGE/8 < dur → one island/key
    assert (got["n_intervals"] == 1).all()
    assert (got["covered_us"] == 9 * (HUGE // 8) + HUGE // 4).all()


def test_overflow_guards_computed_pre_wrap(ray_session):
    """Order extents PAST int64 (span ~2^63): the old guards computed
    the lift quantities in int64 first, so they either wrapped (passing
    the guard with a corrupted remap) or raised OverflowError instead
    of taking the documented exact per-run fallback (ADVICE r3). The
    guard math now runs in Python ints / float64 before any int64
    array is built."""
    import duckdb

    from webvalid.ops.keyscan import (interval_coverage_scan,
                                      rolling_range_sum_scan)

    LO, HI = -(2 ** 62), 2 ** 62  # run extent 2^63: wraps int64 subtract
    df = pd.DataFrame({
        "k": np.repeat(np.arange(3, dtype=np.int64), 4),
        "o": np.tile(np.array([LO, LO + 5, HI - 5, HI], np.int64), 3),
        "tb": np.arange(12, dtype=np.int64),
        "v": np.arange(12, dtype=np.float64),
    })
    got = rolling_range_sum_scan(_ds(df, 4), "k", "o", "tb", "v", span=10) \
        .to_pandas().sort_values("tb").reset_index(drop=True)
    exp = duckdb.connect().execute("""
        SELECT tb, SUM(v) OVER (PARTITION BY k ORDER BY o
                    RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS range_sum
        FROM df ORDER BY tb""").df()
    assert np.allclose(got["range_sum"], exp["range_sum"])

    # interval coverage: e = s + dur wraps int64; np.int64(off) would
    # raise OverflowError before the fallback could run
    df2 = pd.DataFrame({
        "k": np.repeat(np.arange(2, dtype=np.int64), 2),
        "s": np.tile(np.array([LO, HI - (2 ** 61)], np.int64), 2),
        "tb": np.arange(4, dtype=np.int64),
    })
    cov = interval_coverage_scan(_ds(df2, 2), "k", "s", 2 ** 61,
                                 tiebreak="tb").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert (cov["n_intervals"] == 2).all()
    assert (cov["covered_us"] == 2 * 2 ** 61).all()


def test_per_key_scan_rejects_null_order_column(ray_session):
    """Nulls in the order/tiebreak columns (not just the key) must be
    rejected loudly: a null in a block-head row enters the pickled head
    tuple and desyncs the driver-side block ordering (ADVICE r3)."""
    import pytest

    from webvalid.ops.keyscan import rolling_agg_scan

    df = pd.DataFrame({
        "k": np.arange(20, dtype=np.int64) % 3,
        "o": [None if i == 7 else i for i in range(20)],
        "tb": np.arange(20, dtype=np.int64),
        "v": np.arange(20, dtype=np.float64),
    })
    # Ray wraps the worker's ValueError in RayTaskError — match message
    with pytest.raises(Exception, match="null/NaN values in sort column"):
        rolling_agg_scan(_ds(df, 4), "k", "o", "tb", "v", 3,
                         {"rm": "mean"}).to_pandas()


def test_funnel_equal_ts_b_before_a_across_blocks(ray_session):
    """to_type < from_type lexicographically puts equal-ts B events
    BEFORE the A events they convert (horizon is inclusive of ts); a
    block boundary between them must not lose the conversion — the
    review repro: 10 blocks, from='b', to='a', horizon=0."""
    from webvalid.ops.funnel import funnel_conversion

    rng = np.random.default_rng(99)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 6, n),
        "ts": rng.integers(0, 300, n).astype(np.int64),  # heavy ties
        "typ": rng.choice(["a", "b"], n),
        "uid": np.arange(n, dtype=np.int64),
    })
    for horizon in (0, 20):
        got = funnel_conversion(_ds(df, 10), key="k", ts_col="ts",
                                type_col="typ", from_type="b", to_type="a",
                                horizon=horizon, tiebreak="uid")
        for k, g in df.groupby("k"):
            a = g.loc[g.typ == "b", "ts"].to_numpy()
            b = np.sort(g.loc[g.typ == "a", "ts"].to_numpy())
            if len(a) == 0:
                assert k not in set(got["k"])
                continue
            exp = sum(bool(((b >= t) & (b <= t + horizon)).any()) for t in a)
            row = got[got["k"] == k].iloc[0]
            assert row["n_from"] == len(a), (horizon, k)
            assert row["n_conversions"] == exp, (horizon, k)


def test_funnel_no_from_events_returns_empty(ray_session):
    from webvalid.ops.funnel import funnel_conversion

    df = pd.DataFrame({"k": [1, 1, 2, 2], "ts": [1, 2, 3, 4],
                       "typ": ["b", "b", "b", "b"],
                       "uid": np.arange(4, dtype=np.int64)})
    out = funnel_conversion(_ds(df, 2), key="k", ts_col="ts",
                            type_col="typ", from_type="a", to_type="b",
                            horizon=10, tiebreak="uid")
    assert len(out) == 0
    assert list(out.columns) == ["k", "n_from", "n_conversions"]


def test_funnel_extreme_ts_magnitudes_exact(ray_session):
    """Order extents near int64 extremes must not wrap the monotonic
    remap (the guard must run in the float domain BEFORE any int64
    lift) and the fallback's window compare must stay exact."""
    import ray.data

    from webvalid.ops.funnel import funnel_conversion

    lo, hi = -(1 << 62), (1 << 62)
    rows = []
    for key, base in (("u1", lo), ("u2", hi - 10)):
        rows += [
            {"user_id": key, "ts_us": base, "event_type": "click",
             "event_id": f"{key}-a"},
            {"user_id": key, "ts_us": base + 5, "event_type": "purchase",
             "event_id": f"{key}-b"},
        ]
    # one key spanning BOTH extremes: its own extent wraps int64
    rows += [
        {"user_id": "u3", "ts_us": lo, "event_type": "click",
         "event_id": "u3-a1"},
        {"user_id": "u3", "ts_us": lo + 5, "event_type": "purchase",
         "event_id": "u3-b1"},
        {"user_id": "u3", "ts_us": hi - 10, "event_type": "click",
         "event_id": "u3-a2"},
        {"user_id": "u3", "ts_us": hi - 5, "event_type": "purchase",
         "event_id": "u3-b2"},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
    out = funnel_conversion(ds, key="user_id", ts_col="ts_us",
                            type_col="event_type", from_type="click",
                            to_type="purchase", horizon=10,
                            tiebreak="event_id")
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    out = out.set_index("user_id")
    assert out.loc["u1", "n_conversions"] == 1
    assert out.loc["u2", "n_conversions"] == 1
    assert out.loc["u3", "n_from"] == 2
    assert out.loc["u3", "n_conversions"] == 2


def test_event_time_ops_negative_epochs_match_duckdb(ray_session):
    """Pre-1970 timestamps: day/bucket arithmetic must match DuckDB's
    TRUNC integer division (numpy floor shifts negatives one unit
    down), and sliding windows must agree with the oracle's
    grid+predicate construction."""
    import ray.data

    duckdb = pytest.importorskip("duckdb")
    from webvalid.ops.retention import new_users_daily
    from webvalid.ops.windows import windowed_distinct

    HOUR = 3_600_000_000
    DAY = 86_400_000_000
    rows = pd.DataFrame({
        "user_id": [1, 2, 3, 3],
        "ts_us": [-1_000_000, 1_000_000, -2 * DAY - 5, DAY + 5],
    })
    rows["ts"] = pd.to_datetime(rows["ts_us"], unit="us")
    ds = ray.data.from_pandas(rows).repartition(2)

    got = new_users_daily(ds, key="user_id", ts_col="ts")
    exp = duckdb.sql("""
        WITH f AS (SELECT user_id,
                          MIN(epoch_us(ts) // 86400000000) AS day
                   FROM rows GROUP BY user_id)
        SELECT day, COUNT(*) AS n_new FROM f GROUP BY day ORDER BY day
    """).df()
    assert got["day"].tolist() == exp["day"].tolist()
    assert got["n_new"].tolist() == exp["n_new"].tolist()

    got_w = windowed_distinct(ds, ts_col="ts", id_col="user_id",
                              bucket_us=HOUR, n_buckets=3)
    exp_w = duckdb.sql("""
        WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hb, user_id
                   FROM rows),
        hours AS (SELECT DISTINCT hb FROM e)
        SELECT h.hb * 3600000000 AS window_end,
               COUNT(DISTINCT e.user_id) AS n_ids
        FROM hours h JOIN e ON e.hb BETWEEN h.hb - 2 AND h.hb
        GROUP BY 1 ORDER BY 1
    """).df()
    assert got_w["window_end"].tolist() == exp_w["window_end"].tolist()
    assert got_w["n_ids"].tolist() == exp_w["n_ids"].tolist()


def test_cumsum_scan_null_values_sql_semantics(ray_session):
    """SUM(value) OVER ignores NULLs: a NULL row shows the running sum
    of prior non-nulls; leading NULLs (empty frame) stay NULL —
    including across block boundaries."""
    import ray.data

    from webvalid.ops.keyscan import cumsum_scan

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 3,
        "o": [1, 2, 3, 4, 1, 2, 3],
        "tb": list(range(7)),
        "v": [1.0, np.nan, 2.0, np.nan, np.nan, np.nan, 5.0],
    })
    got = cumsum_scan(ray.data.from_pandas(df).repartition(4),
                      "k", "o", "tb", "v").to_pandas() \
        .sort_values("tb")["cum_sum"].tolist()
    exp = [1.0, 1.0, 3.0, 3.0, np.nan, np.nan, 5.0]
    for g, e in zip(got, exp):
        if np.isnan(e):
            assert np.isnan(g)
        else:
            assert g == pytest.approx(e)


def test_retention_empty_and_null_user(ray_session):
    """Empty datasets return empty results (Ray drops columns on
    all-empty blocks); a NULL user id is its own user per SQL."""
    import ray.data

    from webvalid.ops.retention import new_users_daily, retention_matrix

    schema_df = pd.DataFrame({"user_id": pd.Series([], dtype="float64"),
                              "ts": pd.Series([], dtype="datetime64[us]")})
    empty = ray.data.from_pandas(schema_df)
    assert len(new_users_daily(empty, "user_id", "ts")) == 0
    assert len(retention_matrix(empty, "user_id", "ts")) == 0

    df = pd.DataFrame({
        "user_id": [1.0, np.nan, np.nan],
        "ts": pd.to_datetime([0, 0, 86_400_000_000], unit="us"),
    })
    ds = ray.data.from_pandas(df).repartition(2)
    out = new_users_daily(ds, "user_id", "ts")
    # two users (1.0 and the NULL user), both first seen day 0
    assert out["n_new"].tolist() == [2]
    mat = retention_matrix(ds, "user_id", "ts")
    # NULL user active at offsets 0 and 1
    assert mat.set_index(["cohort_day", "day_offset"])["n_users"] \
        .to_dict() == {(0, 0): 2, (0, 1): 1}
