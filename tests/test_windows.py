"""Windowed-aggregation ops vs pandas ground truth."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

HOUR = 3_600_000_000


@pytest.fixture(scope="module")
def events(ray_session):
    import ray.data

    rng = np.random.default_rng(17)
    n = 5_000
    ts = np.sort(rng.integers(0, 48 * HOUR, size=n))
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": rng.integers(0, 40, size=n),
            "value": rng.random(n).round(3),
            "event_type": rng.choice(["a", "b", "c"], size=n),
        }
    )
    return ray.data.from_pandas(df), df


def test_tumbling_matches_pandas(events):
    from webvalid.ops.windows import tumbling_aggregate

    ds, df = events
    got = tumbling_aggregate(
        ds, "ts", HOUR, ["event_type"],
        {"cnt": ("event_type", "count"), "min_value": ("value", "min")},
    ).sort_values(["window_start", "event_type"]).reset_index(drop=True)

    exp = df.copy()
    ts_us = exp["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    exp["window_start"] = (ts_us // HOUR) * HOUR
    exp = (
        exp.groupby(["window_start", "event_type"], as_index=False)
        .agg(cnt=("value", "size"), min_value=("value", "min"))
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["window_start", "event_type", "cnt", "min_value"]], exp, check_dtype=False
    )


def test_sliding_window_counts(events):
    from webvalid.ops.windows import sliding_aggregate

    ds, df = events
    got = sliding_aggregate(
        ds, "ts", 2 * HOUR, HOUR, [], {"cnt": ("ts", "count")}
    ).sort_values("window_start").reset_index(drop=True)

    ts_us = pd.Series(df["ts"].to_numpy().astype("datetime64[us]").astype("int64"))
    # every event lands in exactly 2 windows (size/step = 2)
    assert got["cnt"].sum() == 2 * len(df)
    # spot-check one window: [w, w + 2h)
    w = int(got["window_start"].iloc[3])
    expected = int(((ts_us >= w) & (ts_us < w + 2 * HOUR)).sum())
    assert int(got[got["window_start"] == w]["cnt"].iloc[0]) == expected


def test_sessionize(ray_session):
    import ray.data

    from webvalid.ops.windows import sessionize

    rows = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                [0, 10, 20, 200, 5, 400], unit="m"
            ),
        }
    )
    ds = ray.data.from_pandas(rows)
    out = sessionize(ds, "user_id", "ts", gap_us=60 * 60_000_000).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_id")
    u2 = out[out["user_id"] == 2].sort_values("session_id")
    assert list(u1["n_events"]) == [3, 1]  # 0/10/20 then 200 after >60m gap
    assert list(u2["n_events"]) == [1, 1]


def test_rolling_mean_per_key_matches_pandas(ray_session):
    import random

    import pandas as pd
    import ray.data

    from webvalid.ops.rank import rolling_mean_per_key

    rng = random.Random(6)
    rows = [{"event_id": i, "user_id": rng.randrange(20),
             "ts_us": rng.randrange(10_000), "value": rng.random() * 100}
            for i in range(1500)]
    ds = ray.data.from_items(rows).repartition(5)
    got = rolling_mean_per_key(ds, key="user_id", order_col="ts_us",
                               value_col="value", window=3, tiebreak="event_id")
    got = got.to_pandas().sort_values("event_id").reset_index(drop=True)

    pdf = pd.DataFrame(rows).sort_values(["user_id", "ts_us", "event_id"])
    pdf["expect"] = (
        pdf.groupby("user_id")["value"].transform(
            lambda s: s.rolling(3, min_periods=1).mean())
    )
    expect = pdf.sort_values("event_id").reset_index(drop=True)["expect"]
    assert (got["rolling_avg"] - expect).abs().max() < 1e-9
