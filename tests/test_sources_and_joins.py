"""CSV compat source (KDD-shaped) end-to-end parity + salted join tests."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests import oracle
from tests.test_drift_parity import drifting_rows


@pytest.fixture(scope="module")
def csv_stream(tmp_path_factory):
    """Headerless categorical CSV with planted shifts (reference input shape)."""
    rows = drifting_rows(3, n_blocks=8, block_size=200, m=4, shift_at=(5,))
    path = tmp_path_factory.mktemp("csv") / "stream.csv"
    with open(path, "w") as f:
        for r in rows:
            f.write(",".join(r) + "\n")
    return str(path), rows


def test_csv_detectors_match_oracle(ray_session, csv_stream):
    """Full Main.java-equivalent run over CSV == naive oracle, both detectors."""
    from webvalid.sources import csv_drift_segments

    path, rows = csv_stream
    got = csv_drift_segments(path, block_size=200)
    assert got["cdcstream"] == oracle.cdcstream_run(rows, 200, 3.0)
    assert got["cdda"] == oracle.cdda_run(rows, 200, 0.1)


def test_csv_reader_types_and_order(ray_session, csv_stream):
    from webvalid.sources import read_categorical_csv

    path, rows = csv_stream
    ds = read_categorical_csv(path)
    schema = ds.schema()
    assert schema.names[:4] == ["c0", "c1", "c2", "c3"]
    df = ds.to_pandas().sort_values("row_index")
    assert len(df) == len(rows)
    # all-string contract: numeric-looking tokens stay strings
    assert df["c0"].map(type).eq(str).all()
    assert tuple(df.iloc[0][:4]) == rows[0]


def test_salted_anti_join(ray_session):
    import ray.data

    from webvalid.ops.joins import salted_anti_join

    rng = random.Random(4)
    valid_keys = [f"k{i}" for i in range(100)]
    right = pa.table({"key": pa.array(valid_keys, pa.string()),
                      "payload": pa.array(range(100), pa.int64())})
    left_keys = [rng.choice(valid_keys) for _ in range(500)] + ["orphan1", "orphan2"] * 3
    left = ray.data.from_pandas(pd.DataFrame({"key": left_keys,
                                              "val": range(len(left_keys))}))
    out = salted_anti_join(left, right, "key", num_buckets=8).to_pandas()
    assert set(out["key"]) == {"orphan1", "orphan2"} and len(out) == 6


def test_salted_anti_join_with_hot_keys(ray_session):
    import ray.data

    from webvalid.ops.joins import salted_anti_join

    right = pa.table({"key": pa.array(["hot", "cold"], pa.string())})
    left_keys = ["hot"] * 400 + ["cold"] * 5 + ["missing"] * 7
    left = ray.data.from_pandas(pd.DataFrame({"key": left_keys}))
    out = salted_anti_join(left, right, "key", num_buckets=4,
                           hot_keys={"hot"}, n_salts=3).to_pandas()
    assert list(out["key"].unique()) == ["missing"] and len(out) == 7


def test_salted_inner_join(ray_session):
    import ray.data

    from webvalid.ops.joins import salted_inner_join

    right = pa.table({"key": pa.array([f"k{i}" for i in range(50)], pa.string()),
                      "payload": pa.array(range(50), pa.int64())})
    left = ray.data.from_pandas(
        pd.DataFrame({"key": [f"k{i % 60}" for i in range(300)], "v": range(300)})
    )
    out = salted_inner_join(left, right, "key", num_buckets=8).to_pandas()
    # keys k50..k59 have no right match → dropped
    expected = sum(1 for i in range(300) if i % 60 < 50)
    assert len(out) == expected
    assert (out["payload"] == out["key"].str[1:].astype(int)).all()


def test_salted_inner_join_hot_keys(ray_session):
    import ray.data

    from webvalid.ops.joins import salted_inner_join

    right = pa.table({"key": pa.array(["en", "de"], pa.string()),
                      "name": pa.array(["english", "german"], pa.string())})
    left = ray.data.from_pandas(
        pd.DataFrame({"key": ["en"] * 200 + ["de"] * 10 + ["xx"] * 5})
    )
    out = salted_inner_join(left, right, "key", num_buckets=4,
                            hot_keys={"en"}, n_salts=4).to_pandas()
    assert len(out) == 210  # xx dropped, no duplicate matches from salting
    assert (out[out["key"] == "en"]["name"] == "english").all()


def test_ray_native_join_matches_salted(ray_session):
    """Dataset.join (hash shuffle) == salted bucketed join on the same
    inputs."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from webvalid.ops.joins import ray_native_inner_join, salted_inner_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame({"k": rng.integers(0, 50, size=400), "lv": np.arange(400)})
    right = pd.DataFrame({"k": np.arange(0, 60, 2), "rv": np.arange(30)})
    native = ray_native_inner_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right.rename(columns={"k": "rk"})),
        on="k", right_on="rk", num_partitions=4,
    ).to_pandas()
    salted = salted_inner_join(
        ray.data.from_pandas(left), pa.Table.from_pandas(right), key="k",
        num_buckets=8,
    ).to_pandas()
    key = lambda df: sorted(zip(df["k"], df["lv"], df["rv"]))
    assert key(native) == key(salted)
    exp = left.merge(right, on="k")
    assert len(native) == len(exp)


def test_asof_partitioned_matches_broadcast(ray_session):
    """The co-partitioned as-of path must equal the broadcast path."""
    import random

    import pandas as pd
    import ray.data

    from webvalid.ops.asof import asof_join_broadcast, asof_join_partitioned

    rng = random.Random(13)
    left_rows = [{"id": i, "ts": rng.randrange(0, 10_000), "k": rng.randrange(40)}
                 for i in range(2000)]
    right_rows = [{"ts": rng.randrange(0, 10_000), "k": rng.randrange(40),
                   "val": float(i)} for i in range(600)]
    left = ray.data.from_items(left_rows).repartition(5)
    right = ray.data.from_items(right_rows).repartition(3)

    bcast = asof_join_broadcast(
        left, pd.DataFrame(right_rows), on="ts", by="k"
    ).to_pandas().sort_values(["id"]).reset_index(drop=True)
    part = asof_join_partitioned(
        left, right, on="ts", by="k", num_buckets=7
    ).to_pandas().sort_values(["id"]).reset_index(drop=True)
    cols = ["id", "ts", "k", "val"]
    pd.testing.assert_frame_equal(bcast[cols], part[cols], check_dtype=False)


def test_asof_partitioned_preserves_int_dtypes(ray_session):
    """The co-partitioned path unions both sides onto one null-filled
    schema; a pandas co-group would upcast null-bearing int64 columns to
    float64 (CORRECTNESS_r03's one red row: click_id came back 5.0 vs
    the oracle's 5). Both paths must emit the ORIGINAL Arrow types, and
    unmatched left rows get proper nulls, not NaN."""
    import pandas as pd
    import ray.data

    from webvalid.ops.asof import asof_join_broadcast, asof_join_partitioned

    left_rows = [{"click_id": i, "user_id": i % 4, "ts": 100 + i}
                 for i in range(40)]
    # user 3 has no right rows at all -> its matches are null
    right_rows = [{"ts": 50 + 7 * j, "user_id": j % 3, "purchase_id": 1000 + j}
                  for j in range(9)]
    left = ray.data.from_items(left_rows).repartition(3)
    right = ray.data.from_items(right_rows).repartition(2)

    part = asof_join_partitioned(left, right, on="ts", by="user_id",
                                 num_buckets=5)
    psch = dict(zip(part.schema().names, part.schema().types))
    assert str(psch["click_id"]) == "int64"
    assert str(psch["user_id"]) == "int64"
    assert str(psch["purchase_id"]) == "int64"
    ppdf = part.to_pandas().sort_values("click_id").reset_index(drop=True)
    bpdf = asof_join_broadcast(
        left, pd.DataFrame(right_rows), on="ts", by="user_id"
    ).to_pandas().sort_values("click_id").reset_index(drop=True)
    assert str(ppdf["click_id"].dtype) == str(bpdf["click_id"].dtype) == "int64"
    # unmatched rows: purchase_id is null (nullable Int64 in pandas), no NaN
    unmatched = ppdf[ppdf["user_id"] == 3]
    assert len(unmatched) > 0 and unmatched["purchase_id"].isna().all()
    assert ppdf["purchase_id"].equals(
        bpdf["purchase_id"].astype(ppdf["purchase_id"].dtype))


def test_asof_partitioned_nullable_int_keys(ray_session):
    """A batch containing any null `by` key materializes int64 as
    float64+NaN; hashing that raw would route the SAME key value to a
    different bucket than on an all-int64 batch — silently dropping
    matches (ADVICE r3). bucket_of canonicalizes first."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from webvalid.ops.asof import asof_join_broadcast, asof_join_partitioned

    # left block 1 is all-int64 keys; block 2 has a null key alongside
    # key 7 -> that block's key column is float64+NaN in numpy terms
    l1 = pa.table({"id": [1, 2], "k": pa.array([7, 8], pa.int64()),
                   "ts": [100, 100]})
    l2 = pa.table({"id": [3, 4], "k": pa.array([7, None], pa.int64()),
                   "ts": [200, 200]})
    right_rows = [{"k": 7, "ts": 50, "val": 70}, {"k": 8, "ts": 60, "val": 80}]
    left = ray.data.from_arrow([l1, l2])
    right = ray.data.from_items(right_rows)

    part = asof_join_partitioned(left, right, on="ts", by="k",
                                 num_buckets=4).to_pandas()
    part = part.sort_values("id").reset_index(drop=True)
    bcast = asof_join_broadcast(left, pd.DataFrame(right_rows),
                                on="ts", by="k").to_pandas()
    bcast = bcast.sort_values("id").reset_index(drop=True)
    # key 7 on BOTH blocks must match val=70 — same bucket either way
    assert part.loc[part["id"] == 1, "val"].iloc[0] == 70
    assert part.loc[part["id"] == 3, "val"].iloc[0] == 70
    assert part.loc[part["id"] == 2, "val"].iloc[0] == 80
    assert part["val"].isna().tolist() == bcast["val"].isna().tolist()


def test_asof_tie_break_is_block_order_independent(ray_session):
    """Equal-(key, ts) right rows must resolve to the SAME match no
    matter how the right side's rows are ordered/partitioned (Ray's
    union block order varies across sessions — CORRECTNESS_r02's one
    hash mismatch). The winner is the max tiebreak-column row."""
    import pandas as pd
    import ray.data

    from webvalid.ops.asof import asof_join_broadcast, asof_join_partitioned

    left_rows = [{"id": i, "ts": 100 + 10 * (i % 5), "k": i % 3} for i in range(60)]
    # many exact (k, ts) ties on the right, distinguished only by rid
    right_rows = [{"ts": 100 + 10 * (j % 5), "k": j % 3, "rid": j}
                  for j in range(45)]
    left = ray.data.from_items(left_rows).repartition(4)

    outs = []
    for perm_seed in (1, 2, 3):
        import random
        shuffled = list(right_rows)
        random.Random(perm_seed).shuffle(shuffled)
        right = ray.data.from_items(shuffled).repartition(perm_seed + 2)
        part = asof_join_partitioned(
            left, right, on="ts", by="k", num_buckets=5
        ).to_pandas().sort_values("id").reset_index(drop=True)
        bcast = asof_join_broadcast(
            left, pd.DataFrame(shuffled), on="ts", by="k"
        ).to_pandas().sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            part[["id", "ts", "k", "rid"]], bcast[["id", "ts", "k", "rid"]],
            check_dtype=False)
        outs.append(part[["id", "ts", "k", "rid"]])
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    # winner among ties is the max rid for that (k, ts)
    exp = {(k, ts): max(r["rid"] for r in right_rows
                        if r["k"] == k and r["ts"] == ts)
           for k in range(3) for ts in {r["ts"] for r in right_rows}}
    for _, row in outs[0].iterrows():
        assert row["rid"] == exp[(row["k"], row["ts"])]


def test_asof_partitioned_normalizes_ns_timestamps(ray_session):
    """timestamp[ns] inputs must come out in epoch MICROseconds from
    both as-of paths (a raw int64 cast would be 1000x off)."""
    import pandas as pd
    import ray.data

    from webvalid.ops.asof import asof_join_broadcast, asof_join_partitioned

    left_pdf = pd.DataFrame({
        "id": [1, 2], "k": [7, 7],
        "ts": pd.to_datetime(["2024-01-01 00:00:10", "2024-01-01 00:00:20"]),
    })  # pandas default: timestamp[ns]
    right_pdf = pd.DataFrame({
        "k": [7], "ts": pd.to_datetime(["2024-01-01 00:00:05"]), "val": [1.5],
    })
    left = ray.data.from_pandas(left_pdf)
    right = ray.data.from_pandas(right_pdf)
    part = asof_join_partitioned(left, right, on="ts", by="k").to_pandas()
    bcast = asof_join_broadcast(left, right_pdf, on="ts", by="k").to_pandas()
    part = part.sort_values("id").reset_index(drop=True)
    bcast = bcast.sort_values("id").reset_index(drop=True)
    assert part["ts"].tolist() == bcast["ts"].tolist()
    epoch_us = pd.Timestamp("2024-01-01 00:00:10").value // 1000
    assert part["ts"].iloc[0] == epoch_us
    assert part["val"].tolist() == [1.5, 1.5]


def test_salted_anti_join_tolerates_null_keys(ray_session):
    """Null keys on either side must not crash the vectorized bucket
    membership; a null left key is always a miss (matches nothing)."""
    import pyarrow as pa
    import ray.data

    from webvalid.ops.joins import salted_anti_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", None, "b", "zz", None], pa.string()),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    }))
    right = pa.table({"k": pa.array(["a", "b", None], pa.string())})
    out = salted_anti_join(left, right, key="k").to_pandas()
    assert sorted(out["v"]) == [2, 4, 5]  # nulls + unmatched key miss


def test_bloom_anti_join_one_sided_guarantee(ray_session):
    """bloom_anti_join finds ONLY real misses (never invents a
    violation) and recovers planted orphans unless a deterministic
    false positive hides them."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webvalid.ops.joins import bloom_anti_join, salted_anti_join

    ref_keys = np.asarray([f"user{i}" for i in range(5000)], dtype=object)
    rows = [{"k": f"user{i % 5000}", "v": i} for i in range(20_000)]
    rows += [{"k": f"orphan{i}", "v": 100_000 + i} for i in range(50)]
    left = ray.data.from_items(rows).repartition(5)

    bloom = bloom_anti_join(left, ref_keys, key="k").to_pandas()
    exact = salted_anti_join(
        left, pa.table({"k": pa.array(ref_keys, pa.string())}), key="k"
    ).to_pandas()
    # one-sided: bloom's findings are a subset of the exact misses
    assert set(bloom["v"]) <= set(exact["v"])
    assert set(exact["v"]) == {100_000 + i for i in range(50)}
    # at 1% FPR over 50 orphans, expect ~all recovered (deterministic)
    assert len(bloom) >= 48


def test_bloom_anti_join_numeric_keys(ray_session):
    """hash64 hashes int64 vs object arrays differently — build and
    probe must canonicalize to the same dtype (previously every present
    numeric key was a 'definite miss', violating the one-sided
    guarantee)."""
    import pyarrow as pa
    import ray.data

    from webvalid.ops.joins import bloom_anti_join

    left = ray.data.from_pandas(
        pd.DataFrame({"k": np.arange(1, 9, dtype=np.int64)}))
    out = bloom_anti_join(left, pa.array(np.arange(1, 6), pa.int64()),
                          key="k").to_pandas()
    # keys 1..5 present (never flagged); 6..8 absent (always flagged)
    assert set(out["k"]) == {6, 7, 8}


def test_salted_joins_nullable_int_keys(ray_session):
    """A nullable int64 key column materializes as float64+NaN; bucket
    routing must stay consistent with the int64 build side, and NaN
    keys match nothing."""
    import pyarrow as pa
    import ray.data

    from webvalid.ops.joins import salted_anti_join

    left = ray.data.from_arrow(pa.table({
        "v": pa.array([1, 2, 3], pa.int64()),
        "k": pa.array([5, None, 7], pa.int64())}))
    right = pa.table({"k": pa.array([5, 7], pa.int64())})
    out = salted_anti_join(left, right, key="k").to_pandas()
    assert sorted(out["v"]) == [2]


def test_salted_inner_join_keeps_duplicate_right_keys(ray_session):
    """Hot-key salting must not collapse legitimate one-to-many right
    rows (the old replica dedup kept one row per key)."""
    import pyarrow as pa
    import ray.data

    from webvalid.ops.joins import salted_inner_join

    left = ray.data.from_items([{"k": "a"}, {"k": "b"}])
    right = pa.table({"k": pa.array(["a", "a", "b"]),
                      "p": pa.array([1, 2, 3])})
    out = salted_inner_join(left, right, key="k", num_buckets=2,
                            hot_keys={"b"}, n_salts=4).to_pandas()
    assert sorted(out["p"]) == [1, 2, 3]
    # null right keys must not crash the bucket path either
    right2 = pa.table({"k": pa.array(["a", None, "b"]),
                       "p": pa.array([1, 2, 3])})
    out2 = salted_inner_join(left, right2, key="k", num_buckets=1,
                             hot_keys={"a"}, n_salts=4).to_pandas()
    assert sorted(out2["p"]) == [1, 3]


def test_storage_join_rejects_bucket_count_mismatch(ray_session, tmp_path):
    import ray.data

    from webvalid.ops.joins import storage_partitioned_join, write_bucketed

    a = ray.data.from_items([{"k": i, "x": i} for i in range(50)])
    b = ray.data.from_items([{"k": i, "y": i} for i in range(50)])
    write_bucketed(a, "k", str(tmp_path / "l"), 8)
    write_bucketed(b, "k", str(tmp_path / "r"), 4)
    with pytest.raises(ValueError, match="bucket-count mismatch"):
        storage_partitioned_join(str(tmp_path / "l"), str(tmp_path / "r"), "k")


def test_storage_join_rejects_hash_scheme_mismatch(ray_session, tmp_path):
    """A layout bucketed under an older key-hash scheme routes equal
    keys to different bucket ids; the count cross-check can't see it
    (ADVICE r3) — the join must refuse versionless or cross-scheme
    layouts instead of silently dropping matches."""
    import json

    import ray.data

    from webvalid.ops.joins import storage_partitioned_join, write_bucketed

    a = ray.data.from_items([{"k": i, "x": i} for i in range(50)])
    b = ray.data.from_items([{"k": i, "y": i} for i in range(50)])
    write_bucketed(a, "k", str(tmp_path / "l"), 8)
    write_bucketed(b, "k", str(tmp_path / "r"), 8)
    # sanity: same-scheme layouts join fine
    out = storage_partitioned_join(str(tmp_path / "l"), str(tmp_path / "r"),
                                   "k").to_pandas()
    assert len(out) == 50
    # simulate a layout written by the pre-versioning engine
    meta_path = tmp_path / "r" / "_buckets.json"
    meta = json.loads(meta_path.read_text())
    del meta["hash_scheme"]
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="hash scheme"):
        storage_partitioned_join(str(tmp_path / "l"), str(tmp_path / "r"), "k")
    meta["hash_scheme"] = "v1-rawdtype"
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="hash scheme"):
        storage_partitioned_join(str(tmp_path / "l"), str(tmp_path / "r"), "k")


def test_bloom_anti_join_refuses_keys_beyond_2_53(ray_session):
    """Build keys at/past 2^53 are not exact in float64: distinct probe
    keys can round onto a present build key and real orphans read
    'present' deterministically (ADVICE r3) — refuse, don't degrade."""
    import ray.data

    from webvalid.ops.joins import bloom_anti_join

    left = ray.data.from_items([{"k": 1}, {"k": 2}])
    with pytest.raises(ValueError, match="2\\^53"):
        bloom_anti_join(left, np.array([5, (1 << 53) + 1], np.int64), "k")
    # below the contract bound everything still works
    out = bloom_anti_join(left, np.array([1], np.int64), "k").to_pandas()
    assert out["k"].tolist() == [2]
    # native-float build keys past 2^53 are exact (ADVICE r4: epoch-ns
    # float domains) — allowed, and float probes hash identically
    big = float(1 << 53)
    leftf = ray.data.from_items([{"k": big}, {"k": 3.0}])
    outf = bloom_anti_join(leftf, np.array([big], np.float64), "k") \
        .to_pandas()
    assert outf["k"].tolist() == [3.0]
    # ...but an INTEGER probe >= 2^53 against such a build rounds on
    # the float64 cast (2^53+1 -> 2^53 = a present key): a real orphan
    # would hide deterministically, so the probe must refuse
    lefti = ray.data.from_items([{"k": (1 << 53) + 1}])
    # (Ray wraps the in-task ValueError in RayTaskError/UserCodeException)
    with pytest.raises(Exception, match="probe keys at or beyond 2\\^53"):
        bloom_anti_join(lefti, np.array([big], np.float64), "k") \
            .materialize()
    # an int probe below 2^53 against the same float build stays safe
    lefts = ray.data.from_items([{"k": 7}])
    outs = bloom_anti_join(lefts, np.array([big], np.float64), "k") \
        .to_pandas()
    assert outs["k"].tolist() == [7]


def test_asof_big_int_keys_stay_exact(ray_session):
    """int64 by-keys at/past 2^53 must join EXACTLY when no nulls force
    a float cast (the r4 review repro: unconditional float64 canon
    matched 2^53+1 to 2^53's row and rewrote the key itself), and must
    raise loudly when a null-bearing side forces the cast."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from webvalid.ops.asof import asof_join_broadcast, asof_join_partitioned

    K = 1 << 53
    left_rows = [{"id": 1, "k": K, "ts": 100},
                 {"id": 2, "k": K + 1, "ts": 100}]
    right_rows = [{"k": K, "ts": 50, "val": 999}]
    left = ray.data.from_items(left_rows)
    bc = asof_join_broadcast(left, pd.DataFrame(right_rows), on="ts",
                             by="k").to_pandas().sort_values("id")
    assert bc["val"].tolist()[0] == 999
    assert pd.isna(bc["val"].tolist()[1])  # K+1 has NO right row
    assert bc["k"].tolist() == [K, K + 1]  # keys unrewritten
    pt = asof_join_partitioned(
        left, ray.data.from_items(right_rows), on="ts", by="k",
    ).to_pandas().sort_values("id")
    assert pt["val"].tolist()[0] == 999 and pd.isna(pt["val"].tolist()[1])
    assert pt["k"].tolist() == [K, K + 1]
    # a null key alongside big keys forces the float cast -> loud error
    lnull = ray.data.from_arrow(pa.table({
        "id": [1, 2], "k": pa.array([K + 1, None], pa.int64()),
        "ts": [100, 100]}))
    with pytest.raises(Exception, match="2\\^53"):
        asof_join_broadcast(lnull, pd.DataFrame(right_rows), on="ts",
                            by="k").to_pandas()


def test_asof_both_sides_null_bearing_big_keys_raise(ray_session):
    """When BOTH sides carry null int64 by-keys (both upcast to
    float64), the dtypes match and the cast guard can't fire — the
    provenance-based exactness check must still raise for keys at/past
    2^53 instead of silently matching a neighboring key (r4 review #2)."""
    import pyarrow as pa
    import ray.data

    from webvalid.ops.asof import asof_join_partitioned

    K = 1 << 53
    left = ray.data.from_arrow(pa.table({
        "id": [1, 2], "k": pa.array([K + 1, None], pa.int64()),
        "ts": [100, 100]}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([K, None], pa.int64()), "ts": [50, 60],
        "val": [7, 8]}))
    # num_buckets=1 forces the null rows into the same bucket as the
    # big keys — the upcast (and thus the hazard) only exists when they
    # co-locate; separate buckets join exactly in int64 and need no raise
    with pytest.raises(Exception, match="2\\^53"):
        asof_join_partitioned(left, right, on="ts", by="k",
                              num_buckets=1).to_pandas()
