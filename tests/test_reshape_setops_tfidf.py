"""Tests for session-3 operator families: left/semi join variants,
pivot/unpivot, set ops, lag/cumsum/global row number, TF-IDF."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(ray_session, df: pd.DataFrame, blocks: int = 3):
    import ray.data

    return ray.data.from_pandas(df).repartition(blocks)


@pytest.fixture(scope="module")
def left_right(ray_session):
    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": rng.integers(0, 40, 300),
        "x": rng.normal(size=300).round(4),
    })
    right = pa.table({
        "k": pa.array(np.arange(0, 40, 2)),          # evens only → misses
        "name": pa.array([f"n{v}" for v in range(0, 40, 2)]),
    })
    return _ds(ray_session, left), right, left


def test_salted_left_join_matches_pandas(left_right):
    from webvalid.ops.joins import salted_left_join

    left_ds, right, left = left_right
    got = salted_left_join(left_ds, right, key="k", num_buckets=4) \
        .to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
    exp = left.merge(right.to_pandas(), on="k", how="left") \
        .sort_values(["k", "x"]).reset_index(drop=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["name"].reset_index(drop=True),
                                   exp["name"].reset_index(drop=True))


def test_salted_semi_and_anti_partition_the_left(left_right):
    from webvalid.ops.joins import salted_anti_join, salted_semi_join

    left_ds, right, left = left_right
    semi = salted_semi_join(left_ds, right, key="k", num_buckets=4).to_pandas()
    anti = salted_anti_join(left_ds, right, key="k", num_buckets=4).to_pandas()
    member = set(right["k"].to_pylist())
    assert set(semi.columns) == {"k", "x"}  # no payload attaches
    assert (semi["k"].isin(member)).all()
    assert (~anti["k"].isin(member)).all()
    assert len(semi) + len(anti) == len(left)


def test_semi_join_hot_key_salting(ray_session):
    from webvalid.ops.joins import salted_semi_join

    left = pd.DataFrame({"k": [7] * 500 + [1, 2, 3]})
    right = pa.table({"k": pa.array([7, 3])})
    out = salted_semi_join(_ds(ray_session, left), right, key="k",
                          num_buckets=4, hot_keys={7}, n_salts=3).to_pandas()
    assert len(out) == 501  # all 500 hot rows + the one key-3 row


def test_pivot_table_matches_pandas(ray_session):
    from webvalid.ops.reshape import pivot_table

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 400),
        "p": rng.choice(["x", "y", "z"], 400),
        "v": rng.integers(1, 10, 400),
    })
    got = pivot_table(_ds(ray_session, df), index=["g"], pivot_col="p",
                      value_col="v", how="sum")
    exp = df.pivot_table(index="g", columns="p", values="v",
                         aggfunc="sum", fill_value=0).astype("int64")
    exp.columns = [str(c) for c in exp.columns]
    exp = exp.reset_index().sort_values("g").reset_index(drop=True)
    exp.columns.name = None
    pd.testing.assert_frame_equal(got, exp, check_names=False)


def test_pivot_count_fills_missing_cells(ray_session):
    from webvalid.ops.reshape import pivot_table

    df = pd.DataFrame({"g": ["a", "a", "b"], "p": ["x", "y", "x"]})
    got = pivot_table(_ds(ray_session, df, blocks=2), index=["g"],
                      pivot_col="p", how="count")
    assert got.loc[got["g"] == "b", "y"].iloc[0] == 0
    assert got.loc[got["g"] == "a", "x"].iloc[0] == 1


def test_unpivot_roundtrip_counts(ray_session):
    from webvalid.ops.reshape import unpivot

    df = pd.DataFrame({"id": [1, 2, 3], "m1": [1.0, 2.0, 3.0],
                       "m2": [4.0, 5.0, 6.0]})
    out = unpivot(_ds(ray_session, df, blocks=2), id_cols=["id"],
                  value_cols=["m1", "m2"]).to_pandas()
    assert len(out) == 6
    assert set(out["measure"]) == {"m1", "m2"}
    got = out[out["measure"] == "m2"].sort_values("id")["val"].tolist()
    assert got == [4.0, 5.0, 6.0]


def test_set_ops_strategies_agree_and_match_numpy(ray_session):
    from webvalid.ops.setops import set_op_keys

    rng = np.random.default_rng(9)
    a = pd.DataFrame({"k": rng.integers(0, 60, 200)})
    b = pd.DataFrame({"k": rng.integers(30, 90, 200)})
    a_ds, b_ds = _ds(ray_session, a), _ds(ray_session, b)
    for op, npfn in [("except", np.setdiff1d), ("intersect", np.intersect1d)]:
        drv = set_op_keys(a_ds, b_ds, "k", op=op, strategy="driver")
        shf = set_op_keys(a_ds, b_ds, "k", op=op, strategy="shuffle")
        exp = npfn(a["k"].unique(), b["k"].unique())
        assert drv["k"].tolist() == sorted(exp.tolist())
        assert shf["k"].tolist() == sorted(exp.tolist())


def test_set_ops_drop_null_keys(ray_session):
    from webvalid.ops.setops import set_op_keys

    a = pd.DataFrame({"k": pd.array([1, 2, None, 3], dtype="Int64")})
    b = pd.DataFrame({"k": pd.array([2, None], dtype="Int64")})
    out = set_op_keys(_ds(ray_session, a, blocks=2),
                      _ds(ray_session, b, blocks=1), "k", op="except")
    assert out["k"].tolist() == [1, 3]


@pytest.fixture(scope="module")
def keyed_events(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "eid": np.arange(500),
        "u": rng.integers(0, 12, 500),
        "t": rng.integers(0, 10_000, 500),
        "v": rng.normal(size=500).round(3),
    })
    return _ds(ray_session, df, blocks=4), df


def test_lag_per_key_matches_pandas(keyed_events):
    from webvalid.ops.rank import lag_per_key

    ds, df = keyed_events
    got = lag_per_key(ds, key="u", order_col="t", value_col="v",
                      tiebreak="eid", n=1, out_col="lagged") \
        .to_pandas().sort_values("eid").reset_index(drop=True)
    exp = df.sort_values(["t", "eid"]).groupby("u")["v"].shift(1)
    exp = df.assign(lagged=exp).sort_values("eid").reset_index(drop=True)
    pd.testing.assert_series_equal(got["lagged"], exp["lagged"])


def test_cumsum_per_key_matches_pandas(keyed_events):
    from webvalid.ops.rank import cumsum_per_key

    ds, df = keyed_events
    got = cumsum_per_key(ds, key="u", order_col="t", value_col="v",
                         tiebreak="eid", out_col="cs") \
        .to_pandas().sort_values("eid").reset_index(drop=True)
    exp = df.sort_values(["t", "eid"]).groupby("u")["v"].cumsum()
    exp = df.assign(cs=exp).sort_values("eid").reset_index(drop=True)
    pd.testing.assert_series_equal(got["cs"], exp["cs"])


def test_global_row_number_total_order(keyed_events):
    from webvalid.ops.rank import global_row_number

    ds, df = keyed_events
    out = global_row_number(ds, by=["t", "eid"], descending=[True, False],
                            rank_col="rn").to_pandas()
    exp = df.sort_values(["t", "eid"], ascending=[False, True]) \
        .reset_index(drop=True)
    exp["rn"] = np.arange(1, len(exp) + 1)
    merged = out.merge(exp[["eid", "rn"]], on="eid", suffixes=("", "_exp"))
    assert (merged["rn"] == merged["rn_exp"]).all()
    assert sorted(out["rn"]) == list(range(1, len(df) + 1))


def test_tfidf_matches_naive_oracle(ray_session):
    from webvalid.ops.tfidf import tfidf_scores

    rows = [
        {"doc_id": 0, "text": "apple banana apple"},
        {"doc_id": 1, "text": "banana cherry"},
        {"doc_id": 2, "text": "cherry cherry durian apple"},
        {"doc_id": 3, "text": None},          # null text → no rows
    ]
    ds = _ds(ray_session, pd.DataFrame(rows), blocks=2)
    got = tfidf_scores(ds).to_pandas()
    n_docs = 4  # ALL rows count in the denominator
    df = {"apple": 2, "banana": 2, "cherry": 2, "durian": 1}
    tf = {(0, "apple"): 2, (0, "banana"): 1, (1, "banana"): 1,
          (1, "cherry"): 1, (2, "cherry"): 2, (2, "durian"): 1,
          (2, "apple"): 1}
    assert len(got) == len(tf)
    for _, r in got.iterrows():
        key = (r["doc_id"], r["token"])
        exp = tf[key] * math.log(n_docs / df[r["token"]])
        assert r["tfidf"] == pytest.approx(exp, rel=1e-12)


def test_tfidf_max_per_doc(ray_session):
    from webvalid.ops.tfidf import tfidf_max_per_doc

    rows = [{"doc_id": 0, "text": "a a a rare"},
            {"doc_id": 1, "text": "a common words"}]
    out = tfidf_max_per_doc(_ds(ray_session, pd.DataFrame(rows), blocks=1))
    # for doc 0: 'a' df=2 → tf3*ln(1)=0; 'rare' df=1 → ln(2)
    exp0 = round(math.log(2), 6)
    assert out.loc[out["doc_id"] == 0, "max_tfidf"].iloc[0] == exp0
    assert set(out["doc_id"]) == {0, 1}


def test_normalize_text_kernels(ray_session):
    from webvalid.ops.textnorm import normalize_text

    df = pd.DataFrame({
        "id": [0, 1, 2, 3],
        "text": ["  Hello   WORLD ", "a\t\tb\nc", None, "É  Über"],
    })
    out = normalize_text(_ds(ray_session, df, blocks=2), text_col="text") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    assert out["norm_text"].tolist()[:2] == ["hello world", "a b c"]
    assert out["norm_text"].isna()[2]          # null preserved
    assert out["norm_text"][3] == "é über"     # unicode lower


def test_rollup_counts_matches_pandas(ray_session):
    from webvalid.ops.reshape import rollup_counts

    rng = np.random.default_rng(21)
    df = pd.DataFrame({"a": rng.choice(["x", "y"], 300),
                       "b": rng.choice(["p", "q", "r"], 300)})
    got = rollup_counts(_ds(ray_session, df), ["a", "b"], out_col="n")
    fine = df.groupby(["a", "b"]).size()
    # spot-check each level
    assert got[(got.a == "x") & (got.b == "p")]["n"].iloc[0] == fine[("x", "p")]
    assert got[(got.a == "y") & (got.b == "ALL")]["n"].iloc[0] == \
        (df["a"] == "y").sum()
    assert got[(got.a == "ALL") & (got.b == "ALL")]["n"].iloc[0] == 300
    assert len(got) == len(fine) + df["a"].nunique() + 1


def test_global_ntile_sql_remainder_semantics(ray_session):
    from webvalid.ops.rank import global_ntile

    df = pd.DataFrame({"k": np.arange(10), "v": np.arange(10)[::-1]})
    out = global_ntile(_ds(ray_session, df), by=["v", "k"],
                       descending=[False, False], k=4).to_pandas()
    sizes = out.groupby("bucket").size().sort_index().tolist()
    assert sizes == [3, 3, 2, 2]  # first n%k buckets take the extra row
    # v ascending → smallest v in bucket 1
    assert set(out[out["bucket"] == 1]["v"]) == {0, 1, 2}


def test_repetition_stats_naive_oracle(ray_session):
    from webvalid.ops.textstats import repetition_stats

    rows = [
        {"doc_id": 0, "text": "a a a b"},       # top tok 3/4; bigram 'a a' 2/3
        {"doc_id": 1, "text": "solo"},          # 1 token, no bigrams
        {"doc_id": 2, "text": None},            # no row
        {"doc_id": 3, "text": "x y x y x"},     # tok 3/5; 'x y' 2/4
    ]
    out = repetition_stats(_ds(ray_session, pd.DataFrame(rows), blocks=2)) \
        .to_pandas().set_index("doc_id")
    assert set(out.index) == {0, 1, 3}
    assert out.loc[0, "n_tokens"] == 4
    assert out.loc[0, "top_token_frac"] == pytest.approx(3 / 4)
    assert out.loc[0, "top_bigram_frac"] == pytest.approx(2 / 3)
    assert out.loc[1, "top_bigram_frac"] == 0.0
    assert out.loc[3, "top_token_frac"] == pytest.approx(3 / 5)
    assert out.loc[3, "top_bigram_frac"] == pytest.approx(2 / 4)


def test_dup_ngram_stats_naive_oracle(ray_session):
    from collections import Counter

    from webvalid.ops.textstats import dup_ngram_stats

    rows = [
        # 'a b c' x2 among 4 trigrams -> dup frac 2/4
        {"doc_id": 0, "text": "a b c a b c"},
        {"doc_id": 1, "text": "x y"},          # <3 tokens: no row
        {"doc_id": 2, "text": None},           # null: no row
        {"doc_id": 3, "text": "p q r s"},      # all unique: 0.0
        {"doc_id": 4, "text": "z z z z z"},    # one trigram x3: 1.0
    ]
    out = dup_ngram_stats(_ds(ray_session, pd.DataFrame(rows), blocks=2),
                          n=3).to_pandas().set_index("doc_id")
    assert set(out.index) == {0, 3, 4}
    assert out.loc[0, "n_ngrams"] == 4
    assert out.loc[0, "dup_ngram_frac"] == pytest.approx(2 / 4)
    assert out.loc[3, "dup_ngram_frac"] == 0.0
    assert out.loc[4, "dup_ngram_frac"] == 1.0

    # randomized parity vs a naive per-doc Counter oracle
    rng = np.random.default_rng(5)
    docs = [" ".join(rng.choice(list("abcdef"), rng.integers(1, 40)))
            for _ in range(60)]
    df = pd.DataFrame({"doc_id": np.arange(60), "text": docs})
    got = dup_ngram_stats(_ds(ray_session, df, blocks=4), n=3) \
        .to_pandas().set_index("doc_id")
    for did, text in zip(df["doc_id"], df["text"]):
        toks = text.split(" ")
        tris = Counter(tuple(toks[i:i + 3]) for i in range(len(toks) - 2))
        if not tris:
            assert did not in got.index
            continue
        total = sum(tris.values())
        dup = sum(c for c in tris.values() if c >= 2)
        assert got.loc[did, "n_ngrams"] == total
        assert got.loc[did, "dup_ngram_frac"] == pytest.approx(dup / total)


def test_salted_left_join_hot_keys(ray_session):
    from webvalid.ops.joins import salted_left_join

    left = pd.DataFrame({"k": [9] * 200 + [1, 4]})
    right = pa.table({"k": pa.array([9, 1]), "p": pa.array(["hot", "cold"])})
    out = salted_left_join(_ds(ray_session, left), right, key="k",
                           num_buckets=4, hot_keys={9}, n_salts=3).to_pandas()
    assert len(out) == 202  # salt replicas must not duplicate matches
    assert (out.loc[out["k"] == 9, "p"] == "hot").all()
    assert out.loc[out["k"] == 4, "p"].isna().all()


def test_lead_per_key_matches_pandas(keyed_events):
    from webvalid.ops.rank import lead_per_key

    ds, df = keyed_events
    got = lead_per_key(ds, key="u", order_col="t", value_col="v",
                       tiebreak="eid", n=1, out_col="led") \
        .to_pandas().sort_values("eid").reset_index(drop=True)
    exp = df.sort_values(["t", "eid"]).groupby("u")["v"].shift(-1)
    exp = df.assign(led=exp).sort_values("eid").reset_index(drop=True)
    pd.testing.assert_series_equal(got["led"], exp["led"])


def test_dense_rank_stitches_keys_and_ties_across_blocks(ray_session):
    from webvalid.ops.rank import dense_rank_per_key

    # 3 keys x ~170 rows from only 5 distinct order values → every key
    # spans multiple sorted blocks and ties cross block boundaries
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 500),
        "q": rng.integers(0, 5, 500),
        "tb": np.arange(500),
    })
    got = dense_rank_per_key(_ds(ray_session, df, blocks=8), key="k",
                             order_col="q", tiebreak="tb",
                             out_col="drank").to_pandas()
    exp = df.copy()
    exp["drank"] = df.groupby("k")["q"].rank(method="dense").astype("int64")
    merged = got.merge(exp[["tb", "drank"]], on="tb", suffixes=("", "_exp"))
    assert (merged["drank"] == merged["drank_exp"]).all()


def test_dense_rank_descending(ray_session):
    from webvalid.ops.rank import dense_rank_per_key

    df = pd.DataFrame({"k": ["x"] * 6, "q": [3, 1, 2, 3, 1, 2],
                       "tb": range(6)})
    got = dense_rank_per_key(_ds(ray_session, df, blocks=2), key="k",
                             order_col="q", tiebreak="tb", descending=True,
                             out_col="drank").to_pandas()
    exp = {3: 1, 2: 2, 1: 3}
    assert all(exp[q] == r for q, r in zip(got["q"], got["drank"]))


def test_full_join_matches_pandas(ray_session):
    from webvalid.ops.joins import salted_full_join

    rng = np.random.default_rng(13)
    left = pd.DataFrame({"k": rng.integers(0, 30, 200),
                         "lid": np.arange(200)})
    right = pa.table({"k": pa.array(np.arange(20, 50)),
                      "name": pa.array([f"n{v}" for v in range(20, 50)])})
    got = salted_full_join(_ds(ray_session, left), right, key="k",
                           num_buckets=4).to_pandas()
    exp = left.merge(right.to_pandas(), on="k", how="outer")
    assert len(got) == len(exp)
    # right-only rows: null lid, key + name present
    ro = got[got["lid"].isna()]
    exp_ro = set(range(20, 50)) - set(left["k"])
    assert set(ro["k"]) == exp_ro
    assert ro["name"].notna().all()


def test_repetition_filter_cuts(ray_session):
    from webvalid.ops.textstats import repetition_filter

    long_ok = " ".join(f"w{i}" for i in range(30))
    rows = [
        {"doc_id": 0, "text": long_ok},                       # keeps
        {"doc_id": 1, "text": "spam " * 30},                  # repetitive
        {"doc_id": 2, "text": "tiny doc"},                    # too short
        {"doc_id": 3, "text": None},                          # null
    ]
    out = repetition_filter(_ds(ray_session, pd.DataFrame(rows), blocks=2),
                            max_top_token_frac=0.15, min_tokens=20) \
        .to_pandas()
    assert out["doc_id"].tolist() == [0]


def test_prep_corpus_v2_composition(ray_session):
    from webvalid.ops.prep import prep_corpus, prep_corpus_v2

    texts = [" ".join(f"t{i}_{j}" for j in range(25)) + " common"
             for i in range(8)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    rows.append({"doc_id": 8, "text": texts[0]})          # exact dup
    rows.append({"doc_id": 9, "text": "loop " * 25})      # repetitive
    ds = _ds(ray_session, pd.DataFrame(rows), blocks=2)
    v2 = prep_corpus_v2(ds, max_top_token_frac=0.15, min_tokens=20) \
        .to_pandas().sort_values("doc_id")
    assert set(v2["doc_id"]) == set(range(8))  # dup + repetitive dropped
    # 'common' has df 8/8 > 0.78 → stripped from every doc
    assert not v2["clean_text"].str.contains("common").any()


def test_bottomk_sample_matches_naive(ray_session):
    import hashlib

    from webvalid.ops.sampling import bottomk_sample

    rng = np.random.default_rng(17)
    texts = [f"doc number {i} " + " ".join(map(str, rng.integers(0, 9, 5)))
             for i in range(200)]
    df = pd.DataFrame({"doc_id": range(200), "text": texts})
    got = bottomk_sample(_ds(ray_session, df, blocks=4), k=10)
    exp = sorted(range(200),
                 key=lambda i: (hashlib.md5(texts[i].encode()).hexdigest(), i))[:10]
    assert got["doc_id"].tolist() == sorted(exp)


def test_bottomk_ties_break_by_id(ray_session):
    from webvalid.ops.sampling import bottomk_sample

    df = pd.DataFrame({"doc_id": [5, 3, 9], "text": ["same", "same", "same"]})
    got = bottomk_sample(_ds(ray_session, df, blocks=2), k=2)
    assert got["doc_id"].tolist() == [3, 5]


def test_percent_rank_bounds(keyed_events):
    from webvalid.ops.rank import global_percent_rank

    ds, df = keyed_events
    out = global_percent_rank(ds, by=["t", "eid"], descending=False,
                              out_col="pr").to_pandas()
    assert out["pr"].min() == 0.0 and out["pr"].max() == 1.0
    # row with the globally smallest (t, eid) has pr 0
    top = df.sort_values(["t", "eid"]).iloc[0]["eid"]
    assert out.loc[out["eid"] == top, "pr"].iloc[0] == 0.0


def test_first_last_value_matches_pandas(keyed_events):
    from webvalid.ops.rank import first_last_value_per_key

    ds, df = keyed_events
    got = first_last_value_per_key(ds, key="u", order_col="t",
                                   value_col="v", tiebreak="eid").to_pandas()
    s = df.sort_values(["t", "eid"])
    exp_first = s.drop_duplicates("u", keep="first").set_index("u")["v"]
    exp_last = s.drop_duplicates("u", keep="last").set_index("u")["v"]
    for _, r in got.iterrows():
        assert r["first_value"] == exp_first[r["u"]]
        assert r["last_value"] == exp_last[r["u"]]
