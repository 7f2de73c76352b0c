"""Driver-contract query implementations over the testdata tables.

Each function takes `sf_dir` (a directory of TPC-H-ish parquet tables)
and returns a Dataset / pandas DataFrame / pyarrow Table. These map the
engine's operator inventory (SURVEY.md §2 + training-data ops) onto the
driver's tables so every operator has a DuckDB-checkable twin in
`__ray_entry__.oracle_sql`. Column names match the SQL exactly.

Ray is initialised by the caller; nothing here calls ray.init().
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from webvalid.ops.dedup import exact_dedup_groups, minhash_lsh_candidates, simhash_near_dups
from webvalid.ops.similarity import brute_force_topk
from webvalid.ops.textstats import LangId, QualityScorer, text_stats_batch
from webvalid.rayutil import task_callable


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


_COMBINE_HOW = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def twophase_agg(ds, keys: list[str], spec: dict[str, tuple[str, str]]) -> pd.DataFrame:
    """Grouped aggregate as partial-per-batch + driver combine.

    `spec`: {out_col: (src_col, how)} with how in sum/count/min/max.
    Avoids the all-to-all sort shuffle of `Dataset.groupby` — each
    batch pre-aggregates with pandas (one row per in-batch group), the
    driver combines the tiny partials. Right whenever #groups is small
    relative to #rows (the usual case for analytics rollups); for huge
    group counts fall back to Dataset.groupby.
    """
    named = {
        out: pd.NamedAgg(column=src, aggfunc="size" if how == "count" else how)
        for out, (src, how) in spec.items()
    }

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby(keys, as_index=False, sort=False).agg(**named)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        # a fully-empty upstream (e.g. an anti join with no survivors)
        # can yield a column-less frame; return the right shape anyway
        return pd.DataFrame({c: pd.Series(dtype=object)
                             for c in [*keys, *spec]})
    combined = parts.groupby(keys, as_index=False, sort=False).agg(
        **{
            out: pd.NamedAgg(column=out, aggfunc=_COMBINE_HOW[how])
            for out, (_, how) in spec.items()
        }
    )
    return combined


def _read(sf_dir: str, name: str, columns=None):
    """Column-pruned read with a right-sized block count.

    Ray's default split (64 blocks per file) schedules 64 tiny tasks
    for these single-file driver tables — pure per-task overhead
    (measured: a trivial pass over 150k rows drops 1.6 s → 0.15 s at 16
    blocks). Multi-file 100-TB inputs keep Ray's own defaults; this
    override only right-sizes the single-file small-table case.
    """
    n_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return ray.data.read_parquet(
        _t(sf_dir, name), columns=columns,
        override_num_blocks=max(8, n_cpus // 2),
    )


# ---------------------------------------------------------------------------
# Column statistics (A1/A8 analogue + north_rule stats)
# ---------------------------------------------------------------------------

class _NumStatsPartial:
    """Per-batch partial (n, nulls, min, max) per column — two-phase agg."""

    def __init__(self, columns):
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"column": [], "n_rows": [], "n_nulls": [], "min_val": [], "max_val": []}
        for c in self.columns:
            col = batch[c]
            nn = col.drop_null()
            mm = pc.min_max(nn).as_py() if len(nn) else {"min": None, "max": None}
            rows["column"].append(c)
            rows["n_rows"].append(len(col))
            rows["n_nulls"].append(col.null_count)
            rows["min_val"].append(mm["min"])
            rows["max_val"].append(mm["max"])
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.string()),
                "n_rows": pa.array(rows["n_rows"], pa.int64()),
                "n_nulls": pa.array(rows["n_nulls"], pa.int64()),
                "min_val": pa.array(rows["min_val"], pa.float64()),
                "max_val": pa.array(rows["max_val"], pa.float64()),
            }
        )


def column_stats_lineitem(sf_dir: str):
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    partials = _read(sf_dir, "lineitem", columns=cols).map_batches(
        _NumStatsPartial(cols), batch_format="pyarrow"
    ).to_pandas()
    out = (
        partials.groupby("column", as_index=False)
        .agg(
            n_rows=("n_rows", "sum"),
            n_nulls=("n_nulls", "sum"),
            min_val=("min_val", "min"),
            max_val=("max_val", "max"),
        )
        .sort_values("column")
        .reset_index(drop=True)
    )
    return out


# ---------------------------------------------------------------------------
# Uniqueness / referential (north_rule checks on driver tables)
# ---------------------------------------------------------------------------

def uniqueness_events_user(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["user_id"])
    counts = twophase_agg(ds, ["user_id"], {"cnt": ("user_id", "count")})
    dup = counts[counts["cnt"] > 1]
    return dup.sort_values("user_id").reset_index(drop=True)


def referential_orders_customer(sf_dir: str):
    """Anti-join: orders whose o_custkey is missing from customer."""
    import pyarrow.parquet as pq

    valid = frozenset(
        pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey"])["c_custkey"].to_pylist()
    )
    import ray as _ray

    valid_ref = _ray.put(valid)

    class Anti:
        def __init__(self, ref):
            self.valid = _ray.get(ref)
            self._vs = pa.array(sorted(self.valid), pa.int64())

        def __call__(self, t: pa.Table) -> pa.Table:
            bad = pc.invert(pc.is_in(t["o_custkey"], value_set=self._vs))
            return t.filter(pc.fill_null(bad, True))

    orphans = _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        task_callable(Anti, ref=valid_ref), batch_format="pyarrow",
    )
    # Orphans are rare by definition; reduce driver-side (Ray groupby on a
    # possibly-empty dataset loses the schema).
    pdf = orphans.to_pandas()
    if len(pdf) == 0:
        return pd.DataFrame({"o_custkey": pd.Series([], dtype="int64"),
                             "cnt": pd.Series([], dtype="int64")})
    out = pdf.groupby("o_custkey", as_index=False).size().rename(columns={"size": "cnt"})
    return out.sort_values("o_custkey").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Histograms / co-occurrence (A2, A9 analogues)
# ---------------------------------------------------------------------------

def _add_doc_partition(t: pa.Table) -> pa.Table:
    pid = pc.divide(t["doc_id"], pa.scalar(100, pa.int64()))
    return t.append_column("partition_id", pid)


def histogram_lang_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"]).map_batches(
        _add_doc_partition, batch_format="pyarrow"
    )
    return twophase_agg(ds.select_columns(["partition_id", "lang"]),
                        ["partition_id", "lang"], {"cnt": ("lang", "count")})


def cooccurrence_lang_source_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"]).map_batches(
        _add_doc_partition, batch_format="pyarrow"
    )
    return twophase_agg(ds.select_columns(["partition_id", "lang", "source"]),
                        ["partition_id", "lang", "source"], {"cnt": ("lang", "count")})


# ---------------------------------------------------------------------------
# Aggregation + join machinery
# ---------------------------------------------------------------------------

def pricing_summary_lineitem(sf_dir: str):
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    out = twophase_agg(
        ds, ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "count_order": ("l_quantity", "count"),
            "min_price": ("l_extendedprice", "min"),
            "max_price": ("l_extendedprice", "max"),
        },
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def orders_by_nation(sf_dir: str):
    """Broadcast double-hop join: orders → customer → nation, then count.

    Demonstrates the small-side broadcast join pattern: the dimension
    side ships once via ray.put as SORTED numpy key arrays + aligned
    value codes (zero-copy plasma reads), and each fact batch resolves
    names with searchsorted + pc.take — no Python dict, no per-row
    loop, no shuffle of the fact table.
    """
    import pyarrow.parquet as pq
    import ray as _ray

    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    ck = cust["c_custkey"].to_numpy()
    cn = cust["c_nationkey"].to_numpy()
    order = np.argsort(ck, kind="stable")
    nk = nation["n_nationkey"].to_numpy()
    nk_order = np.argsort(nk, kind="stable")
    _names = nation["n_name"].to_pylist()
    names_sorted = [_names[i] for i in nk_order]
    lookup_ref = _ray.put((ck[order], cn[order], nk[nk_order]))
    names_ref = _ray.put(names_sorted)

    class AddNation:
        def __init__(self, ref, nref):
            self.ck, self.cn, self.nk = _ray.get(ref)
            self.names = pa.array(_ray.get(nref), pa.string())

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["o_custkey"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.ck, keys), 0, len(self.ck) - 1)
            cust_hit = self.ck[pos] == keys
            nkey = self.cn[pos]
            npos = np.clip(np.searchsorted(self.nk, nkey), 0, len(self.nk) - 1)
            hit = cust_hit & (self.nk[npos] == nkey)
            idx = pa.array(npos.astype(np.int64), pa.int64(), mask=~hit)
            return t.append_column("n_name", pc.take(self.names, idx))

    ds = _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        task_callable(AddNation, ref=lookup_ref, nref=names_ref),
        batch_format="pyarrow",
    )
    out = twophase_agg(ds.select_columns(["n_name"]), ["n_name"],
                       {"n_orders": ("n_name", "count")})
    return out.sort_values("n_name").reset_index(drop=True)


def events_type_by_day(sf_dir: str):
    """Timestamp binning + grouped counts (the warc_ts-histogram pattern)."""

    def add_day(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], "%Y-%m-%d")
        return pa.table({"day": day, "event_type": t["event_type"]})

    ds = _read(sf_dir, "events", columns=["ts", "event_type"]).map_batches(
        add_day, batch_format="pyarrow"
    )
    out = twophase_agg(ds, ["day", "event_type"], {"cnt": ("event_type", "count")})
    return out.sort_values(["day", "event_type"]).reset_index(drop=True)


def tumbling_hourly_events(sf_dir: str):
    """Tumbling 1-hour event-time windows (windows are data, not runtime)."""
    from webvalid.ops.windows import tumbling_aggregate

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = tumbling_aggregate(
        ds, "ts", 3_600_000_000, ["event_type"],
        {"cnt": ("event_type", "count"), "min_value": ("value", "min"),
         "max_value": ("value", "max")},
    )
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


def sessionize_events_users(sf_dir: str, gap_minutes: int = 60):
    """Session windows per user (rows-only: gap-based splitting)."""
    from webvalid.ops.windows import sessionize

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    out = sessionize(ds, "user_id", "ts", gap_us=gap_minutes * 60_000_000,
                     tiebreak="event_id").to_pandas()
    return out.sort_values(["user_id", "session_id"]).reset_index(drop=True)


def sliding_2h_hourly_events(sf_dir: str):
    """Sliding 2-hour windows stepped hourly (row replication + two-phase
    aggregate — the windows-as-data pattern, SURVEY.md §2.9)."""
    from webvalid.ops.windows import sliding_aggregate

    ds = _read(sf_dir, "events", columns=["ts", "value"])
    out = sliding_aggregate(
        ds, "ts", 7_200_000_000, 3_600_000_000, [],
        {"cnt": ("value", "count"), "min_value": ("value", "min"),
         "max_value": ("value", "max")},
    )
    return out.sort_values("window_start").reset_index(drop=True)


def salted_join_orders_customer(sf_dir: str):
    """Bucketed + hot-key-salted inner join (ops/joins.py) of orders
    against customer, rolled up per market segment.

    The first 100 custkeys are declared hot to force the salt-replica
    path (replicated right rows + first-occurrence dedupe) through the
    gate, not just pytest.
    """
    import pyarrow.parquet as pq

    from webvalid.ops.joins import salted_inner_join

    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    right = cust.rename_columns(["o_custkey", "c_mktsegment"])
    hot = set(right["o_custkey"].to_pylist()[:100])
    left = _read(sf_dir, "orders", columns=["o_custkey"])
    joined = salted_inner_join(left, right, key="o_custkey",
                               num_buckets=16, hot_keys=hot, n_salts=4)
    out = twophase_agg(joined.select_columns(["c_mktsegment"]), ["c_mktsegment"],
                       {"n_orders": ("c_mktsegment", "count")})
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def asof_clicks_purchases_events(sf_dir: str):
    """As-of join: each click matched to the user's most recent
    purchase at or before it (ops/asof.py — pandas merge_asof per batch
    against a broadcast, pre-filtered right side)."""
    import pyarrow.parquet as pq

    from webvalid.ops.asof import asof_join_broadcast

    right = pq.read_table(
        _t(sf_dir, "events"), columns=["event_id", "ts", "user_id", "event_type", "value"],
        filters=[("event_type", "=", "purchase")],
    ).to_pandas()
    right = right[["ts", "user_id", "event_id", "value"]].rename(
        columns={"event_id": "purchase_id", "value": "purchase_value"}
    )

    def clicks_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["event_type"], "click")).drop_columns(["event_type"])

    left = _read(sf_dir, "events",
                 columns=["event_id", "ts", "user_id", "event_type"]).map_batches(
        clicks_only, batch_format="pyarrow"
    )
    out = asof_join_broadcast(left, right, on="ts", by="user_id").to_pandas()
    out = out.rename(columns={"event_id": "click_id", "ts": "ts_us"})
    return out[["click_id", "ts_us", "user_id", "purchase_id", "purchase_value"]] \
        .sort_values("click_id").reset_index(drop=True)


def top_orders_per_customer(sf_dir: str, n: int = 3):
    """Per-key top-N (rank/window family, ops/rank.py): each customer's
    3 priciest orders, rank column included."""
    from webvalid.ops.rank import top_n_per_key

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    return top_n_per_key(ds, key="o_custkey", order_col="o_totalprice",
                         n=n, tiebreak="o_orderkey")


def avg_value_by_event_type(sf_dir: str):
    """Mean + population stddev via sum/sumsq/count partials (exact
    two-phase; floats rounded to 4 dp on both sides of the oracle)."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["_v2"] = df["value"] * df["value"]
        out = df.groupby("event_type", as_index=False).agg(
            s=("value", "sum"), s2=("_v2", "sum"),
            n=("value", "count"),  # non-null, like SQL AVG's denominator
            n_all=("value", "size"),  # all rows, like SQL COUNT(*)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = _read(sf_dir, "events", columns=["event_type", "value"]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    agg = parts.groupby("event_type", as_index=False).agg(
        s=("s", "sum"), s2=("s2", "sum"), n=("n", "sum"), n_all=("n_all", "sum")
    )
    agg["avg_value"] = (agg["s"] / agg["n"]).round(4)
    agg["std_value"] = np.sqrt(
        np.maximum(agg["s2"] / agg["n"] - (agg["s"] / agg["n"]) ** 2, 0.0)
    ).round(4)
    agg["n_events"] = agg["n_all"]
    out = agg[["event_type", "avg_value", "std_value", "n_events"]]
    return out.sort_values("event_type").reset_index(drop=True)


def props_k_by_type_events(sf_dir: str):
    """JSON field extraction (scalar-function family): pull the integer
    `k` from the props JSON column with a vectorized Arrow regex and
    aggregate per event type."""

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    ds = _read(sf_dir, "events", columns=["event_type", "props"]).map_batches(
        extract, batch_format="pyarrow"
    )
    out = twophase_agg(ds, ["event_type"],
                       {"sum_k": ("k", "sum"), "n_events": ("k", "count")})
    return out.sort_values("event_type").reset_index(drop=True)


def events_type_by_day_jsonl(sf_dir: str):
    """S1 source-format coverage: the events table round-tripped
    through JSONL (`ray.data.read_json`) and aggregated — must equal
    the Parquet-sourced SQL oracle exactly."""
    import hashlib
    import pyarrow.parquet as pq

    # cache key includes the source file's (mtime, size) so an
    # in-place fixture regeneration can never serve a stale JSONL
    src_stat = os.stat(_t(sf_dir, "events"))
    key = f"{sf_dir}|{src_stat.st_mtime_ns}|{src_stat.st_size}"
    cache = os.path.join(
        tempfile.gettempdir(),
        "webvalid_jsonl_" + hashlib.md5(key.encode()).hexdigest()[:10],
    )
    marker = os.path.join(cache, "DONE")
    if not os.path.exists(marker):
        os.makedirs(cache, exist_ok=True)
        t = pq.read_table(_t(sf_dir, "events"), columns=["ts", "event_type"])
        df = t.to_pandas()
        df["ts"] = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        df.to_json(os.path.join(cache, "events.jsonl"), orient="records",
                   lines=True, date_format="iso")
        with open(marker, "w") as f:
            f.write("ok")

    def add_day(t: pa.Table) -> pa.Table:
        day = pc.utf8_slice_codeunits(t["ts"], 0, 10)
        return pa.table({"day": day, "event_type": t["event_type"]})

    ds = ray.data.read_json(os.path.join(cache, "events.jsonl")).map_batches(
        add_day, batch_format="pyarrow"
    )
    out = twophase_agg(ds, ["day", "event_type"], {"cnt": ("event_type", "count")})
    return out.sort_values(["day", "event_type"]).reset_index(drop=True)


def rayjoin_orders_customer(sf_dir: str):
    """Same rollup as salted_join_orders_customer but through the true
    all-to-all hash join (ops/joins.py:ray_native_inner_join) — the
    both-sides-huge regime."""
    from webvalid.ops.joins import ray_native_inner_join

    left = _read(sf_dir, "orders", columns=["o_custkey"])
    right = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = ray_native_inner_join(left, right, on="o_custkey", right_on="c_custkey")
    out = twophase_agg(joined.select_columns(["c_mktsegment"]), ["c_mktsegment"],
                       {"n_orders": ("c_mktsegment", "count")})
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def distinct_exact_part_brand(sf_dir: str):
    """Exact distinct count via per-batch unique sets → driver union (A1)."""

    def uniques(t: pa.Table) -> pa.Table:
        u = pc.unique(t["p_brand"])
        return pa.table({"p_brand": u})

    parts = _read(sf_dir, "part", columns=["p_brand"]).map_batches(
        uniques, batch_format="pyarrow"
    ).to_pandas()
    return pd.DataFrame({"n_distinct": [int(parts["p_brand"].nunique())]})


# ---------------------------------------------------------------------------
# Dedup / text / similarity ops
# ---------------------------------------------------------------------------

def dedup_exact_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = exact_dedup_groups(ds, text_col="text", id_col="doc_id").to_pandas()
    return out.sort_values("text_md5").reset_index(drop=True)


def text_stats_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        text_stats_batch, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "n_chars_computed", "n_tokens"]).to_pandas()


def token_totals_by_lang(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"]).map_batches(
        text_stats_batch, batch_format="pyarrow"
    )
    out = twophase_agg(
        ds.select_columns(["lang", "n_tokens"]), ["lang"],
        {"total_tokens": ("n_tokens", "sum"), "n_docs": ("n_tokens", "count")},
    )
    return out.sort_values("lang").reset_index(drop=True)


def similarity_topk_embeddings(sf_dir: str, n_queries: int = 5, k: int = 10):
    import pyarrow.parquet as pq

    qt = pq.read_table(_t(sf_dir, "embeddings"))
    qdf = qt.to_pandas().sort_values("vec_id").head(n_queries)
    qids = qdf["vec_id"].to_numpy()
    qmat = np.array(qdf["embedding"].to_list(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, qids, qmat, k=k).to_pandas()
    out["cosine"] = out["cosine"].round(6)
    return out.sort_values(["query_id", "cosine", "vec_id"],
                           ascending=[True, False, True]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Drift detectors over the events stream (reference parity surface)
# ---------------------------------------------------------------------------

def _events_projection(sf_dir: str, block_size: int = 1000):
    """Categorical projection of events in event_id order (SURVEY.md §2.9:
    order is data — the explicit event_id column, never Ray block order)."""

    def proj(t: pa.Table) -> pa.Table:
        pid = pc.divide(t["event_id"], pa.scalar(block_size, pa.int64()))
        bucket = pc.cast(pc.multiply(pc.floor(pc.divide(t["value"], 5.0)), 5.0), pa.string())
        out = pa.table(
            {
                "partition_id": pid,
                "event_type": t["event_type"],
                "value_bucket": bucket,
            }
        )
        return out

    return (
        _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
        .map_batches(proj, batch_format="pyarrow")
    )


def _events_drift_states(sf_dir: str, block_size: int = 1000):
    """Per-partition drift states via block-local merge + driver finish.

    Same mergeable-state pattern as the flagship suite
    (pipeline.merge_keyed_states) — drift states are additive, so no
    sort shuffle is needed; the driver touches O(#partitions) states.
    """
    import pickle

    from webvalid.checks.drift_check import DriftPartial, merge_drift_state_dicts
    from webvalid.pipeline import merge_keyed_states

    ds = _events_projection(sf_dir, block_size)
    partials = ds.map_batches(
        DriftPartial(("event_type", "value_bucket")), batch_format="pyarrow"
    )
    return merge_keyed_states(
        partials, ("partition_id",), pickle.loads, merge_drift_state_dicts
    )


def cdcstream_segments_events(sf_dir: str, block_size: int = 1000):
    import pickle

    from webvalid.drift.cdcstream import control_chart_fold
    from webvalid.drift.dilca import BlockStatistics, summary_of_stats

    merged = sorted(_events_drift_states(sf_dir, block_size), key=lambda r: r["partition_id"])
    states = [pickle.loads(r["state"]) for r in merged]
    summaries = [
        summary_of_stats(BlockStatistics.from_counts(s["value_counts"], s["pairs"]))
        for s in states
    ]
    sizes = [s["n"] for s in states]
    segments, _ = control_chart_fold(summaries, sizes, drift_coefficient=3.0)
    return pd.DataFrame(
        {"start": [s[0] for s in segments], "end": [s[1] for s in segments]}
    )


def cdda_segments_events(sf_dir: str, block_size: int = 1000):
    import pickle

    from webvalid.drift.cdda import cdda_fold

    merged = sorted(_events_drift_states(sf_dir, block_size), key=lambda r: r["partition_id"])
    states = [pickle.loads(r["state"]) for r in merged]
    histograms = [s["value_counts"] for s in states]
    sizes = [s["n"] for s in states]
    segments, _, _ = cdda_fold(histograms, sizes, min_change_degree=0.05)
    return pd.DataFrame(
        {"start": [s[0] for s in segments], "end": [s[1] for s in segments]}
    )


# ---------------------------------------------------------------------------
# Rows-only ops (approximate / heuristic — no SQL twin)
# ---------------------------------------------------------------------------

def dedup_minhash_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_lsh_candidates(ds, min_est_jaccard=0.5).to_pandas()


def dedup_simhash_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_near_dups(ds, max_hamming=3).to_pandas()


def langid_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        task_callable(LangId), batch_format="pyarrow"
    )
    return ds.to_pandas()


def quality_documents(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        task_callable(QualityScorer), batch_format="pyarrow"
    )
    return ds.to_pandas()


def ensure_suite_fixture() -> str:
    """Generate (idempotently) the seeded webpages fixture the suite
    gates run on; returns its base dir. Also called from
    `__ray_entry__.oracle_sql()` so the SQL twin's read_parquet path
    exists regardless of driver evaluation order."""
    import os
    import tempfile

    from webvalid.gen import generate_webpages

    # v2: parity fingerprint scheme changed — stale caches would flood
    # text_parity
    base = os.path.join(tempfile.gettempdir(), "webvalid_query_fixture_v2")
    marker = os.path.join(base, "text_hashes.parquet")
    if not os.path.exists(marker):
        generate_webpages(base, n_rows=8_000, block_size=800, seed=19)
    return base


def ensure_langid_fixture() -> str:
    """Deterministic multilingual labeled corpus for the trained
    lang-ID checked twin (also called from `__ray_entry__.oracle_sql()`
    so the SQL twin's read_parquet path always exists)."""
    import os
    import tempfile

    from webvalid.ops.langid_ngram import generate_langid_fixture

    base = os.path.join(tempfile.gettempdir(), "webvalid_langid_fixture_v1")
    return generate_langid_fixture(base, n_rows=3000, seed=101)


def langid_trained_checked_documents(sf_dir: str):
    """Checked twin for trained n-gram lang-ID (VERDICT r3 #8): train
    char-trigram naive-Bayes profiles on the fixture's train split
    (distributed partials + native groupby-sum; the model never sees
    the generator's lexicons), score the held-out test split through
    the broadcast actor path, and assert ≥95% per-language accuracy.
    SQL twin: per-lang test counts + TRUE."""
    from webvalid.ops.langid_ngram import NgramLangId, train_lang_profiles

    path = ensure_langid_fixture()
    ds = ray.data.read_parquet(path)

    def split_is(which: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["split"], which))
        return fn

    model = train_lang_profiles(
        ds.map_batches(split_is("train"), batch_format="pyarrow"))
    ref = ray.put(model)
    test = ds.map_batches(split_is("test"), batch_format="pyarrow")
    pred = test.map_batches(task_callable(NgramLangId, model_ref=ref),
                            batch_format="pyarrow")

    # join predictions back to truth (doc_id is unique) and reduce to
    # per-lang hit counts with distributed partials
    truth = {r["doc_id"]: r["lang"]
             for r in test.select_columns(["doc_id", "lang"]).take_all()}
    truth_ref = ray.put(truth)

    def hits(t: pa.Table) -> pa.Table:
        tr = ray.get(truth_ref)
        langs = [tr[d] for d in t["doc_id"].to_pylist()]
        ok = np.asarray([p == l for p, l in
                         zip(t["lang_pred"].to_pylist(), langs)], np.int64)
        return pa.table({"lang": pa.array(langs, pa.string()),
                         "ok": pa.array(ok),
                         "one": pa.array(np.ones(len(ok), np.int64))})

    agg = pred.map_batches(hits, batch_format="pyarrow") \
        .groupby("lang").sum(["ok", "one"]).to_pandas()
    agg = agg.sort_values("lang").reset_index(drop=True)
    return pd.DataFrame({
        "lang": agg["lang"],
        "n_eval": agg["sum(one)"].astype("int64"),
        "acc_ok": (agg["sum(ok)"] / agg["sum(one)"] >= 0.95),
    })


def _run_suite_on_fixture():
    import os

    from webvalid.checks.base import CheckConfig
    from webvalid.gen import TS_HI, TS_LO
    from webvalid.pipeline import run_validation

    base = ensure_suite_fixture()
    out = os.path.join(base, "out")
    cfg = CheckConfig(block_size=800, ts_range=(int(TS_LO), int(TS_HI)))
    return run_validation(
        os.path.join(base, "webpages"), out, cfg=cfg,
        ref_langs=os.path.join(base, "ref_langs.parquet"),
        text_hashes=os.path.join(base, "text_hashes.parquet"),
    )


def webpages_validation_suite(sf_dir: str):
    """Flagship: the full validation suite on the seeded webpages fixture.

    Deterministic (fixed seed/size, independent of sf_dir — the driver
    tables have no webpages-shaped data); returns the verdicts table.
    Rows-only check; `webpages_verdicts_sql_subset` holds the
    SQL-expressible verdict families to a value-exact oracle.
    """
    v = _run_suite_on_fixture()["verdicts"]
    return v.sort_values(["check", "column", "partition_id"]).reset_index(drop=True)


def webpages_verdicts_sql_subset(sf_dir: str):
    """Value-exact oracle twin for the suite's SQL-expressible verdict
    families: null_frac (html/text), ts_range, referential_lang and
    uniqueness rows from the SAME suite run (resume makes the second
    invocation cheap), compared against a DuckDB recomputation over
    the fixture parquet (partition_id = row_index // block_size)."""
    v = _run_suite_on_fixture()["verdicts"]
    keep = v[v["check"].isin(
        ["null_frac", "ts_range", "referential_lang", "uniqueness"])]
    out = keep.copy()
    out["metric"] = out["metric"].astype(float)
    return out.sort_values(["check", "column", "partition_id"]) \
        .reset_index(drop=True)


def dedup_verified_documents(sf_dir: str, min_jaccard: float = 0.6):
    """MinHash-LSH candidates verified with exact n-gram Jaccard.

    The candidate pairs are rare by construction, so their texts are
    fetched with a distributed membership filter (only matching rows
    leave the workers) and broadcast for the verify stage
    (ops/dedup.py JaccardVerifier)."""
    import ray as _ray

    from webvalid.ops.dedup import JaccardVerifier, fetch_texts_for_ids

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    cands = minhash_lsh_candidates(ds, min_est_jaccard=0.3)
    cand_pdf = cands.to_pandas()
    if len(cand_pdf) == 0:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"),
             "est_jaccard": pd.Series([], dtype="float64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    need = set(cand_pdf["doc_a"]) | set(cand_pdf["doc_b"])
    texts = fetch_texts_for_ids(ds, need)
    texts_ref = _ray.put(texts)
    verified = ray.data.from_pandas(cand_pdf).map_batches(
        task_callable(JaccardVerifier, texts_ref=texts_ref),
        batch_format="pyarrow",
    ).to_pandas()
    out = verified[verified["jaccard"] >= min_jaccard]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def similarity_ivf_embeddings(sf_dir: str, n_queries: int = 5, k: int = 10):
    """IVF-bucketed approximate top-k (the ANN scale path)."""
    import pyarrow.parquet as pq

    from webvalid.ops.similarity import ivf_topk

    qt = pq.read_table(_t(sf_dir, "embeddings"))
    qdf = qt.to_pandas().sort_values("vec_id").head(n_queries)
    qids = qdf["vec_id"].to_numpy()
    qmat = np.array(qdf["embedding"].to_list(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_topk(ds, qids, qmat, k=k, nlist=16, nprobe=6).to_pandas()
    out["cosine"] = out["cosine"].round(6)
    return out.sort_values(["query_id", "cosine", "vec_id"],
                           ascending=[True, False, True]).reset_index(drop=True)


def embedding_near_dups_gate(sf_dir: str, threshold: float = 0.4):
    """Embedding-cosine near-duplicate pairs (brute-force baseline).

    Threshold 0.4 sits above the 99.9th percentile of pairwise cosines
    in the synthetic embeddings (max ≈ 0.51) so the result is small but
    non-empty."""
    from webvalid.ops.dedup import embedding_near_dups

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = embedding_near_dups(ds, threshold=threshold).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    out["cosine"] = out["cosine"].round(6)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def fingerprint_documents(sf_dir: str):
    """Winnowing-style rolling-hash document fingerprints."""
    from webvalid.ops.textstats import Fingerprinter

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        task_callable(Fingerprinter), batch_format="pyarrow"
    )
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _hll_all_columns(sf_dir: str, table: str, cols: list[str], p: int = 14):
    """Distributed HLL per column: each block emits ONE serialized HLL
    per column (the mergeable partial), the driver merges O(#blocks)
    sketches — table rows never stream through the driver (the r3
    version fed HLLs via a driver-side iter_batches loop)."""
    from webvalid.sketches import HyperLogLog

    def partial(t: pa.Table) -> pa.Table:
        blobs = []
        for c in cols:
            h = HyperLogLog(p=p)
            vals = t[c].drop_null().to_numpy(zero_copy_only=False)
            if len(vals):
                h.add(vals)
            blobs.append(h.serialize())
        return pa.table({"column": pa.array(cols),
                         "state": pa.array(blobs, pa.binary())})

    parts = _read(sf_dir, table, columns=cols).map_batches(
        partial, batch_format="pyarrow").take_all()
    hlls = {c: HyperLogLog(p=p) for c in cols}
    for row in parts:
        hlls[row["column"]].merge(HyperLogLog.deserialize(row["state"]))
    return hlls


def distinct_hll_documents(sf_dir: str):
    """HLL estimates vs exact distinct per column (approximate → rows-only)."""
    cols = ["lang", "source", "text"]
    # p=12 matches the pre-round-4 output (HyperLogLog's old default) —
    # the refactor distributes the feed, it must not move the estimates
    hlls = _hll_all_columns(sf_dir, "documents", cols, p=12)
    return pd.DataFrame(
        {"column": cols, "distinct_est": [round(hlls[c].estimate()) for c in cols]}
    )


def quantiles_tdigest_lineitem(sf_dir: str):
    """TDigest quantiles of l_extendedprice (approximate → rows-only)."""
    from webvalid.sketches import TDigest

    class TDPartial:
        def __call__(self, t: pa.Table) -> pa.Table:
            td = TDigest()
            td.add_array(t["l_extendedprice"].to_numpy(zero_copy_only=False))
            return pa.table({"state": pa.array([td.serialize()], pa.binary())})

    parts = _read(sf_dir, "lineitem", columns=["l_extendedprice"]).map_batches(
        TDPartial(), batch_format="pyarrow"
    ).take_all()
    td = TDigest.deserialize(parts[0]["state"])
    for p in parts[1:]:
        td.merge(TDigest.deserialize(p["state"]))
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    return pd.DataFrame({"q": qs, "value": [td.quantile(q) for q in qs]})


# ---- round-2 session additions: sampling / ngrams / graph / quantiles ----


def hash_split_documents(sf_dir: str):
    """Deterministic md5-bucket train/valid/test split (ops/sampling.py).

    Pure map stage — content-keyed assignment, stable under any
    repartitioning; the DuckDB oracle recomputes it from md5(text)."""
    from webvalid.ops.sampling import hash_split

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = hash_split(ds).select_columns(["doc_id", "split"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def stratified_sample_documents(sf_dir: str):
    """Per-language deterministic downsample: en 25%, es 50%, rest 100%."""
    from webvalid.ops.sampling import stratified_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out = stratified_sample(ds, strat_col="lang",
                            rates={"en": 0.25, "es": 0.5}, default_rate=1.0)
    pdf = out.select_columns(["doc_id", "lang"]).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def unigram_topk_documents(sf_dir: str, k: int = 50):
    """Corpus-wide token frequency, top-k (word-count shape; ops/ngrams.py)."""
    from webvalid.ops.ngrams import ngram_counts

    ds = _read(sf_dir, "documents", columns=["text"])
    return ngram_counts(ds, n=1, top_k=k)


def bigram_topk_documents(sf_dir: str, k: int = 50):
    """Corpus-wide bigram frequency, top-k (windows never cross docs)."""
    from webvalid.ops.ngrams import ngram_counts

    ds = _read(sf_dir, "documents", columns=["text"])
    return ngram_counts(ds, n=2, top_k=k)


def _user_graph_edges(sf_dir: str):
    """Shared probe graph: user u ↔ (2u mod 150) per event row — a
    functional graph with long chains and cycles, the worst case for
    naive label propagation. Must match the recursive-CTE oracles."""
    def edges(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(u), "dst": pa.array((u * 2) % 150)})

    return _read(sf_dir, "events", columns=["user_id"]).map_batches(
        edges, batch_format="pyarrow"
    )


def components_events_users(sf_dir: str):
    """Connected components over the probe user graph (ops/graph.py,
    forest-contraction path); labels are the min node id per
    component; the oracle is a DuckDB recursive CTE."""
    from webvalid.ops.graph import connected_components

    out = connected_components(_user_graph_edges(sf_dir))
    return out.sort_values("node").reset_index(drop=True)


def dedup_clusters_documents(sf_dir: str, min_est_jaccard: float = 0.5):
    """Near-dup cluster assignment: MinHash-LSH pairs → connected
    components → (doc_id, cluster) for every implicated doc.

    The end-to-end dedup shape a training pipeline runs: candidate
    pairs (no SQL twin — MinHash) clustered by min-doc-id label."""
    from webvalid.ops.dedup import minhash_lsh_candidates
    from webvalid.ops.graph import dedup_components

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_lsh_candidates(ds, min_est_jaccard=min_est_jaccard).to_pandas()
    if len(pairs) == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "component": pd.Series([], dtype="int64")})
    pairs_ds = ray.data.from_pandas(pairs[["doc_a", "doc_b"]])
    return dedup_components(pairs_ds).sort_values("node").reset_index(drop=True)


def grouped_quantiles_lineitem(sf_dir: str):
    """Exact per-group quantiles via the real all-to-all groupby path.

    This intentionally exercises `Dataset.groupby().map_groups` (the
    engine's only full-shuffle aggregate) as a documented CONTRAST: the
    PREFERRED exact route at scale is
    `ops/selection.py:grouped_kth_smallest_multi` — shared
    histogram-bisection streaming passes, no all-to-all, no
    group-fits-a-worker contract (see median_mad_price_lineitem and
    tests/test_session6_ops.py::test_grouped_quantiles_bisection_parity
    for the value-exact parity proof); the mergeable-SKETCH alternative
    is quantiles_tdigest_lineitem. Rounded to 4 dp to absorb
    float-accumulation ulps vs DuckDB's quantile_cont."""
    def q(group: pd.DataFrame) -> pd.DataFrame:
        v = group["l_extendedprice"].to_numpy()
        return pd.DataFrame({
            "l_returnflag": [group["l_returnflag"].iloc[0]],
            "p50": [round(float(np.quantile(v, 0.5)), 4)],
            "p90": [round(float(np.quantile(v, 0.9)), 4)],
        })

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    out = ds.groupby("l_returnflag").map_groups(q, batch_format="pandas").to_pandas()
    return out.sort_values("l_returnflag").reset_index(drop=True)


def partitioned_write_documents(sf_dir: str):
    """Partitioned Parquet sink round-trip (resumable-output layout).

    Writes documents hive-partitioned by lang (one directory per key —
    the north_rule's resumable layout), reads the tree back, and
    returns per-lang counts; the oracle checks them against the source
    table, proving the sink moved every row into the right partition."""
    import shutil
    import tempfile

    out_dir = os.path.join(tempfile.gettempdir(), "webvalid_partwrite")
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    ds.write_parquet(out_dir, partition_cols=["lang"])
    back = ray.data.read_parquet(out_dir)
    pdf = twophase_agg(back, ["lang"], {"n_docs": ("doc_id", "count")})
    pdf["lang"] = pdf["lang"].astype(str)
    return pdf.sort_values("lang").reset_index(drop=True)


def search_tokens_documents(sf_dir: str, needle: str = "spark window"):
    """Substring search (vectorized pc.match_substring filter)."""
    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.match_substring(t["text"], needle))

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )
    pdf = ds.select_columns(["doc_id"]).to_pandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def remove_boilerplate_documents(sf_dir: str, max_df_frac: float = 0.78):
    """Corpus-DF boilerplate strip: rewrite every doc without tokens
    whose document frequency exceeds 78% of the corpus (ops/boilerplate.py)."""
    from webvalid.ops.boilerplate import remove_boilerplate

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = remove_boilerplate(ds, max_df_frac=max_df_frac).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def global_topk_orders(sf_dir: str, k: int = 100):
    """Global top-k via the distributed sort operator (`Dataset.sort`).

    The engine's other rankings deliberately avoid the sort shuffle
    (per-key top-N, driver reduces); this gate exercises Ray's real
    range-partitioned sort + limit for the cases that need a total
    order. Deterministic tiebreak on o_orderkey."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)
    return out.to_pandas()


def contamination_documents(sf_dir: str):
    """Eval-decontamination scan: docs sharing any bigram with a
    "benchmark" (docs 0-4 stand in for the eval set); n_hits = distinct
    shared bigrams (ops/ngrams.py:ngram_contamination)."""
    import pyarrow.parquet as pq

    from webvalid.ops.ngrams import ngram_contamination

    bench = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"],
                          filters=[("doc_id", "<", 5)])
    bench_texts = bench.sort_by("doc_id")["text"].to_pylist()

    def not_bench(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["doc_id"], 5))

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        not_bench, batch_format="pyarrow"
    )
    return ngram_contamination(ds, bench_texts, n=2)


def prep_corpus_documents(sf_dir: str):
    """Composed corpus-prep pipeline (ops/prep.py): exact dedup (keep
    min doc per text) → boilerplate strip (df > 0.78 of kept docs) →
    deterministic md5 split. One composed DuckDB oracle checks the
    whole chain value-exactly."""
    from webvalid.ops.prep import prep_corpus

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = prep_corpus(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def asof_partitioned_clicks_purchases(sf_dir: str):
    """Same as-of join through the co-partitioned path (both sides as
    Datasets, one hash-bucket co-group shuffle — ops/asof.py)."""
    from webvalid.ops.asof import asof_join_partitioned

    def clicks_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["event_type"], "click")).drop_columns(["event_type"])

    def purchases_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({"ts": t["ts"], "user_id": t["user_id"],
                         "purchase_id": t["event_id"],
                         "purchase_value": t["value"]})

    left = _read(sf_dir, "events",
                 columns=["event_id", "ts", "user_id", "event_type"]).map_batches(
        clicks_only, batch_format="pyarrow"
    )
    right = _read(sf_dir, "events",
                  columns=["event_id", "ts", "user_id", "event_type", "value"]).map_batches(
        purchases_only, batch_format="pyarrow"
    )
    out = asof_join_partitioned(left, right, on="ts", by="user_id").to_pandas()
    out = out.rename(columns={"event_id": "click_id", "ts": "ts_us"})
    return out[["click_id", "ts_us", "user_id", "purchase_id", "purchase_value"]] \
        .sort_values("click_id").reset_index(drop=True)


def rolling_avg_value_events(sf_dir: str, window: int = 3):
    """Per-user trailing-3-row rolling mean of event value (window
    frame family, ops/rank.py:rolling_mean_per_key)."""
    from webvalid.ops.rank import rolling_mean_per_key

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def ts_us(t: pa.Table) -> pa.Table:
        ts = t["ts"]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us"))  # unit-normalize before int64
        return pa.table({"event_id": t["event_id"],
                         "ts_us": ts.cast(pa.int64()),
                         "user_id": t["user_id"], "value": t["value"]})

    out = rolling_mean_per_key(
        ds.map_batches(ts_us, batch_format="pyarrow"),
        key="user_id", order_col="ts_us", value_col="value",
        window=window, tiebreak="event_id",
    ).to_pandas()
    out["rolling_avg"] = (out["rolling_avg"] + 1e-9).round(6)
    return out[["event_id", "user_id", "rolling_avg"]] \
        .sort_values("event_id").reset_index(drop=True)


def unigram_topk_sketch_documents(sf_dir: str, k: int = 50):
    """Same exact top-50 tokens, computed through the O(counters)-memory
    Misra–Gries two-pass path (ops/ngrams.py:ngram_topk_sketch) — the
    unbounded-vocabulary scale route; shares unigram_topk's oracle."""
    from webvalid.ops.ngrams import ngram_topk_sketch

    ds = _read(sf_dir, "documents", columns=["text"])
    return ngram_topk_sketch(ds, n=1, top_k=k, k_counters=4096)


def components_star_events_users(sf_dir: str):
    """Same probe graph, computed by the fully-distributed alternating
    large-star/small-star rounds (no O(#nodes) driver state)."""
    from webvalid.ops.graph import connected_components_starlike

    return connected_components_starlike(_user_graph_edges(sf_dir))


def referential_bloom_documents(sf_dir: str):
    """Referential misses via the Bloom-broadcast anti-join (the
    memory-bound path for reference sets beyond sorted-array scale):
    reference = every source except 'src0', so src0 docs are planted
    orphans. One-sided op; with this deterministic key set no false
    positive hides them, so the gate is value-exact."""
    import pyarrow.parquet as pq

    from webvalid.ops.joins import bloom_anti_join

    srcs = pq.read_table(_t(sf_dir, "documents"), columns=["source"])["source"]
    ref = sorted({s for s in srcs.to_pylist() if s is not None and s != "src0"})
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    out = bloom_anti_join(ds, np.asarray(ref, dtype=object), key="source").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Join variants (left outer / semi), reshape, set ops, window functions,
# global row numbering, TF-IDF — session-3 operator families
# ---------------------------------------------------------------------------

def left_join_orders_customer(sf_dir: str):
    """Left OUTER bucketed join (ops/joins.py:salted_left_join): the
    right side is customers with c_custkey % 3 != 0, so ~1/3 of orders
    MISS and must survive with a null segment — the polarity the inner
    join can't exercise. Rolled up per COALESCEd segment."""
    import pyarrow.parquet as pq

    from webvalid.ops.joins import salted_left_join

    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    cust = cust.filter(pa.array(cust["c_custkey"].to_numpy() % 3 != 0))
    right = cust.rename_columns(["o_custkey", "c_mktsegment"])
    left = _read(sf_dir, "orders", columns=["o_custkey"])
    joined = salted_left_join(left, right, key="o_custkey", num_buckets=16)

    def seg(t: pa.Table) -> pa.Table:
        return pa.table({"segment": pc.coalesce(t["c_mktsegment"],
                                                pa.scalar("UNMATCHED"))})

    out = twophase_agg(joined.map_batches(seg, batch_format="pyarrow"),
                       ["segment"], {"n_orders": ("segment", "count")})
    return out.sort_values("segment").reset_index(drop=True)


def semi_join_orders_customer(sf_dir: str):
    """Semi join (ops/joins.py:salted_semi_join): orders whose custkey
    IS in the c_custkey % 5 == 0 subset — membership filter only, no
    payload ever attaches — rolled up per order priority."""
    import pyarrow.parquet as pq

    from webvalid.ops.joins import salted_semi_join

    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey"])
    cust = cust.filter(pa.array(cust["c_custkey"].to_numpy() % 5 == 0))
    right = cust.rename_columns(["o_custkey"])
    left = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    kept = salted_semi_join(left, right, key="o_custkey", num_buckets=16)
    out = twophase_agg(kept.select_columns(["o_orderpriority"]),
                       ["o_orderpriority"],
                       {"n_orders": ("o_orderpriority", "count")})
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def pivot_day_by_type_events(sf_dir: str):
    """Crosstab (ops/reshape.py:pivot_table): days × event types, cell
    = count; missing cells 0. Output grid is |days| × 5 — tiny — while
    the input streams; columns are the event types themselves."""
    from webvalid.ops.reshape import pivot_table

    def add_day(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.strftime(t["ts"], "%Y-%m-%d"),
                         "event_type": t["event_type"]})

    ds = _read(sf_dir, "events", columns=["ts", "event_type"]).map_batches(
        add_day, batch_format="pyarrow")
    return pivot_table(ds, index=["day"], pivot_col="event_type", how="count")


def unpivot_lineitem_measures(sf_dir: str):
    """Melt (ops/reshape.py:unpivot): four lineitem measure columns to
    long (measure, val) — a pure streaming map, output 4× input — then
    reduce with order-insensitive aggregates (count/min/max; float SUM
    is order-sensitive across engines so it is not compared)."""
    from webvalid.ops.reshape import unpivot

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey"] + cols)
    long = unpivot(ds, id_cols=["l_orderkey"], value_cols=cols,
                   var_name="measure", value_name="val")
    out = twophase_agg(long, ["measure"],
                       {"n_rows": ("val", "count"), "min_val": ("val", "min"),
                        "max_val": ("val", "max")})
    return out.sort_values("measure").reset_index(drop=True)


def except_en_src0_documents(sf_dir: str):
    """Distributed EXCEPT (ops/setops.py, shuffle strategy — the
    unbounded-key-domain path): doc_ids of English docs minus doc_ids
    of src0 docs. Presence flags shuffle, never rows."""
    from webvalid.ops.setops import set_op_keys

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    a = docs.filter(expr="lang == 'en'").select_columns(["doc_id"])
    b = docs.filter(expr="source == 'src0'").select_columns(["doc_id"])
    return set_op_keys(a, b, "doc_id", op="except", strategy="shuffle")


def intersect_en_src0_documents(sf_dir: str):
    """Distributed INTERSECT (ops/setops.py, driver strategy — the
    vocabulary-sized-key path): English doc_ids ∩ src0 doc_ids."""
    from webvalid.ops.setops import set_op_keys

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    a = docs.filter(expr="lang == 'en'").select_columns(["doc_id"])
    b = docs.filter(expr="source == 'src0'").select_columns(["doc_id"])
    return set_op_keys(a, b, "doc_id", op="intersect", strategy="driver")


def _events_ts_us(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def ts_us(t: pa.Table) -> pa.Table:
        ts = t["ts"]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us"))
        return pa.table({"event_id": t["event_id"], "ts_us": ts.cast(pa.int64()),
                         "user_id": t["user_id"], "value": t["value"]})

    return ds.map_batches(ts_us, batch_format="pyarrow")


def lag_value_events(sf_dir: str):
    """Per-user LAG(value, 1) in event-time order (ops/rank.py:
    lag_per_key) — null for each user's first event."""
    from webvalid.ops.rank import lag_per_key

    out = lag_per_key(_events_ts_us(sf_dir), key="user_id", order_col="ts_us",
                      value_col="value", tiebreak="event_id", n=1,
                      out_col="lagged").to_pandas()
    out["lagged"] = out["lagged"].round(6)
    return out[["event_id", "user_id", "lagged"]] \
        .sort_values("event_id").reset_index(drop=True)


def cumsum_value_events(sf_dir: str):
    """Per-user running total of value (ops/rank.py:cumsum_per_key).
    Within a key both engines accumulate in the same event-time order,
    so the doubles agree bit-for-bit before the comparison round."""
    from webvalid.ops.rank import cumsum_per_key

    out = cumsum_per_key(_events_ts_us(sf_dir), key="user_id",
                         order_col="ts_us", value_col="value",
                         tiebreak="event_id", out_col="cum_value").to_pandas()
    out["cum_value"] = (out["cum_value"] + 1e-9).round(6)
    return out[["event_id", "user_id", "cum_value"]] \
        .sort_values("event_id").reset_index(drop=True)


def row_number_orders(sf_dir: str):
    """Distributed zipWithIndex (ops/rank.py:global_row_number): dense
    global 1-based rank of every order by (o_totalprice DESC,
    o_orderkey) — one sort shuffle, O(#blocks) driver state."""
    from webvalid.ops.rank import global_row_number

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    ranked = global_row_number(ds, by=["o_totalprice", "o_orderkey"],
                               descending=[True, False], rank_col="rn")
    return ranked.select_columns(["o_orderkey", "rn"])


def tfidf_max_documents(sf_dir: str):
    """Per-doc max TF-IDF (ops/tfidf.py): DF pass + broadcast-sorted-
    hash score pass; the reduce keeps one row per doc."""
    from webvalid.ops.tfidf import tfidf_max_per_doc

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_max_per_doc(ds, text_col="text", id_col="doc_id")


def normalize_text_documents(sf_dir: str):
    """Text normalization (ops/textnorm.py): the gate derives a
    deliberately messy string from each doc IDENTICALLY on both sides
    (upper-cased text + doubled spaces + padding — the table's own
    text is already clean, which would make the kernel a no-op), then
    the engine normalizes it back: lower → collapse whitespace → trim."""
    from webvalid.ops.textnorm import normalize_text

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def messy(t: pa.Table) -> pa.Table:
        up = pc.utf8_upper(t["text"])
        two = pc.replace_substring(up, " ", "  ")
        pad = pc.binary_join_element_wise(
            pa.array([" \t"] * t.num_rows), two,
            pa.array(["\t "] * t.num_rows), "")
        return pa.table({"doc_id": t["doc_id"], "text": pad})

    out = normalize_text(ds.map_batches(messy, batch_format="pyarrow"),
                         keep=["doc_id"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def rollup_lang_source_documents(sf_dir: str):
    """GROUP BY ROLLUP (ops/reshape.py:rollup_counts): doc counts at
    (lang, source), (lang), and grand-total levels, 'ALL' marking the
    rolled-up positions."""
    from webvalid.ops.reshape import rollup_counts

    ds = _read(sf_dir, "documents", columns=["lang", "source"])
    return rollup_counts(ds, ["lang", "source"], out_col="n_docs")


def ntile_orders(sf_dir: str):
    """NTILE(10) by descending total price (ops/rank.py:global_ntile),
    rolled up per decile with order-insensitive price bounds."""
    from webvalid.ops.rank import global_ntile

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    tiled = global_ntile(ds, by=["o_totalprice", "o_orderkey"],
                         descending=[True, False], k=10)
    out = twophase_agg(tiled, ["bucket"],
                       {"n_orders": ("o_orderkey", "count"),
                        "min_price": ("o_totalprice", "min"),
                        "max_price": ("o_totalprice", "max")})
    return out.sort_values("bucket").reset_index(drop=True)


def repetition_documents(sf_dir: str):
    """Per-doc repetition profile (ops/textstats.py:repetition_stats):
    Gopher-style top-token / top-bigram fractions."""
    from webvalid.ops.textstats import repetition_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = repetition_stats(ds).to_pandas()
    # +1e-9 nudge (repo convention): fractions with power-of-2
    # denominators (max/n) hit EXACT halves at 6 dp, where pandas
    # rounds half-to-even and DuckDB ROUND half-away-from-zero
    out["top_token_frac"] = (out["top_token_frac"] + 1e-9).round(6)
    out["top_bigram_frac"] = (out["top_bigram_frac"] + 1e-9).round(6)
    return out.sort_values("doc_id").reset_index(drop=True)


def dup_ngram_documents(sf_dir: str):
    """Per-doc duplicate-trigram fraction
    (ops/textstats.py:dup_ngram_stats): the Gopher dup-n-gram
    repetition signal — fraction of trigram instances whose trigram
    occurs >= 2x in the doc. Docs with < 3 tokens emit no row."""
    from webvalid.ops.textstats import dup_ngram_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = dup_ngram_stats(ds, n=3).to_pandas()
    out["dup_ngram_frac"] = (out["dup_ngram_frac"] + 1e-9).round(6)
    return out.sort_values("doc_id").reset_index(drop=True)


def lead_value_events(sf_dir: str):
    """Per-user LEAD(value, 1) (ops/rank.py:lead_per_key) — null for
    each user's last event."""
    from webvalid.ops.rank import lead_per_key

    out = lead_per_key(_events_ts_us(sf_dir), key="user_id", order_col="ts_us",
                       value_col="value", tiebreak="event_id", n=1,
                       out_col="led").to_pandas()
    out["led"] = out["led"].round(6)
    return out[["event_id", "user_id", "led"]] \
        .sort_values("event_id").reset_index(drop=True)


def dense_rank_lineitem(sf_dir: str):
    """Per-order DENSE_RANK by quantity (ops/rank.py:dense_rank_per_key)
    — integer quantities tie constantly, so dense (gap-free, shared)
    ranks differ visibly from row numbers."""
    from webvalid.ops.rank import dense_rank_per_key

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity"])
    out = dense_rank_per_key(ds, key="l_orderkey", order_col="l_quantity",
                             tiebreak="l_linenumber", out_col="drank")
    return out.select_columns(["l_orderkey", "l_linenumber", "drank"])


def full_join_orders_customer(sf_dir: str):
    """FULL OUTER join (ops/joins.py:salted_full_join): orders ⟗
    customers-with-custkey%3≠0, so both polarities appear — orders
    missing a customer AND customers with no order — rolled up per
    COALESCEd segment with an exact right-only count."""
    import pyarrow.parquet as pq

    from webvalid.ops.joins import salted_full_join

    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    cust = cust.filter(pa.array(cust["c_custkey"].to_numpy() % 3 != 0))
    right = cust.rename_columns(["o_custkey", "c_mktsegment"])
    left = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])
    full = salted_full_join(left, right, key="o_custkey", num_buckets=16)

    def mark(t: pa.Table) -> pa.Table:
        return pa.table({
            "segment": pc.coalesce(t["c_mktsegment"], pa.scalar("UNMATCHED")),
            "is_right_only": pc.cast(pc.is_null(t["o_orderkey"]), pa.int64()),
        })

    out = twophase_agg(full.map_batches(mark, batch_format="pyarrow"),
                       ["segment"], {"n_rows": ("segment", "count"),
                                     "right_only": ("is_right_only", "sum")})
    return out.sort_values("segment").reset_index(drop=True)


def prep_corpus_v2_documents(sf_dir: str):
    """Composed prep v2 (ops/prep.py:prep_corpus_v2): dedup →
    repetition-quality filter (top-token ≤ 0.15, ≥ 20 tokens) →
    boilerplate strip over the filtered corpus → content-keyed split.
    One composed SQL oracle checks the whole chain value-exactly."""
    from webvalid.ops.prep import prep_corpus_v2

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = prep_corpus_v2(ds).to_pandas()
    return out[["doc_id", "split", "clean_text"]] \
        .sort_values("doc_id").reset_index(drop=True)


def sample_bottomk_documents(sf_dir: str, k: int = 100):
    """Deterministic uniform bottom-k sample (ops/sampling.py:
    bottomk_sample): the k docs with the smallest md5(text)."""
    from webvalid.ops.sampling import bottomk_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bottomk_sample(ds, k=k)


def histogram_price_lineitem(sf_dir: str):
    """Equi-width histogram of l_extendedprice over the mergeable
    NumericHistogram sketch (sketches.py): fixed [0, 100000) × 20 bins,
    bin -1 = underflow, 20 = overflow — per-batch partials merge
    associatively, so the combine is O(bins) regardless of rows."""
    from webvalid.sketches import NumericHistogram

    LO, HI, BINS = 0.0, 100_000.0, 20

    def partial(t: pa.Table) -> pa.Table:
        h = NumericHistogram(LO, HI, BINS)
        h.add_array(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        return pa.table({"blob": pa.array([h.serialize()], pa.binary())})

    parts = _read(sf_dir, "lineitem", columns=["l_extendedprice"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    total = NumericHistogram(LO, HI, BINS)
    for blob in parts["blob"]:
        total.merge(NumericHistogram.deserialize(blob))
    bins = [-1] + list(range(BINS)) + [BINS]
    cnts = [total.underflow] + total.counts.tolist() + [total.overflow]
    out = pd.DataFrame({"bin": bins, "cnt": cnts})
    return out[out["cnt"] > 0].reset_index(drop=True)


def percent_rank_orders(sf_dir: str):
    """PERCENT_RANK over all orders by price desc (ops/rank.py:
    global_percent_rank on the zipWithIndex machinery)."""
    from webvalid.ops.rank import global_percent_rank

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = global_percent_rank(ds, by=["o_totalprice", "o_orderkey"],
                              descending=[True, False], out_col="pr") \
        .select_columns(["o_orderkey", "pr"]).to_pandas()
    out["pr"] = out["pr"].round(6)
    return out.sort_values("o_orderkey").reset_index(drop=True)


def first_last_value_events(sf_dir: str):
    """Per-user FIRST_VALUE / LAST_VALUE of value in event-time order
    (ops/rank.py:first_last_value_per_key — keyscan run-boundary
    merge, one row per key)."""
    from webvalid.ops.rank import first_last_value_per_key

    out = first_last_value_per_key(_events_ts_us(sf_dir), key="user_id",
                                   order_col="ts_us", value_col="value",
                                   tiebreak="event_id").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def rank_lineitem(sf_dir: str):
    """Per-order RANK() by quantity (ops/rank.py:rank_per_key) —
    competition rank: ties share, gaps follow; same high-cardinality
    sort + O(#blocks) stitch machinery as dense_rank."""
    from webvalid.ops.rank import rank_per_key

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity"])
    out = rank_per_key(ds, key="l_orderkey", order_col="l_quantity",
                       tiebreak="l_linenumber", out_col="rnk")
    return out.select_columns(["l_orderkey", "l_linenumber", "rnk"])


def cume_dist_orders(sf_dir: str):
    """CUME_DIST over all orders by (price DESC, key) — the unique
    composite makes cume_dist = rn/n on the zipWithIndex rank
    (ops/rank.py:global_cume_dist)."""
    from webvalid.ops.rank import global_cume_dist

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = global_cume_dist(ds, by=["o_totalprice", "o_orderkey"],
                           descending=[True, False], out_col="cd") \
        .select_columns(["o_orderkey", "cd"]).to_pandas()
    out["cd"] = out["cd"].round(6)
    return out.sort_values("o_orderkey").reset_index(drop=True)


def rolling_minmax_value_events(sf_dir: str):
    """Per-user rolling MIN/MAX/SUM over the trailing 5-row frame
    (ops/rank.py:rolling_agg_per_key, three reducers in one pass)."""
    from webvalid.ops.rank import rolling_agg_per_key

    out = rolling_agg_per_key(_events_ts_us(sf_dir), key="user_id",
                              order_col="ts_us", value_col="value",
                              window=5, tiebreak="event_id",
                              aggs={"roll_min": "min", "roll_max": "max",
                                    "roll_sum": "sum"}).to_pandas()
    for c in ["roll_min", "roll_max", "roll_sum"]:
        out[c] = (out[c] + 1e-9).round(6)
    return out[["event_id", "user_id", "roll_min", "roll_max", "roll_sum"]] \
        .sort_values("event_id").reset_index(drop=True)


def range_join_events_days(sf_dir: str):
    """Interval join (ops/joins.py:broadcast_range_join): the 5 busiest
    calendar days (count DESC, day ASC — derived with a two-phase agg)
    become non-overlapping [day, day+24h) windows; events are
    range-joined to them with broadcast searchsorted and rolled up per
    window."""
    from webvalid.ops.joins import broadcast_range_join

    DAY_US = 86_400_000_000
    ds = _events_ts_us(sf_dir)

    def add_day(t: pa.Table) -> pa.Table:
        day = pc.multiply(pc.divide(t["ts_us"], DAY_US), DAY_US)
        return t.append_column("day_us", day)

    with_day = ds.map_batches(add_day, batch_format="pyarrow")
    counts = twophase_agg(with_day, ["day_us"], {"c": ("day_us", "count")})
    top5 = counts.sort_values(["c", "day_us"], ascending=[False, True]) \
        .head(5)
    intervals = pa.table({
        "win_start": pa.array(top5["day_us"].to_numpy(), pa.int64()),
        "win_end": pa.array(top5["day_us"].to_numpy() + DAY_US, pa.int64()),
    })
    joined = broadcast_range_join(ds, intervals, ts_col="ts_us",
                                  start_col="win_start", end_col="win_end")
    out = twophase_agg(joined, ["win_start"],
                       {"n_events": ("win_start", "count"),
                        "sum_value": ("value", "sum")})
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values("win_start").reset_index(drop=True)


def cube_lang_source_documents(sf_dir: str):
    """GROUP BY CUBE (ops/reshape.py:cube_counts): doc counts for every
    grouping subset of (lang, source) from one finest-partials pass."""
    from webvalid.ops.reshape import cube_counts

    ds = _read(sf_dir, "documents", columns=["lang", "source"])
    return cube_counts(ds, ["lang", "source"], out_col="n_docs")


def mode_event_type_by_user(sf_dir: str):
    """Per-user MODE of event_type (ops/agg.py:grouped_mode) with the
    deterministic (count DESC, value ASC) tie-break."""
    from webvalid.ops.agg import grouped_mode

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    out = grouped_mode(ds, key="user_id", val="event_type")
    return out.sort_values("user_id").reset_index(drop=True)


def entropy_event_type_by_user(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution
    (ops/agg.py:grouped_entropy) — the categorical-drift profile
    primitive."""
    from webvalid.ops.agg import grouped_entropy

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return grouped_entropy(ds, key="user_id", val="event_type")


def corr_qty_price_lineitem(sf_dir: str):
    """Per-returnflag Pearson correlation of (quantity, price) from the
    six mergeable sums (ops/agg.py:grouped_corr); null pairs excluded,
    as SQL corr() does."""
    from webvalid.ops.agg import grouped_corr

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    return grouped_corr(ds, key="l_returnflag", x="l_quantity",
                        y="l_extendedprice", out_col="corr_qp")


def stringagg_docs_by_lang_source(sf_dir: str):
    """Per-(lang, source) ordered doc_id concatenation (ops/reshape.py:
    grouped_string_agg — SQL string_agg ... ORDER BY doc_id)."""
    from webvalid.ops.reshape import grouped_string_agg

    ds = _read(sf_dir, "documents", columns=["lang", "source", "doc_id"])
    return grouped_string_agg(ds, ["lang", "source"], "doc_id",
                              sep=",", out_col="doc_ids")


def events_dow_hour(sf_dir: str):
    """Event counts by (ISO day-of-week, hour) — Arrow temporal kernels
    (pc.day_of_week week_start=1 count_from_zero=False == isodow) +
    two-phase agg."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def proj(t: pa.Table) -> pa.Table:
        dow = pc.day_of_week(t["ts"], count_from_zero=False, week_start=1)
        hr = pc.hour(t["ts"])
        return pa.table({"dow": pc.cast(dow, pa.int64()),
                         "hr": pc.cast(hr, pa.int64())})

    out = twophase_agg(ds.map_batches(proj, batch_format="pyarrow"),
                       ["dow", "hr"], {"cnt": ("dow", "count")})
    return out.sort_values(["dow", "hr"]).reset_index(drop=True)


def argmax_chars_documents(sf_dir: str):
    """Per-lang arg-max: the doc with the most characters (ties → min
    doc_id) via the two-phase top-N machinery with n=1
    (ops/rank.py:top_n_per_key)."""
    from webvalid.ops.rank import top_n_per_key

    ds = _read(sf_dir, "documents", columns=["lang", "doc_id", "n_chars"])
    out = top_n_per_key(ds, key="lang", order_col="n_chars", n=1,
                        tiebreak="doc_id", rank_col="rn")
    return out[["lang", "doc_id", "n_chars"]] \
        .sort_values("lang").reset_index(drop=True)


def redact_pii_documents(sf_dir: str):
    """PII redaction (ops/redact.py): the gate derives a messy string
    from each doc IDENTICALLY on both sides (the table's text contains
    no PII) — appending a doc-keyed email + phone — then the engine
    counts and masks them with Arrow RE2 kernels."""
    from webvalid.ops.redact import redact_pii

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def messy(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        id_str = pa.array(ids.astype(str))
        pad4 = pa.array(np.char.zfill((ids % 10000).astype(str), 4))
        n = t.num_rows
        mt = pc.binary_join_element_wise(
            t["text"], pa.array([" contact-"] * n), id_str,
            pa.array(["@example.com call +1-555-"] * n), pad4, "")
        return pa.table({"doc_id": t["doc_id"], "text": mt})

    out = redact_pii(ds.map_batches(messy, batch_format="pyarrow")) \
        .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def chunk_tokens_documents(sf_dir: str):
    """Fixed 32-token window chunking (ops/chunking.py:token_chunks) —
    LLM sequence-packing prep, one row per (doc, chunk)."""
    from webvalid.ops.chunking import token_chunks

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = token_chunks(ds, chunk_tokens=32).to_pandas()
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


def quantile_disc_price_lineitem(sf_dir: str):
    """EXACT discrete quantiles of l_extendedprice WITHOUT a global
    sort (ops/selection.py): iterative histogram bisection, O(rounds)
    streaming passes + an answer-sized collect — the exact twin of the
    tdigest sketch gate."""
    from webvalid.ops.selection import exact_quantile_disc

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    out = exact_quantile_disc(ds, "l_extendedprice", qs=[0.25, 0.5, 0.9])
    return out.reset_index(drop=True)


def distinct_users_by_type(sf_dir: str):
    """Per-type exact COUNT(DISTINCT user_id) (ops/agg.py:
    grouped_count_distinct) — domain-sized partials, no row shuffle."""
    from webvalid.ops.agg import grouped_count_distinct

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_count_distinct(ds, key="event_type", val="user_id",
                                  out_col="n_distinct")


def normalize_value_events(sf_dir: str):
    """Per-user min-max feature scaling of value (ops/agg.py:
    grouped_minmax_normalize): broadcast O(#keys) stats + vectorized
    searchsorted rescale."""
    from webvalid.ops.agg import grouped_minmax_normalize

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    out = grouped_minmax_normalize(ds, key="user_id", val="value",
                                   out_col="norm_value") \
        .select_columns(["event_id", "user_id", "norm_value"]).to_pandas()
    # min-max ratios are dyadic rationals, so exact .5 ties at the 6th
    # decimal DO occur — round half away from zero like SQL ROUND, not
    # numpy's half-even
    v = out["norm_value"].to_numpy()
    out["norm_value"] = np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6
    return out.sort_values("event_id").reset_index(drop=True)


def densify_hourly_events(sf_dir: str):
    """Gap-filled hourly event counts (ops/windows.py:densify_hourly):
    every hour in the global span appears, empty hours as 0."""
    from webvalid.ops.windows import densify_hourly

    return densify_hourly(_events_ts_us(sf_dir), ts_us_col="ts_us",
                          out_col="cnt")


def embedding_norms_by_label(sf_dir: str):
    """Per-label L2-norm profile of the embedding column — the vector-
    column statistics primitive (flatten → reshape → one BLAS pass per
    batch; mergeable (sum, n) partials)."""
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = t.num_rows
        m = flat.reshape(n, -1)
        norms = np.sqrt((m * m).sum(axis=1))
        df = pd.DataFrame({"label": t["label"].to_numpy(), "_s": norms,
                           "_n": 1})
        out = df.groupby("label", as_index=False, sort=False)[["_s", "_n"]] \
                .sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    c = parts.groupby("label", as_index=False, sort=False)[["_s", "_n"]].sum()
    out = pd.DataFrame({
        "label": c["label"].to_numpy().astype(np.int64),
        "n_vecs": c["_n"].to_numpy().astype(np.int64),
        "avg_norm": (c["_s"] / c["_n"]).round(6),
    })
    return out.sort_values("label").reset_index(drop=True)


def funnel_click_purchase_events(sf_dir: str):
    """Per-user click→purchase conversion within 1 h (ops/funnel.py:
    funnel_conversion — vectorized searchsorted per co-located key)."""
    from webvalid.ops.funnel import funnel_conversion

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type", "event_id"])

    def ts_us(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "ts_us": t["ts"].cast(pa.timestamp("us"))
                                         .cast(pa.int64()),
                         "event_type": t["event_type"],
                         "event_id": t["event_id"]})

    return funnel_conversion(ds.map_batches(ts_us, batch_format="pyarrow"),
                             key="user_id", ts_col="ts_us",
                             type_col="event_type", from_type="click",
                             to_type="purchase", horizon=3_600_000_000,
                             n_from_col="n_clicks", tiebreak="event_id")


def top_tokens_by_lang(sf_dir: str, k: int = 3):
    """Per-lang top-k tokens (grouped heavy hitters): vectorized
    flatten partials → driver combine → per-group head — the grouped
    twin of the global unigram top-k."""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern(t["text"], " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        rep = np.repeat(t["lang"].to_numpy(zero_copy_only=False),
                        np.nan_to_num(counts, nan=0).astype(np.int64))
        df = pd.DataFrame({"lang": rep, "token": flat.to_pandas()})
        out = df.groupby(["lang", "token"], as_index=False, sort=False).size() \
                .rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    comb = parts.groupby(["lang", "token"], as_index=False, sort=False)["cnt"].sum()
    comb = comb.sort_values(["lang", "cnt", "token"],
                            ascending=[True, False, True], kind="mergesort")
    top = comb.groupby("lang", sort=False).head(k).reset_index(drop=True)
    top["rn"] = top.groupby("lang", sort=False).cumcount() + 1
    return top[["lang", "token", "cnt", "rn"]]


def weighted_avg_price_lineitem(sf_dir: str):
    """Quantity-weighted mean price per returnflag — ratio of two
    mergeable sums (null pairs excluded, as SQL SUM of a product is)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_numpy(zero_copy_only=False),
            "_w": t["l_quantity"].to_numpy(zero_copy_only=False),
            "_x": t["l_extendedprice"].to_numpy(zero_copy_only=False),
        }).dropna(subset=["_w", "_x"])
        df["_xw"] = df["_x"] * df["_w"]
        out = df.groupby("l_returnflag", as_index=False, sort=False)[
            ["_xw", "_w"]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    c = parts.groupby("l_returnflag", as_index=False, sort=False)[
        ["_xw", "_w"]].sum()
    out = pd.DataFrame({"l_returnflag": c["l_returnflag"],
                        "wavg_price": (c["_xw"] / c["_w"]).round(6)})
    return out.sort_values("l_returnflag").reset_index(drop=True)


def share_by_priority_orders(sf_dir: str):
    """Ratio-to-report: each priority's share of all orders (two-phase
    counts; the total is the partials' own sum — no second pass)."""
    ds = _read(sf_dir, "orders", columns=["o_orderpriority"])
    out = twophase_agg(ds, ["o_orderpriority"],
                       {"n_orders": ("o_orderpriority", "count")})
    out["share"] = (out["n_orders"] / out["n_orders"].sum()).round(6)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def equidepth_buckets_price_lineitem(sf_dir: str):
    """Equi-DEPTH histogram: exact quartile boundaries from the
    histogram-bisection selection op (ops/selection.py), broadcast into
    a vectorized bucket-count pass — a two-op composition with no sort
    and no shuffle."""
    from webvalid.ops.selection import exact_quantile_disc

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    q = exact_quantile_disc(ds, "l_extendedprice", qs=[0.25, 0.5, 0.75])
    bounds = q["value"].to_numpy()

    def partial(t: pa.Table) -> pa.Table:
        v = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        b = np.searchsorted(bounds, v, side="left")
        cnt = np.bincount(b, minlength=4)
        return pa.table({"bucket": pa.array(np.arange(4, dtype=np.int64)),
                         "cnt": pa.array(cnt, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("bucket", as_index=False)["cnt"].sum()
    return out.sort_values("bucket").reset_index(drop=True)


def skew_kurtosis_price_lineitem(sf_dir: str):
    """Per-returnflag sample skewness / excess kurtosis of price —
    two-pass central-moment streaming (ops/agg.grouped_skew_kurt)."""
    from webvalid.ops.agg import grouped_skew_kurt

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    out = grouped_skew_kurt(ds, "l_returnflag", "l_extendedprice")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def zscore_outliers_price_lineitem(sf_dir: str):
    """Per-returnflag |z| > 2 outlier counts — broadcast-profile
    anomaly scan (ops/agg.zscore_outlier_counts)."""
    from webvalid.ops.agg import zscore_outlier_counts

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    out = zscore_outlier_counts(ds, "l_returnflag", "l_extendedprice", z=2.0)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def quantile_cont_price_lineitem(sf_dir: str):
    """Exact PERCENTILE_CONT quantiles of price via histogram
    bisection (ops/selection.exact_quantile_cont) — no sort."""
    from webvalid.ops.selection import exact_quantile_cont

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    return exact_quantile_cont(ds, "l_extendedprice",
                               qs=[0.1, 0.25, 0.5, 0.75, 0.9])


def dedup_keep_best_documents(sf_dir: str):
    """Exact dedup keeping the LONGEST copy per content group
    (ops/dedup.exact_dedup_keep_best — encoded-argmax hash groupby)."""
    from webvalid.ops.dedup import exact_dedup_keep_best

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    out = exact_dedup_keep_best(ds).to_pandas()
    out["cnt"] = out["cnt"].astype("int64")
    return out[["text_md5", "doc_id", "n_chars", "cnt"]] \
        .sort_values("text_md5", kind="mergesort").reset_index(drop=True)


def cap_per_lang_documents(sf_dir: str, k: int = 40):
    """Language-rebalancing cap: at most k docs per lang, picked by
    content-hash order (ops/sampling.cap_per_group)."""
    from webvalid.ops.sampling import cap_per_group

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return cap_per_group(ds, group_col="lang", k=k)


def anti_join_customers_no_orders(sf_dir: str):
    """Anti join (ops/joins.py:salted_anti_join): customers with NO
    urgent orders, rolled up per market segment — the inverse polarity
    of the semi-join gate, same zero-payload bucketed membership. (The
    urgent restriction keeps the gate non-degenerate: every customer
    has SOME order at these scales.)"""
    import pyarrow.parquet as pq

    from webvalid.ops.joins import salted_anti_join

    orders = pq.read_table(_t(sf_dir, "orders"),
                           columns=["o_custkey", "o_orderpriority"])
    orders = orders.filter(
        pc.equal(orders["o_orderpriority"], "1-URGENT"))
    right = orders.select(["o_custkey"]).rename_columns(["c_custkey"])
    left = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    kept = salted_anti_join(left, right, key="c_custkey", num_buckets=16)
    out = twophase_agg(kept.select_columns(["c_mktsegment"]),
                       ["c_mktsegment"],
                       {"n_customers": ("c_mktsegment", "count")})
    return out.sort_values("c_mktsegment").reset_index(drop=True)


_MASK_MOD, _MASK_LT = 7, 3  # event_id % 7 < 3 → value masked to NULL


def _masked_events(sf_dir: str):
    """Events with `value` deterministically masked to NULL on ~3/7 of
    rows — the shared fixture for the imputation gates (the raw table
    has no nulls; the mask is part of the query definition and is
    replicated verbatim in the SQL oracle)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def mask(t: pa.Table) -> pa.Table:
        ev = t["event_id"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.where(ev % _MASK_MOD < _MASK_LT, np.nan, v)
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "value": pa.array(v, pa.float64())})

    return ds.map_batches(mask, batch_format="pyarrow")


def fill_forward_value_events(sf_dir: str):
    """LOCF imputation (ops/impute.py:fill_forward_per_key): per-user
    fill-forward of masked values in event_id order."""
    from webvalid.ops.impute import fill_forward_per_key

    out = fill_forward_per_key(_masked_events(sf_dir), key="user_id",
                               order_col="event_id", tiebreak="event_id",
                               value_col="value").to_pandas()
    out = out[["event_id", "user_id", "filled"]]
    return out.sort_values("event_id", kind="mergesort").reset_index(drop=True)


def impute_group_mean_events(sf_dir: str):
    """Group-mean imputation (ops/impute.py:fill_group_mean): masked
    values replaced by the user's mean over surviving rows.

    The comparison rounds to 6 digits AFTER a +1e-9 nudge (mirrored in
    the oracle SQL): 2-decimal source values make several group means
    land EXACTLY on a 7th-decimal …5 boundary, where numpy (half-even)
    and DuckDB (half-away) round apart; the nudge moves both engines to
    the same side of every attainable boundary."""
    from webvalid.ops.impute import fill_group_mean

    ds = fill_group_mean(_masked_events(sf_dir), key="user_id",
                         value_col="value", ndigits=None)
    out = ds.select_columns(["event_id", "user_id", "filled"]).to_pandas()
    out["filled"] = (out["filled"] + 1e-9).round(6)
    return out.sort_values("event_id", kind="mergesort").reset_index(drop=True)


def geomean_chars_by_lang(sf_dir: str):
    """Per-lang geometric mean of document length
    (ops/agg.py:grouped_geomean — EXP(AVG(LN(n_chars))))."""
    from webvalid.ops.agg import grouped_geomean

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    return grouped_geomean(ds, "lang", "n_chars")


def extract_first_number_documents(sf_dir: str):
    """First decimal-number substring per document via the Arrow RE2
    regex kernel (pc.extract_regex) — null when no digits occur.
    Shares regex semantics with DuckDB's regexp_extract (also RE2)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ex(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["text"], r"(?P<num>[0-9]+)")
        return pa.table({"doc_id": t["doc_id"],
                         "first_num": pc.struct_field(m, "num")})

    out = ds.map_batches(ex, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


def median_mad_price_lineitem(sf_dir: str):
    """Robust location/scale per returnflag: exact median + MAD
    (ops/agg.py:grouped_median_mad — grouped histogram-bisection
    selection; streaming scans, no per-group Python)."""
    from webvalid.ops.agg import grouped_median_mad

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    out = grouped_median_mad(ds, "l_returnflag", "l_extendedprice")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def edit_distance_adjacent_documents(sf_dir: str, max_chars: int = 120):
    """Levenshtein distance between doc_id-consecutive documents per
    lang (ops/editdist.py — vectorized DP rows, prefix-min insertion
    scan), truncated to the first 120 chars."""
    from webvalid.ops.editdist import adjacent_edit_distances

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out = adjacent_edit_distances(ds, key="lang", order_col="doc_id",
                                  text_col="text",
                                  max_chars=max_chars).to_pandas()
    return out.sort_values(["lang", "doc_id"], kind="mergesort") \
              .reset_index(drop=True)


def rate_value_events(sf_dir: str):
    """Per-user value rate of change over event time
    (ops/rank.py:rate_per_key — sorted diff pass per group)."""
    from webvalid.ops.rank import rate_per_key

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def ts_us(t: pa.Table) -> pa.Table:
        return pa.table({"event_id": t["event_id"], "user_id": t["user_id"],
                         "ts_us": t["ts"].cast(pa.timestamp("us"))
                                         .cast(pa.int64()),
                         "value": t["value"]})

    out = rate_per_key(ds.map_batches(ts_us, batch_format="pyarrow"),
                       key="user_id", order_col="ts_us",
                       value_col="value", tiebreak="event_id").to_pandas()
    out = out[["event_id", "user_id", "rate"]]
    return out.sort_values("event_id", kind="mergesort").reset_index(drop=True)


def sliding_3h_distinct_users_events(sf_dir: str):
    """Trailing-3h distinct active users per hour
    (ops/windows.py:windowed_distinct — (bucket, id) pair dedup, the
    non-mergeable COUNT DISTINCT decomposed into a bounded pair
    domain)."""
    from webvalid.ops.windows import windowed_distinct

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])
    out = windowed_distinct(ds, ts_col="ts", id_col="user_id",
                            bucket_us=3_600_000_000, n_buckets=3)
    return out.rename(columns={"n_ids": "n_users"})


# ---------------------------------------------------------------------------
# Session-6 additions: paragraph dedup, streaks, winsorized mean, trend
# ---------------------------------------------------------------------------


def dedup_paragraphs_documents(sf_dir: str, chunk_tokens: int = 16):
    """Paragraph(chunk)-level exact dedup with document rebuild
    (ops/paradedup.chunk_dedup_rebuild): first occurrence of each
    distinct 16-token chunk wins; docs are rewritten from surviving
    chunks, batch-locally."""
    from webvalid.ops.paradedup import chunk_dedup_rebuild

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = chunk_dedup_rebuild(ds, chunk_tokens=chunk_tokens).to_pandas()
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


def streaks_events_users(sf_dir: str):
    """Gaps-and-islands per user: longest run of equal consecutive
    event types in (ts, event_id) order + total run count
    (ops/rank.streaks_per_key)."""
    from webvalid.ops.rank import streaks_per_key

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])
    out = streaks_per_key(ds, "user_id", "ts", "event_id",
                          "event_type").to_pandas()
    return out.sort_values("user_id", kind="mergesort").reset_index(drop=True)


def winsorized_mean_price_lineitem(sf_dir: str):
    """Per-returnflag mean of price winsorized at the global exact
    [p05, p95] PERCENTILE_CONT fences (ops/agg.winsorized_mean —
    histogram-bisection quantiles, clip-and-sum two-phase)."""
    from webvalid.ops.agg import winsorized_mean

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    return winsorized_mean(ds, "l_returnflag", "l_extendedprice")


_TREND_T0_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC


def trend_value_by_type_events(sf_dir: str):
    """Per-event-type least-squares trend of value vs integer hours
    since 2024-01-01 (ops/agg.grouped_regr_slope — mergeable moment
    partials; x pre-centered to small ints so Σx/Σxx are exact)."""
    from webvalid.ops.agg import grouped_regr_slope

    def add_x(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        xh = pc.divide(pc.subtract(us, _TREND_T0_US), 3_600_000_000)
        return t.append_column("xh", xh)

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"]) \
        .map_batches(add_x, batch_format="pyarrow")
    return grouped_regr_slope(ds, "event_type", "xh", "value")


def rolling_1h_sum_value_events(sf_dir: str):
    """Per-user RANGE-frame rolling sum: value summed over the
    trailing hour including peer rows (ops/rank.
    rolling_range_sum_per_key — SQL RANGE BETWEEN ... PRECEDING)."""
    from webvalid.ops.rank import rolling_range_sum_per_key

    def add_us(t: pa.Table) -> pa.Table:
        return t.append_column("ts_us", pc.cast(t["ts"], pa.int64()))

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"]) \
        .map_batches(add_us, batch_format="pyarrow")
    out = rolling_range_sum_per_key(ds, "user_id", "ts_us", "value",
                                    "event_id", 3_600_000_000).to_pandas()
    return out[["event_id", "user_id", "range_sum"]] \
        .sort_values("event_id", kind="mergesort").reset_index(drop=True)


def retention_cohorts_events(sf_dir: str):
    """Cohort retention matrix: distinct users per (first-active-day,
    day-offset) cell (ops/retention.retention_matrix — MIN-partials +
    zero-copy broadcast + bounded distinct-triple partials)."""
    from webvalid.ops.retention import retention_matrix

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    out = retention_matrix(ds, "user_id", "ts")
    out["n_users"] = out["n_users"].astype("int64")
    return out


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 6):
    """Distributed Lloyd k-means over the embedding table
    (ops/kmeans.kmeans_distributed — one streaming pass per iteration,
    O(k·d) mergeable partials, deterministic smallest-id init).
    Rows-only gate: iterative, not SQL-expressible."""
    from webvalid.ops.kmeans import kmeans_distributed

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent, hist, sizes = kmeans_distributed(ds, k=k, iters=iters)
    return pd.DataFrame({
        "cluster": np.arange(len(sizes), dtype=np.int64),
        "n": sizes.astype("int64"),
        "inertia_final": round(float(hist["inertia"].iloc[-1]), 4),
    })


def psi_lang_by_source_documents(sf_dir: str):
    """Population Stability Index of each source's lang distribution
    vs the pooled rest of the corpus (sketches.psi_two_sample over
    two-phase (source, lang) count partials — O(sources × langs)
    driver math, nothing else moves)."""
    from webvalid.ops.agg import _keyval_counts
    from webvalid.sketches import psi_two_sample

    ds = _read(sf_dir, "documents", columns=["source", "lang"])
    counts = _keyval_counts(ds, "source", "lang")
    pivot = counts.pivot_table(index="source", columns="lang", values="_c",
                               fill_value=0, aggfunc="sum").sort_index()
    mat = pivot.to_numpy(np.float64)
    totals = mat.sum(axis=0)
    rows = []
    for i, src in enumerate(pivot.index):
        psi = psi_two_sample(mat[i], totals - mat[i], smooth=0.5)
        rows.append({"source": src, "psi": round(psi + 1e-9, 6)})
    return pd.DataFrame(rows).sort_values("source").reset_index(drop=True)


def coverage_15min_events_users(sf_dir: str):
    """Per-user union length of 15-minute activity intervals
    (ops/windows.interval_coverage_per_key — merged-interval
    gaps-and-islands, integer-exact)."""
    from webvalid.ops.windows import interval_coverage_per_key

    def add_us(t: pa.Table) -> pa.Table:
        return t.append_column("ts_us", pc.cast(t["ts"], pa.int64()))

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"]) \
        .map_batches(add_us, batch_format="pyarrow")
    out = interval_coverage_per_key(ds, "user_id", "ts_us",
                                    dur_us=900_000_000,
                                    tiebreak="event_id").to_pandas()
    return out.sort_values("user_id", kind="mergesort").reset_index(drop=True)


def benford_price_lineitem(sf_dir: str):
    """First-significant-digit (Benford) profile of price-in-cents:
    exact integer digit extraction (repeated integer division — no
    float log10 edge cases), two-phase digit-count partials, observed
    vs Benford-expected fractions."""
    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        x = x[~np.isnan(x)]
        cents = np.round(x * 100).astype(np.int64)
        d = cents[cents > 0]
        while (d >= 10).any():
            d = np.where(d >= 10, d // 10, d)
        cnt = np.bincount(d, minlength=10)[1:]
        return pa.table({"digit": pa.array(np.arange(1, 10), pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    c = parts.groupby("digit", as_index=False)["n"].sum()
    # GROUP BY semantics: a digit no price starts with has no row
    # (the SQL twin can't emit zero-count groups)
    c = c[c["n"] > 0].reset_index(drop=True)
    total = float(c["n"].sum())
    c["frac"] = ((c["n"] / total) + 1e-9).round(6)
    c["expected"] = np.round(np.log10(1.0 + 1.0 / c["digit"].to_numpy())
                             + 1e-9, 6)
    return c.sort_values("digit").reset_index(drop=True)


def ewma_value_events(sf_dir: str, alpha: float = 0.25):
    """Per-user EWMA of value in (ts, event_id) order
    (ops/rank.ewma_per_key — recursive form, C-level scan per key)."""
    from webvalid.ops.rank import ewma_per_key

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])
    out = ewma_per_key(ds, "user_id", "ts", "event_id", "value",
                       alpha).to_pandas()
    return out[["event_id", "user_id", "ewma"]] \
        .sort_values("event_id", kind="mergesort").reset_index(drop=True)


def weighted_sample_documents(sf_dir: str, step: int = 5_000):
    """Deterministic PPS sampling of documents weighted by n_chars
    (ops/sampling.systematic_weighted_sample — exact int64 cumulative
    weights, block-offset stitch, reproducible on any layout)."""
    from webvalid.ops.sampling import systematic_weighted_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    out = systematic_weighted_sample(ds, "doc_id", "n_chars", step) \
        .to_pandas()
    return out.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


def new_users_daily_events(sf_dir: str):
    """Daily new-user counts + cumulative distinct users
    (ops/retention.new_users_daily — first-seen MIN partials)."""
    from webvalid.ops.retention import new_users_daily

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    out = new_users_daily(ds, "user_id", "ts")
    out["n_new"] = out["n_new"].astype("int64")
    out["n_cum"] = out["n_cum"].astype("int64")
    return out


def chi2_lang_source_documents(sf_dir: str):
    """Chi-squared independence test + Cramér's V on the
    lang × source contingency table (ops/agg.chi2_independence —
    two-phase count partials, answer-sized table math). The p-value
    (engine-computed incomplete gamma) is excluded from the gate
    projection — DuckDB has no chi2 SF."""
    from webvalid.ops.agg import chi2_independence

    ds = _read(sf_dir, "documents", columns=["lang", "source"])
    out = chi2_independence(ds, "lang", "source")
    return out[["chi2", "dof", "cramers_v"]]


def hmean_chars_by_lang(sf_dir: str):
    """Per-lang harmonic mean of document length
    (ops/agg.grouped_harmonic_mean — COUNT/SUM(1/x))."""
    from webvalid.ops.agg import grouped_harmonic_mean

    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    return grouped_harmonic_mean(ds, "lang", "n_chars")


def snapshot_diff_documents(sf_dir: str):
    """Snapshot regression diff (ops/tablediff.snapshot_diff): the NEW
    side is derived deterministically from documents — doc_id % 97
    rows removed, doc_id % 101 texts edited, 3 fresh keys appended —
    and the diff must recover exactly those added/removed/changed
    sets. Only (key, fingerprint) pairs shuffle."""
    import pyarrow.parquet as pq

    from webvalid.ops.tablediff import snapshot_diff

    old_ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # answer-sized: max(doc_id) from parquet row-group statistics
    # (fallback: distributed max — never a driver-side column read)
    pf = pq.ParquetFile(_t(sf_dir, "documents"))
    ci = pf.schema_arrow.get_field_index("doc_id")
    stats = [pf.metadata.row_group(i).column(ci).statistics
             for i in range(pf.metadata.num_row_groups)]
    if stats and all(s is not None and s.has_min_max for s in stats):
        max_id = max(s.max for s in stats)
    else:
        max_id = int(_read(sf_dir, "documents",
                           columns=["doc_id"]).max("doc_id"))

    def mutate(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % 97 != 0
        t = t.filter(pa.array(keep))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        edited = pc.binary_join_element_wise(t["text"], " EDITED", "")
        text = pc.if_else(pa.array(ids % 101 == 0), edited, t["text"])
        return pa.table({"doc_id": t["doc_id"], "text": text})

    fresh = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(max_id + 1, max_id + 4, dtype=np.int64),
        "text": ["new doc"] * 3,
    }))
    new_ds = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(mutate, batch_format="pyarrow").union(fresh)
    return snapshot_diff(old_ds, new_ds, "doc_id", ["text"])


def ranksum_error_value_events(sf_dir: str):
    """Mann-Whitney rank-sum test: do 'error' events draw their value
    from the same distribution as the rest? (ops/agg.ranksum_test —
    bounded-domain count partials, tie-corrected z)."""
    from webvalid.ops.agg import ranksum_test

    def flag(t: pa.Table) -> pa.Table:
        return t.append_column("is_err",
                               pc.equal(t["event_type"], "error"))

    ds = _read(sf_dir, "events", columns=["event_type", "value"]) \
        .map_batches(flag, batch_format="pyarrow")
    return ranksum_test(ds, "value", "is_err")


def mutual_info_lang_source_documents(sf_dir: str):
    """Mutual information + normalized MI of (lang, source)
    (ops/agg.mutual_information — two-phase contingency counts)."""
    from webvalid.ops.agg import mutual_information

    ds = _read(sf_dir, "documents", columns=["lang", "source"])
    return mutual_information(ds, "lang", "source")


def storage_join_orders_customer(sf_dir: str):
    """Storage-partitioned join (ops/joins.write_bucketed +
    storage_partitioned_join): both sides laid out as
    bucket=hash(key)%16 parquet once, then joined bucket-by-bucket
    with NO shuffle — the bucketed-table join that amortizes a
    repeated all-to-all into a one-time layout cost. Aggregated per
    market segment."""
    import shutil
    import tempfile

    from webvalid.ops.joins import storage_partitioned_join, write_bucketed

    base = tempfile.mkdtemp(prefix="wv_spj_")
    try:
        orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

        def rename(t: pa.Table) -> pa.Table:
            return t.rename_columns(["o_custkey", "c_mktsegment"])

        write_bucketed(orders, "o_custkey", f"{base}/orders", 16)
        write_bucketed(cust.map_batches(rename, batch_format="pyarrow"),
                       "o_custkey", f"{base}/customer", 16)
        joined = storage_partitioned_join(f"{base}/orders",
                                          f"{base}/customer", "o_custkey")
        out = twophase_agg(joined, ["c_mktsegment"],
                           {"n_orders": ("o_totalprice", "count"),
                            "sum_total": ("o_totalprice", "sum")})
        out["sum_total"] = (out["sum_total"] + 1e-9).round(2)
        return out.sort_values("c_mktsegment", kind="mergesort") \
                  .reset_index(drop=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def audio_features_documents(sf_dir: str):
    """REAL audio decode through the actor pool
    (ops/multimodal.AudioFeatures): a deterministic PCM WAV payload is
    synthesized per document (sine at 100 + doc_id % 200 Hz, 0.25 s
    @ 8 kHz) inside map_batches, then decoded back by the actor-pool
    stage — rate/duration exact, RMS/ZCR rounded. Rows-only gate (no
    SQL audio codec); the plumbing contract (binary column, byte-aware
    batches, null marker) is the point."""
    import struct

    from webvalid.ops.multimodal import audio_features

    RATE, N = 8_000, 2_000

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        ts = np.arange(N, dtype=np.float64) / RATE
        fmt = struct.pack("<HHIIHH", 1, 1, RATE, RATE * 2, 2, 16)
        for d in ids:
            freq = 100.0 + float(d % 200)
            data = (0.4 * np.sin(2 * np.pi * freq * ts) * 32767) \
                .astype(np.int16).tobytes()
            payloads.append(
                b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return pa.table({"doc_id": t["doc_id"],
                         "audio": pa.array(payloads, pa.binary())})

    ds = _read(sf_dir, "documents", columns=["doc_id"]) \
        .map_batches(synth, batch_format="pyarrow")
    out = audio_features(ds, payload_col="audio", id_col="doc_id") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    out["rms"] = out["rms"].round(4)
    out["zcr"] = out["zcr"].round(4)
    return out[["doc_id", "sample_rate", "n_channels", "duration_sec",
                "rms", "zcr"]]


def overlap_users_click_purchase(sf_dir: str, p: int = 14):
    """HLL audience overlap: distinct users who click, who purchase,
    and the inclusion–exclusion estimate of the intersection
    (|A| + |B| − |A∪B|) from three mergeable sketches built in ONE
    pass — the sketch path for set overlap when exact
    COUNT(DISTINCT) can't be co-located. Rows-only gate
    (estimates); the pytest pins tolerance vs exact."""
    import pickle as _pickle

    from webvalid.sketches import HyperLogLog

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        sks = []
        for mask in (et == "click", et == "purchase"):
            h = HyperLogLog(p)
            h.add(uid[mask])
            sks.append(_pickle.dumps(h))
        return pa.table({"which": pa.array([0, 1], pa.int64()),
                         "sk": pa.array(sks, pa.binary())})

    parts = _read(sf_dir, "events", columns=["user_id", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = []
    for w in (0, 1):
        blobs = parts.loc[parts["which"] == w, "sk"].tolist()
        acc = _pickle.loads(blobs[0])
        for b in blobs[1:]:
            acc.merge(_pickle.loads(b))
        merged.append(acc)
    # the union sketch is register-wise max of the two — merging the
    # per-class sketches is bit-identical to hashing the union rows,
    # so no third per-batch sketch is ever built
    a = merged[0].estimate()
    b = merged[1].estimate()
    u = merged[0].merge(merged[1]).estimate()
    return pd.DataFrame({
        "n_click_est": [round(a, 1)], "n_purchase_est": [round(b, 1)],
        "n_union_est": [round(u, 1)],
        "n_overlap_est": [round(a + b - u, 1)],
    })


def compression_ratio_documents(sf_dir: str):
    """Per-doc zlib compression ratio (ops/textstats.
    compression_ratio_batch) — rows-only gate (no SQL codec);
    deterministic at fixed zlib level."""
    from webvalid.ops.textstats import compression_ratio_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(compression_ratio_batch, batch_format="pyarrow")
    return ds.to_pandas().sort_values("doc_id", kind="mergesort") \
        .reset_index(drop=True)


def expectations_lineitem(sf_dir: str):
    """Declarative expectation suite over lineitem
    (checks/expectations.run_expectations — six kinds, ONE streaming
    pass for all metrics)."""
    from webvalid.checks.expectations import run_expectations

    ds = _read(sf_dir, "lineitem",
               columns=["l_discount", "l_extendedprice", "l_quantity",
                        "l_returnflag"])
    out = run_expectations(ds, [
        {"kind": "null_frac_le", "column": "l_discount", "value": 0.5},
        {"kind": "min_ge", "column": "l_extendedprice", "value": 0.0},
        {"kind": "max_le", "column": "l_quantity", "value": 100.0},
        {"kind": "mean_between", "column": "l_extendedprice",
         "value": [1.0, 1e6]},
        {"kind": "in_set", "column": "l_returnflag",
         "value": ["A", "N", "R"]},
        {"kind": "match_frac_ge", "column": "l_returnflag",
         "pattern": "^[ANR]$", "value": 0.99},
    ])
    return out.sort_values(["expectation", "column"],
                           kind="mergesort").reset_index(drop=True)


def anomalous_hours_events(sf_dir: str, window: int = 24):
    """Rolling z-score anomaly scan over the gap-filled hourly event
    series: each hour scored against the mean/σ (sample) of its
    trailing `window` hours (current hour excluded). The hourly series
    is answer-sized (densify_hourly partials), so the scoring is
    driver math; SQL twin uses the identical ROWS frame."""
    from webvalid.ops.windows import densify_hourly

    def add_us(t: pa.Table) -> pa.Table:
        return t.append_column("ts_us", pc.cast(t["ts"], pa.int64()))

    ds = _read(sf_dir, "events", columns=["ts"]) \
        .map_batches(add_us, batch_format="pyarrow")
    hourly = densify_hourly(ds)
    prev = hourly["cnt"].shift(1)
    roll = prev.rolling(window, min_periods=1)
    mean, std = roll.mean(), roll.std(ddof=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        z = (hourly["cnt"] - mean) / std.replace(0.0, np.nan)
    out = pd.DataFrame({
        "window_start": hourly["window_start"],
        "cnt": hourly["cnt"].astype("int64"),
        "zscore": (z + 1e-9).round(6),
        "is_anomaly": (z.abs() > 3).fillna(False),
    })
    return out.reset_index(drop=True)


def logreg_error_events(sf_dir: str, iters: int = 15):
    """Distributed full-batch logistic regression (ops/sgd.logreg_fit):
    P(event_type == 'error') from (value, hour-of-day) — one exact
    gradient pass per iteration, O(d) mergeable partials. Rows-only
    gate (iterative, not SQL-expressible); deterministic on any
    partition layout, coefficients rounded."""
    from webvalid.ops.sgd import logreg_fit

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = pa.array((us % 86_400_000_000) // 3_600_000_000,
                        pa.int64()).cast(pa.float64())
        return pa.table({
            "value": t["value"],
            "hour": hour,
            "is_err": pc.cast(pc.equal(t["event_type"], "error"),
                              pa.float64()),
        })

    ds = _read(sf_dir, "events", columns=["ts", "value", "event_type"]) \
        .map_batches(prep, batch_format="pyarrow")
    w, b, hist = logreg_fit(ds, ["value", "hour"], "is_err", iters=iters)
    return pd.DataFrame({
        "feature": ["value", "hour", "_intercept"],
        "coef": np.round(np.append(w, b) + 1e-9, 6),
        "final_log_loss": round(float(hist["log_loss"].iloc[-1]), 6),
    })


def schema_evolution_documents(sf_dir: str):
    """Schema-evolution-tolerant read (sources.read_parquet_evolving):
    documents are re-laid-out as two files — odd doc_ids written
    WITHOUT the `source` column (the pre-evolution layout) — and read
    back under the union schema with typed nulls, then counted per
    source. NULL source is reported as '__none__' (deterministic
    ordering on both sides)."""
    import pyarrow.parquet as pq
    import shutil
    import tempfile

    from webvalid.sources import read_parquet_evolving

    base = tempfile.mkdtemp(prefix="wv_evo_")
    try:
        t = pq.read_table(_t(sf_dir, "documents"),
                          columns=["doc_id", "source"])
        odd = pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1)
        pq.write_table(t.filter(pc.invert(odd)), f"{base}/even.parquet")
        pq.write_table(t.filter(odd).drop_columns(["source"]),
                       f"{base}/odd_nosource.parquet")
        ds = read_parquet_evolving([f"{base}/even.parquet",
                                    f"{base}/odd_nosource.parquet"])

        def partial(tt: pa.Table) -> pa.Table:
            src = pc.fill_null(tt["source"], "__none__")
            df = pd.DataFrame({"source": src.to_numpy(zero_copy_only=False)})
            out = df.groupby("source", as_index=False).size() \
                    .rename(columns={"size": "n"})
            return pa.Table.from_pandas(out, preserve_index=False)

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        out = parts.groupby("source", as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out.sort_values("source", kind="mergesort") \
                  .reset_index(drop=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def sink_roundtrip_events(sf_dir: str):
    """CSV + JSONL sink round-trip: the (event_id, event_type) slice is
    written with ray.data write_csv / write_json, read back with the
    matching readers, and counted per (format, event_type) — proving
    both sinks preserve the data exactly."""
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="wv_sink_")
    try:
        ds = _read(sf_dir, "events", columns=["event_id", "event_type"])
        ds.write_csv(f"{base}/csv")
        ds.write_json(f"{base}/jsonl")
        frames = []
        for fmt, rd in (("csv", ray.data.read_csv(f"{base}/csv")),
                        ("jsonl", ray.data.read_json(f"{base}/jsonl"))):
            out = twophase_agg(rd.select_columns(["event_type"]),
                               ["event_type"],
                               {"n": ("event_type", "count")})
            out["fmt"] = fmt
            frames.append(out)
        out = pd.concat(frames, ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return out[["fmt", "event_type", "n"]] \
            .sort_values(["fmt", "event_type"], kind="mergesort") \
            .reset_index(drop=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def lm_scores_documents(sf_dir: str):
    """Corpus bigram-LM quality scores (ops/lm.bigram_lm_scores —
    add-one smoothed, trained on the corpus itself; docs with < 2
    tokens define no bigram and drop)."""
    from webvalid.ops.lm import bigram_lm_scores

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bigram_lm_scores(ds)


def containment_documents(sf_dir: str, theta: float = 0.9):
    """Near-containment pairs via winnowing-fingerprint overlap
    (ops/dedup.containment_pairs) — catches doc-inside-doc that
    whole-document Jaccard misses. Rows-only gate (winnowing is not
    SQL-expressible); exact duplicate docs surface at containment
    1.0, so the result set is stable."""
    from webvalid.ops.dedup import containment_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return containment_pairs(ds, theta=theta)


# ---- round-3: checked twins for the approximate / iterative gates ----
# Each converts a rows-only gate family into a value-exact one: the
# engine computes BOTH the approximation and an exact answer (or an
# invariant), returns the exact values plus in-bound flags, and the
# SQL twin recomputes the exact side and expects the flags TRUE. A
# sketch/iteration bug flips a flag → hash mismatch → red gate.


def distinct_hll_checked_documents(sf_dir: str):
    """HLL estimates asserted against exact distinct counts (computed
    distributedly via groupby-count) — 1.04/√m standard error, flag
    checks 5σ. SQL twin: COUNT(DISTINCT col) + TRUE."""
    cols = ["lang", "source", "text"]
    hlls = _hll_all_columns(sf_dir, "documents", cols, p=12)
    rows = []
    bound = 5 * 1.04 / np.sqrt(1 << 12)
    for c in cols:
        dds = _read(sf_dir, "documents", columns=[c])

        def nn(t: pa.Table, c=c) -> pa.Table:
            return t.filter(pc.is_valid(t[c]))

        exact = dds.map_batches(nn, batch_format="pyarrow") \
            .groupby(c).count().count()
        est = hlls[c].estimate()
        rows.append({"column": c, "distinct_exact": int(exact),
                     "hll_in_bound": bool(abs(est - exact) <= bound * exact)})
    return pd.DataFrame(rows)


def grouped_distinct_hll_checked_events(sf_dir: str):
    """Per-group HLL distinct estimates asserted against per-group
    exact COUNT(DISTINCT) — grouped sketch twin of
    distinct_hll_checked_documents (ops/agg.grouped_distinct_hll: one
    flat maximum.at per block, driver max-fold of 2^p-byte partials).
    Flag checks 5σ = 5·1.04/√m per group. SQL twin: COUNT(DISTINCT
    user_id) per event_type + TRUE."""
    from webvalid.ops.agg import grouped_count_distinct, grouped_distinct_hll

    p = 12
    bound = 5 * 1.04 / np.sqrt(1 << p)
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    est = grouped_distinct_hll(ds, key="event_type", val="user_id", p=p)
    ds2 = _read(sf_dir, "events", columns=["event_type", "user_id"])
    exact = grouped_count_distinct(ds2, key="event_type", val="user_id",
                                   out_col="distinct_exact")
    out = exact.merge(est, on="event_type", how="left")
    out["distinct_exact"] = out["distinct_exact"].astype("int64")
    out["hll_in_bound"] = (
        (out["distinct_est"] - out["distinct_exact"]).abs()
        <= bound * out["distinct_exact"]).astype(bool)
    return out[["event_type", "distinct_exact", "hll_in_bound"]] \
        .sort_values("event_type", kind="mergesort").reset_index(drop=True)


def quantiles_tdigest_checked_lineitem(sf_dir: str):
    """TDigest quantile estimates rank-checked against the data (the
    estimate's true rank must sit within 2% of q) with the EXACT
    quantile_cont values returned for the hash compare. SQL twin:
    quantile_cont + TRUE."""
    from webvalid.ops.selection import exact_quantile_cont
    from webvalid.sketches import TDigest

    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    exact = exact_quantile_cont(ds, "l_extendedprice", qs=qs)

    def td_partial(t: pa.Table) -> pa.Table:
        td = TDigest()
        td.add_array(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        return pa.table({"state": pa.array([td.serialize()], pa.binary())})

    parts = ds.map_batches(td_partial, batch_format="pyarrow").take_all()
    td = TDigest.deserialize(parts[0]["state"])
    for p in parts[1:]:
        td.merge(TDigest.deserialize(p["state"]))
    ests = np.array([td.quantile(q) for q in qs])
    ests_ref = ray.put(ests)

    def rank_partial(t: pa.Table) -> pa.Table:
        v = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        v = v[~pd.isna(v)]
        thr = ray.get(ests_ref)
        le = np.array([(v <= x).sum() for x in thr], np.int64)
        return pa.table({"i": pa.array(np.arange(len(thr), dtype=np.int64)),
                         "le": pa.array(le), "n": pa.array(
                             np.full(len(thr), len(v), np.int64))})

    rp = ds.map_batches(rank_partial, batch_format="pyarrow").to_pandas() \
        .groupby("i", as_index=False).sum()
    frac = rp["le"].to_numpy(np.float64) / rp["n"].to_numpy(np.float64)
    ok = np.abs(frac - np.asarray(qs)) <= 0.02
    out = exact.copy()
    out["rank_err_ok"] = ok
    return out


def overlap_users_checked_events(sf_dir: str):
    """Exact click/purchase audience overlap (two-phase distinct
    (user, class) partials — O(#users) driver set math) with the HLL
    inclusion–exclusion estimates asserted in-bound (5σ of 1.04/√m,
    p=14). SQL twin: COUNT(DISTINCT ...) + an INTERSECT + TRUE."""
    import pickle as _pickle

    from webvalid.sketches import HyperLogLog

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        sks, users = [], []
        for mask in (et == "click", et == "purchase"):
            h = HyperLogLog(14)
            h.add(uid[mask])
            sks.append(_pickle.dumps(h))
            users.append(np.unique(uid[mask]).tobytes())
        return pa.table({"which": pa.array([0, 1], pa.int64()),
                         "sk": pa.array(sks, pa.binary()),
                         "uniq": pa.array(users, pa.binary())})

    parts = _read(sf_dir, "events", columns=["user_id", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    merged, exact_sets = [], []
    for w in (0, 1):
        rows = parts[parts["which"] == w]
        acc = _pickle.loads(rows["sk"].iloc[0])
        s: set = set()
        for b in rows["sk"].iloc[1:]:
            acc.merge(_pickle.loads(b))
        for u in rows["uniq"]:
            s.update(np.frombuffer(u, dtype=np.int64).tolist())
        merged.append(acc)
        exact_sets.append(s)
    a_est, b_est = merged[0].estimate(), merged[1].estimate()
    u_est = merged[0].merge(merged[1]).estimate()
    na, nb = len(exact_sets[0]), len(exact_sets[1])
    novl = len(exact_sets[0] & exact_sets[1])
    bound = 5 * 1.04 / np.sqrt(1 << 14)
    ok = (abs(a_est - na) <= bound * max(na, 1)
          and abs(b_est - nb) <= bound * max(nb, 1)
          and abs(u_est - (na + nb - novl)) <= bound * max(na + nb - novl, 1))
    return pd.DataFrame({"n_click": [na], "n_purchase": [nb],
                         "n_overlap": [novl], "hll_in_bound": [bool(ok)]})


def kmeans_checked_embeddings(sf_dir: str, k: int = 8, iters: int = 6):
    """Lloyd k-means invariants as a value-exact gate: every point
    assigned (cluster sizes sum to the table's row count — the SQL
    side), k non-empty clusters, and the inertia history monotonically
    non-increasing (Lloyd's guarantee; a wrong partial merge breaks
    it). SQL twin: COUNT(*) + literals."""
    from webvalid.ops.kmeans import kmeans_distributed

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent, hist, sizes = kmeans_distributed(ds, k=k, iters=iters)
    inertia = hist["inertia"].to_numpy(np.float64)
    return pd.DataFrame({
        "n_points": [int(sizes.sum())],
        "k_nonempty": [int((sizes > 0).sum())],
        "inertia_monotone": [bool(np.all(np.diff(inertia) <= 1e-9))],
    })


def logreg_separable_events(sf_dir: str, iters: int = 30):
    """Closed-form logistic-regression check: labels are a threshold
    rule on `value` with a margin (|value − 35| ≥ 15 kept), so the
    1-D problem is linearly separable with a wide gap and full-batch
    GD reaches ZERO training errors well within the budget (measured:
    zero from iteration ~17) — which SQL states in closed form
    (0 AS n_errors, COUNT(*) AS n_points). The prepped table is
    materialized once so each GD pass scans cached blocks."""
    from webvalid.ops.sgd import logreg_fit

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(pc.abs(pc.subtract(t["value"], 35.0)), 15.0)
        t = t.filter(keep)
        return pa.table({
            "x": t["value"],
            "y": pc.cast(pc.greater(t["value"], 35.0), pa.float64()),
        })

    ds = _read(sf_dir, "events", columns=["value"]) \
        .map_batches(prep, batch_format="pyarrow").materialize()
    w, b, hist = logreg_fit(ds, ["x"], "y", iters=iters)
    from webvalid.ops.sgd import _moments

    mean, sd = _moments(ds, ["x"])
    wb_ref = ray.put((float(w[0]), float(b), float(mean[0]), float(sd[0])))

    def err_partial(t: pa.Table) -> pa.Table:
        ww, bb, mu, sg = ray.get(wb_ref)
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        z = ww * ((x - mu) / sg) + bb
        pred = (z > 0).astype(np.float64)
        return pa.table({"err": pa.array([int((pred != y).sum())], pa.int64()),
                         "n": pa.array([len(x)], pa.int64())})

    ep = ds.map_batches(err_partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"n_points": [int(ep["n"].sum())],
                         "n_errors": [int(ep["err"].sum())]})


def jaccard_pairs_exact_documents(sf_dir: str, n_docs: int = 400,
                                  min_jaccard: float = 0.5):
    """Exact all-pairs character-5-gram Jaccard over a deterministic
    document subset (the first `n_docs` ids) — the value-exact twin of
    the MinHash/verify family: the same `ngram_jaccard` kernel the
    LSH verify stage uses, checked against a pure-SQL 5-gram self-join.
    Texts broadcast once; pairs verified distributed."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from webvalid.ops.dedup import JaccardVerifier

    t = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"],
                      filters=[("doc_id", "<", n_docs)])
    df = t.to_pandas().dropna(subset=["text"])
    df = df[df["text"].str.len() >= 5]
    ids = np.sort(df["doc_id"].to_numpy())
    texts = dict(zip(df["doc_id"], df["text"]))
    ii, jj = np.triu_indices(len(ids), k=1)
    pairs = pd.DataFrame({"doc_a": ids[ii], "doc_b": ids[jj]})
    texts_ref = ray.put(texts)
    verified = rd.from_pandas(pairs).map_batches(
        task_callable(JaccardVerifier, texts_ref=texts_ref),
        batch_format="pyarrow",
    ).to_pandas()
    out = verified[verified["jaccard"] >= min_jaccard].copy()
    out["jaccard"] = (out["jaccard"] + 1e-9).round(6)
    return out[["doc_a", "doc_b", "jaccard"]] \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _synth_image_payloads(sf_dir: str, fmt: str, n_docs: int = 200):
    """Dataset of (doc_id, img) with REAL encoded payloads synthesized
    deterministically from doc_id (W = 16 + d%13, H = 16 + (d//13)%11,
    pixel(x, y) = (x + 2y + d) % 256 gray) — SQL can recompute the
    exact pixels, making the decode gates oracle-checkable."""
    from webvalid.ops.gifcodec import encode_gif
    from webvalid.ops.imagecodec import encode_jpeg_gray, encode_png

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for d in ids:
            d = int(d)
            w, h = 16 + d % 13, 16 + (d // 13) % 11
            x, y = np.meshgrid(np.arange(w), np.arange(h))
            img = ((x + 2 * y + d) % 256).astype(np.uint8)
            if fmt == "png":
                payloads.append(encode_png(img))
            elif fmt == "gif":
                # exercise both row layouts: odd docs interlaced
                payloads.append(encode_gif(img, interlaced=bool(d % 2)))
            else:
                payloads.append(encode_jpeg_gray(img, quality=90))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "img": pa.array(payloads, pa.binary())})

    def head_ids(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["doc_id"], n_docs))

    return _read(sf_dir, "documents", columns=["doc_id"]) \
        .map_batches(head_ids, batch_format="pyarrow") \
        .map_batches(synth, batch_format="pyarrow")


def decode_png_documents(sf_dir: str):
    """REAL PNG decode through the actor pool (pure-NumPy codec,
    ops/imagecodec.py): payloads synthesized deterministically from
    doc_id, decoded dimensions AND mean intensity value-exact against
    a SQL recomputation of the pixel formula (PNG is lossless)."""
    from webvalid.ops.multimodal import decode_images

    ds = _synth_image_payloads(sf_dir, "png")
    out = decode_images(ds, payload_col="img", id_col="doc_id").to_pandas()
    out["mean_q6"] = (out["mean_intensity"] + 1e-9).round(6)
    return out[["doc_id", "width", "height", "mean_q6"]] \
        .sort_values("doc_id").reset_index(drop=True)


def decode_gif_documents(sf_dir: str):
    """REAL GIF decode through the actor pool (pure-Python LZW +
    palette codec, ops/gifcodec.py; odd doc_ids interlaced): decoded
    dimensions AND mean intensity value-exact against the SQL pixel
    recomputation (GIF is lossless)."""
    from webvalid.ops.multimodal import decode_images

    ds = _synth_image_payloads(sf_dir, "gif")
    out = decode_images(ds, payload_col="img", id_col="doc_id").to_pandas()
    out["mean_q6"] = (out["mean_intensity"] + 1e-9).round(6)
    return out[["doc_id", "width", "height", "mean_q6"]] \
        .sort_values("doc_id").reset_index(drop=True)


def decode_jpeg_documents(sf_dir: str):
    """REAL baseline-JPEG decode through the actor pool: dimensions
    value-exact vs SQL; the decoded mean must sit within quantization
    error (0.02) of the true pixel mean — the flag the SQL twin states
    as TRUE."""
    from webvalid.ops.multimodal import decode_images

    ds = _synth_image_payloads(sf_dir, "jpeg")
    out = decode_images(ds, payload_col="img", id_col="doc_id").to_pandas()
    ids = out["doc_id"].to_numpy()
    true_means = []
    for d in ids:
        d = int(d)
        w, h = 16 + d % 13, 16 + (d // 13) % 11
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        true_means.append(((x + 2 * y + d) % 256).mean() / 255.0)
    out["mean_in_bound"] = (
        np.abs(out["mean_intensity"].to_numpy() - np.asarray(true_means))
        <= 0.02)
    return out[["doc_id", "width", "height", "mean_in_bound"]] \
        .sort_values("doc_id").reset_index(drop=True)


def bpe_tokens_documents(sf_dir: str, n_merges: int = 150):
    """BPE tokenizer pipeline (ops/bpe.py): train merges on the corpus
    word table, encode every doc through the actor pool, return per-doc
    word and BPE-token counts with the token-count bounds asserted
    (n_words ≤ n_bpe_tokens ≤ non-space chars) — the SQL twin restates
    the exact word count and TRUE."""
    from webvalid.ops.bpe import bpe_token_counts, train_bpe

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    merges = train_bpe(ds, n_merges=n_merges)
    out = bpe_token_counts(ds, merges).to_pandas()
    # bounds need the non-space char count — recompute exactly
    import pyarrow.parquet as pq

    t = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    txt = t.to_pandas().set_index("doc_id")["text"]
    chars = txt.fillna("").str.replace(" ", "", regex=False).str.len()
    out = out.set_index("doc_id")
    ok = (out["n_words"] <= out["n_bpe_tokens"]) & \
         (out["n_bpe_tokens"] <= chars.reindex(out.index))
    ok |= out["n_bpe_tokens"] == 0  # null/empty docs
    out["bounds_ok"] = ok.to_numpy()
    out = out.reset_index()
    return out[["doc_id", "n_words", "bounds_ok"]] \
        .sort_values("doc_id").reset_index(drop=True)


def resize_images_documents(sf_dir: str, out: int = 24):
    """REAL image resize through the actor pool
    (ops/multimodal.ResizeImage, nearest-neighbor = exact integer pixel
    selection): synthesized PNGs resized to out×out; output dimensions
    AND resized mean value-exact against a SQL recomputation of the
    picked source pixels."""
    from webvalid.ops.multimodal import resize_images

    ds = _synth_image_payloads(sf_dir, "png")
    res = resize_images(ds, out, out, method="nearest",
                        payload_col="img", id_col="doc_id").to_pandas()
    res["mean_q6"] = (res["mean_intensity"] + 1e-9).round(6)
    return res[["doc_id", "width", "height", "mean_q6"]] \
        .sort_values("doc_id").reset_index(drop=True)


def similarity_ivf_checked_embeddings(sf_dir: str, n_queries: int = 5,
                                      k: int = 10, min_recall: float = 0.4):
    """IVF ANN asserted against the brute-force exact top-k computed in
    the same run: per query, recall@k must clear `min_recall`
    (deterministic — fixed-seed centroids fitted on an id-SORTED
    driver sample so block arrival order can't move them, fixed
    queries; observed ≥ 0.7 at sf0.001/0.01/0.1 with nprobe=8). SQL
    twin restates the query ids, the result size, and TRUE."""
    import pyarrow.parquet as pq

    from webvalid.ops.similarity import brute_force_topk, ivf_topk

    qt = pq.read_table(_t(sf_dir, "embeddings"))
    qdf = qt.to_pandas().sort_values("vec_id").head(n_queries)
    qids = qdf["vec_id"].to_numpy()
    qmat = np.array(qdf["embedding"].to_list(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ivf = ivf_topk(ds, qids, qmat, k=k, nlist=16, nprobe=8).to_pandas()
    ds2 = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    brute = brute_force_topk(ds2, qids, qmat, k=k).to_pandas()
    rows = []
    for qid in qids:
        got = set(ivf.loc[ivf["query_id"] == qid, "vec_id"])
        exact = set(brute.loc[brute["query_id"] == qid, "vec_id"])
        rows.append({"query_id": int(qid), "n_results": len(got),
                     "recall_ok": len(got & exact) / max(len(exact), 1)
                     >= min_recall})
    return pd.DataFrame(rows).sort_values("query_id").reset_index(drop=True)


def video_frames_checked_documents(sf_dir: str):
    """REAL video decode through the actor pool: a deterministic
    MJPEG-in-AVI payload is synthesized per document (6 constant-gray
    32x32 frames at closed-form levels, muxed by ops/videocodec), then
    the VideoFrameSampler stage container-parses it and JPEG-decodes
    every 2nd frame with the pure-NumPy codec. Dims are value-exact
    (stated by SQL); decoded per-frame luma must match the closed-form
    level within the JPEG quantization bound (<=2; constant frames
    measure <=0.5). SQL twin: the expected (doc_id, frame_idx) grid +
    TRUE flags."""
    from webvalid.ops.imagecodec import encode_jpeg_gray
    from webvalid.ops.multimodal import sample_video
    from webvalid.ops.videocodec import encode_avi_mjpeg

    N_FRAMES, SIDE = 6, 32

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for d in ids:
            jpegs = []
            for fi in range(N_FRAMES):
                level = int((17 * int(d) + 31 * fi) % 200 + 20)
                img = np.full((SIDE, SIDE), level, np.uint8)
                jpegs.append(encode_jpeg_gray(img, quality=90))
            payloads.append(encode_avi_mjpeg(jpegs, SIDE, SIDE, fps=5))
        return pa.table({"doc_id": pa.array(ids),
                         "video": pa.array(payloads, pa.binary())})

    def head_ids(t: pa.Table) -> pa.Table:
        # codec-path coverage, not corpus throughput: cap like the
        # image decode gates (synthesizing+decoding an AVI per corpus
        # row made this the bench's second-slowest query at sf0.1)
        return t.filter(pc.less(t["doc_id"], 300))

    ds = _read(sf_dir, "documents", columns=["doc_id"]) \
        .map_batches(head_ids, batch_format="pyarrow") \
        .map_batches(synth, batch_format="pyarrow")
    out = sample_video(ds, payload_col="video", id_col="doc_id",
                       every=2, max_frames=3, concurrency=2).to_pandas()
    exp_level = (17 * out["doc_id"].to_numpy()
                 + 31 * out["frame_idx"].to_numpy()) % 200 + 20
    out["luma_ok"] = (np.abs(out["mean_luma"].to_numpy() - exp_level) <= 2.0) \
        & out["decoded"].to_numpy()
    out = out[["doc_id", "frame_idx", "width", "height", "luma_ok"]]
    return out.sort_values(["doc_id", "frame_idx"]).reset_index(drop=True)


def audio_checked_documents(sf_dir: str):
    """Checked twin of the audio gate: decoded sample rate, channel
    count and duration are value-exact (stated by SQL), and the
    decoded RMS/ZCR must sit within tight closed-form bounds of the
    synthesized sine (RMS → 0.4/√2, ZCR → f/4000; finite-sample
    deviation ≤ 5e-3 measured ≤ 5e-4)."""
    out = audio_features_documents(sf_dir)
    f = 100.0 + out["doc_id"].to_numpy() % 200
    out = out.copy()
    out["rms_ok"] = np.abs(out["rms"] - 0.4 / np.sqrt(2.0)) <= 5e-3
    out["zcr_ok"] = np.abs(out["zcr"] - f / 4000.0) <= 5e-3
    return out[["doc_id", "sample_rate", "n_channels", "duration_sec",
                "rms_ok", "zcr_ok"]]
