"""End-to-end validation pipeline over a webpages Parquet table.

One streaming, column-pruned read per checkpoint group feeds a single
combined `map_batches` pass (stateless tasks with per-worker cached
broadcast state — see `make_combined_fn`) that emits union-schema
partial rows for four families at once:

- `stats`:     per-(partition, column) sketch states (column_stats.py)
- `drift`:     per-partition categorical count states (drift_check.py)
- `urlhash`:   per-batch uint64 key-hash blobs (uniqueness pass 1)
- `violation`: row-level referential / text-parity / ts-window hits

Partials are checkpointed per group (checkpoint.py) and merged without
any shuffle: one distributed block-local merge pass
(`collect_merged_partials`) collapses the per-batch fan-out, then the
driver finishes the tiny per-(partition, column) merges. The only
sequential work (CDCStream control chart, CDDA pairwise fold) touches
one float / one small histogram per partition, per SURVEY.md §3.1.
Uniqueness finds duplicate-key hash candidates in bucketed parallel
tasks and re-scans only the key column when candidates exist
(uniqueness.py). No row-level all-to-all exchange happens anywhere in
the suite.

The whole module is Ray-session-agnostic: callers own `ray.init`.
"""

from __future__ import annotations

import glob
import json
import os
import pickle
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from webvalid import checkpoint as ckpt
from webvalid.checks.base import CheckConfig, VERDICT_SCHEMA, VIOLATION_SCHEMA, verdict_row
from webvalid.checks.column_stats import (
    ColumnState,
    StatsPartial,
    metadata_binary_states,
    stats_rows,
    stats_verdicts,
)
from webvalid.checks.drift_check import DriftPartial, drift_fold, merge_drift_state_dicts
from webvalid.checks.referential import RefCheckBatcher, load_ref_sets
from webvalid.checks.text_parity import TextParityBatcher
from webvalid.checks.uniqueness import collect_dup_rows, dup_candidates_from_hash_arrays, uniqueness_verdicts
from webvalid.partition import add_host, add_partition_id
from webvalid.schema import WEBPAGES_SCHEMA, schema_mismatches
from webvalid.sketches import NumericHistogram

READ_COLUMNS = ["url", "warc_ts", "html", "text", "lang", "row_index"]

UNION_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.string()),
        pa.field("partition_id", pa.int64()),
        pa.field("column", pa.string()),
        pa.field("state", pa.binary()),
        pa.field("check", pa.string()),
        pa.field("url", pa.string()),
        pa.field("reason", pa.string()),
    ]
)


def _empty_union() -> pa.Table:
    return UNION_SCHEMA.empty_table()


def _to_union(kind: str, t: pa.Table) -> pa.Table:
    n = t.num_rows
    cols = {name: t[name] if name in t.column_names else pa.nulls(n, UNION_SCHEMA.field(name).type)
            for name in UNION_SCHEMA.names if name != "kind"}
    return pa.table({"kind": pa.array([kind] * n, pa.string()), **cols}).cast(UNION_SCHEMA)


def _make_prep(block_size: int):
    def prep(batch: pa.Table) -> pa.Table:
        batch = add_partition_id(batch, block_size)
        batch = add_host(batch)
        tl = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
        return batch.append_column("text_len", tl)

    return prep


_COMBINED_CACHE: dict = {}


def make_combined_fn(cfg, block_size, ref_sets_ref, expected_text_ref):
    """Task-based wrapper around CombinedPartial.

    Stateless tasks schedule to full width immediately (no actor-pool
    ramp-up); the heavy per-process setup (broadcast resolution, regex
    compiles) runs once per WORKER via a module-level cache — same
    amortization as an actor pool without its spin-up serialization.
    """
    import hashlib

    # the cfg fingerprint keeps a warm worker from reusing a
    # CombinedPartial built for a previous run's CheckConfig when the
    # broadcast refs happen to be absent/equal and block_size matches
    cfg_fp = hashlib.blake2b(pickle.dumps(cfg), digest_size=8).hexdigest()
    key = (
        ref_sets_ref.hex() if ref_sets_ref is not None else None,
        expected_text_ref.hex() if expected_text_ref is not None else None,
        block_size,
        cfg_fp,
    )

    def fn(batch: pa.Table) -> pa.Table:
        cp = _COMBINED_CACHE.get(key)
        if cp is None:
            cp = CombinedPartial(cfg, block_size, ref_sets_ref, expected_text_ref)
            _COMBINED_CACHE.clear()  # one live config per worker
            _COMBINED_CACHE[key] = cp
        return cp(batch)

    return fn


def _count_and_cap_violations(v: pa.Table, cap: int) -> tuple[pa.Table, pa.Table]:
    """Exact (partition, check) violation counts + a per-check row cap.

    Returns (viocount rows in union layout [partition_id, check,
    state=count bytes], capped violation rows). Verdicts use the exact
    counts, so capping the row sample never distorts pass/fail — and a
    systemic failure (every row violating) can no longer flood the
    driver or the checkpoint with O(rows) violation rows.
    """
    empty_counts = pa.table(
        {
            "partition_id": pa.array([], pa.int64()),
            "check": pa.array([], pa.string()),
            "state": pa.array([], pa.binary()),
        }
    )
    if v.num_rows == 0:
        return empty_counts, v
    counts = v.group_by(["partition_id", "check"]).aggregate([("url", "count")])
    viocount = pa.table(
        {
            "partition_id": counts["partition_id"].cast(pa.int64()),
            "check": counts["check"],
            "state": pa.array(
                [int(c).to_bytes(8, "little") for c in counts["url_count"].to_pylist()],
                pa.binary(),
            ),
        }
    )
    if v.num_rows > cap:
        parts = []
        for cname in pc.unique(v["check"]).to_pylist():
            sub = v.filter(pc.equal(v["check"], cname))
            parts.append(sub.slice(0, cap))
        v = pa.concat_tables(parts)
    return viocount, v


class CombinedPartial:
    """Single-pass per-batch kernel: stats + drift partials + violations."""

    def __init__(self, cfg: CheckConfig, block_size: int,
                 ref_sets_ref=None, expected_text_ref=None):
        self.cap = cfg.max_violations_per_check
        self.prep = _make_prep(block_size)
        stat_cols = ("url", "warc_ts", "html", "text", "lang", "host", "text_len")
        self.stats = StatsPartial(
            cfg, stat_cols, categorical_columns=("lang", "host"),
            hist_ranges={"text_len": (0.0, 2048.0)},
        )
        self.drift = DriftPartial(cfg.drift_columns,
                                  max_keys=cfg.drift_max_histogram_keys)
        self.ref = RefCheckBatcher(ref_sets_ref) if ref_sets_ref is not None else None
        self.parity = (
            TextParityBatcher(expected_text_ref, ts_range=cfg.ts_range)
            if expected_text_ref is not None
            else None
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from webvalid.sketches import hash64

        batch = self.prep(batch)
        # per-batch url-hash blob: feeds the shuffle-free uniqueness
        # pass 1 straight from the checkpointed partials; the same
        # vectorized hash64 is shared with the text-parity fingerprint
        urls = batch["url"].to_numpy(zero_copy_only=False)
        url_hashes = hash64(urls)
        # blob is SORTED here (parallel, ~5 ms/batch) so uniqueness
        # pass 1 buckets with binary searches instead of a driver-side
        # argsort per blob; candidates are a multiset property, so
        # sorted and unsorted blobs are interchangeable downstream
        hash_tab = pa.table(
            {
                "partition_id": pa.array([int(batch["partition_id"][0].as_py())], pa.int64()),
                "state": pa.array([np.sort(url_hashes).tobytes()], pa.binary()),
            }
        )
        parts = [
            _to_union("stats", self.stats(batch)),
            _to_union("drift", self.drift(batch)),
            _to_union("urlhash", hash_tab),
        ]
        vio_parts = []
        if self.ref is not None:
            vio_parts.append(self.ref(batch))
        if self.parity is not None:
            vio_parts.append(self.parity(batch, url_hashes=url_hashes))
        for v in vio_parts:
            viocount, capped = _count_and_cap_violations(v, self.cap)
            parts.append(_to_union("viocount", viocount))
            parts.append(_to_union("violation", capped))
        return pa.concat_tables([p for p in parts if p.num_rows] or [_empty_union()])


def _schema_check_verdicts(files: list[str]) -> tuple[list[dict], list[str]]:
    """Metadata-only schema verdicts, one per input file (partition_id -1).

    Returns (verdict_rows, conforming_files). Files whose Parquet
    schema does not match WEBPAGES_SCHEMA are quarantined — they get a
    failing verdict and are excluded from the scan instead of crashing
    it (generalizes the reference's hard arity assertion,
    CDDA/DriftDetector.java:89-91, into a per-file verdict).
    """
    out = []
    good = []
    for f in files:
        problems = schema_mismatches(pq.read_schema(f), WEBPAGES_SCHEMA)
        out.append(
            verdict_row(-1, "schema", "*", not problems, float(len(problems)),
                        f"{os.path.basename(f)}: " + ("; ".join(problems) or "ok"))
        )
        if not problems:
            good.append(f)
    return out, good


def _filter_kind(ds, kind: str):
    return ds.map_batches(
        lambda t, k=kind: t.filter(pc.equal(t["kind"], k)),
        batch_format="pyarrow",
    )


def merge_keyed_states(ds, key_cols: tuple[str, ...], deserialize, merge,
                       tree: bool = False) -> list[dict]:
    """Merge pickled mergeable states by key WITHOUT a shuffle.

    States are associative/commutative, so: one distributed map_batches
    round merges block-locally by key (collapsing the per-batch partial
    fan-out), then the survivors — O(#keys × #blocks-touching-key),
    small because batches cover contiguous partitions — are merged to
    completion on the driver. This outperforms Ray's sort-based
    groupby by orders of magnitude for sketch-sized state tables.
    `tree=True` adds a coalescing repartition + second local round so
    the driver finish is O(coalesced blocks × keys) for wide fan-ins.
    """

    def local(t: pa.Table) -> pa.Table:
        acc: dict = {}
        key_arrays = [t[k].to_pylist() for k in key_cols]
        blobs = t["state"].to_pylist()
        for i, blob in enumerate(blobs):
            k = tuple(col[i] for col in key_arrays)
            st = deserialize(blob)
            if k in acc:
                acc[k] = merge(acc[k], st)
            else:
                acc[k] = st
        keys = list(acc.keys())
        cols = {
            name: pa.array([k[j] for k in keys])
            for j, name in enumerate(key_cols)
        }
        cols["state"] = pa.array([pickle.dumps(acc[k]) for k in keys], pa.binary())
        return pa.table(cols)

    # batch_size=None = one call per input block: keeps the round as
    # wide as the upstream fan-out (an explicit 65536 coalesced fat-row
    # state tables into a single serial task); the tree round coalesces
    # via repartition when the fan-in is wide.
    reduced_ds = ds.select_columns(list(key_cols) + ["state"]).map_batches(
        local, batch_format="pyarrow", batch_size=None
    )
    if tree:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        reduced_ds = reduced_ds.repartition(max(2, n_cpus // 2)).map_batches(
            local, batch_format="pyarrow", batch_size=None
        )
    reduced = reduced_ds.take_all()
    final: dict = {}
    for row in reduced:
        k = tuple(row[c] for c in key_cols)
        st = deserialize(row["state"])
        if k in final:
            final[k] = merge(final[k], st)
        else:
            final[k] = st
    return [
        {**dict(zip(key_cols, k)), "state": pickle.dumps(st)}
        for k, st in final.items()
    ]


def make_block_reducer(cap: int):
    """Block-local, IDEMPOTENT reducer over union-schema partial rows:
    merges stats states by (partition, column), drift states by
    partition, violation counts by (partition, check); caps violation
    ROWS per check; passes urlhash rows through. Applying it again to
    its own output is a no-op-shaped further reduction, so it can run
    both before checkpointing (bounding checkpoint size under systemic
    failure) and again at merge time."""

    def local(t: pa.Table) -> pa.Table:
        # Violation rows can be O(batch rows) under a systemic failure —
        # they are split off and capped with Arrow kernels, NEVER walked
        # row-by-row in Python. Only the small state rows (stats/drift/
        # viocount: a handful per batch) take the Python merge loop.
        kind_col = t["kind"]
        vio = t.filter(pc.equal(kind_col, "violation"))
        passthrough = [t.filter(pc.equal(kind_col, "urlhash"))]
        if vio.num_rows:
            for cname in pc.unique(vio["check"]).to_pylist():
                sub = vio.filter(pc.equal(vio["check"], cname))
                # counts stay exact via the viocount rows
                passthrough.append(sub.slice(0, cap))
        states_t = t.filter(
            pc.is_in(kind_col, value_set=pa.array(["stats", "drift", "viocount"]))
        )

        kinds = states_t["kind"].to_pylist()
        pids = states_t["partition_id"].to_pylist()
        cols = states_t["column"].to_pylist()
        states = states_t["state"].to_pylist()
        checks = states_t["check"].to_pylist()

        stats_acc: dict = {}
        drift_acc: dict = {}
        vio_counts: dict = {}
        out_rows = {name: [] for name in UNION_SCHEMA.names}

        def emit(kind, pid=None, col=None, state=None, check=None, url=None, reason=None):
            out_rows["kind"].append(kind)
            out_rows["partition_id"].append(pid)
            out_rows["column"].append(col)
            out_rows["state"].append(state)
            out_rows["check"].append(check)
            out_rows["url"].append(url)
            out_rows["reason"].append(reason)

        for i, kind in enumerate(kinds):
            if kind == "stats":
                k = (pids[i], cols[i])
                st = ColumnState.deserialize(states[i])
                if k in stats_acc:
                    stats_acc[k].merge(st)
                else:
                    stats_acc[k] = st
            elif kind == "drift":
                s = pickle.loads(states[i])
                if pids[i] in drift_acc:
                    merge_drift_state_dicts(drift_acc[pids[i]], s)
                else:
                    drift_acc[pids[i]] = s
            else:  # viocount
                k = (pids[i], checks[i])
                vio_counts[k] = vio_counts.get(k, 0) + int.from_bytes(states[i], "little")

        for (pid, col), st in stats_acc.items():
            emit("stats", pid, col, pickle.dumps(st))
        for pid, s in drift_acc.items():
            emit("drift", pid, None, pickle.dumps(s))
        for (pid, check), c in vio_counts.items():
            emit("viocount", pid, None, int(c).to_bytes(8, "little"), check)
        merged_states = pa.table(
            {
                name: pa.array(out_rows[name],
                               UNION_SCHEMA.field(name).type)
                for name in UNION_SCHEMA.names
            }
        )
        return pa.concat_tables(
            [merged_states] + [p for p in passthrough if p.num_rows]
        )

    return local


def collect_merged_partials(partials_ds, cap: int = 10_000,
                            tree: bool = False,
                            collect_urlhash: bool = True) -> dict:
    """ONE distributed pass over the union-schema partials: block-local
    reduce (make_block_reducer), then finish the (now tiny) merges on
    the driver. Collapses what would be four separate Ray jobs — each
    with ~1s of launch overhead — into one.

    `tree=True` inserts a coalescing repartition + one more block-local
    merge round before the driver finish, so the driver touches
    O(coalesced blocks × keys) rows even when the partial pass produced
    thousands of blocks (the tree-reduce rung for huge runs).
    """
    local = make_block_reducer(cap)
    # batch_size=None → one call per INPUT BLOCK, so the reduce runs as
    # wide as the partial pass produced blocks. An explicit 65536 here
    # coalesced the whole fat-row state table (~90 rows × ~2 MB/row per
    # block) into ONE task — the "distributed" round ran serial
    # (measured 11 s of single-core UDF at 20M rows). The old
    # motivation for coalescing — floods of ~650-row violation batches —
    # is gone now that the block reducer runs before checkpointing and
    # caps them at the source.
    reduced = partials_ds.map_batches(local, batch_format="pyarrow",
                                      batch_size=None)
    if tree:
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        reduced = reduced.repartition(max(2, n_cpus // 2)).map_batches(
            local, batch_format="pyarrow", batch_size=None
        )
    rows = reduced.take_all()

    stats_final: dict = {}
    drift_final: dict = {}
    viocounts: dict = {}
    hash_blobs: list[bytes] = []
    violations: list[dict] = []
    vio_kept_final: dict = {}
    for r in rows:
        kind = r["kind"]
        if kind == "stats":
            k = (r["partition_id"], r["column"])
            st = ColumnState.deserialize(r["state"])
            if k in stats_final:
                stats_final[k].merge(st)
            else:
                stats_final[k] = st
        elif kind == "drift":
            s = pickle.loads(r["state"])
            if r["partition_id"] in drift_final:
                merge_drift_state_dicts(drift_final[r["partition_id"]], s)
            else:
                drift_final[r["partition_id"]] = s
        elif kind == "viocount":
            k = (r["partition_id"], r["check"])
            viocounts[k] = viocounts.get(k, 0) + int.from_bytes(r["state"], "little")
        elif kind == "urlhash":
            # above the uniqueness shuffle cutover the blobs are NOT
            # used (dup_candidates_via_shuffle runs instead) — keeping
            # them would accumulate 8 B/row on the driver in exactly
            # the regime the cutover exists for
            if collect_urlhash:
                hash_blobs.append(r["state"])
        else:
            kept = vio_kept_final.get(r["check"], 0)
            if kept < cap:
                vio_kept_final[r["check"]] = kept + 1
                violations.append(
                    {"partition_id": r["partition_id"], "check": r["check"],
                     "url": r["url"], "reason": r["reason"]}
                )
    return {
        "stats": [
            {"partition_id": pid, "column": col, "state": pickle.dumps(st)}
            for (pid, col), st in stats_final.items()
        ],
        "drift": [
            {"partition_id": pid, "state": pickle.dumps(s)}
            for pid, s in drift_final.items()
        ],
        "hash_blobs": hash_blobs,
        "violations": violations,
        "viocounts": viocounts,
    }


def run_validation(
    pages_dir: str,
    out_dir: str,
    cfg: CheckConfig | None = None,
    ref_langs: str | None = None,
    ref_hosts: str | None = None,
    text_hashes: str | None = None,
    files_per_group: int | None = None,
    max_groups: int | None = None,
    batch_size: int | None = None,
) -> dict:
    """Run the full suite; resumable via per-group checkpoints under out_dir.

    Returns a result dict with small pandas tables (verdicts,
    violations, stats, segments) and the run report. `max_groups`
    limits how many *new* groups are processed this run (used by the
    resume tests to simulate a mid-run crash).
    """
    cfg = cfg or CheckConfig()
    t_run0 = time.time()
    timings: dict[str, float] = {}

    def _mark(name: str, t0: float) -> None:
        timings[name] = round(timings.get(name, 0.0) + time.time() - t0, 3)
    os.makedirs(out_dir, exist_ok=True)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    all_files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    if not all_files:
        raise FileNotFoundError(f"no parquet files under {pages_dir}")
    schema_verdict_rows, files = _schema_check_verdicts(all_files)
    if not files:
        raise ValueError(f"no schema-conforming parquet files under {pages_dir}")

    # --- broadcast reference tables (once per run) -----------------------
    ref_cols: list[str] = []
    ref_sets_ref = None
    if ref_langs or ref_hosts:
        paths = {}
        if ref_langs:
            paths["lang"] = (ref_langs, "lang")
            ref_cols.append("lang")
        if ref_hosts:
            paths["host"] = (ref_hosts, "host")
            ref_cols.append("host")
        ref_sets_ref = ray.put(load_ref_sets(paths))
    t0 = time.time()
    expected_text_ref = None
    if text_hashes:
        from webvalid.checks.text_parity import build_expected_hashes

        schema_names = pq.read_schema(text_hashes).names
        if "url_hash" in schema_names and "pair_hash" in schema_names:
            # memory_map shaves ~40% off this 320 MB fixed-cost read
            t = pq.read_table(text_hashes, columns=["url_hash", "pair_hash"],
                              memory_map=True)

            def _sorted(a: np.ndarray) -> np.ndarray:
                # gen writes these pre-sorted; the is-sorted check is
                # ~70x cheaper than re-sorting 10^7 uint64s serially
                return a if len(a) < 2 or bool((a[1:] >= a[:-1]).all()) else np.sort(a)

            expected_text_ref = ray.put(
                (
                    _sorted(t["url_hash"].to_numpy()),
                    _sorted(t["pair_hash"].to_numpy()),
                )
            )
        else:
            t = pq.read_table(text_hashes)
            expected_text_ref = ray.put(
                build_expected_hashes(t["url"].to_pylist(), t["text_md5"].to_pylist())
            )

    _mark("setup_broadcast", t0)

    # --- per-group partial pass (resumable) ------------------------------
    if files_per_group is None:
        # auto-size: ~2 s of fixed cost per group (job launch,
        # repartition, checkpoint write) must amortize, so cap the
        # group COUNT, not the group size — a fixed files_per_group
        # would create ~10^5 groups on a 10^6-file input. 64 groups
        # bounds fixed cost at ~2 min regardless of corpus size while
        # keeping crash-loss ≤ 1/64 of the run; small inputs keep
        # 8-file groups for resume-test granularity.
        files_per_group = max(8, -(-len(files) // 64))
    groups = [files[i: i + files_per_group] for i in range(0, len(files), files_per_group)]
    lineage: list[dict] = []
    new_groups = 0
    fresh_partials = []  # materialized partials of groups processed THIS run
    reused_groups: list[int] = []
    for gid, group_files in enumerate(groups):
        if ckpt.is_done(ckpt_dir, gid):
            m = ckpt.read_manifest(ckpt_dir, gid)
            m["reused"] = True
            lineage.append(m)
            reused_groups.append(gid)
            continue
        if max_groups is not None and new_groups >= max_groups:
            continue
        ckpt.reset_group(ckpt_dir, gid)
        t0 = time.time()
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        # binary payload pruning: html's null-frac states come from
        # parquet row-group metadata (exact; zero data IO) whenever the
        # footers allow, and the scan then skips the biggest column
        scan_cols = list(READ_COLUMNS)
        meta_union: pa.Table | None = None
        if cfg.binary_stats == "metadata" and "html" in scan_cols:
            synth = metadata_binary_states(group_files, cfg.block_size, "html", cfg)
            if synth is not None:
                scan_cols.remove("html")
                meta_union = _to_union("stats", pa.table({
                    "partition_id": pa.array([p for p, _ in synth], pa.int64()),
                    "column": pa.array(["html"] * len(synth), pa.string()),
                    "state": pa.array([s for _, s in synth], pa.binary()),
                }))
        ds = ray.data.read_parquet(
            group_files,
            columns=scan_cols,
            # read parallelism must not be capped by file count
            override_num_blocks=max(len(group_files), 2 * n_cpus),
        )
        n_rows = sum(pq.read_metadata(f).num_rows for f in group_files)
        partials = ds.map_batches(
            make_combined_fn(cfg, cfg.block_size, ref_sets_ref, expected_text_ref),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
        # block-local reduce BEFORE checkpointing: states merge, and a
        # systemic failure (every row violating) is capped here, so the
        # checkpoint stays O(states + cap·checks), never O(rows); then
        # coalesce so the checkpoint is a handful of files, not one per
        # batch. The materialized result lets this run's merge skip
        # re-reading it.
        # batch_size 2048 (not 65536): still coalesces the scan's thin
        # per-batch partial blocks for cross-batch state reduction, but
        # splits the work across ~#rows/2048 parallel tasks instead of
        # collapsing a fat-row state table into one serial call.
        reduced = partials.map_batches(
            make_block_reducer(cfg.max_violations_per_check),
            batch_format="pyarrow", batch_size=2048,
        )
        mat = reduced.repartition(max(1, n_cpus // 4)).materialize()
        if meta_union is not None and meta_union.num_rows:
            # metadata-derived html states join the group's partials
            # here, so checkpointing, resume and the merge are oblivious
            # to how the states were produced
            mat = mat.union(ray.data.from_arrow(meta_union)).materialize()
        mat.write_parquet(ckpt.data_dir(ckpt_dir, gid))
        fresh_partials.append(mat)
        m = ckpt.commit_group(ckpt_dir, gid, group_files, n_rows, time.time() - t0)
        m["reused"] = False
        lineage.append(m)
        new_groups += 1
        _mark("partial_pass", t0)

    done_groups = [g for g in range(len(groups)) if ckpt.is_done(ckpt_dir, g)]
    complete = len(done_groups) == len(groups)

    # --- merge partials (distributed) + folds (tiny, driver) -------------
    # Fresh groups merge from their in-memory materialized partials;
    # only groups checkpointed by PREVIOUS runs are read back from disk.
    partial_files = sorted(
        f
        for g in reused_groups
        for f in glob.glob(os.path.join(ckpt.data_dir(ckpt_dir, g), "*.parquet"))
    )
    sources = list(fresh_partials)
    if partial_files:
        sources.append(ray.data.read_parquet(partial_files))
    if not sources:
        raise ValueError(
            "run_validation has no partials to merge: no fresh groups were "
            "processed this run (max_groups may be 0) and no committed "
            "checkpoints exist under "
            f"{ckpt_dir}"
        )
    partials_ds = sources[0] if len(sources) == 1 else sources[0].union(*sources[1:])

    t0 = time.time()
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    # partial block count is known driver-side: fresh groups were
    # repartitioned to ~n_cpus/4 blocks each, disk groups to one block
    # per file — add a tree-reduce round when that fan-in is wide
    n_partial_blocks = len(fresh_partials) * max(1, n_cpus // 4) + len(partial_files)
    rows_so_far = sum(m["rows"] for m in lineage)
    merged = collect_merged_partials(
        partials_ds, cap=cfg.max_violations_per_check,
        tree=n_partial_blocks > 64,
        collect_urlhash=rows_so_far <= cfg.uniqueness_driver_max_rows,
    )
    merged_stats = merged["stats"]
    viocounts: dict = merged["viocounts"]
    _mark("merge_pass", t0)
    t0 = time.time()
    stats_table = stats_rows(merged_stats, cfg)
    verdicts: list[dict] = []
    verdicts.extend(schema_verdict_rows)
    verdicts.extend(stats_verdicts(stats_table, cfg))

    _mark("stats_fold", t0)
    # numeric per-partition histograms for the KS drift test
    numeric_hists: dict[int, NumericHistogram] = {}
    for row in merged_stats:
        if row["column"] == "text_len":
            st = ColumnState.deserialize(row["state"])
            if st.num_hist is not None:
                numeric_hists[row["partition_id"]] = st.num_hist

    merged_drift = merged["drift"]
    t0 = time.time()
    drift_verdict_rows, segments = drift_fold(
        merged_drift, cfg, numeric_hists=numeric_hists, ks_column="text_len"
    )
    verdicts.extend(drift_verdict_rows)
    _mark("drift_fold", t0)

    all_partitions = sorted({r["partition_id"] for r in merged_drift})

    import pandas as pd

    violations_parts = []
    vio_tab = pd.DataFrame(merged["violations"],
                           columns=["partition_id", "check", "url", "reason"])
    if len(vio_tab):
        violations_parts.append(pa.Table.from_pandas(vio_tab, preserve_index=False).cast(VIOLATION_SCHEMA))

    # referential / text-parity / ts-window verdicts from the EXACT
    # merged (partition, check) violation counts — the violations table
    # is a capped row sample and must never drive pass/fail
    if ref_cols:
        for col in ref_cols:
            check = f"referential_{col}"
            for pid in all_partitions:
                c = viocounts.get((pid, check), 0)
                verdicts.append(verdict_row(pid, check, col, c == 0, float(c), "orphan keys"))

    # --- uniqueness (global — see uniqueness.py) --------------------------
    # Below cfg.uniqueness_driver_max_rows, pass 1 reads the per-batch
    # url-hash blobs already sitting in the checkpointed partials (no
    # re-scan, bucketed parallel sort, 8 B/row transient); above it, the
    # groupby(url).count() shuffle finds duplicate keys with nothing
    # O(rows) converging anywhere. Pass 2 touches the url column again
    # only when candidate duplicates exist.
    total_rows = sum(m["rows"] for m in lineage)
    t0 = time.time()
    if total_rows > cfg.uniqueness_driver_max_rows:
        from webvalid.checks.uniqueness import dup_candidates_via_shuffle

        cand = dup_candidates_via_shuffle(
            ray.data.read_parquet(files, columns=["url"]), "url"
        )
    else:
        cand = dup_candidates_from_hash_arrays(merged["hash_blobs"])
    _mark("uniq_pass1", t0)
    t0 = time.time()
    if len(cand):
        uniq_ds = ray.data.read_parquet(files, columns=["url", "row_index"]).map_batches(
            lambda t: add_partition_id(t, cfg.block_size), batch_format="pyarrow"
        )
        vtab, n_dup_keys, uniq_counts = collect_dup_rows(uniq_ds, cand, cfg, column="url")
    else:
        from webvalid.checks.uniqueness import _empty_violations

        vtab = _empty_violations()
        uniq_counts = {}
    violations_parts.append(vtab.cast(VIOLATION_SCHEMA))
    verdicts.extend(uniqueness_verdicts(uniq_counts, all_partitions, column="url"))
    _mark("uniqueness", t0)

    violations = (
        pa.concat_tables(violations_parts) if violations_parts else VIOLATION_SCHEMA.empty_table()
    )

    for check in ("text_parity", "ts_window"):
        for pid in all_partitions:
            c = viocounts.get((pid, check), 0)
            verdicts.append(verdict_row(pid, check, "*", c == 0, float(c), "row violations"))

    t0 = time.time()

    # --- write outputs ---------------------------------------------------
    import pandas as pd

    verdicts_pd = pd.DataFrame(verdicts)
    violations_pd = violations.to_pandas()
    stats_pd = pd.DataFrame(stats_table)
    segments_pd = pd.DataFrame(segments, columns=["algorithm", "start", "end"])

    pa_verdicts = pa.Table.from_pandas(verdicts_pd, preserve_index=False).cast(VERDICT_SCHEMA)
    pq.write_table(pa_verdicts, os.path.join(out_dir, "verdicts.parquet"))
    pq.write_table(violations, os.path.join(out_dir, "violations.parquet"))
    pq.write_table(
        pa.Table.from_pandas(stats_pd, preserve_index=False),
        os.path.join(out_dir, "stats.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(segments_pd, preserve_index=False),
        os.path.join(out_dir, "segments.parquet"),
    )

    _mark("outputs", t0)
    total_rows = sum(m["rows"] for m in lineage)
    wall = time.time() - t_run0
    report = {
        "complete": complete,
        "n_files": len(all_files),
        "n_quarantined_files": len(all_files) - len(files),
        "n_groups": len(groups),
        "groups_done": len(done_groups),
        "rows": total_rows,
        "wall_sec": wall,
        "rows_per_sec": total_rows / wall if wall > 0 else None,
        "n_partitions": len(all_partitions),
        "n_verdicts": len(verdicts_pd),
        "n_violations": len(violations_pd),
        "timings": timings,
        "lineage": lineage,
    }
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)

    return {
        "verdicts": verdicts_pd,
        "violations": violations_pd,
        "stats": stats_pd,
        "segments": segments_pd,
        "report": report,
        "out_dir": out_dir,
    }
