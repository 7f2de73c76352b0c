"""End-to-end pipeline tests on the seeded webpages fixture.

Covers: planted-violation recovery (dups, orphan langs, ts outliers,
text parity), drift detection at the planted partition, full
Ray-pipeline vs naive-oracle segment parity for both reference
algorithms, and checkpoint/resume semantics.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from webvalid.checks.base import CheckConfig
from webvalid.gen import generate_webpages
from tests import oracle

N_ROWS = 6_000
BLOCK = 500


@pytest.fixture(scope="module")
def fixture_info(tmp_path_factory):
    d = tmp_path_factory.mktemp("webfix")
    return generate_webpages(
        str(d), n_rows=N_ROWS, block_size=BLOCK, seed=11,
        dup_frac=0.002, orphan_lang_frac=0.001, ts_outlier_frac=0.001,
    )


@pytest.fixture(scope="module")
def run_result(ray_session, fixture_info, tmp_path_factory):
    from webvalid.pipeline import run_validation

    out = tmp_path_factory.mktemp("out")
    cfg = CheckConfig(block_size=BLOCK, ts_range=fixture_info["ts_window"])
    return run_validation(
        fixture_info["pages_dir"], str(out), cfg=cfg,
        ref_langs=fixture_info["ref_langs"],
        text_hashes=fixture_info["text_hashes"],
        files_per_group=2,
    )


def test_report_complete(run_result, fixture_info):
    r = run_result["report"]
    assert r["complete"] and r["rows"] == N_ROWS
    assert r["n_partitions"] == fixture_info["n_partitions"]


def test_uniqueness_violations_match_planted(run_result, fixture_info):
    vio = run_result["violations"]
    dup_urls = {u for _, u in fixture_info["dup_rows"]}
    got = set(vio[vio["check"] == "uniqueness"]["url"])
    assert got == dup_urls
    # every duplicated url contributes >= 2 violation rows
    counts = vio[vio["check"] == "uniqueness"]["url"].value_counts()
    assert (counts >= 2).all()


def test_referential_violations_match_planted(run_result, fixture_info):
    vio = run_result["violations"]
    n = len(vio[vio["check"] == "referential_lang"])
    assert n == len(fixture_info["orphan_lang_rows"])
    bad_parts = {r // BLOCK for r in fixture_info["orphan_lang_rows"]}
    v = run_result["verdicts"]
    ref = v[v["check"] == "referential_lang"]
    assert set(ref[~ref["pass"]]["partition_id"]) == bad_parts


def test_ts_window_violations_match_planted(run_result, fixture_info):
    vio = run_result["violations"]
    n = len(vio[vio["check"] == "ts_window"])
    assert n == len(fixture_info["ts_outlier_rows"])
    bad_parts = {r // BLOCK for r in fixture_info["ts_outlier_rows"]}
    v = run_result["verdicts"]
    tsr = v[v["check"] == "ts_range"]
    assert set(tsr[~tsr["pass"]]["partition_id"]) == bad_parts


def test_text_parity_clean(run_result):
    vio = run_result["violations"]
    assert len(vio[vio["check"] == "text_parity"]) == 0
    v = run_result["verdicts"]
    assert v[v["check"] == "text_parity"]["pass"].all()


def test_chi2_flags_planted_drift(run_result, fixture_info):
    v = run_result["verdicts"]
    chi = v[(v["check"] == "drift_chi2") & (v["column"] == "lang")]
    failed = set(chi[~chi["pass"]]["partition_id"])
    assert fixture_info["drift_partition"] in failed


def test_stats_sane(run_result, fixture_info):
    stats = run_result["stats"]
    url_stats = stats[stats["column"] == "url"]
    assert len(url_stats) == fixture_info["n_partitions"]
    # HLL distinct per partition ≈ block size (few dups)
    assert np.allclose(url_stats["distinct_hll"], BLOCK, rtol=0.1)
    text_stats = stats[stats["column"] == "text"]
    assert (text_stats["null_frac"] < 0.06).all()
    html_stats = stats[stats["column"] == "html"]
    # default binary_stats="metadata": n/nulls exact, byte stats not read
    assert (html_stats["n"] > 0).all()
    tl = stats[stats["column"] == "text_len"]
    assert (tl["q50"] > 0).all()


def test_binary_stats_modes_agree(ray_session, fixture_info, run_result,
                                  tmp_path_factory):
    """binary_stats="scan" (reads html bytes) and the default
    "metadata" (parquet-footer null counts, html pruned from the scan)
    must produce identical verdicts and identical html n/null stats;
    only the byte-size stats differ (0 in metadata mode)."""
    import pandas as pd

    from webvalid.pipeline import run_validation

    out = tmp_path_factory.mktemp("out_scanmode")
    cfg = CheckConfig(block_size=BLOCK, ts_range=fixture_info["ts_window"],
                      binary_stats="scan")
    scan_res = run_validation(
        fixture_info["pages_dir"], str(out), cfg=cfg,
        ref_langs=fixture_info["ref_langs"],
        text_hashes=fixture_info["text_hashes"],
        files_per_group=2,
    )

    def vsort(df):
        return df.sort_values(["check", "partition_id", "column"],
                              kind="mergesort").reset_index(drop=True)

    pd.testing.assert_frame_equal(
        vsort(scan_res["verdicts"]), vsort(run_result["verdicts"])
    )
    a = scan_res["stats"]; b = run_result["stats"]
    ah = a[a["column"] == "html"].sort_values("partition_id").reset_index(drop=True)
    bh = b[b["column"] == "html"].sort_values("partition_id").reset_index(drop=True)
    assert ah["n"].tolist() == bh["n"].tolist()
    assert ah["null_frac"].tolist() == bh["null_frac"].tolist()
    assert (ah["n_bytes"] > 0).all()      # scan mode measures bytes
    assert (bh["n_bytes"] == 0).all()     # metadata mode doesn't read them


def _projection_rows(pages_dir):
    """(lang, host) tuples in row_index order — the drift projection."""
    import re

    t = pq.read_table(pages_dir, columns=["url", "lang", "row_index"])
    order = np.argsort(t["row_index"].to_numpy())
    urls = np.asarray(t["url"].to_pylist(), dtype=object)[order]
    langs = np.asarray(t["lang"].to_pylist(), dtype=object)[order]
    host_re = re.compile(r"^[a-z]+://([^/]+)")
    return [(l, host_re.match(u).group(1)) for u, l in zip(urls, langs)]


def test_segments_match_oracle_end_to_end(run_result, fixture_info):
    """The flagship parity test: Ray pipeline segments == naive oracle
    segments for BOTH reference algorithms on the same projection."""
    rows = _projection_rows(fixture_info["pages_dir"])
    seg = run_result["segments"]

    expected_cdc = oracle.cdcstream_run(rows, BLOCK, drift_coefficient=3.0)
    got_cdc = [
        (int(r["start"]), int(r["end"]))
        for _, r in seg[seg["algorithm"] == "cdcstream"].iterrows()
    ]
    assert got_cdc == expected_cdc

    expected_cdda = oracle.cdda_run(rows, BLOCK, min_change_degree=0.1)
    got_cdda = [
        (int(r["start"]), int(r["end"]))
        for _, r in seg[seg["algorithm"] == "cdda"].iterrows()
    ]
    assert got_cdda == expected_cdda


def test_resume_skips_done_groups_and_matches(ray_session, fixture_info, tmp_path_factory):
    from webvalid.pipeline import run_validation

    out = tmp_path_factory.mktemp("resume_out")
    cfg = CheckConfig(block_size=BLOCK, ts_range=fixture_info["ts_window"])
    kwargs = dict(
        cfg=cfg,
        ref_langs=fixture_info["ref_langs"],
        text_hashes=fixture_info["text_hashes"],
        files_per_group=1,
    )
    # simulated crash: only one group completes
    partial = run_validation(fixture_info["pages_dir"], str(out), max_groups=1, **kwargs)
    assert not partial["report"]["complete"]
    assert partial["report"]["groups_done"] == 1

    # resume: finishes the rest, reuses group 0
    full = run_validation(fixture_info["pages_dir"], str(out), **kwargs)
    assert full["report"]["complete"]
    reused = [m for m in full["report"]["lineage"] if m.get("reused")]
    assert len(reused) == 1 and reused[0]["group"] == 0

    # and equals a fresh single-shot run
    out2 = tmp_path_factory.mktemp("fresh_out")
    fresh = run_validation(fixture_info["pages_dir"], str(out2), **kwargs)

    def canon(df):
        return (
            df.sort_values(list(df.columns))
            .reset_index(drop=True)
        )

    for key in ("verdicts", "segments"):
        a, b = canon(full[key]), canon(fresh[key])
        assert a.equals(b), key
    a = canon(full["violations"][["partition_id", "check", "url"]])
    b = canon(fresh["violations"][["partition_id", "check", "url"]])
    assert a.equals(b)


def test_referential_host_column(ray_session, tmp_path_factory):
    """Two-column referential: planted orphan HOSTS caught via the salted
    reference host table (the derived-host path of RefCheckBatcher)."""
    from webvalid.pipeline import run_validation

    d = tmp_path_factory.mktemp("hostfix")
    info = generate_webpages(str(d), n_rows=3_000, block_size=500, seed=29,
                             orphan_host_frac=0.004)
    assert info["orphan_host_rows"], "fixture must plant orphan hosts"
    out = tmp_path_factory.mktemp("hostout")
    cfg = CheckConfig(block_size=500, ts_range=info["ts_window"])
    res = run_validation(
        info["pages_dir"], str(out), cfg=cfg,
        ref_langs=info["ref_langs"], ref_hosts=info["ref_hosts"],
        text_hashes=info["text_hashes"],
    )
    vio = res["violations"]
    host_vio = vio[vio["check"] == "referential_host"]
    assert len(host_vio) == len(info["orphan_host_rows"])
    assert host_vio["url"].str.contains("unregistered").all()
    v = res["verdicts"]
    ref = v[v["check"] == "referential_host"]
    bad_parts = {r // 500 for r in info["orphan_host_rows"]}
    assert set(ref[~ref["pass"]]["partition_id"]) == bad_parts


def test_uniqueness_shuffle_cutover_matches_driver_path(
    ray_session, fixture_info, tmp_path_factory
):
    """Forcing the groupby-count cutover (uniqueness_driver_max_rows=0)
    must produce the same verdicts and violations as the default
    hash-blob pass 1."""
    from webvalid.pipeline import run_validation

    out = tmp_path_factory.mktemp("cutover_out")
    cfg = CheckConfig(block_size=BLOCK, ts_range=fixture_info["ts_window"],
                      uniqueness_driver_max_rows=0)
    res = run_validation(
        fixture_info["pages_dir"], str(out), cfg=cfg,
        ref_langs=fixture_info["ref_langs"],
        text_hashes=fixture_info["text_hashes"],
    )
    vio = res["violations"]
    dup_urls = {u for _, u in fixture_info["dup_rows"]}
    assert set(vio[vio["check"] == "uniqueness"]["url"]) == dup_urls
    v = res["verdicts"]
    uniq = v[v["check"] == "uniqueness"]
    bad_parts = {r // BLOCK for r, _ in fixture_info["dup_rows"]}
    assert bad_parts <= set(uniq[~uniq["pass"]]["partition_id"])


def test_systemic_failure_bounded_violations_exact_verdicts(
    ray_session, tmp_path_factory
):
    """Every row violating ts_window must not flood the driver: the
    violations table is capped per check, while verdict metrics carry
    the EXACT per-partition counts from the distributed viocount
    merge."""
    from webvalid.pipeline import run_validation

    d = tmp_path_factory.mktemp("floodfix")
    info = generate_webpages(str(d), n_rows=2_000, block_size=500, seed=31)
    out = tmp_path_factory.mktemp("floodout")
    # a ts_range entirely before the generated window → 100% violations
    cfg = CheckConfig(block_size=500, ts_range=(0, 1),
                      max_violations_per_check=50)
    res = run_validation(
        info["pages_dir"], str(out), cfg=cfg,
        ref_langs=info["ref_langs"], text_hashes=info["text_hashes"],
    )
    vio = res["violations"]
    assert len(vio[vio["check"] == "ts_window"]) <= 50
    v = res["verdicts"]
    tsw = v[v["check"] == "ts_window"]
    assert (~tsw["pass"]).all()
    # exact counts survive the cap: every partition reports its full 500
    assert sorted(tsw["metric"]) == [500.0] * 4


def test_tree_reduce_merge_matches_flat(ray_session, fixture_info, tmp_path_factory):
    """collect_merged_partials(tree=True) must equal the flat merge."""
    import glob

    import ray.data

    from webvalid.pipeline import collect_merged_partials, run_validation

    out = tmp_path_factory.mktemp("tree_out")
    cfg = CheckConfig(block_size=BLOCK, ts_range=fixture_info["ts_window"])
    run_validation(
        fixture_info["pages_dir"], str(out), cfg=cfg,
        ref_langs=fixture_info["ref_langs"],
        text_hashes=fixture_info["text_hashes"],
    )
    files = sorted(glob.glob(os.path.join(str(out), "checkpoints", "**", "*.parquet"),
                             recursive=True))
    assert files
    flat = collect_merged_partials(ray.data.read_parquet(files), tree=False)
    tree = collect_merged_partials(ray.data.read_parquet(files), tree=True)
    assert tree["viocounts"] == flat["viocounts"]
    assert len(tree["stats"]) == len(flat["stats"])
    assert len(tree["drift"]) == len(flat["drift"])
    import pickle

    f = {(r["partition_id"], r["column"]): r["state"] for r in flat["stats"]}
    t = {(r["partition_id"], r["column"]): r["state"] for r in tree["stats"]}
    assert set(f) == set(t)
    fd = {r["partition_id"]: pickle.loads(r["state"]) for r in flat["drift"]}
    td = {r["partition_id"]: pickle.loads(r["state"]) for r in tree["drift"]}
    assert fd == td


def test_chi2_global_reference_flags_planted_drift(
    ray_session, fixture_info, tmp_path_factory
):
    """chi2_reference="global" (each partition vs the pooled rest) must
    also flag the planted drift partition."""
    from webvalid.pipeline import run_validation

    out = tmp_path_factory.mktemp("chi2g_out")
    cfg = CheckConfig(block_size=BLOCK, ts_range=fixture_info["ts_window"],
                      chi2_reference="global")
    res = run_validation(
        fixture_info["pages_dir"], str(out), cfg=cfg,
        ref_langs=fixture_info["ref_langs"],
        text_hashes=fixture_info["text_hashes"],
    )
    v = res["verdicts"]
    chi = v[(v["check"] == "drift_chi2") & (v["column"] == "lang")]
    assert chi["detail"].str.startswith("global").all()
    failed = set(chi[~chi["pass"]]["partition_id"])
    assert fixture_info["drift_partition"] in failed


def test_chi2_window_reference_flags_planted_drift(
    ray_session, fixture_info, tmp_path_factory
):
    """chi2_reference="window" (each partition vs the pooled trailing
    k) must also flag the planted drift partition."""
    from webvalid.pipeline import run_validation

    out = tmp_path_factory.mktemp("chi2w_out")
    cfg = CheckConfig(block_size=BLOCK, ts_range=fixture_info["ts_window"],
                      chi2_reference="window", chi2_window=3)
    res = run_validation(
        fixture_info["pages_dir"], str(out), cfg=cfg,
        ref_langs=fixture_info["ref_langs"],
        text_hashes=fixture_info["text_hashes"],
    )
    v = res["verdicts"]
    chi = v[(v["check"] == "drift_chi2") & (v["column"] == "lang")]
    assert chi["detail"].str.startswith(("window", "first")).all()
    failed = set(chi[~chi["pass"]]["partition_id"])
    assert fixture_info["drift_partition"] in failed


def test_output_files_written(run_result):
    out = run_result["out_dir"]
    for name in ("verdicts.parquet", "violations.parquet", "stats.parquet",
                 "segments.parquet", "report.json"):
        assert os.path.exists(os.path.join(out, name)), name


def test_metadata_binary_states_fallback_conditions(tmp_path):
    """metadata_binary_states must return exact states when row groups
    align, and None (forcing the scan fallback) when a row group
    straddles a partition boundary or row_index isn't contiguous."""
    import pyarrow as pa

    from webvalid.checks.column_stats import ColumnState, metadata_binary_states

    def write(path, row_index, html, row_group_size):
        t = pa.table({
            "row_index": pa.array(row_index, pa.int64()),
            "html": pa.array(html, pa.binary()),
        })
        pq.write_table(t, path, row_group_size=row_group_size)

    cfg = CheckConfig()

    # aligned: 40 rows, block_size 10, row groups of 10 → 4 partitions
    f1 = str(tmp_path / "aligned.parquet")
    write(f1, list(range(40)), [b"x" if i % 5 else None for i in range(40)], 10)
    states = metadata_binary_states([f1], 10, "html", cfg)
    assert states is not None and len(states) == 4
    got = {pid: ColumnState.deserialize(s) for pid, s in states}
    assert all(got[p].n == 10 for p in range(4))
    assert all(got[p].nulls == 2 for p in range(4))  # i%5==0 twice per 10

    # straddle: row groups of 8 cross the block_size=10 boundary → None
    f2 = str(tmp_path / "straddle.parquet")
    write(f2, list(range(40)), [b"x"] * 40, 8)
    assert metadata_binary_states([f2], 10, "html", cfg) is None

    # non-contiguous row_index → None
    f3 = str(tmp_path / "gaps.parquet")
    write(f3, [i * 2 for i in range(10)], [b"x"] * 10, 10)
    assert metadata_binary_states([f3], 100, "html", cfg) is None


def test_driver_contract_rotation_consistent():
    """queries() rotation must not drop/duplicate entries, its hardcoded
    _NO_ORACLE set must equal the actual queries-without-oracle set, and
    the driver's 50-entry window (first 50 keys) must be entirely
    oracle-equipped queries (no wasted rows-only slots)."""
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) == len(set(qs))
    assert set(qs) - set(oracles) == set(e._NO_ORACLE)
    assert set(oracles) <= set(qs)
    green = e._driver_green()
    # the window holds only never-green oracle-equipped queries until
    # fewer than 50 of those remain
    first50 = list(qs)[:50]
    n_unverified = len(set(qs) - set(e._NO_ORACLE) - green)
    for k in first50[:min(50, n_unverified)]:
        assert k in oracles and k not in green
    # already-green queries must sit behind everything else (guard the
    # slice: [-0:] would be the WHOLE list, not an empty one)
    n_green = len(green & set(qs))
    if n_green:
        tail = list(qs)[-n_green:]
        assert set(tail) == green & set(qs)
