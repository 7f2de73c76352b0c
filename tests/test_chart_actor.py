"""Streaming DriftChartActor == batch folds, including checkpoint resume."""

from __future__ import annotations

import numpy as np
import pytest

from tests.test_drift_parity import columns_of, drifting_rows
from webvalid.drift import block_summary, cdda_fold, column_histograms, control_chart_fold


@pytest.fixture(scope="module")
def stream_blocks():
    rows = drifting_rows(21, n_blocks=9, block_size=40, shift_at=(5,))
    blocks = [rows[i: i + 40] for i in range(0, len(rows), 40)]
    summaries = [block_summary(columns_of(b)) for b in blocks]
    histograms = [column_histograms(columns_of(b)) for b in blocks]
    sizes = [len(b) for b in blocks]
    return summaries, histograms, sizes


def _expected_segments(summaries, histograms, sizes):
    cdc_segments, _ = control_chart_fold(summaries, sizes, 3.0)
    cdda_segments, _, _ = cdda_fold(histograms, sizes, 0.1)
    return (
        [{"algorithm": "cdcstream", "start": s, "end": e} for s, e in cdc_segments]
        + [{"algorithm": "cdda", "start": s, "end": e} for s, e in cdda_segments]
    )


def _sorted(segs):
    return sorted(segs, key=lambda d: (d["algorithm"], d["start"], d["end"]))


def test_streaming_matches_batch_folds(ray_session, stream_blocks, tmp_path):
    import ray

    from webvalid.state.chart_actor import DriftChartActor

    summaries, histograms, sizes = stream_blocks
    actor = DriftChartActor.remote(checkpoint_path=str(tmp_path / "chart.json"))
    for pid, (s, h, sz) in enumerate(zip(summaries, histograms, sizes)):
        ray.get(actor.observe.remote(pid, s, sz, h))
    result = ray.get(actor.finish.remote())
    assert _sorted(result["segments"]) == _sorted(
        _expected_segments(summaries, histograms, sizes)
    )


def test_streaming_resume_from_checkpoint(ray_session, stream_blocks, tmp_path):
    import ray

    from webvalid.state.chart_actor import DriftChartActor

    summaries, histograms, sizes = stream_blocks
    ckpt = str(tmp_path / "chart_resume.json")

    a1 = DriftChartActor.remote(checkpoint_path=ckpt)
    for pid in range(4):
        ray.get(a1.observe.remote(pid, summaries[pid], sizes[pid], histograms[pid]))
    ray.kill(a1)

    a2 = DriftChartActor.remote(checkpoint_path=ckpt)
    assert ray.get(a2.state.remote())["next_pid"] == 4
    for pid in range(4, len(summaries)):
        ray.get(a2.observe.remote(pid, summaries[pid], sizes[pid], histograms[pid]))
    result = ray.get(a2.finish.remote())
    assert _sorted(result["segments"]) == _sorted(
        _expected_segments(summaries, histograms, sizes)
    )


def test_streaming_rejects_out_of_order(ray_session, stream_blocks, tmp_path):
    import ray

    from webvalid.state.chart_actor import DriftChartActor

    summaries, histograms, sizes = stream_blocks
    actor = DriftChartActor.remote()
    ray.get(actor.observe.remote(0, summaries[0], sizes[0], histograms[0]))
    with pytest.raises(Exception, match="in-order"):
        ray.get(actor.observe.remote(5, summaries[5], sizes[5], histograms[5]))


def test_streaming_matches_pipeline_on_webpages_fixture(ray_session, tmp_path):
    """Golden link between the streaming actor and the batch pipeline:
    feeding the actor the same per-partition states the pipeline merges
    (lang/host projection of the seeded webpages fixture, in partition
    order) must reproduce run_validation's segments exactly."""
    import pickle

    import ray
    import ray.data

    from webvalid.checks.base import CheckConfig
    from webvalid.checks.drift_check import DriftPartial, merge_drift_state_dicts
    from webvalid.drift.dilca import BlockStatistics, summary_of_stats
    from webvalid.gen import generate_webpages
    from webvalid.partition import add_host, add_partition_id
    from webvalid.pipeline import merge_keyed_states, run_validation
    from webvalid.state.chart_actor import DriftChartActor

    info = generate_webpages(str(tmp_path / "fix"), n_rows=4_000, block_size=400,
                             seed=17)
    cfg = CheckConfig(block_size=400, ts_range=info["ts_window"])
    res = run_validation(
        info["pages_dir"], str(tmp_path / "out"), cfg=cfg,
        ref_langs=info["ref_langs"], text_hashes=info["text_hashes"],
    )
    expected = [
        {"algorithm": r["algorithm"], "start": int(r["start"]), "end": int(r["end"])}
        for _, r in res["segments"].iterrows()
    ]

    def proj(t):
        t = add_partition_id(t, 400)
        t = add_host(t)
        return t.select(["partition_id", "lang", "host"])

    ds = ray.data.read_parquet(info["pages_dir"],
                               columns=["url", "lang", "row_index"]).map_batches(
        proj, batch_format="pyarrow"
    )
    partials = ds.map_batches(DriftPartial(cfg.drift_columns), batch_format="pyarrow")
    merged = sorted(
        merge_keyed_states(partials, ("partition_id",), pickle.loads,
                           merge_drift_state_dicts),
        key=lambda r: r["partition_id"],
    )
    actor = DriftChartActor.remote(checkpoint_path=str(tmp_path / "chart.json"))
    for row in merged:
        s = pickle.loads(row["state"])
        summ = summary_of_stats(
            BlockStatistics.from_counts(s["value_counts"], s["pairs"])
        )
        ray.get(actor.observe.remote(row["partition_id"], summ,
                                     s["n"], s["value_counts"]))
    result = ray.get(actor.finish.remote())
    assert _sorted(result["segments"]) == _sorted(expected)
