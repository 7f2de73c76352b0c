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
