"""Incremental drift-detection actor for streaming partition arrival.

The batch pipeline folds per-partition summaries driver-side
(webvalid/drift/cdcstream.py) because the whole summary table exists at
once. In streaming/incremental mode — partitions validated as they
land — the chart state (summary history, sigma extrema, segment
cursor: reference CDCStream/DriftDetector.java:50-55, plus CDDA's
previous-block histograms, CDDA/DriftDetector.java:48-51) must survive
across calls and driver restarts. `DriftChartActor` is that holder: a
(optionally named) Ray actor fed one partition state at a time, in
partition order, checkpointing its own state to JSON after every
observation so a replacement actor resumes exactly.

Usage:
    actor = DriftChartActor.options(name="webvalid_chart",
                                    get_if_exists=True).remote(
        checkpoint_path="/out/chart_state.json")
    verdicts = ray.get(actor.observe.remote(pid, summary, size, histograms))
"""

from __future__ import annotations

import base64
import json
import os
import pickle

import ray

from webvalid.drift.cdcstream import ChartState, chart_finish, chart_step
from webvalid.drift.cdda import change_degree


@ray.remote
class DriftChartActor:
    """Feeds CDCStream + CDDA sequentially; state checkpointed per call."""

    def __init__(self, drift_coefficient: float = 3.0,
                 min_change_degree: float = 0.1,
                 checkpoint_path: str | None = None):
        self.coef = drift_coefficient
        self.min_degree = min_change_degree
        self.path = checkpoint_path
        self.chart = ChartState()
        self.prev_histograms: list[dict] | None = None
        self.cdda_last_count = 0
        self.cdda_rows_before = 0
        self.next_pid = 0
        self.segments: list[dict] = []
        if checkpoint_path and os.path.exists(checkpoint_path):
            self._load()

    # -- persistence ------------------------------------------------------

    def _save(self) -> None:
        if not self.path:
            return
        # histograms are keyed by raw category values (may be None,
        # numbers, …) — JSON would stringify the keys and change_degree
        # would then never match them against fresh raw-keyed
        # histograms after a restart; pickle+base64 keeps them lossless
        state = {
            "chart": self.chart.to_dict(),
            "prev_histograms": (
                base64.b64encode(pickle.dumps(self.prev_histograms)).decode("ascii")
                if self.prev_histograms is not None else None
            ),
            "cdda_last_count": self.cdda_last_count,
            "cdda_rows_before": self.cdda_rows_before,
            "next_pid": self.next_pid,
            "segments": self.segments,
        }
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.rename(tmp, self.path)

    def _load(self) -> None:
        with open(self.path) as f:
            state = json.load(f)
        self.chart = ChartState.from_dict(state["chart"])
        ph = state["prev_histograms"]
        if ph is None:
            self.prev_histograms = None
        elif isinstance(ph, str):
            self.prev_histograms = pickle.loads(base64.b64decode(ph))
        else:
            # legacy layout: a JSON list of {str(key): count} dicts
            # (pre-pickle format) — keys were stringified on save, so
            # restore them as-is; only str-keyed histograms round-trip
            self.prev_histograms = ph
        self.cdda_last_count = state["cdda_last_count"]
        self.cdda_rows_before = state["cdda_rows_before"]
        self.next_pid = state["next_pid"]
        self.segments = state["segments"]

    # -- observation ------------------------------------------------------

    def observe(self, partition_id: int, summary: float, size: int,
                histograms: list[dict]) -> dict:
        """Feed one partition (must arrive in ascending order).

        Returns {"cdcstream_drift", "cdda_drift", "cdda_degree",
        "segments_emitted"}.
        """
        if partition_id != self.next_pid:
            raise ValueError(
                f"streaming mode requires in-order partitions: got {partition_id}, "
                f"expected {self.next_pid}"
            )
        emitted = []

        cdc_drift, seg = chart_step(self.chart, summary, size, self.coef)
        if seg is not None:
            emitted.append({"algorithm": "cdcstream", "start": seg[0], "end": seg[1]})

        cdda_drift = False
        degree = None
        if self.prev_histograms is not None:
            current_count = self.cdda_rows_before
            degree = change_degree(self.prev_histograms, histograms)
            if degree >= self.min_degree:
                emitted.append(
                    {"algorithm": "cdda", "start": self.cdda_last_count,
                     "end": current_count}
                )
                self.cdda_last_count = current_count + 1
                cdda_drift = True
        self.prev_histograms = histograms
        self.cdda_rows_before += size

        self.next_pid += 1
        self.segments.extend(emitted)
        self._save()
        return {
            "cdcstream_drift": cdc_drift,
            "cdda_drift": cdda_drift,
            "cdda_degree": degree,
            "segments_emitted": emitted,
        }

    def finish(self) -> dict:
        """End-of-stream: emit the final segments for both algorithms."""
        emitted = []
        seg = chart_finish(self.chart)
        if seg is not None:
            emitted.append({"algorithm": "cdcstream", "start": seg[0], "end": seg[1]})
        if self.cdda_rows_before >= self.cdda_last_count:
            emitted.append(
                {"algorithm": "cdda", "start": self.cdda_last_count,
                 "end": self.cdda_rows_before}
            )
        self.segments.extend(emitted)
        self._save()
        return {"segments": self.segments, "final": emitted}

    def state(self) -> dict:
        return {"next_pid": self.next_pid, "segments": list(self.segments)}
