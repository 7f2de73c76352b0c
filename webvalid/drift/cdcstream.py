"""CDCStream mean/sigma control-chart fold over ordered block summaries.

Replicates the sequential loop of the reference detector
(reference: CDCStream/DriftDetector.java:46-116) as a driver-side fold
over the tiny per-partition summary table — the reference's only
sequential dependency is one double per block, so the heavy per-block
DILCA work (webvalid.drift.dilca) parallelizes fully and this fold is
O(#partitions).

Replicated quirks:
- `maxStandardDeviation` initializes to Java's `Double.MIN_VALUE` —
  the smallest *positive* subnormal (4.9e-324), NOT -inf — and
  `minStandardDeviation` to `Double.MAX_VALUE`
  (CDCStream/DriftDetector.java:50). Both survive drift resets, so the
  one-summary fallback sigma after a drift is `(min+max)/2` over
  *global* extrema (:95-98).
- Population standard deviation (divide by n, :82-86); mean and sigma
  accumulate in ascending block order (:74-86).
- Drift fires when `|summary - mean| >= coefficient * sigma` (:100-102)
  — `>=`, so a zero sigma with a zero difference still fires.
- Warm-up: the first two blocks are summarized without testing
  (:59-64); the first drift test happens on block index 2.
- Segment bookkeeping: `currentCount` is the record count *before* the
  tested block (:67); on drift the segment `(lastCount, currentCount)`
  is emitted and `lastCount = currentCount + 1` (:103-104); at
  end-of-stream a final segment is emitted when
  `currentCount >= lastCount` (:110-114). Streams shorter than two
  blocks emit the degenerate `(0, 0)` segment because `currentCount` is
  never assigned before the reader throws.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

JAVA_DOUBLE_MIN = 5e-324  # Double.MIN_VALUE: smallest positive subnormal
JAVA_DOUBLE_MAX = 1.7976931348623157e308  # Double.MAX_VALUE


@dataclass
class ChartState:
    """Serializable control-chart state (for checkpoint/resume)."""

    summaries: list[float] = field(default_factory=list)
    max_sd: float = JAVA_DOUBLE_MIN
    min_sd: float = JAVA_DOUBLE_MAX
    last_count: int = 0
    rows_before: int = 0  # records consumed before the next block
    blocks_seen: int = 0

    def to_dict(self) -> dict:
        return {
            "summaries": list(self.summaries),
            "max_sd": self.max_sd,
            "min_sd": self.min_sd,
            "last_count": self.last_count,
            "rows_before": self.rows_before,
            "blocks_seen": self.blocks_seen,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ChartState":
        return cls(
            summaries=list(d["summaries"]),
            max_sd=d["max_sd"],
            min_sd=d["min_sd"],
            last_count=d["last_count"],
            rows_before=d["rows_before"],
            blocks_seen=d["blocks_seen"],
        )


def chart_step(state: ChartState, summary: float, block_size: int,
               drift_coefficient: float) -> tuple[bool, tuple[int, int] | None]:
    """Feed one block summary through the chart; mutates `state`.

    Returns (drifted, emitted_segment). Blocks 0 and 1 are warm-up
    (CDCStream/DriftDetector.java:59-64): summaries are recorded but no
    test runs.
    """
    if state.blocks_seen < 2:
        state.summaries.append(summary)
        state.blocks_seen += 1
        state.rows_before += block_size
        return False, None

    current_count = state.rows_before
    mean = 0.0
    sd = 0.0
    n_hist = len(state.summaries)
    if n_hist > 1:
        for s in state.summaries:  # accumulate-then-divide, Java order (:74-79)
            mean += s
        mean /= n_hist
        for s in state.summaries:  # population sigma (:82-86)
            sd += (s - mean) ** 2
        sd = math.sqrt(sd / n_hist)
        if state.max_sd < sd:
            state.max_sd = sd
        if state.min_sd > sd:
            state.min_sd = sd
    elif n_hist == 1:
        mean = state.summaries[0]
        sd = (state.min_sd + state.max_sd) / 2  # fallback (:95-98)

    drifted = False
    segment = None
    # NaN summary (e.g. single-column block, see dilca.py) never fires: NaN >= x is False.
    if abs(summary - mean) >= drift_coefficient * sd:
        segment = (state.last_count, current_count)
        state.last_count = current_count + 1
        state.summaries.clear()
        drifted = True

    state.summaries.append(summary)
    state.blocks_seen += 1
    state.rows_before += block_size
    return drifted, segment


def chart_finish(state: ChartState) -> tuple[int, int] | None:
    """End-of-stream segment (CDCStream/DriftDetector.java:110-115).

    `currentCount` at the throw site equals the total record count when
    at least two blocks were consumed, else 0 (never assigned).
    """
    current_count = state.rows_before if state.blocks_seen >= 2 else 0
    last = state.last_count
    if current_count >= last:
        return (last, current_count)
    return None


def control_chart_fold(summaries, block_sizes, drift_coefficient: float = 3.0):
    """Run the whole chart over ordered per-partition summaries.

    `summaries[b]` / `block_sizes[b]` describe logical block b in
    stream order. Returns (segments, drift_flags) where drift_flags[b]
    is True iff the chart fired while testing block b.
    """
    state = ChartState()
    segments: list[tuple[int, int]] = []
    flags = [False] * len(summaries)
    for b, (s, sz) in enumerate(zip(summaries, block_sizes)):
        drifted, seg = chart_step(state, s, sz, drift_coefficient)
        flags[b] = drifted
        if seg is not None:
            segments.append(seg)
    final = chart_finish(state)
    if final is not None:
        segments.append(final)
    return segments, flags
