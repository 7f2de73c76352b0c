"""Distribution-drift check: CDCStream + CDDA reference parity, chi², KS.

Pipeline shape (SURVEY.md §3.1 "engine decomposition"):

1. *Embarrassingly parallel*: a vectorized `map_batches` pass over the
   categorical drift projection (e.g. lang, host) emits one small
   pickled state per (partition, batch): per-column value counts plus
   pairwise co-occurrence count dicts. Counts are additive, so batch
   partials merge into exact per-partition statistics — the engine
   never ships raw rows (the reference holds the whole 10k-row block in
   heap instead: CDCStream/DriftDetector.java:52,68-69).
2. *Sequential, tiny*: per-partition DILCA summaries feed the
   CDCStream control chart fold and per-partition histograms feed the
   CDDA pairwise fold (both O(#partitions), driver-side), plus
   chi-squared tests between consecutive partitions' histograms and a
   KS test over numeric histograms from the column-stats pass.
"""

from __future__ import annotations

import math
import pickle

import numpy as np
import pyarrow as pa

from webvalid.checks.base import CheckConfig, verdict_row
from webvalid.drift.cdcstream import control_chart_fold
from webvalid.drift.cdda import cdda_fold
from webvalid.drift.dilca import BlockStatistics, summary_of_stats
from webvalid.partition import partition_slices
from webvalid.sketches import (NumericHistogram, chi2_two_sample,
                               ks_two_sample_from_hist, psi_two_sample)


# reserved pseudo-category that absorbs the tail of a capped domain
OTHER_BUCKET = "\x00__other__"


class DriftPartial:
    """map_batches callable over the categorical projection columns.

    Emits (partition_id, state) rows where state holds per-column value
    counts and upper-triangular pair co-occurrence counts for the
    partition rows present in this batch.

    `max_keys` (None = uncapped, the reference-parity default) bounds
    every column's per-batch domain: only the top-`max_keys` values by
    count keep their identity, the tail collapses into OTHER_BUCKET.
    Semantic deviation (documented, NOT reference behavior): CDDA and
    chi² then see the tail as one shared pseudo-value — tail-internal
    churn is invisible, tail-mass shifts remain visible — and DILCA
    domains are bounded at max_keys+1, keeping the O(d²..d³) math and
    state size bounded on high-cardinality projections (e.g. url host).

    CAVEAT (capped mode only): the top-`max_keys` cutoff is chosen PER
    BATCH, so a value on the cap boundary can keep its identity in one
    batch and fall into OTHER_BUCKET in another — capped drift counts
    therefore depend (slightly) on Ray's batch layout, unlike every
    other state in the engine. The exact default (max_keys=None) is
    fully partition-independent; if a deterministic capped mode is ever
    needed, derive a global keep-set first (e.g. via
    sketches.MisraGries) and pass it down.
    """

    def __init__(self, columns: tuple[str, ...], max_keys: int | None = None):
        self.columns = columns
        self.max_keys = max_keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        pids: list[int] = []
        states: list[bytes] = []
        m = len(self.columns)
        for pid, sub in partition_slices(batch):
            codes = []
            uniques = []
            for name in self.columns:
                arr = sub[name].combine_chunks().to_numpy(zero_copy_only=False)
                c, u = pd.factorize(arr, use_na_sentinel=False)
                if self.max_keys is not None and len(u) > self.max_keys:
                    cnt = np.bincount(c, minlength=len(u))
                    top = np.argsort(-cnt, kind="stable")[: self.max_keys]
                    remap = np.full(len(u), self.max_keys, dtype=np.int64)
                    remap[top] = np.arange(self.max_keys)
                    c = remap[c]
                    u = np.concatenate(
                        [np.asarray(u, dtype=object)[top], [OTHER_BUCKET]]
                    )
                codes.append(c)
                uniques.append(u)
            value_counts = []
            for i in range(m):
                cnt = np.bincount(codes[i], minlength=len(uniques[i]))
                value_counts.append({v: int(c) for v, c in zip(uniques[i], cnt)})
            pairs: dict = {}
            for i in range(m):
                di = len(uniques[i])
                for j in range(i + 1, m):
                    dj = len(uniques[j])
                    fused = codes[i].astype(np.int64) * dj + codes[j]
                    cnt = np.bincount(fused, minlength=di * dj)
                    nz = np.flatnonzero(cnt)
                    d = {
                        (uniques[i][k // dj], uniques[j][k % dj]): int(cnt[k])
                        for k in nz
                    }
                    pairs[(i, j)] = d
            pids.append(pid)
            states.append(
                pickle.dumps({"n": sub.num_rows, "value_counts": value_counts, "pairs": pairs})
            )
        return pa.table(
            {
                "partition_id": pa.array(pids, pa.int64()),
                "state": pa.array(states, pa.binary()),
            }
        )


def merge_drift_state_dicts(acc: dict, s: dict) -> dict:
    """Additive merge of two drift state dicts (mutates and returns acc)."""
    acc["n"] += s["n"]
    for i, vc in enumerate(s["value_counts"]):
        dst = acc["value_counts"][i]
        for v, c in vc.items():
            dst[v] = dst.get(v, 0) + c
    for key, d in s["pairs"].items():
        dst = acc["pairs"][key]
        for k, c in d.items():
            dst[k] = dst.get(k, 0) + c
    return acc


def merge_drift_states(group: pa.Table) -> pa.Table:
    """map_groups callable: additive merge of one partition's partials."""
    blobs = group["state"].to_pylist()
    acc = pickle.loads(blobs[0])
    for b in blobs[1:]:
        acc = merge_drift_state_dicts(acc, pickle.loads(b))
    return pa.table(
        {
            "partition_id": pa.array([group["partition_id"][0].as_py()], pa.int64()),
            "state": pa.array([pickle.dumps(acc)], pa.binary()),
        }
    )


def _aligned_counts(h1: dict, h2: dict) -> tuple[np.ndarray, np.ndarray]:
    # SORTED union, not raw set order: set iteration order varies per
    # process (string hash randomization), and chi2/psi accumulate
    # float sums in this order — unsorted keys made the suite's drift
    # metrics wobble in the last ulps across runs (caught by
    # tools/check_determinism.py at sf0.1)
    # type name breaks str-collision ties (int 1 vs str '1') that would
    # otherwise fall back to per-process set order
    keys = sorted(h1.keys() | h2.keys(),
                  key=lambda k: (k is None, type(k).__name__, str(k)))
    c1 = np.array([h1.get(k, 0) for k in keys], dtype=np.float64)
    c2 = np.array([h2.get(k, 0) for k in keys], dtype=np.float64)
    return c1, c2


def drift_fold(merged_states: list[dict], cfg: CheckConfig,
               numeric_hists: dict[int, NumericHistogram] | None = None,
               ks_column: str = "") -> tuple[list[dict], list[dict]]:
    """Sequential fold over per-partition drift states (sorted by id).

    Returns (verdict_rows, segment_rows). Verdicts:
    - drift_cdcstream: chart fired on this partition (warm-up passes);
    - drift_cdda: change degree vs previous partition >= threshold;
    - drift_chi2 (per projection column): homogeneity vs previous
      partition, fail when p < cfg.chi2_alpha;
    - drift_ks (optional numeric histogram per partition from the
      column-stats pass): KS vs previous partition.
    """
    merged_states = sorted(merged_states, key=lambda r: r["partition_id"])
    pids = [r["partition_id"] for r in merged_states]
    states = [pickle.loads(r["state"]) for r in merged_states]
    sizes = [s["n"] for s in states]
    m = len(cfg.drift_columns)

    verdicts: list[dict] = []
    segments: list[dict] = []

    # CDCStream: per-partition DILCA summaries → control chart.
    summaries = [
        summary_of_stats(BlockStatistics.from_counts(s["value_counts"], s["pairs"]))
        for s in states
    ]
    cdc_segments, cdc_flags = control_chart_fold(
        summaries, sizes, drift_coefficient=cfg.drift_coefficient
    )
    for seg in cdc_segments:
        segments.append({"algorithm": "cdcstream", "start": seg[0], "end": seg[1]})
    for pid, flag, summ in zip(pids, cdc_flags, summaries):
        warmup = pid < 2
        verdicts.append(
            verdict_row(
                pid, "drift_cdcstream", "*", not flag,
                summ if not math.isnan(summ) else math.nan,
                "warmup" if warmup else f"coef={cfg.drift_coefficient}",
            )
        )

    # CDDA: per-partition histograms → pairwise change degrees.
    histograms = [s["value_counts"] for s in states]
    cdda_segments, cdda_flags, degrees = cdda_fold(
        histograms, sizes, min_change_degree=cfg.min_change_degree
    )
    for seg in cdda_segments:
        segments.append({"algorithm": "cdda", "start": seg[0], "end": seg[1]})
    for pid, flag, deg in zip(pids, cdda_flags, degrees):
        verdicts.append(
            verdict_row(
                pid, "drift_cdda", "*", not flag,
                deg if deg is not None else math.nan,
                "first" if deg is None else f"min_degree={cfg.min_change_degree}",
            )
        )

    # chi-squared homogeneity per column: vs previous partition
    # (default) or vs the pooled rest of the run (cfg.chi2_reference ==
    # "global" — catches slow drifts the per-step test never sees).
    for ci, cname in enumerate(cfg.drift_columns):
        if cfg.chi2_reference == "window":
            from collections import deque

            hist: deque = deque(maxlen=max(1, cfg.chi2_window))
            for pid, s in zip(pids, states):
                cur = s["value_counts"][ci]
                if not hist:
                    verdicts.append(
                        verdict_row(pid, "drift_chi2", cname, True, math.nan, "first")
                    )
                else:
                    pooled: dict = {}
                    for h in hist:
                        for v, c in h.items():
                            pooled[v] = pooled.get(v, 0) + c
                    c1, c2 = _aligned_counts(pooled, cur)
                    stat, df, p = chi2_two_sample(c1, c2)
                    ok = not (p == p and p < cfg.chi2_alpha)
                    verdicts.append(
                        verdict_row(pid, "drift_chi2", cname, ok, p,
                                    f"window{len(hist)},stat={stat:.3f},df={df}")
                    )
                hist.append(cur)
            continue
        if cfg.chi2_reference == "global":
            totals: dict = {}
            for s in states:
                for v, c in s["value_counts"][ci].items():
                    totals[v] = totals.get(v, 0) + c
            for pid, s in zip(pids, states):
                cur = s["value_counts"][ci]
                rest = {v: totals.get(v, 0) - cur.get(v, 0) for v in totals}
                c1, c2 = _aligned_counts(rest, cur)
                stat, df, p = chi2_two_sample(c1, c2)
                ok = not (p == p and p < cfg.chi2_alpha)  # NaN p → pass
                verdicts.append(
                    verdict_row(pid, "drift_chi2", cname, ok, p,
                                f"global,stat={stat:.3f},df={df}")
                )
            continue
        prev = None
        for pid, s in zip(pids, states):
            cur = s["value_counts"][ci]
            if prev is None:
                verdicts.append(
                    verdict_row(pid, "drift_chi2", cname, True, math.nan, "first")
                )
            else:
                c1, c2 = _aligned_counts(prev, cur)
                stat, df, p = chi2_two_sample(c1, c2)
                ok = not (p == p and p < cfg.chi2_alpha)  # NaN p → pass
                verdicts.append(
                    verdict_row(pid, "drift_chi2", cname, ok, p, f"stat={stat:.3f},df={df}")
                )
            prev = cur

    # PSI (population stability index) per projection column vs the
    # previous partition — the drift MAGNITUDE score that complements
    # the chi2 significance test (chi2 flags any significant change at
    # large n; PSI only fails when the distribution moved by a
    # practically meaningful amount, cfg.psi_max).
    for ci, cname in enumerate(cfg.drift_columns):
        prev = None
        for pid, s in zip(pids, states):
            cur = s["value_counts"][ci]
            if prev is None:
                verdicts.append(
                    verdict_row(pid, "drift_psi", cname, True, math.nan, "first")
                )
            else:
                c1, c2 = _aligned_counts(prev, cur)
                psi = psi_two_sample(c1, c2, smooth=cfg.psi_smooth)
                ok = not (psi == psi and psi > cfg.psi_max)  # NaN → pass
                verdicts.append(
                    verdict_row(pid, "drift_psi", cname, ok, psi,
                                f"max={cfg.psi_max}")
                )
            prev = cur

    # KS over numeric per-partition histograms (from column stats).
    if numeric_hists:
        prev_h = None
        for pid in pids:
            h = numeric_hists.get(pid)
            if h is None:
                continue
            if prev_h is None:
                verdicts.append(
                    verdict_row(pid, "drift_ks", ks_column, True, math.nan, "first")
                )
            else:
                d, p = ks_two_sample_from_hist(prev_h, h)
                ok = not (p == p and p < cfg.ks_alpha)
                verdicts.append(
                    verdict_row(pid, "drift_ks", ks_column, ok, p, f"D={d:.4f}")
                )
            prev_h = h

    return verdicts, segments
