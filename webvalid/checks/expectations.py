"""Declarative expectation suites — config-driven column checks.

The user hands the engine a LIST of expectations (dicts), and ONE
streaming `map_batches` pass computes every metric all of them need
as mergeable partials (n, nulls, min, max, sum, in-set violation
count, regex match count — one partial row per batch, O(#expectations)
wide). The driver closes each expectation into a verdict row
(expectation, column, metric, threshold, pass) — the
Great-Expectations-shaped API surface on top of the engine's
two-phase machinery.

Supported expectation kinds (each SQL-twinnable, so the gate is
value-exact):

- ``null_frac_le``:   fraction of NULLs ≤ value
- ``min_ge``:         column minimum ≥ value
- ``max_le``:         column maximum ≤ value
- ``mean_between``:   lo ≤ mean ≤ hi  (value = [lo, hi])
- ``in_set``:         non-null values ∉ set count == 0 (value = list)
- ``match_frac_ge``:  fraction of non-null values matching an RE2
                      regex ≥ value (pc.match_substring_regex)

No reference analogue; north-rule / validation-API addition.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

KINDS = ("null_frac_le", "min_ge", "max_le", "mean_between", "in_set",
         "match_frac_ge")


def _partial_for(exps: list[dict]):
    """One batch → one row per expectation with its mergeable pieces
    (count-like fields sum; min/max fields min/max)."""
    def partial(t: pa.Table) -> pa.Table:
        rows = {"idx": [], "n": [], "nulls": [], "vmin": [], "vmax": [],
                "vsum": [], "bad": [], "hits": []}
        for i, e in enumerate(exps):
            col = t[e["column"]]
            n = len(col)
            nulls = col.null_count
            vmin = vmax = vsum = math.nan
            bad = hits = 0
            kind = e["kind"]
            if kind in ("min_ge", "max_le", "mean_between"):
                if n - nulls > 0:
                    vmin = pc.min(col).as_py()
                    vmax = pc.max(col).as_py()
                    vsum = pc.sum(col).as_py()
            elif kind == "in_set":
                ok = pc.is_in(col, value_set=pa.array(e["value"]))
                bad = int(pc.sum(pc.and_(pc.is_valid(col),
                                         pc.invert(ok))).as_py() or 0)
            elif kind == "match_frac_ge":
                m = pc.match_substring_regex(col, e["pattern"])
                hits = int(pc.sum(m).as_py() or 0)
            rows["idx"].append(i)
            rows["n"].append(n)
            rows["nulls"].append(nulls)
            rows["vmin"].append(float(vmin) if vmin is not None else math.nan)
            rows["vmax"].append(float(vmax) if vmax is not None else math.nan)
            rows["vsum"].append(float(vsum) if vsum is not None else math.nan)
            rows["bad"].append(bad)
            rows["hits"].append(hits)
        return pa.table({k: pa.array(v) for k, v in rows.items()})

    return partial


def run_expectations(ds, expectations: list[dict],
                     ndigits: int = 6) -> pd.DataFrame:
    """(expectation, column, metric, threshold, pass) per expectation.

    `metric` is the measured quantity the threshold applies to (null
    fraction, min, max, mean, violation count, match fraction),
    rounded after a +1e-9 nudge for cross-engine comparability."""
    for e in expectations:
        if e["kind"] not in KINDS:
            raise ValueError(f"unknown expectation kind: {e['kind']}")
    parts = ds.map_batches(_partial_for(expectations),
                           batch_format="pyarrow").to_pandas()
    g = parts.groupby("idx", sort=True)
    agg = pd.DataFrame({
        "n": g["n"].sum(), "nulls": g["nulls"].sum(),
        "vmin": g["vmin"].min(), "vmax": g["vmax"].max(),
        "vsum": g["vsum"].sum(), "bad": g["bad"].sum(),
        "hits": g["hits"].sum(),
    })
    out = []
    for i, e in enumerate(expectations):
        r = agg.loc[i]
        n, nulls = int(r["n"]), int(r["nulls"])
        kind = e["kind"]
        if kind == "null_frac_le":
            metric = nulls / n if n else 0.0
            ok = metric <= e["value"]
            thr = float(e["value"])
        elif kind == "min_ge":
            metric = float(r["vmin"])
            ok = not (metric == metric and metric < e["value"])
            thr = float(e["value"])
        elif kind == "max_le":
            metric = float(r["vmax"])
            ok = not (metric == metric and metric > e["value"])
            thr = float(e["value"])
        elif kind == "mean_between":
            metric = float(r["vsum"]) / (n - nulls) if n - nulls else math.nan
            lo, hi = e["value"]
            ok = not (metric == metric and not (lo <= metric <= hi))
            thr = float(hi)
        elif kind == "in_set":
            metric = float(int(r["bad"]))
            ok = metric == 0
            thr = 0.0
        else:  # match_frac_ge
            nn = n - nulls
            metric = int(r["hits"]) / nn if nn else 0.0
            ok = metric >= e["value"]
            thr = float(e["value"])
        out.append({
            "expectation": kind, "column": e["column"],
            "metric": round(metric + 1e-9, ndigits)
            if metric == metric else math.nan,
            "threshold": thr, "pass": bool(ok),
        })
    return pd.DataFrame(out)
