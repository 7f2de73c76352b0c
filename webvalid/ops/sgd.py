"""Distributed full-batch logistic regression by gradient descent.

The model-training counterpart of `ops/kmeans`: every iteration is ONE
streaming pass where each batch computes its exact gradient
contribution Σ (σ(Xw) − y)·X and log-loss as an O(d) mergeable
partial; the driver sums partials, takes a deterministic step, and
repeats. Full-batch (not stochastic), so the fit is REPRODUCIBLE on
any partition layout — same data, same iterations, same coefficients —
which is what makes a gate query possible at all.

Features are standardized with global (mean, σ) moments from one
prior pass, so the fixed learning rate is scale-free; coefficients
are reported in standardized space plus the intercept.

No reference analogue; training-data / ML-at-scale addition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _moments(ds, x_cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
    def partial(t: pa.Table) -> pa.Table:
        cols = {c: t[c].to_numpy(zero_copy_only=False).astype(np.float64)
                for c in x_cols}
        row = {"n": [float(t.num_rows)]}
        for c, v in cols.items():
            row[f"s_{c}"] = [float(v.sum())]
            row[f"ss_{c}"] = [float((v * v).sum())]
        return pa.table(row)

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n = p["n"]
    mean = np.array([p[f"s_{c}"] / n for c in x_cols])
    var = np.array([p[f"ss_{c}"] / n for c in x_cols]) - mean ** 2
    sd = np.sqrt(np.maximum(var, 0.0))
    sd[sd == 0] = 1.0
    return mean, sd


def logreg_fit(ds, x_cols: list[str], label_col: str, iters: int = 50,
               lr: float = 0.5):
    """Returns (weights ndarray[d], intercept, history DataFrame(iter,
    log_loss)). Labels must be 0/1. Deterministic full-batch GD on
    standardized features."""
    mean, sd = _moments(ds, x_cols)
    scale_ref = ray.put((mean, sd))
    d = len(x_cols)
    w = np.zeros(d)
    b = 0.0
    hist: list[tuple[int, float]] = []

    def grad_pass(w_ref):
        def partial(t: pa.Table) -> pa.Table:
            m, s = ray.get(scale_ref)
            ww, bb = ray.get(w_ref)
            x = np.stack([t[c].to_numpy(zero_copy_only=False)
                          .astype(np.float64) for c in x_cols], axis=1)
            x = (x - m) / s
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            z = x @ ww + bb
            p = 1.0 / (1.0 + np.exp(-z))
            err = p - y
            eps = 1e-12
            loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
            return pa.table({
                "gw": pa.array([(x * err[:, None]).sum(axis=0).tolist()],
                               pa.list_(pa.float64())),
                "gb": pa.array([float(err.sum())], pa.float64()),
                "loss": pa.array([float(loss)], pa.float64()),
                "n": pa.array([float(len(y))], pa.float64()),
            })

        return partial

    data = ds.select_columns([*x_cols, label_col])
    for it in range(iters):
        w_ref = ray.put((w, b))
        parts = data.map_batches(grad_pass(w_ref),
                                 batch_format="pyarrow").to_pandas()
        n = parts["n"].sum()
        gw = np.sum(np.stack(parts["gw"].to_list()), axis=0) / n
        gb = parts["gb"].sum() / n
        hist.append((it, float(parts["loss"].sum() / n)))
        w = w - lr * gw
        b = b - lr * gb
    return w, b, pd.DataFrame(hist, columns=["iter", "log_loss"])
