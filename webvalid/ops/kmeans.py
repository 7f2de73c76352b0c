"""Distributed Lloyd k-means over an embedding column.

The full-corpus iterative counterpart of the sampled
`ops/similarity.fit_centroids` (which only seeds IVF buckets): every
Lloyd iteration is ONE streaming pass where each batch assigns its
vectors to the nearest centroid (vectorized ‖x−c‖² via the Gram trick)
and emits mergeable (count, vector-sum, SSE) partials per cluster —
O(k·d) per batch, no shuffle. The driver combines partials, recomputes
centroids (an empty cluster keeps its old centroid), and stops on
`iters` or relative-inertia convergence.

Init is deterministic: the vectors of the k smallest ids, found with a
per-batch partial top-k + answer-sized driver combine (no sort
shuffle). Same init → identical clustering across runs and cluster
sizes, so the gate query is reproducible (inertia floats are rounded).

No reference analogue; training-data addition (corpus clustering /
topic bucketing — the standard precursor to cluster-balanced sampling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _init_centroids(ds, vec_col: str, id_col: str, k: int) -> np.ndarray:
    """Vectors of the k smallest ids: per-batch local k-smallest
    partials, combined driver-side (answer-sized)."""
    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if len(ids) > k:
            keep = np.argsort(ids, kind="stable")[:k]
            t = t.take(pa.array(np.sort(keep)))
        return t.select([id_col, vec_col])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(id_col, kind="mergesort").head(k)
    return np.array(parts[vec_col].to_list(), dtype=np.float64)


def _assign_partials(cent_ref, vec_col: str):
    def partial(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        from webvalid.ops.similarity import vecs_from_list_column

        x = vecs_from_list_column(t[vec_col])
        kk = cent.shape[0]
        if len(x) == 0:
            z = np.zeros(kk)
            return pa.table({"cluster": pa.array(np.arange(kk), pa.int64()),
                             "n": pa.array(np.zeros(kk, np.int64)),
                             "sse": pa.array(z, pa.float64()),
                             "vsum": pa.array(
                                 [np.zeros(cent.shape[1]).tolist()] * kk,
                                 pa.list_(pa.float64()))})
        # argmin ‖x−c‖² = argmin (‖c‖² − 2 x·c); SSE needs the real dist
        d2 = (np.einsum("ij,ij->i", x, x)[:, None]
              - 2.0 * (x @ cent.T)
              + np.einsum("ij,ij->i", cent, cent)[None, :])
        assign = np.argmin(d2, axis=1)
        sse = np.maximum(d2[np.arange(len(x)), assign], 0.0)
        n = np.bincount(assign, minlength=kk).astype(np.int64)
        sse_sum = np.bincount(assign, weights=sse, minlength=kk)
        vsum = np.zeros((kk, x.shape[1]))
        np.add.at(vsum, assign, x)
        return pa.table({"cluster": pa.array(np.arange(kk), pa.int64()),
                         "n": pa.array(n),
                         "sse": pa.array(sse_sum, pa.float64()),
                         "vsum": pa.array([v.tolist() for v in vsum],
                                          pa.list_(pa.float64()))})

    return partial


def kmeans_distributed(ds, vec_col: str = "embedding",
                       id_col: str = "vec_id", k: int = 8, iters: int = 10,
                       tol: float = 1e-6):
    """Returns (centroids ndarray, history DataFrame(iter, inertia),
    last-iteration cluster sizes ndarray)."""
    data = ds.select_columns([id_col, vec_col])
    cent = _init_centroids(data, vec_col, id_col, k)
    hist: list[tuple[int, float]] = []
    sizes = np.zeros(k, dtype=np.int64)
    prev = np.inf
    for it in range(iters):
        cent_ref = ray.put(cent)
        parts = data.map_batches(_assign_partials(cent_ref, vec_col),
                                 batch_format="pyarrow").to_pandas()
        g = parts.groupby("cluster", sort=True)
        n = g["n"].sum().to_numpy()
        inertia = float(g["sse"].sum().sum())
        vsum = np.stack([
            np.sum(np.stack(sub["vsum"].to_list()), axis=0)
            for _, sub in g
        ])
        nonempty = n > 0
        cent = cent.copy()
        cent[nonempty] = vsum[nonempty] / n[nonempty, None]
        sizes = n
        hist.append((it, inertia))
        if prev < np.inf and prev - inertia <= tol * prev:
            break
        prev = inertia
    history = pd.DataFrame(hist, columns=["iter", "inertia"])
    return cent, history, sizes
