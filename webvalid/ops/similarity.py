"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — per-batch NumPy matmul against a
broadcast (`ray.put`) query matrix; per-batch local top-k partials are
reduced per query (the partial fan-in is #batches × k rows, tiny).

Scale path: IVF — centroids fitted driver-side on a small sample
(a few k-means iterations), broadcast; each batch assigns its vectors
to the nearest centroid and only vectors in the query's `nprobe`
closest clusters are scored. Cuts the matmul work by ~nlist/nprobe at
a small recall cost.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def vecs_from_list_column(col) -> np.ndarray:
    """Zero-copy (n, d) float64 matrix from an Arrow list<float>
    column: one list_flatten + reshape instead of a Python list per
    row (to_pylist costs ~20x on wide embedding batches). Requires
    non-null, equal-length lists (asserted)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if isinstance(col.type, pa.ExtensionType):
        # Ray tensor-extension columns (from_pandas of ndarray cells)
        arr = col.to_numpy(zero_copy_only=False)
        if arr.dtype == object:
            arr = np.stack(arr)
        return arr.astype(np.float64, copy=False)
    lens = pc.list_value_length(col)
    if col.null_count or pc.min(lens).as_py() != pc.max(lens).as_py():
        raise ValueError("embedding column must be non-null fixed-length lists")
    d = int(lens[0].as_py())
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(n, d)


class BruteForceScorer:
    """map_batches callable: cosine of batch vectors vs broadcast queries,
    emitting each batch's local top-k rows per query."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        qids, qmat = ray.get(queries_ref)
        self.query_ids = np.asarray(qids)
        self.queries = _normalize(np.asarray(qmat, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:  # empty block: (0, 0) matrix would crash matmul
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        vecs = _normalize(vecs_from_list_column(batch[self.vec_col]))
        sims = self.queries @ vecs.T  # (n_queries, n_batch)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            # full tie-break INSIDE the block: equal-cosine candidates
            # must survive by vec_id asc, or the k cut drops the very
            # ids the documented (sim DESC, vec_id ASC) order keeps
            order = np.lexsort((ids, -sims[qi]))[:k]
            for c in order:
                out_q.append(int(self.query_ids[qi]))
                out_v.append(int(ids[c]))
                out_s.append(float(sims[qi, c]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def _reduce_topk(partials_ds, k: int):
    """Driver-side final top-k per query over the tiny partial table
    (#blocks × #queries × k rows) — no sort shuffle."""
    import pandas as pd
    import ray.data

    pdf = partials_ds.to_pandas()
    if len(pdf) == 0:  # all-empty blocks lose their columns in to_pandas
        return ray.data.from_pandas(pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "vec_id": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}))
    out = (
        pdf.sort_values(["cosine", "vec_id"], ascending=[False, True])
        .groupby("query_id", as_index=False, sort=True)
        .head(k)
        .sort_values(["query_id", "cosine", "vec_id"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    return ray.data.from_pandas(out)


def brute_force_topk(ds, query_ids, query_matrix, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Top-k cosine neighbors per query vector. Ties broken by vec_id asc."""
    from webvalid.rayutil import task_callable

    queries_ref = ray.put((np.asarray(query_ids), np.asarray(query_matrix)))
    partials = ds.select_columns([id_col, vec_col]).map_batches(
        task_callable(BruteForceScorer, queries_ref=queries_ref, k=k,
                      id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
    )
    return _reduce_topk(partials, k)


# ---------------------------------------------------------------------------
# IVF (bucketed) path
# ---------------------------------------------------------------------------

def fit_centroids(sample: np.ndarray, nlist: int, iters: int = 8,
                  seed: int = 0) -> np.ndarray:
    """Small k-means on a driver-side sample (normalized, cosine metric)."""
    if sample.ndim != 2 or len(sample) == 0:
        raise ValueError("fit_centroids needs a non-empty (n, d) sample "
                         "— is the embeddings dataset empty?")
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(x), size=min(nlist, len(x)), replace=False)
    cent = x[idx].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


class IVFScorer:
    """Scores only vectors falling in each query's nprobe nearest clusters."""

    def __init__(self, queries_ref, centroids_ref, k: int, nprobe: int,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        qids, qmat = ray.get(queries_ref)
        self.query_ids = np.asarray(qids)
        self.queries = _normalize(np.asarray(qmat, dtype=np.float64))
        self.centroids = ray.get(centroids_ref)
        sims = self.queries @ self.centroids.T
        nprobe = min(nprobe, self.centroids.shape[0])
        self.probe = np.argpartition(-sims, kth=nprobe - 1, axis=1)[:, :nprobe]
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:  # empty block: (0, 0) matrix would crash matmul
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        vecs = _normalize(vecs_from_list_column(batch[self.vec_col]))
        assign = np.argmax(vecs @ self.centroids.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.query_ids)):
            mask = np.isin(assign, self.probe[qi])
            if not mask.any():
                continue
            sub = vecs[mask]
            sub_ids = ids[mask]
            sims = sub @ self.queries[qi]
            k = min(self.k, len(sims))
            # tie-break by vec_id asc so the k cut is layout-independent
            top = np.lexsort((sub_ids, -sims))[:k]
            for c in top:
                out_q.append(int(self.query_ids[qi]))
                out_v.append(int(sub_ids[c]))
                out_s.append(float(sims[c]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def ivf_topk(ds, query_ids, query_matrix, k: int = 10, nlist: int = 16,
             nprobe: int = 4, sample_size: int = 2048,
             id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 0):
    """Approximate top-k via IVF bucketing; recall < 1, ~nlist/nprobe less work."""
    # random_sample's SET is seed-deterministic but its row ORDER is
    # block-arrival order, which varies run to run — and fit_centroids'
    # k-means init draws positional indices, so unordered rows made the
    # centroids (hence recall) nondeterministic across runs. Carry the
    # id and sort the driver-side sample before fitting.
    sample = ds.select_columns([id_col, vec_col]).random_sample(
        min(1.0, sample_size / max(1, ds.count())), seed=seed
    ).to_pandas().sort_values(id_col, kind="mergesort")
    # mergesort is stable, but duplicate ids would still tie back to
    # arrival order — id_col must identify rows for the fit (and the
    # probe phase) to be deterministic
    if sample[id_col].duplicated().any():
        raise ValueError(
            f"ivf_topk: id column '{id_col}' has duplicate values in the "
            "centroid sample; centroid fitting (and result identity) "
            "requires unique ids")
    centroids = fit_centroids(np.array(sample[vec_col].to_list()), nlist, seed=seed)
    from webvalid.rayutil import task_callable

    queries_ref = ray.put((np.asarray(query_ids), np.asarray(query_matrix)))
    centroids_ref = ray.put(centroids)
    partials = ds.select_columns([id_col, vec_col]).map_batches(
        task_callable(IVFScorer, queries_ref=queries_ref,
                      centroids_ref=centroids_ref, k=k, nprobe=nprobe,
                      id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
    )
    return _reduce_topk(partials, k)
