"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes:
- exact: content fingerprint (md5) per batch (vectorized C hashing) →
  `groupby(fingerprint)` keeps min-id per group. The shuffle ships only
  (fingerprint, id) pairs, never text.
- MinHash-LSH: shingle → minhash signature per batch → explode to one
  row per LSH band (band_id, band_hash, doc_id, signature) →
  `groupby(band_id, band_hash)` → candidate pairs with
  signature-estimated Jaccard → optional exact n-gram Jaccard verify
  against a broadcast text lookup (candidates are assumed rare).
- SimHash: 64-bit signature per doc; banded into 16-bit chunks for
  candidate generation; verify by Hamming distance.
- embedding cosine: per-batch matmul against a broadcast (ray.put)
  normalized matrix of comparison vectors — brute force baseline; see
  similarity.py for the bucketed scale path.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

import ray

_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def md5_hex(texts: list) -> list:
    return [None if t is None else hashlib.md5(t.encode()).hexdigest() for t in texts]


def add_fingerprint(batch: pa.Table, text_col: str = "text",
                    out_col: str = "text_md5") -> pa.Table:
    return batch.append_column(out_col, pa.array(md5_hex(batch[text_col].to_pylist()), pa.string()))


def exact_dedup_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of (text_md5, keeper id, count) — one row per distinct content."""
    from ray.data.aggregate import Count, Min

    with_fp = ds.map_batches(
        lambda t: add_fingerprint(t, text_col), batch_format="pyarrow"
    ).select_columns(["text_md5", id_col])
    return with_fp.groupby("text_md5").aggregate(
        Min(id_col, alias_name="keeper"), Count(alias_name="cnt")
    )


# ---------------------------------------------------------------------------
# MinHash-LSH
# ---------------------------------------------------------------------------

def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Stable 64-bit hashes of character k-shingles (vectorized siphash)."""
    from webvalid.sketches import hash64

    if text is None or len(text) < k:
        return np.empty(0, dtype=np.uint64)
    shingles = list({text[i: i + k] for i in range(len(text) - k + 1)})
    return hash64(np.array(shingles, dtype=object))


class MinHasher:
    """Actor-pool callable: text → minhash signature → LSH band rows.

    Permutation coefficients are derived from a fixed seed in
    `__init__` (once per actor). Output: one row per (doc, band).
    """

    def __init__(self, num_perm: int = 64, bands: int = 8, shingle_k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 1234):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        # odd multipliers → (a*h + b) mod 2^64 is a bijection of Z_2^64,
        # so taking the min is a valid minhash permutation.
        self.a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.shingle_k)
        if len(h) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * h[None, :] + self.b[:, None]  # wraps mod 2^64
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_band: list[int] = []
        out_hash: list[int] = []
        out_id: list = []
        out_sig: list[bytes] = []
        for i, t in zip(ids, texts):
            sig = self.signature(t)
            sig_bytes = sig.tobytes()
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band: (b + 1) * self.rows_per_band]
                bh = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "little"
                )
                out_band.append(b)
                out_hash.append(bh)
                out_id.append(i)
                out_sig.append(sig_bytes)
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.uint64()),
                "doc_id": pa.array(out_id),
                "signature": pa.array(out_sig, pa.binary()),
            }
        )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs within one LSH bucket, with estimated Jaccard."""
    ids = group["doc_id"].to_pylist()
    sigs = [np.frombuffer(s, dtype=np.uint64) for s in group["signature"].to_pylist()]
    a_out, b_out, est = [], [], []
    seen = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            lo, hi = sorted((ids[i], ids[j]))
            if (lo, hi) in seen or lo == hi:
                continue
            seen.add((lo, hi))
            a_out.append(lo)
            b_out.append(hi)
            est.append(float((sigs[i] == sigs[j]).mean()))
    return pa.table(
        {
            "doc_a": pa.array(a_out),
            "doc_b": pa.array(b_out),
            "est_jaccard": pa.array(est, pa.float64()),
        }
    )


def _pairs_from_band_rows(pdf, min_est_jaccard: float):
    """Vectorized bucket detection over collected band rows.

    Sorts (band_id, band_hash) with np.lexsort, finds runs of length>1
    (the LSH buckets with collisions — rare), and emits estimated-
    Jaccard pairs only for those. No per-bucket Python calls for the
    overwhelmingly common singleton buckets.
    """
    bid = pdf["band_id"].to_numpy()
    bhash = pdf["band_hash"].to_numpy()
    ids = pdf["doc_id"].to_numpy()
    sigs = pdf["signature"].to_numpy()
    order = np.lexsort((bhash, bid))
    bid, bhash, ids, sigs = bid[order], bhash[order], ids[order], sigs[order]
    boundary = np.flatnonzero((np.diff(bid) != 0) | (np.diff(bhash) != 0)) + 1
    bounds = np.concatenate([[0], boundary, [len(bid)]])
    seen: set = set()
    a_out, b_out, est = [], [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        bucket_ids = ids[s:e]
        bucket_sigs = [np.frombuffer(x, dtype=np.uint64) for x in sigs[s:e]]
        for i in range(len(bucket_ids)):
            for j in range(i + 1, len(bucket_ids)):
                lo, hi = sorted((bucket_ids[i], bucket_ids[j]))
                if lo == hi or (lo, hi) in seen:
                    continue
                seen.add((lo, hi))
                ej = float((bucket_sigs[i] == bucket_sigs[j]).mean())
                if ej >= min_est_jaccard:
                    a_out.append(lo)
                    b_out.append(hi)
                    est.append(ej)
    import pandas as pd

    return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "est_jaccard": est})


def minhash_lsh_candidates(ds, num_perm: int = 64, bands: int = 8, shingle_k: int = 5,
                           text_col: str = "text", id_col: str = "doc_id",
                           min_est_jaccard: float = 0.5, strategy: str = "driver"):
    """Dataset/DataFrame of candidate near-dup pairs (doc_a < doc_b).

    `strategy="driver"` (default): band rows (~(8+num_perm*8) bytes per
    doc per band) are collected and buckets detected vectorized — right
    up to ~10^7 docs per run. `strategy="shuffle"`: the fully
    distributed `groupby(band_id, band_hash)` path for corpus sizes
    beyond driver memory.
    """
    import pyarrow.compute as pc

    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perm": num_perm, "bands": bands, "shingle_k": shingle_k,
            "text_col": text_col, "id_col": id_col,
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    if strategy == "driver":
        import ray.data

        pairs = _pairs_from_band_rows(band_rows.to_pandas(), min_est_jaccard)
        return ray.data.from_pandas(
            pairs.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
    pairs = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    uniq = pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )
    return uniq.map_batches(
        lambda t: t.filter(pc.greater_equal(t["est_jaccard"], min_est_jaccard)),
        batch_format="pyarrow",
    )


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard similarity."""
    if a is None or b is None:
        return 0.0
    sa = {a[i: i + k] for i in range(max(0, len(a) - k + 1))}
    sb = {b[i: i + k] for i in range(max(0, len(b) - k + 1))}
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


class JaccardVerifier:
    """Verify candidate pairs with exact n-gram Jaccard.

    Texts for the (rare) candidate ids are broadcast via ray.put —
    resolve once per actor.
    """

    def __init__(self, texts_ref, k: int = 5):
        self.texts: dict = ray.get(texts_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sims = [
            ngram_jaccard(self.texts.get(a), self.texts.get(b), self.k)
            for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist())
        ]
        return batch.append_column("jaccard", pa.array(sims, pa.float64()))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over token hashes; emits 16-bit chunk rows for
    candidate generation (near-dups agree on >=1 chunk when Hamming <= 3
    per chunk-pigeonhole)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", chunks: int = 4):
        self.text_col = text_col
        self.id_col = id_col
        self.chunks = chunks
        self.bits_per_chunk = 64 // chunks

    @staticmethod
    def simhash64(text: str) -> int:
        from webvalid.sketches import hash64

        if not text:
            return 0
        tokens = _TOKEN_RE.findall(text.lower())
        if not tokens:
            return 0
        h = hash64(np.array(tokens, dtype=object))
        bits = (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        hashes = [self.simhash64(t) for t in batch[self.text_col].to_pylist()]
        out_id, out_chunk, out_val, out_hash = [], [], [], []
        mask = (1 << self.bits_per_chunk) - 1
        for i, h in zip(ids, hashes):
            for c in range(self.chunks):
                out_id.append(i)
                out_chunk.append(c)
                out_val.append((h >> (c * self.bits_per_chunk)) & mask)
                out_hash.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_id),
                "chunk_id": pa.array(out_chunk, pa.int32()),
                "chunk_val": pa.array(out_val, pa.uint64()),
                "simhash": pa.array(out_hash, pa.uint64()),
            }
        )


def _simhash_pairs(max_hamming: int):
    def fn(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_pylist()
        hashes = group["simhash"].to_pylist()
        a_out, b_out, ham = [], [], []
        seen = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                lo, hi = sorted((ids[i], ids[j]))
                if lo == hi or (lo, hi) in seen:
                    continue
                seen.add((lo, hi))
                d = bin(hashes[i] ^ hashes[j]).count("1")
                if d <= max_hamming:
                    a_out.append(lo)
                    b_out.append(hi)
                    ham.append(d)
        return pa.table(
            {
                "doc_a": pa.array(a_out),
                "doc_b": pa.array(b_out),
                "hamming": pa.array(ham, pa.int32()),
            }
        )

    return fn


def simhash_near_dups(ds, text_col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3, strategy: str = "driver"):
    """Near-dup pairs by SimHash banding + Hamming verify.

    Like minhash_lsh_candidates, the default path collects the (tiny)
    chunk rows and detects collision buckets vectorized;
    `strategy="shuffle"` keeps the distributed groupby for huge corpora.
    """
    chunk_rows = ds.select_columns([id_col, text_col]).map_batches(
        SimHasher,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    if strategy == "driver":
        import pandas as pd
        import ray.data

        pdf = chunk_rows.to_pandas()
        cid = pdf["chunk_id"].to_numpy()
        cval = pdf["chunk_val"].to_numpy()
        ids = pdf["doc_id"].to_numpy()
        hashes = pdf["simhash"].to_numpy()
        order = np.lexsort((cval, cid))
        cid, cval, ids, hashes = cid[order], cval[order], ids[order], hashes[order]
        boundary = np.flatnonzero((np.diff(cid) != 0) | (np.diff(cval) != 0)) + 1
        bounds = np.concatenate([[0], boundary, [len(cid)]])
        seen: set = set()
        a_out, b_out, ham = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            for i in range(s, e):
                for j in range(i + 1, e):
                    lo, hi = sorted((ids[i], ids[j]))
                    if lo == hi or (lo, hi) in seen:
                        continue
                    seen.add((lo, hi))
                    d = bin(int(hashes[i]) ^ int(hashes[j])).count("1")
                    if d <= max_hamming:
                        a_out.append(lo)
                        b_out.append(hi)
                        ham.append(d)
        out = pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "hamming": ham})
        return ray.data.from_pandas(
            out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
    pairs = chunk_rows.groupby(["chunk_id", "chunk_val"]).map_groups(
        _simhash_pairs(max_hamming), batch_format="pyarrow"
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (brute-force baseline)
# ---------------------------------------------------------------------------

class CosinePairFinder:
    """Per-batch matmul against the broadcast full (normalized) matrix;
    emits pairs above threshold with id_a < id_b. Brute-force baseline —
    O(n * N) work per run; the IVF path in similarity.py is the scale
    route."""

    def __init__(self, matrix_ref, threshold: float, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        ids, mat = ray.get(matrix_ref)
        self.all_ids = np.asarray(ids)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.matrix = (mat / norms).astype(np.float64)
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist())
        vecs = np.array(batch[self.vec_col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vecs = vecs / norms
        sims = vecs @ self.matrix.T
        rows, cols = np.nonzero(sims >= self.threshold)
        a, b, s = [], [], []
        for r, c in zip(rows, cols):
            ia, ib = int(ids[r]), int(self.all_ids[c])
            if ia < ib:
                a.append(ia)
                b.append(ib)
                s.append(float(sims[r, c]))
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "cosine": pa.array(s, pa.float64()),
            }
        )


def embedding_near_dups(ds, threshold: float = 0.95, id_col: str = "vec_id",
                        vec_col: str = "embedding"):
    """Pairs of near-duplicate embeddings by cosine (brute force)."""
    tbl = ds.select_columns([id_col, vec_col]).to_pandas()
    matrix_ref = ray.put(
        (tbl[id_col].to_numpy(), np.array(tbl[vec_col].to_list(), dtype=np.float64))
    )
    return ds.select_columns([id_col, vec_col]).map_batches(
        CosinePairFinder,
        fn_constructor_kwargs={
            "matrix_ref": matrix_ref, "threshold": threshold,
            "id_col": id_col, "vec_col": vec_col,
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
