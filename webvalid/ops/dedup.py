"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (all designed for the 10^12-row target, tested at sf):
- exact: content fingerprint (md5) per batch (vectorized C hashing) →
  `groupby(fingerprint)` keeps min-id per group. The shuffle ships only
  (fingerprint, id) pairs, never text.
- MinHash-LSH: batch-vectorized shingle hashing + signature kernel →
  one row per LSH band carrying ONLY (band_hash, doc_id) — 16 bytes,
  never the signature blob. Collision buckets are detected either by a
  driver-side lexsort (small corpora) or a distributed
  `groupby(band_hash)` (the scale path) — `strategy="auto"` picks by
  corpus size. Candidate pairs are rare by construction; their
  signatures are recomputed in a second targeted pass (membership
  filter on a broadcast sorted id array) to attach est_jaccard.
- SimHash: 64-bit signature per doc, batch-vectorized; banded into
  16-bit chunks for candidate generation (24 B/chunk row incl. the
  signature, so Hamming verifies in the bucket stage — no second
  pass). Same auto driver/shuffle selection.
- embedding cosine near-dup: exact all-pairs via BLOCK-PAIR tasks —
  normalized blocks stay in the object store (`to_arrow_refs`), one
  Ray task per block pair computes the partial similarity matrix and
  emits only above-threshold pairs. No full-matrix broadcast, no
  driver materialization of the corpus. `method="ivf"` is the
  approximate bucketed path for when exact O(N²) FLOPs are
  unaffordable.

Empty/too-short documents never emit band/chunk rows (a single shared
sentinel signature would otherwise put every empty doc in one LSH
bucket and explode candidate pairs quadratically); they are simply
never near-dup candidates.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

_U64 = np.uint64
_POLY = _U64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 arrays."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
        return x ^ (x >> _U64(31))


def md5_hex(texts: list) -> list:
    return [None if t is None else hashlib.md5(t.encode()).hexdigest() for t in texts]


def md5_hex_from_column(col) -> list:
    """md5 hex per row straight off the Arrow string buffers
    (memoryview slices — no Python string is ever materialized;
    identical to md5(row.encode()) since Arrow strings ARE UTF-8).
    Same trick as `checks/text_parity._md5_digest8_per_row`, full
    digest instead of an 8-byte prefix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return []
    import numpy as _np

    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    dt = _np.int64 if pa.types.is_large_string(col.type) else _np.int32
    bufs = col.buffers()
    offs = _np.frombuffer(bufs[1], dtype=dt, count=n + 1,
                          offset=col.offset * dt().itemsize).tolist()
    mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    _md5 = hashlib.md5
    return [_md5(mv[offs[i]:offs[i + 1]]).hexdigest() if valid[i] else None
            for i in range(n)]


def add_fingerprint(batch: pa.Table, text_col: str = "text",
                    out_col: str = "text_md5") -> pa.Table:
    return batch.append_column(
        out_col, pa.array(md5_hex_from_column(batch[text_col]), pa.string()))


def exact_dedup_groups(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of (text_md5, keeper id, count) — one row per distinct content.

    Null-text rows form NO group (unknown content is not equal
    content — and Ray's sort-based groupby cannot order a null key);
    every null doc is implicitly its own keeper. Deviation from SQL
    ``GROUP BY md5(text)``, which pools all NULLs into one group.
    """
    from ray.data.aggregate import Count, Min

    def fp(t: pa.Table) -> pa.Table:
        out = add_fingerprint(t, text_col)
        return out.filter(pc.is_valid(out["text_md5"]))

    with_fp = ds.map_batches(fp, batch_format="pyarrow") \
        .select_columns(["text_md5", id_col])
    return with_fp.groupby("text_md5").aggregate(
        Min(id_col, alias_name="keeper"), Count(alias_name="cnt")
    )


# ---------------------------------------------------------------------------
# MinHash-LSH
# ---------------------------------------------------------------------------

_SENTINEL = np.uint32(0xFFFFFFFF)  # not a valid Unicode codepoint


def _batch_shingle_hashes(texts: list, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized char-k-gram hashing for a whole batch of texts.

    Encodes every text to a uint32 codepoint array, concatenates them
    with a sentinel separator, rolls ONE polynomial hash over the whole
    buffer (k vectorized passes), masks windows that cross a document
    boundary, and finalizes with splitmix64. Returns
    (windows_per_doc counts, valid window hashes in doc order).
    Duplicated shingles are NOT deduplicated — min over a multiset
    equals min over its set, so minhash signatures are unaffected.
    """
    n = len(texts)
    pieces: list[np.ndarray] = []
    lens = np.zeros(n, dtype=np.int64)
    sep = np.array([_SENTINEL], dtype=np.uint32)
    for i, t in enumerate(texts):
        cp = np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32)
        lens[i] = len(cp)
        pieces.append(cp)
        pieces.append(sep)
    arr = np.concatenate(pieces) if pieces else np.empty(0, np.uint32)
    total = len(arr)
    if total < k:
        return np.zeros(n, dtype=np.int64), np.empty(0, dtype=np.uint64)
    n_win = total - k + 1
    h = np.zeros(n_win, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = h * _POLY + arr[j: j + n_win].astype(np.uint64)
    h = _mix64(h)
    # doc i starts at offset_i = sum(lens[:i]) + i (one sentinel each)
    starts = np.concatenate([[0], np.cumsum(lens + 1)[:-1]])
    counts = np.maximum(lens - k + 1, 0)
    valid_total = int(counts.sum())
    if valid_total == 0:
        return counts, np.empty(0, dtype=np.uint64)
    # ragged-range trick: window start indices for every doc, in order
    rep_starts = np.repeat(starts, counts)
    excl = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(valid_total, dtype=np.int64) - np.repeat(excl, counts)
    return counts, h[rep_starts + local]


class MinHasher:
    """map_batches callable: text batch → LSH band rows (band_hash, doc_id).

    The minhash signature kernel is fully vectorized: one rolling-hash
    pass over the batch's concatenated codepoints, then `num_perm`
    (multiply-add + minimum.reduceat) passes. Band hashes mix the band
    index into a single uint64 key so downstream bucketing groups by
    ONE column. Signatures are NOT carried on band rows (they would be
    8*num_perm bytes per row at 10^12-doc scale); see
    `minhash_signatures` for the targeted second pass.
    """

    def __init__(self, num_perm: int = 64, bands: int = 8, shingle_k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 1234,
                 emit_signatures: bool = False):
        assert num_perm % bands == 0
        # emit_signatures=True additionally emits ONE signature row per
        # doc (band_hash null) so the small-corpus driver path gets
        # est-Jaccard without a second corpus scan; the scale (shuffle)
        # path keeps this off and fetches signatures in a targeted
        # second pass instead.
        self.emit_signatures = emit_signatures
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

    def signatures(self, texts: list) -> tuple[np.ndarray, np.ndarray]:
        """(keep_mask, signature matrix) for a list of texts.

        Docs with no k-shingle (None / shorter than k) are dropped from
        the output (keep_mask False) — they never become candidates.
        """
        counts, h = _batch_shingle_hashes(texts, self.shingle_k)
        keep = counts > 0
        kept = int(keep.sum())
        sig = np.empty((kept, self.num_perm), dtype=np.uint64)
        if kept == 0:
            return keep, sig
        offs = np.concatenate([[0], np.cumsum(counts[keep])[:-1]]).astype(np.int64)
        with np.errstate(over="ignore"):
            for p in range(self.num_perm):
                vals = self.a[p] * h + self.b[p]
                sig[:, p] = np.minimum.reduceat(vals, offs)
        return keep, sig

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """(n, num_perm) signatures → (n, bands) uint64 bucket keys."""
        n = sig.shape[0]
        v = sig.reshape(n, self.bands, self.rows_per_band)
        acc = np.zeros((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(self.rows_per_band):
                acc = _mix64(acc * _POLY + v[:, :, j])
            # mix the band index in so ONE uint64 is the full bucket key
            acc = _mix64(acc ^ (np.arange(self.bands, dtype=np.uint64)[None, :] * _POLY))
        return acc

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        keep, sig = self.signatures(batch[self.text_col].to_pylist())
        kept_ids = ids[keep]
        bh = self.band_hashes(sig)
        band_hash = pa.array(bh.reshape(-1), pa.uint64())
        doc_id = pa.array(np.repeat(kept_ids, self.bands), pa.int64())
        if not self.emit_signatures:
            return pa.table({"band_hash": band_hash, "doc_id": doc_id})
        n = len(kept_ids)
        return pa.table(
            {
                "band_hash": pa.concat_arrays([band_hash, pa.nulls(n, pa.uint64())]),
                "doc_id": pa.concat_arrays([doc_id, pa.array(kept_ids, pa.int64())]),
                "signature": pa.concat_arrays(
                    [pa.nulls(len(band_hash), pa.binary()),
                     pa.array([s.tobytes() for s in sig], pa.binary())]
                ),
            }
        )


class MinHashSignatures(MinHasher):
    """Second-pass callable: (doc_id, signature bytes) for candidate ids only.

    `ids_ref` broadcasts a SORTED int64 numpy array of candidate doc
    ids (ray.put, zero-copy); each batch keeps only matching rows via
    searchsorted before computing signatures — the corpus is re-scanned
    but only candidate texts are hashed.
    """

    def __init__(self, *args, ids_ref=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.wanted = ray.get(ids_ref) if ids_ref is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        texts = batch[self.text_col].to_pylist()
        if self.wanted is not None and len(ids):
            if len(self.wanted) == 0:
                ids, texts = ids[:0], []
            else:
                pos = np.clip(np.searchsorted(self.wanted, ids), 0,
                              len(self.wanted) - 1)
                m = self.wanted[pos] == ids
                ids = ids[m]
                texts = [t for t, keep in zip(texts, m) if keep]
        keep, sig = self.signatures(texts)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "signature": pa.array([s.tobytes() for s in sig], pa.binary()),
            }
        )


def _pairs_in_sorted_runs(keys: np.ndarray, ids: np.ndarray,
                          payload: np.ndarray | None = None,
                          star_cap: int = 256):
    """Emit unordered id pairs within equal-key runs of a SORTED key array.

    Runs of length 1 (the overwhelming majority) cost nothing; Python
    touches only collision buckets. Returns (a, b[, payload_a,
    payload_b]) lists with a < b, deduplicated.

    Runs longer than `star_cap` emit a STAR (run-min id paired with
    every other member) instead of all-pairs: a duplicate-heavy corpus
    — the very thing dedup targets — can put 20k copies in one bucket,
    and O(run²) enumeration would mean ~2·10⁸ pairs from a single
    bucket. The star preserves component connectivity for clustering
    and gives every member a verify partner; only the redundant
    transitive pairs are dropped.
    """
    if len(keys) == 0:
        return [], [], [], []
    boundary = np.flatnonzero(np.diff(keys) != 0) + 1
    bounds = np.concatenate([[0], boundary, [len(keys)]])
    seen: set = set()
    a_out, b_out, pa_out, pb_out = [], [], [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        if e - s > star_cap:
            mi = s + int(np.argmin(ids[s:e]))
            m = ids[mi]
            for j in range(s, e):
                if ids[j] == m:
                    continue
                lo, hi = (m, ids[j]) if m < ids[j] else (ids[j], m)
                if (lo, hi) in seen:
                    continue
                seen.add((lo, hi))
                a_out.append(lo)
                b_out.append(hi)
                if payload is not None:
                    pl, ph = ((payload[mi], payload[j]) if m < ids[j]
                              else (payload[j], payload[mi]))
                    pa_out.append(pl)
                    pb_out.append(ph)
            continue
        for i in range(s, e):
            for j in range(i + 1, e):
                ia, ib = ids[i], ids[j]
                if ia == ib:
                    continue
                lo, hi = (ia, ib) if ia < ib else (ib, ia)
                if (lo, hi) in seen:
                    continue
                seen.add((lo, hi))
                a_out.append(lo)
                b_out.append(hi)
                if payload is not None:
                    pl, ph = (payload[i], payload[j]) if ia < ib else (payload[j], payload[i])
                    pa_out.append(pl)
                    pb_out.append(ph)
    return a_out, b_out, pa_out, pb_out


def _sorted_run_pairs(rows_ds, key_col: str, id_col: str,
                      payload_col: str | None = None,
                      star_cap: int = 256) -> "pd.DataFrame":
    """Pair rows from equal-key groups via ONE range sort + vectorized
    per-block run-pair emission + a bounded driver edge stitch — the
    shuffle shape shared by the MinHash/SimHash/containment scale
    paths instead of `groupby(key).map_groups` (which pays a Python
    call per bucket; buckets number in the millions).

    Edge handling: runs touching a block boundary defer to the driver,
    but each block forwards AT MOST star_cap+1 rows per edge run — a
    larger fragment emits its star pairs locally (fragment-min paired
    with every member, preserving component connectivity exactly as
    star-capping promises) and forwards only its min row, so driver
    state is O(#blocks · star_cap) even for a giant bucket spanning
    many blocks. Ordering/edge detection uses the key column's NATIVE
    dtype so it agrees with Ray's range sort (a signed view of uint64
    keys would misplace the block straddling 2^63 and silently drop
    cross-block pairs); keys ride to the driver as int64 bit-views,
    which preserves equality (all the stitch needs). Self-pairs from
    duplicated (key, id) rows are filtered. Pairs may repeat across
    keys; callers dedupe when they need distinct pairs. Returns a
    pandas DataFrame (doc_a, doc_b[, payload_a, payload_b])."""
    import pandas as pd

    def block_pairs(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False)  # NATIVE dtype
        i = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pl = (t[payload_col].to_numpy(zero_copy_only=False).view(np.int64)
              if payload_col else np.zeros(len(k), np.int64))
        order = np.lexsort((i, k))
        k, i, pl = k[order], i[order], pl[order]
        n = len(k)
        empty = {"kind": np.empty(0, np.int8), "a": np.empty(0, np.int64),
                 "b": np.empty(0, np.int64), "pa": np.empty(0, np.int64),
                 "pb": np.empty(0, np.int64), "k": np.empty(0, np.int64)}
        if n == 0:
            return pa.table({c: pa.array(v) for c, v in empty.items()})
        edge = (k == k[0]) | (k == k[-1])
        kin = k[~edge]
        ia, ib = _run_pair_positions(kin, star_cap)
        iin, plin = i[~edge], pl[~edge]
        pair_a = [iin[ia]]
        pair_b = [iin[ib]]
        ppa = [plin[ia]]
        ppb = [plin[ib]]
        # edge runs: forward ≤ star_cap+1 rows each; larger fragments
        # star locally and forward only their min row
        fwd_idx_parts = []
        edge_runs = [np.flatnonzero(k == k[0])]
        if k[0] != k[-1]:
            edge_runs.append(np.flatnonzero(k == k[-1]))
        for run in edge_runs:
            if len(run) > star_cap:
                m = run[0]  # fragment min (sorted by id within run)
                others = run[1:]
                pair_a.append(np.full(len(others), i[m], np.int64))
                pair_b.append(i[others])
                ppa.append(np.full(len(others), pl[m], np.int64))
                ppb.append(pl[others])
                fwd_idx_parts.append(run[:1])
            else:
                fwd_idx_parts.append(run)
        fwd = (np.concatenate(fwd_idx_parts) if fwd_idx_parts
               else np.empty(0, np.int64))
        pa_all = np.concatenate(pair_a)
        pb_all = np.concatenate(pair_b)
        n_pairs = len(pa_all)
        cols = {
            "kind": np.concatenate([np.zeros(n_pairs, np.int8),
                                    np.ones(len(fwd), np.int8)]),
            "a": np.concatenate([pa_all, i[fwd]]),
            "b": np.concatenate([pb_all, np.zeros(len(fwd), np.int64)]),
            "pa": np.concatenate([np.concatenate(ppa), pl[fwd]]),
            "pb": np.concatenate([np.concatenate(ppb),
                                  np.zeros(len(fwd), np.int64)]),
            "k": np.concatenate([np.zeros(n_pairs, np.int64),
                                 k[fwd].view(np.int64)
                                 if k.dtype != object else
                                 np.asarray(k[fwd], np.int64)]),
        }
        return pa.table({c: pa.array(v) for c, v in cols.items()})

    mixed = rows_ds.sort(key_col).map_batches(
        block_pairs, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    inner = mixed[mixed["kind"] == 0]
    edges = mixed[mixed["kind"] == 1]
    ek = edges["k"].to_numpy()
    ei = edges["a"].to_numpy()
    ep = edges["pa"].to_numpy()
    order = np.lexsort((ei, ek))  # equality grouping — order may differ
    ek, ei, ep = ek[order], ei[order], ep[order]
    ia, ib = _run_pair_positions(ek, star_cap)
    out = pd.DataFrame({
        "doc_a": np.concatenate([inner["a"].to_numpy(), ei[ia]]),
        "doc_b": np.concatenate([inner["b"].to_numpy(), ei[ib]]),
    })
    if payload_col:
        out["payload_a"] = np.concatenate([inner["pa"].to_numpy(), ep[ia]])
        out["payload_b"] = np.concatenate([inner["pb"].to_numpy(), ep[ib]])
    # duplicated (key, id) input rows would otherwise emit self-pairs
    # (the replaced paths filtered them — see _pairs_in_sorted_runs)
    return out[out["doc_a"] != out["doc_b"]].reset_index(drop=True)

def _resolve_strategy(strategy: str, ds, driver_max_docs: int) -> str:
    if strategy != "auto":
        return strategy
    try:
        n = ds.count()
    except Exception:
        return "shuffle"
    return "driver" if n <= driver_max_docs else "shuffle"


def _empty_pairs_pdf():
    import pandas as pd

    return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                         "doc_b": pd.Series([], dtype="int64"),
                         "est_jaccard": pd.Series([], dtype="float64")})


def _est_filter(pairs_pdf, sig_map: dict, min_est_jaccard: float):
    """est_jaccard per candidate pair from a {doc_id: signature} map."""
    import pandas as pd

    a = pairs_pdf["doc_a"].to_numpy()
    b = pairs_pdf["doc_b"].to_numpy()
    est = np.array([
        float((sig_map[int(x)] == sig_map[int(y)]).mean())
        if int(x) in sig_map and int(y) in sig_map else 0.0
        for x, y in zip(a, b)
    ])
    out = pd.DataFrame({"doc_a": a, "doc_b": b, "est_jaccard": est})
    out = out[out["est_jaccard"] >= min_est_jaccard]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _attach_est_jaccard(ds, pairs_pdf, hasher_kwargs: dict,
                        min_est_jaccard: float,
                        text_col: str, id_col: str):
    """Second pass: signatures for candidate ids only → est_jaccard filter."""
    from webvalid.rayutil import task_callable

    if len(pairs_pdf) == 0:
        return _empty_pairs_pdf()
    need = np.unique(
        np.concatenate([pairs_pdf["doc_a"].to_numpy(), pairs_pdf["doc_b"].to_numpy()])
    ).astype(np.int64)
    ids_ref = ray.put(need)
    sig_rows = ds.select_columns([id_col, text_col]).map_batches(
        task_callable(MinHashSignatures, **hasher_kwargs, ids_ref=ids_ref),
        batch_format="pyarrow",
    ).to_pandas()  # candidates are rare — this table is tiny
    sig_map = {
        int(i): np.frombuffer(s, dtype=np.uint64)
        for i, s in zip(sig_rows["doc_id"], sig_rows["signature"])
    }
    return _est_filter(pairs_pdf, sig_map, min_est_jaccard)


def minhash_lsh_candidates(ds, num_perm: int = 64, bands: int = 8, shingle_k: int = 5,
                           text_col: str = "text", id_col: str = "doc_id",
                           min_est_jaccard: float = 0.5, strategy: str = "auto",
                           driver_max_docs: int = 1_000_000):
    """Dataset of candidate near-dup pairs (doc_a < doc_b, est_jaccard).

    Bucket collisions are found by `strategy`:
    - "driver": one job emits band rows (16 B each) plus one signature
      row (8·num_perm B) per doc; collect + lexsort — cheapest below
      `driver_max_docs` (default 1M docs ≈ 0.7 GB);
    - "shuffle": band rows carry ONLY (band_hash: u64, doc_id);
      distributed `groupby(band_hash)` finds buckets and signatures for
      the (rare) candidate ids are recomputed in a targeted second
      scan — the 100-TB path, nothing corpus-sized ever reaches the
      driver;
    - "auto" (default): pick by `ds.count()` (parquet metadata — cheap).
    Results are strategy-independent (same hashes both ways).
    """
    from webvalid.rayutil import task_callable

    hasher_kwargs = {
        "num_perm": num_perm, "bands": bands, "shingle_k": shingle_k,
        "text_col": text_col, "id_col": id_col,
    }
    strategy = _resolve_strategy(strategy, ds, driver_max_docs)
    import pandas as pd
    import ray.data

    if strategy == "driver":
        # one job: band rows + per-doc signature rows together, so the
        # est-Jaccard filter needs no second corpus scan. Driver bytes ≈
        # (16·bands + 8·num_perm) per doc, bounded by driver_max_docs.
        # collect in ARROW, not pandas: the nullable uint64 band_hash
        # column becomes float64 in pandas and the uint64 round-trip
        # truncates hashes to 53-bit precision — two distinct band
        # hashes could then collide into one spurious LSH bucket
        bh_parts, bid_parts, sig_map = [], [], {}
        job = ds.select_columns([id_col, text_col]).map_batches(
            task_callable(MinHasher, **hasher_kwargs, emit_signatures=True),
            batch_format="pyarrow",
        )
        for t in job.iter_batches(batch_format="pyarrow", batch_size=65536):
            sig_mask = pc.is_valid(t["signature"])
            band_t = t.filter(pc.invert(sig_mask))
            bh_parts.append(band_t["band_hash"].to_numpy(zero_copy_only=False))
            bid_parts.append(band_t["doc_id"].to_numpy(zero_copy_only=False))
            sig_t = t.filter(sig_mask)
            for i, s in zip(sig_t["doc_id"].to_pylist(),
                            sig_t["signature"].to_pylist()):
                sig_map[int(i)] = np.frombuffer(s, dtype=np.uint64)
        bh = (np.concatenate(bh_parts).astype(np.uint64, copy=False)
              if bh_parts else np.empty(0, np.uint64))
        ids = (np.concatenate(bid_parts)
               if bid_parts else np.empty(0, np.int64))
        order = np.argsort(bh, kind="stable")
        a, b, _, _ = _pairs_in_sorted_runs(bh[order], ids[order])
        if not a:
            return ray.data.from_pandas(_empty_pairs_pdf())
        pairs_pdf = pd.DataFrame({"doc_a": a, "doc_b": b})
        out = _est_filter(pairs_pdf, sig_map, min_est_jaccard)
        return ray.data.from_pandas(out)

    band_rows = ds.select_columns([id_col, text_col]).map_batches(
        task_callable(MinHasher, **hasher_kwargs),
        batch_format="pyarrow",
    )
    # candidate pairs are rare (bounded by real near-dups + LSH false
    # positives) — sort-based run pairs (no per-bucket Python), then
    # dedupe the answer-sized pair list driver-side
    pairs_pdf = _sorted_run_pairs(band_rows, "band_hash", "doc_id") \
        .drop_duplicates(["doc_a", "doc_b"])
    out = _attach_est_jaccard(ds, pairs_pdf, hasher_kwargs, min_est_jaccard,
                              text_col, id_col)
    return ray.data.from_pandas(out)


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
        self._sets: dict = {}  # doc_id → frozen gram set, built once

    def _gram_set(self, i):
        s = self._sets.get(i)
        if s is None:
            t = self.texts.get(i)
            k = self.k
            s = {t[j: j + k] for j in range(max(0, len(t) - k + 1))} \
                if t is not None else None
            self._sets[i] = s
        return s

    def _jaccard(self, a, b) -> float:
        sa, sb = self._gram_set(a), self._gram_set(b)
        if sa is None or sb is None:   # missing text → 0.0 (ngram_jaccard)
            return 0.0
        if not sa and not sb:
            return 1.0
        if not sa or not sb:
            return 0.0
        return len(sa & sb) / len(sa | sb)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sims = [
            self._jaccard(a, b)
            for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist())
        ]
        return batch.append_column("jaccard", pa.array(sims, pa.float64()))


def fetch_texts_for_ids(ds, ids, text_col: str = "text", id_col: str = "doc_id") -> dict:
    """Distributed targeted fetch: {id: text} for a small id set.

    Broadcasts the sorted id array and filters inside map_batches —
    only the matching rows ever leave the workers (never the corpus).
    """
    need = np.unique(np.asarray(list(ids), dtype=np.int64))
    if len(need) == 0:
        return {}
    ids_ref = ray.put(need)

    class Fetch:
        def __init__(self, ref):
            self.wanted = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids_np = np.asarray(t[id_col].to_pylist())
            if len(ids_np) == 0:
                return t.select([id_col, text_col])
            pos = np.clip(np.searchsorted(self.wanted, ids_np), 0, len(self.wanted) - 1)
            m = self.wanted[pos] == ids_np
            return t.filter(pa.array(m)).select([id_col, text_col])

    from webvalid.rayutil import task_callable

    rows = ds.select_columns([id_col, text_col]).map_batches(
        task_callable(Fetch, ref=ids_ref), batch_format="pyarrow",
    ).to_pandas()
    return dict(zip(rows[id_col].astype(int), rows[text_col]))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over token hashes, batch-vectorized; emits 16-bit
    chunk rows for candidate generation (near-dups agree on >=1 chunk
    when Hamming <= chunks-1 by pigeonhole). Docs with no tokens emit
    nothing (they can never be near-dup candidates)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", chunks: int = 4):
        self.text_col = text_col
        self.id_col = id_col
        self.chunks = chunks
        self.bits_per_chunk = 64 // chunks

    def simhashes(self, texts: list) -> tuple[np.ndarray, np.ndarray]:
        """(keep_mask, simhash array) — one vectorized pass per batch."""
        from webvalid.sketches import hash64

        n = len(texts)
        all_tokens: list[str] = []
        counts = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            toks = _TOKEN_RE.findall(t.lower()) if t else []
            counts[i] = len(toks)
            all_tokens.extend(toks)
        keep = counts > 0
        kept = int(keep.sum())
        if kept == 0:
            return keep, np.empty(0, dtype=np.uint64)
        h = hash64(np.array(all_tokens, dtype=object))
        # unpackbits beats a 64-wide shift matrix by ~2×; float32 sums
        # are exact (< 2^24 tokens per doc) and dodge uint8 overflow
        bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1,
                             bitorder="little").astype(np.float32)
        offs = np.concatenate([[0], np.cumsum(counts[keep])[:-1]]).astype(np.int64)
        ones = np.add.reduceat(bits, offs, axis=0)  # (kept, 64) popcounts
        # sign(2*ones - n_tokens) > 0  ⇔  majority bit set
        majority = (2.0 * ones) > counts[keep][:, None]
        out = (majority.astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return keep, out

    @staticmethod
    def simhash64(text: str) -> int:
        """Single-doc convenience wrapper (tests / notebooks)."""
        keep, h = SimHasher().simhashes([text])
        return int(h[0]) if keep[0] else 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        keep, hashes = self.simhashes(batch[self.text_col].to_pylist())
        kept_ids = ids[keep]
        n = len(kept_ids)
        mask = _U64((1 << self.bits_per_chunk) - 1)
        shifts = (np.arange(self.chunks, dtype=np.uint64) * _U64(self.bits_per_chunk))
        vals = (hashes[:, None] >> shifts[None, :]) & mask  # (n, chunks)
        # mix chunk index into the value so ONE uint64 is the bucket key
        keyed = _mix64(vals ^ (np.arange(self.chunks, dtype=np.uint64)[None, :] * _POLY))
        return pa.table(
            {
                "chunk_key": pa.array(keyed.reshape(-1), pa.uint64()),
                "doc_id": pa.array(np.repeat(kept_ids, self.chunks), pa.int64()),
                "simhash": pa.array(np.repeat(hashes, self.chunks), pa.uint64()),
            }
        )


def _hamming64(a, b) -> int:
    return bin(int(a) ^ int(b)).count("1")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (no np.bitwise_count on
    this numpy)."""
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    bits = np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
    return bits.reshape(len(x), 64).sum(axis=1).astype(np.int64)


def _simhash_pairs_vectorized(keys_sorted: np.ndarray, ids: np.ndarray,
                              hashes: np.ndarray, max_hamming: int):
    """All unique near-dup pairs from equal-key runs, fully vectorized.

    SimHash chunk buckets can be LARGE on template-heavy corpora
    (similar token distributions collapse to near-identical
    signatures), so pair enumeration must not be a Python double loop:
    per run we take triu indices, then dedupe / xor-popcount / filter
    as array ops over the whole candidate set at once.
    """
    import pandas as pd

    STAR_CAP = 2048  # vectorized, so a higher cap than the minhash path
    boundary = np.flatnonzero(np.diff(keys_sorted) != 0) + 1
    bounds = np.concatenate([[0], boundary, [len(keys_sorted)]])
    i_parts, j_parts = [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        m = e - s
        if m < 2:
            continue
        if m > STAR_CAP:
            # duplicate-heavy bucket: O(m²) triu would allocate ~m²/2
            # index pairs from ONE bucket; a star against the run-min
            # id keeps connectivity and one verify partner per member
            mi = s + int(np.argmin(ids[s:e]))
            others = np.arange(s, e)
            others = others[others != mi]
            i_parts.append(np.full(len(others), mi, dtype=np.int64))
            j_parts.append(others)
            continue
        ti, tj = np.triu_indices(m, k=1)
        i_parts.append(ti + s)
        j_parts.append(tj + s)
    if not i_parts:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    I = np.concatenate(i_parts)
    J = np.concatenate(j_parts)
    ia, ib = ids[I].astype(np.int64), ids[J].astype(np.int64)
    lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
    keep = lo != hi
    lo, hi, I, J = lo[keep], hi[keep], I[keep], J[keep]
    # dedupe pairs seen in multiple chunks before the (pricier) popcount
    _, first = np.unique(np.stack([lo, hi], axis=1), axis=0, return_index=True)
    lo, hi, I, J = lo[first], hi[first], I[first], J[first]
    ham = _popcount64(hashes[I] ^ hashes[J])
    m = ham <= max_hamming
    out = pd.DataFrame({"doc_a": lo[m], "doc_b": hi[m], "hamming": ham[m]})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def simhash_near_dups(ds, text_col: str = "text", id_col: str = "doc_id",
                      max_hamming: int = 3, strategy: str = "auto",
                      driver_max_docs: int = 2_000_000):
    """Near-dup pairs by SimHash banding + Hamming verify.

    Chunk rows are 24 B (chunk_key, doc_id, simhash) so the Hamming
    verify happens in the bucket stage — no second corpus pass. Same
    auto driver/shuffle selection as minhash_lsh_candidates.
    """
    import pandas as pd
    import ray.data

    from webvalid.rayutil import task_callable

    strategy = _resolve_strategy(strategy, ds, driver_max_docs)
    chunk_rows = ds.select_columns([id_col, text_col]).map_batches(
        task_callable(SimHasher, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )
    if strategy == "driver":
        pdf = chunk_rows.to_pandas()
        key = pdf["chunk_key"].to_numpy()
        ids = pdf["doc_id"].to_numpy()
        hashes = pdf["simhash"].to_numpy().astype(np.uint64)
        order = np.argsort(key, kind="stable")
        out = _simhash_pairs_vectorized(key[order], ids[order], hashes[order],
                                        max_hamming)
        return ray.data.from_pandas(out)
    # sort-based run pairs with the signature as payload (no per-bucket
    # Python); dedupe, then ONE vectorized xor-popcount filter — the
    # same star cap as the driver path, so strategies stay identical
    cand = _sorted_run_pairs(chunk_rows, "chunk_key", "doc_id",
                             payload_col="simhash", star_cap=2048) \
        .drop_duplicates(["doc_a", "doc_b"])
    if len(cand) == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                          "doc_b": pd.Series([], dtype="int64"),
                          "hamming": pd.Series([], dtype="int64")}))
    ham = _popcount64(cand["payload_a"].to_numpy().view(np.uint64)
                      ^ cand["payload_b"].to_numpy().view(np.uint64))
    out = pd.DataFrame({"doc_a": cand["doc_a"].to_numpy(),
                        "doc_b": cand["doc_b"].to_numpy(),
                        "hamming": ham.astype(np.int64)})
    out = out[out["hamming"] <= max_hamming]
    return ray.data.from_pandas(
        out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def _table_to_norm_mat(t: pa.Table, id_col: str, vec_col: str):
    """(ids, L2-normalized float64 matrix) from a list-column table —
    flat-values reshape, no per-row Python."""
    import pyarrow.compute as pc

    ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
    col = t[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # list_flatten respects slice offsets; .values on a sliced ListArray
    # would return the whole (misaligned) child buffer
    flat = np.asarray(pc.list_flatten(col).to_numpy(zero_copy_only=False),
                      dtype=np.float64)
    mat = flat.reshape(t.num_rows, -1) if t.num_rows else flat.reshape(0, 1)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


_PAIR_SCHEMA = pa.schema(
    [pa.field("doc_a", pa.int64()), pa.field("doc_b", pa.int64()),
     pa.field("cosine", pa.float64())]
)


@ray.remote
def _block_pair_sims(ta: pa.Table, tb: pa.Table, threshold: float,
                     id_col: str, vec_col: str, same: bool) -> pa.Table:
    """Above-threshold cosine pairs between two normalized blocks."""
    # repartition can produce empty blocks whose schema is empty too
    if ta.num_rows == 0 or tb.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    ids_a, ma = _table_to_norm_mat(ta, id_col, vec_col)
    ids_b, mb = _table_to_norm_mat(tb, id_col, vec_col)
    sims = ma @ mb.T
    if same:
        sims[np.tril_indices_from(sims)] = -2.0  # keep strict upper triangle
    rows, cols = np.nonzero(sims >= threshold)
    ia, ib = ids_a[rows], ids_b[cols]
    lo = np.minimum(ia, ib)
    hi = np.maximum(ia, ib)
    keep = lo != hi
    return pa.table(
        {
            "doc_a": pa.array(lo[keep], pa.int64()),
            "doc_b": pa.array(hi[keep], pa.int64()),
            "cosine": pa.array(sims[rows, cols][keep], pa.float64()),
        }
    )


def _ivf_cluster_pairs(threshold: float, id_col: str, vec_col: str):
    def fn(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_cluster"]) if "_cluster" in group.column_names else group
        ids, mat = _table_to_norm_mat(g, id_col, vec_col)
        if len(ids) < 2:
            return _PAIR_SCHEMA.empty_table()
        sims = mat @ mat.T
        sims[np.tril_indices_from(sims)] = -2.0
        rows, cols = np.nonzero(sims >= threshold)
        ia, ib = ids[rows], ids[cols]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        keep = lo != hi
        return pa.table(
            {
                "doc_a": pa.array(lo[keep], pa.int64()),
                "doc_b": pa.array(hi[keep], pa.int64()),
                "cosine": pa.array(sims[rows, cols][keep], pa.float64()),
            }
        )

    return fn


def embedding_near_dups(ds, threshold: float = 0.95, id_col: str = "vec_id",
                        vec_col: str = "embedding", method: str = "block",
                        target_blocks: int = 16, nlist: int = 16,
                        n_assign: int = 2, sample_size: int = 2048, seed: int = 0):
    """Pairs of near-duplicate embeddings by cosine.

    method="block" (default, EXACT): the corpus is split into
    `target_blocks` normalized blocks that stay in the Ray object
    store; one task per block pair computes that tile of the
    similarity matrix and returns only above-threshold pairs. No full
    N×d broadcast, no driver materialization — driver memory is
    O(result pairs). FLOPs are inherently O(N²·d); use method="ivf"
    when that is unaffordable.

    method="ivf" (approximate, scale path): vectors are assigned to
    their `n_assign` nearest of `nlist` sampled-k-means centroids
    (multi-probe), pairs are generated only within clusters — recall
    loss is pairs whose two vectors share no cluster.
    """
    import pandas as pd
    import ray.data

    sel = ds.select_columns([id_col, vec_col])
    if method == "block":
        try:
            n_vecs = sel.count()
        except Exception:
            n_vecs = None
        if n_vecs is not None:
            # ~5k vectors per block: fewer tiny tile tasks on small
            # inputs, bounded O((N/B)^2·d) matmul per task on large ones
            target_blocks = int(np.clip(n_vecs // 5_000, 1, target_blocks))
        refs = sel.repartition(target_blocks).to_arrow_refs()
        futs = [
            _block_pair_sims.remote(refs[i], refs[j], threshold, id_col, vec_col, i == j)
            for i in range(len(refs))
            for j in range(i, len(refs))
        ]
        tables = [t for t in ray.get(futs) if t.num_rows]
        if not tables:
            return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
        out = pa.concat_tables(tables).to_pandas()
        return ray.data.from_pandas(
            out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
    # ---- IVF bucketed (approximate) ----
    from webvalid.ops.similarity import fit_centroids

    n = sel.count()
    sample = sel.select_columns([vec_col]).random_sample(
        min(1.0, sample_size / max(1, n)), seed=seed
    ).to_pandas()
    centroids = fit_centroids(np.array(sample[vec_col].to_list()), nlist, seed=seed)
    cent_ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        ids, mat = _table_to_norm_mat(t, id_col, vec_col)
        if len(ids) == 0:
            return t.append_column("_cluster", pa.array([], pa.int32()))
        sims = mat @ cents.T
        k = min(n_assign, cents.shape[0])
        top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]  # (n, k)
        reps = []
        for c in range(k):
            reps.append(t.append_column("_cluster", pa.array(top[:, c].astype(np.int32))))
        return pa.concat_tables(reps)

    assigned = sel.map_batches(assign, batch_format="pyarrow")
    pairs = assigned.groupby("_cluster").map_groups(
        _ivf_cluster_pairs(threshold, id_col, vec_col), batch_format="pyarrow"
    )
    out = pairs.to_pandas().drop_duplicates(["doc_a", "doc_b"])
    if len(out) == 0:
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())
    return ray.data.from_pandas(
        out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


def exact_dedup_keep_best(ds, text_col: str = "text", id_col: str = "doc_id",
                          score_col: str = "n_chars"):
    """Exact dedup keeping the BEST row per content group (highest
    score, smallest id on ties) — the canonicalization variant of
    `exact_dedup_groups` (which keeps min id).

    Scale path: ships only (text_md5, encoded) pairs through Ray's
    hash groupby — the (score, id) preference order is packed into ONE
    int64 (score · 2³² + (2³² − 1 − id)) so a plain Max aggregate IS
    the argmax; the winner is decoded after the shuffle. Requires
    0 ≤ score < 2³¹ and 0 ≤ id < 2³² (asserted per batch). Null-text
    rows form no group, as in `exact_dedup_groups`.

    SQL twin: ROW_NUMBER() OVER (PARTITION BY md5(text)
    ORDER BY score DESC, id) = 1.
    """
    from ray.data.aggregate import Count, Max

    _ID_SPAN = 1 << 32

    def fp(t: pa.Table) -> pa.Table:
        out = add_fingerprint(t, text_col)
        out = out.filter(pc.is_valid(out["text_md5"]))
        score = out[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = out[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(score) and (score.min() < 0 or score.max() >= (1 << 31)
                           or ids.min() < 0 or ids.max() >= _ID_SPAN):
            raise ValueError("keep_best encoding needs 0 <= score < 2^31 "
                             "and 0 <= id < 2^32")
        enc = score * _ID_SPAN + (_ID_SPAN - 1 - ids)
        return pa.table({"text_md5": out["text_md5"],
                         "_enc": pa.array(enc, pa.int64())})

    grouped = ds.map_batches(fp, batch_format="pyarrow") \
        .groupby("text_md5").aggregate(
            Max("_enc", alias_name="_best"), Count(alias_name="cnt"))

    def decode(t: pa.Table) -> pa.Table:
        enc = t["_best"].to_numpy(zero_copy_only=False)
        return pa.table({
            "text_md5": t["text_md5"],
            id_col: pa.array(_ID_SPAN - 1 - (enc % _ID_SPAN), pa.int64()),
            score_col: pa.array(enc // _ID_SPAN, pa.int64()),
            "cnt": t["cnt"],
        })

    return grouped.map_batches(decode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Containment detection (winnowing-fingerprint overlap)
# ---------------------------------------------------------------------------


def _run_pair_positions(keys: np.ndarray,
                        star_cap: int) -> tuple[np.ndarray, np.ndarray]:
    """POSITIONS (ia, ib) of all unordered pairs within equal-key runs
    of a sorted key array, WITH multiplicity, fully vectorized (no
    Python per run). Rows must be sorted by (key, id) so ia < ib
    implies id[ia] < id[ib]. Runs longer than `star_cap` emit a star
    around the run's first row (same giant-bucket bound as
    _pairs_in_sorted_runs). Full runs are bucketed BY LENGTH so each
    distinct length costs one broadcast gather against a precomputed
    triu index — exact and loop-free."""
    n = len(keys)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    boundary = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate([[0], boundary]).astype(np.int64)
    lens = np.diff(np.concatenate([starts, [n]]))
    a_parts, b_parts = [], []

    full = (lens >= 2) & (lens <= star_cap)
    if full.any():
        fs, fl = starts[full], lens[full]
        for L in np.unique(fl):
            ii, jj = np.triu_indices(int(L), k=1)
            s = fs[fl == L]
            a_parts.append((s[:, None] + ii[None, :]).ravel())
            b_parts.append((s[:, None] + jj[None, :]).ravel())

    star = lens > star_cap
    if star.any():
        ss, sl = starts[star], lens[star]
        tot = int((sl - 1).sum())
        run_of = np.repeat(np.arange(len(ss)), sl - 1)
        excl = np.concatenate([[0], np.cumsum(sl - 1)[:-1]])
        loc = np.arange(tot, dtype=np.int64) - excl[run_of]
        a_parts.append(ss[run_of])               # run min (sorted by id)
        b_parts.append(ss[run_of] + 1 + loc)

    if not a_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(a_parts), np.concatenate(b_parts)


def _emit_run_pairs(keys: np.ndarray, ids: np.ndarray,
                    star_cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Id-valued wrapper of _run_pair_positions."""
    ia, ib = _run_pair_positions(keys, star_cap)
    return ids[ia], ids[ib]


def _pair_overlap_counts(a: np.ndarray, b: np.ndarray) -> "pd.DataFrame":
    """(a, b, overlap) from a multiset of pair rows — one lexsort."""
    import pandas as pd

    if len(a) == 0:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "overlap": pd.Series([], dtype="int64")})
    order = np.lexsort((b, a))
    av, bv = a[order], b[order]
    new = np.ones(len(av), dtype=bool)
    new[1:] = (av[1:] != av[:-1]) | (bv[1:] != bv[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.concatenate([starts, [len(av)]]))
    return pd.DataFrame({"a": av[starts], "b": bv[starts],
                         "overlap": counts.astype(np.int64)})


def containment_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                      theta: float = 0.8, ngram: int = 4, window: int = 8,
                      max_bucket: int = 256, strategy: str = "auto",
                      driver_max_docs: int = 1_000_000) -> "pd.DataFrame":
    """Near-containment pairs: documents whose winnowing-fingerprint
    sets overlap by ≥ theta of the SMALLER set — catches doc-inside-doc
    (quote inflation / page-wrapping) that whole-doc Jaccard misses.

    Scale shape (mirrors the MinHash strategy split): explode
    (fingerprint, doc_id) rows — 8+8 bytes each, never text — then find
    equal-fingerprint doc groups by `strategy`:
    - "driver": collect the 16 B rows, ONE lexsort, vectorized run-pair
      emission — cheapest below `driver_max_docs` documents;
    - "shuffle": ONE Ray range sort on the fingerprint, then a
      vectorized per-block pair kernel (`_emit_run_pairs` — no Python
      per fingerprint group, unlike map_groups); runs touching a block
      edge are deferred as (fp, doc) rows and stitched on the driver
      (≤ 2 runs per block — O(#blocks), the dense_rank pattern);
    - "auto": pick by document count (parquet metadata — cheap).
    Buckets above `max_bucket` docs are star-capped to pairs with the
    smallest id (documented giant-bucket bound). Per-doc fingerprint
    counts (answer-sized) close containment = |A∩B| / min(|A|,|B|).
    Returns (id_a, id_b, overlap, containment) sorted, id_a < id_b.
    """
    import pandas as pd

    from webvalid.ops.textstats import batch_winnow_fingerprints

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        counts, fps = batch_winnow_fingerprints(
            t[text_col].to_pylist(), ngram, window)
        di = np.repeat(ids.astype(np.int64), counts)
        return pa.table({"fp": pa.array(fps.view(np.int64), pa.int64()),
                         "doc": pa.array(di, pa.int64())})

    def nfp_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        counts, _ = batch_winnow_fingerprints(
            t[text_col].to_pylist(), ngram, window)
        return pa.table({"doc": pa.array(ids, pa.int64()),
                         "n_fp": pa.array(counts, pa.int64())})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    strategy = _resolve_strategy(strategy, ds, driver_max_docs)
    if strategy == "driver":
        fp_parts, doc_parts = [], []
        for t in exploded.iter_batches(batch_format="pyarrow",
                                       batch_size=262144):
            fp_parts.append(t["fp"].to_numpy(zero_copy_only=False))
            doc_parts.append(t["doc"].to_numpy(zero_copy_only=False))
        fp = np.concatenate(fp_parts) if fp_parts else np.empty(0, np.int64)
        doc = np.concatenate(doc_parts) if doc_parts else np.empty(0, np.int64)
        order = np.lexsort((doc, fp))
        pa_, pb_ = _emit_run_pairs(fp[order], doc[order], max_bucket)
        pair_counts = _pair_overlap_counts(pa_, pb_)
    else:
        # distributed: the shared sort-based run-pair kernel
        # (_sorted_run_pairs — vectorized per-block pairs, bounded
        # driver edge stitch); multiplicity is preserved, which is
        # exactly what the overlap count needs
        pairs = _sorted_run_pairs(exploded, "fp", "doc",
                                  star_cap=max_bucket)
        pair_counts = _pair_overlap_counts(pairs["doc_a"].to_numpy(),
                                           pairs["doc_b"].to_numpy())
    if len(pair_counts) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "overlap": pd.Series([], dtype="int64"),
                             "containment": pd.Series([], dtype=float)})
    nfp = ds.map_batches(nfp_partial, batch_format="pyarrow").to_pandas() \
        .drop_duplicates("doc").set_index("doc")["n_fp"]
    amin = np.minimum(nfp.reindex(pair_counts["a"]).to_numpy(),
                      nfp.reindex(pair_counts["b"]).to_numpy())
    with np.errstate(invalid="ignore", divide="ignore"):
        cont = pair_counts["overlap"].to_numpy() / amin
    out = pd.DataFrame({"id_a": pair_counts["a"].astype("int64"),
                        "id_b": pair_counts["b"].astype("int64"),
                        "overlap": pair_counts["overlap"].astype("int64"),
                        "containment": np.round(cont, 6)})
    out = out[out["containment"] >= theta]
    return out.sort_values(["id_a", "id_b"], kind="mergesort") \
              .reset_index(drop=True)
