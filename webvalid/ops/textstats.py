"""Text analysis operators: stats/quality, token counting, language id,
document fingerprinting.

All per-row work is vectorized (pyarrow.compute string kernels, pandas
str methods, compiled regexes held in actor `__init__`) — no per-row
Python in the hot path except where a C-backed call per row is the
kernel (regex findall).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish word/punct tokenizer (compiled once per process).
TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
WORD_RE = re.compile(r"\w+", re.UNICODE)
DIGIT_RE = re.compile(r"\d", re.UNICODE)

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
    "pt": {"o", "a", "os", "as", "e", "um", "uma", "que", "para", "com"},
    "ru": {"и", "в", "не", "на", "что", "это", "с", "как", "по", "но"},
}


def text_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_chars_computed / n_tokens columns (Arrow kernels only).

    Tokens are single-space-separated fields (matches SQL
    `len(str_split(text, ' '))` exactly, for oracle parity).
    """
    t = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(t), pa.int64())
    parts = pc.split_pattern(t, " ")
    n_tokens = pc.cast(pc.list_value_length(parts), pa.int64())
    out = batch.append_column("n_chars_computed", n_chars)
    return out.append_column("n_tokens", n_tokens)


class QualityScorer:
    """Quality features per document: token/char counts (regex-based),
    punctuation ratio, digit ratio, mean token length, stopword ratio,
    and a composite [0, 1] quality score."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.token_re = TOKEN_RE
        self.word_re = WORD_RE
        self.digit_re = DIGIT_RE
        self.all_stop = set().union(*_STOPWORDS.values())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        n_tokens = np.zeros(n, dtype=np.int64)
        n_words = np.zeros(n, dtype=np.int64)
        punct_ratio = np.zeros(n)
        digit_ratio = np.zeros(n)
        mean_tok_len = np.zeros(n)
        stop_ratio = np.zeros(n)
        for i, t in enumerate(texts):
            if not t:
                continue
            toks = self.token_re.findall(t)
            # identical to filtering toks by fullmatch: TOKEN_RE's
            # alternation emits maximal \w+ runs or single non-word
            # chars, so the word subset IS WORD_RE.findall — one C call
            # instead of a per-token interpreted fullmatch
            words = self.word_re.findall(t)
            n_tokens[i] = len(toks)
            n_words[i] = len(words)
            if toks:
                punct_ratio[i] = 1.0 - len(words) / len(toks)
            nc = len(t)
            # C-level regex count, not an O(chars) interpreted loop.
            # \d matches Unicode Nd (decimal digits) only — unlike
            # str.isdigit(), superscripts/circled digits ('²') do NOT
            # count; a deliberate semantic choice for this heuristic.
            digit_ratio[i] = len(self.digit_re.findall(t)) / nc
            if words:
                mean_tok_len[i] = sum(map(len, words)) / len(words)
                lw = [w.lower() for w in words]
                stop_ratio[i] = sum(w in self.all_stop for w in lw) / len(lw)
        # composite score: long enough, not punct/digit heavy, plausible words
        length_score = np.clip(n_words / 20.0, 0, 1)
        score = (
            0.4 * length_score
            + 0.2 * (1 - np.clip(punct_ratio * 2, 0, 1))
            + 0.2 * (1 - np.clip(digit_ratio * 4, 0, 1))
            + 0.2 * np.clip((mean_tok_len - 1) / 6.0, 0, 1)
        )
        score[n_tokens == 0] = 0.0  # null/empty documents score zero
        cols = {
            self.id_col: batch[self.id_col],
            "n_tokens": pa.array(n_tokens),
            "n_words": pa.array(n_words),
            "punct_ratio": pa.array(punct_ratio),
            "digit_ratio": pa.array(digit_ratio),
            "mean_token_len": pa.array(mean_tok_len),
            "stopword_ratio": pa.array(stop_ratio),
            "quality_score": pa.array(score),
        }
        return pa.table(cols)


class LangId:
    """Heuristic language identification: Unicode-script detection for
    zh/ja/ru, stopword voting for Latin-script languages, 'und' fallback.
    Deterministic; patterns compiled once per actor."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.word_re = WORD_RE
        self.cjk = re.compile(r"[一-鿿]")
        self.kana = re.compile(r"[぀-ヿ]")
        self.cyrillic = re.compile(r"[Ѐ-ӿ]")

    def classify(self, text: str) -> tuple[str, float]:
        if not text:
            return "und", 0.0
        sample = text[:2000]
        n = max(1, len(sample))
        if len(self.kana.findall(sample)) / n > 0.05:
            return "ja", 0.9
        if len(self.cjk.findall(sample)) / n > 0.2:
            return "zh", 0.9
        if len(self.cyrillic.findall(sample)) / n > 0.2:
            return "ru", 0.9
        words = [w.lower() for w in self.word_re.findall(sample)]
        if not words:
            return "und", 0.0
        best, best_hits = "und", 0
        for lang, stops in _STOPWORDS.items():
            if lang == "ru":
                continue
            hits = sum(w in stops for w in words)
            if hits > best_hits:
                best, best_hits = lang, hits
        conf = min(1.0, best_hits / max(3, len(words) * 0.05))
        return (best, conf) if best_hits > 0 else ("und", 0.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, confs = [], []
        for t in batch[self.text_col].to_pylist():
            p, c = self.classify(t)
            preds.append(p)
            confs.append(c)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "lang_pred": pa.array(preds, pa.string()),
                "lang_conf": pa.array(confs, pa.float64()),
            }
        )


_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def batch_winnow_fingerprints(texts: list, ngram: int,
                              window: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized winnowing fingerprints for a whole batch of texts.

    Same per-doc semantics as Fingerprinter.fingerprints (tested
    equal), but ONE numpy pipeline for the batch: tokenization is a
    C-level regex call per doc (``\\w+`` is Unicode-aware, which Arrow's
    RE2 kernels are not), then one hash64 pass over the concatenated
    tokens, one rotate-xor n-gram pass, one sentinel-padded sliding
    window min, and one lexsort per-doc unique — no per-doc numpy calls
    or Python xor loops.

    Returns (fps_per_doc counts, unique fingerprints in doc order).
    """
    from webvalid.sketches import hash64

    n = len(texts)
    tok_lists = [WORD_RE.findall(t.lower()) if t else [] for t in texts]
    n_toks = np.array([len(x) for x in tok_lists], dtype=np.int64)
    counts = np.zeros(n, dtype=np.int64)
    k = ngram
    total = int(n_toks.sum())
    if total == 0:
        return counts, np.empty(0, dtype=np.uint64)
    import itertools

    flat = np.array(list(itertools.chain.from_iterable(tok_lists)),
                    dtype=object)
    th = hash64(flat)

    # --- per-doc rolling n-gram hash (xor of rotated token hashes) ---
    g_counts = np.maximum(n_toks - k + 1, 0)  # docs with < k tokens: 0
    total_grams = int(g_counts.sum())
    if total_grams == 0:
        return counts, np.empty(0, dtype=np.uint64)
    doc_tok_starts = np.concatenate([[0], np.cumsum(n_toks)[:-1]])
    rep_starts = np.repeat(doc_tok_starts, g_counts)
    excl = np.concatenate([[0], np.cumsum(g_counts)[:-1]])
    local = np.arange(total_grams, dtype=np.int64) - np.repeat(excl, g_counts)
    idx = rep_starts + local  # global flat index of each gram's first token
    grams = th[idx].copy()
    for off in range(1, k):
        shifted = th[idx + off]
        grams ^= (shifted << np.uint64(off)) | (shifted >> np.uint64(64 - off))

    # --- sentinel-padded sliding-window min ---
    w = window
    # after each doc's gram run, (w-1) U64_MAX sentinels: a window that
    # starts in-doc but overruns sees only losers, so short docs
    # (g <= w) reduce to min(all grams), exactly the per-doc path
    doc_pad_starts = np.concatenate([[0], np.cumsum(g_counts + (w - 1))[:-1]])
    padded = np.full(total_grams + (w - 1) * n + max(w - 1, 0), _U64_MAX,
                     dtype=np.uint64)
    gram_pos = np.repeat(doc_pad_starts, g_counts) + local
    padded[gram_pos] = grams
    sw = np.lib.stride_tricks.sliding_window_view(padded, w).min(axis=1)
    m_counts = np.where(g_counts == 0, 0, np.maximum(g_counts - w + 1, 1))
    total_mins = int(m_counts.sum())
    mexcl = np.concatenate([[0], np.cumsum(m_counts)[:-1]])
    mlocal = np.arange(total_mins, dtype=np.int64) - np.repeat(mexcl, m_counts)
    mins = sw[np.repeat(doc_pad_starts, m_counts) + mlocal]

    # --- per-doc unique via one lexsort ---
    doc_idx = np.repeat(np.arange(n), m_counts)
    order = np.lexsort((mins, doc_idx))
    dv, mv = doc_idx[order], mins[order]
    keep = np.ones(total_mins, dtype=bool)
    keep[1:] = (dv[1:] != dv[:-1]) | (mv[1:] != mv[:-1])
    fps = mv[keep]
    counts = np.bincount(dv[keep], minlength=n).astype(np.int64)
    return counts, fps


class Fingerprinter:
    """Winnowing-style document fingerprints: rolling hash over token
    hashes, minimum per sliding window → set of fingerprints per doc.
    Emits (doc_id, n_fingerprints, fingerprint_xor) summary plus the
    min fingerprint — enough for containment-style matching tests."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 ngram: int = 4, window: int = 8):
        self.text_col = text_col
        self.id_col = id_col
        self.ngram = ngram
        self.window = window
        self.word_re = WORD_RE

    def fingerprints(self, text: str) -> np.ndarray:
        from webvalid.sketches import hash64

        if not text:
            return np.empty(0, dtype=np.uint64)
        toks = self.word_re.findall(text.lower())
        if len(toks) < self.ngram:
            return np.empty(0, dtype=np.uint64)
        th = hash64(np.array(toks, dtype=object))
        # rolling n-gram hash: xor of shifted token hashes
        k = self.ngram
        grams = np.zeros(len(th) - k + 1, dtype=np.uint64)
        for off in range(k):
            shifted = th[off: off + len(grams)]
            grams ^= (shifted << np.uint64(off)) | (shifted >> np.uint64(64 - off)) if off else shifted
        if len(grams) <= self.window:
            return np.unique(grams.min(keepdims=True))
        w = np.lib.stride_tricks.sliding_window_view(grams, self.window)
        return np.unique(w.min(axis=1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        counts, fps = batch_winnow_fingerprints(texts, self.ngram, self.window)
        n = len(counts)
        fp_min = np.zeros(n, dtype=np.uint64)
        fp_xor = np.zeros(n, dtype=np.uint64)
        nz = counts > 0
        if nz.any():
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            fp_min[nz] = np.minimum.reduceat(fps, starts[nz])
            fp_xor[nz] = np.bitwise_xor.reduceat(fps, starts[nz])
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_fingerprints": pa.array(counts, pa.int64()),
                "fingerprint_min": pa.array(fp_min, pa.uint64()),
                "fingerprint_xor": pa.array(fp_xor, pa.uint64()),
            }
        )


def _seg_max_runs(d: np.ndarray, key: np.ndarray):
    """(docs, per-doc total count, per-doc max run count) of sorted
    (d, key) pairs — the shared gaps-and-islands kernel behind the
    repetition stats AND the repetition filter (one implementation,
    one place to fix run-boundary logic)."""
    order = np.lexsort((key, d))
    d_s, k_s = d[order], key[order]
    run_start = np.ones(len(d_s), dtype=bool)
    run_start[1:] = (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])
    starts = np.flatnonzero(run_start)
    cnt = np.diff(np.append(starts, len(d_s)))
    run_doc = d_s[starts]
    doc_start = np.ones(len(run_doc), dtype=bool)
    doc_start[1:] = run_doc[1:] != run_doc[:-1]
    dstarts = np.flatnonzero(doc_start)
    docs = run_doc[dstarts]
    totals = np.add.reduceat(cnt, dstarts)
    maxes = np.maximum.reduceat(cnt, dstarts)
    return docs, totals, maxes


def repetition_stats_batch(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Per-doc repetition profile (Gopher-style quality signals):
    n_tokens, top_token_frac (= max single-token count / n_tokens),
    top_bigram_frac (= max bigram count / n_bigrams; 0 for 1-token
    docs). One lexsort over 64-bit token hashes per batch — no per-row
    Python. Token identity is the hash (collision odds ~V²/2⁶⁵,
    documented trade shared with the TF-IDF/boilerplate kernels).
    Docs with null text emit no row (SQL: unnest of NULL yields none)."""
    from webvalid.ops.boilerplate import _split_flat
    from webvalid.sketches import hash64

    empty = pa.table({id_col: batch[id_col].slice(0, 0),
                      "n_tokens": pa.array([], pa.int64()),
                      "top_token_frac": pa.array([], pa.float64()),
                      "top_bigram_frac": pa.array([], pa.float64())})
    flat, offs, valid = _split_flat(batch[text_col])
    if len(flat) == 0 or not valid.any():
        return empty
    doc_idx = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
    tok_valid = valid[doc_idx]
    h = hash64(flat.to_numpy(zero_copy_only=False))

    docs, n_tok, max_tok = _seg_max_runs(doc_idx[tok_valid], h[tok_valid])
    top_tok = max_tok / n_tok.astype(np.float64)

    # bigrams: adjacent token pairs within one (valid) doc
    pair_ok = (doc_idx[1:] == doc_idx[:-1]) & tok_valid[1:]
    bg_frac = np.zeros(len(docs), np.float64)
    if pair_ok.any():
        bh = (h[:-1][pair_ok] * np.uint64(0x9E3779B97F4A7C15)) ^ h[1:][pair_ok]
        bdocs, n_bg, max_bg = _seg_max_runs(doc_idx[:-1][pair_ok], bh)
        pos = np.searchsorted(docs, bdocs)  # docs sorted; bdocs ⊆ docs
        bg_frac[pos] = max_bg / n_bg.astype(np.float64)
    ids = batch[id_col].to_numpy(zero_copy_only=False)[docs]
    return pa.table({id_col: pa.array(ids, batch[id_col].type),
                     "n_tokens": pa.array(n_tok.astype(np.int64)),
                     "top_token_frac": pa.array(top_tok),
                     "top_bigram_frac": pa.array(bg_frac)})


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Streaming per-doc repetition stats Dataset (see batch kernel)."""
    return ds.map_batches(
        lambda t: repetition_stats_batch(t, text_col, id_col),
        batch_format="pyarrow",
    )


def dup_ngram_stats_batch(batch: pa.Table, n: int = 3,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Per-doc duplicate-n-gram fraction (the Gopher repetition signal
    repetition_stats doesn't cover): of all n-gram instances in a doc,
    the fraction belonging to an n-gram that occurs >= 2 times. One
    lexsort over chained 64-bit token hashes per batch — no per-row
    Python. N-gram identity is the hash chain (same collision trade as
    the bigram kernel above). Docs with < n tokens or null text emit
    no row (SQL: no n-gram rows -> absent from the grouped result)."""
    from webvalid.ops.boilerplate import _split_flat
    from webvalid.sketches import hash64

    assert n >= 2
    empty = pa.table({id_col: batch[id_col].slice(0, 0),
                      "n_ngrams": pa.array([], pa.int64()),
                      "dup_ngram_frac": pa.array([], pa.float64())})
    flat, offs, valid = _split_flat(batch[text_col])
    if len(flat) < n or not valid.any():
        return empty
    doc_idx = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
    h = hash64(flat.to_numpy(zero_copy_only=False))
    gold = np.uint64(0x9E3779B97F4A7C15)
    # chain-mix the n token hashes; an n-gram is valid iff its first
    # and last token share a (valid) doc — doc_idx is monotone, so
    # endpoint equality implies the middle tokens match too
    gh = h[: len(h) - n + 1].copy()
    for i in range(1, n):
        gh = (gh * gold) ^ h[i: len(h) - n + 1 + i]
    gdoc = doc_idx[: len(h) - n + 1]
    ok = (gdoc == doc_idx[n - 1:]) & valid[gdoc]
    if not ok.any():
        return empty
    gdoc, gh = gdoc[ok], gh[ok]
    order = np.lexsort((gh, gdoc))
    d_s, h_s = gdoc[order], gh[order]
    run_start = np.ones(len(d_s), dtype=bool)
    run_start[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    starts = np.flatnonzero(run_start)
    cnt = np.diff(np.append(starts, len(d_s)))
    run_doc = d_s[starts]
    doc_start = np.ones(len(run_doc), dtype=bool)
    doc_start[1:] = run_doc[1:] != run_doc[:-1]
    dstarts = np.flatnonzero(doc_start)
    docs = run_doc[dstarts]
    totals = np.add.reduceat(cnt, dstarts)
    dups = np.add.reduceat(np.where(cnt >= 2, cnt, 0), dstarts)
    ids = batch[id_col].to_numpy(zero_copy_only=False)[docs]
    return pa.table({id_col: pa.array(ids, batch[id_col].type),
                     "n_ngrams": pa.array(totals.astype(np.int64)),
                     "dup_ngram_frac": pa.array(
                         dups / totals.astype(np.float64))})


def dup_ngram_stats(ds, n: int = 3, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Streaming per-doc duplicate-n-gram fraction Dataset (see batch
    kernel; per-doc and batch-local, so it pipelines with no shuffle)."""
    return ds.map_batches(
        lambda t: dup_ngram_stats_batch(t, n, text_col, id_col),
        batch_format="pyarrow",
    )


def repetition_filter(ds, text_col: str = "text",
                      max_top_token_frac: float = 0.15,
                      min_tokens: int = 20):
    """Quality gate: drop docs whose single most-repeated token exceeds
    `max_top_token_frac` of the doc, or with fewer than `min_tokens`
    tokens (null text drops too). Pure streaming map — the repetition
    kernel is batch-local; both sides of the comparison are one double
    division, so the cut is bit-identical to the SQL twin."""
    from webvalid.ops.boilerplate import _split_flat
    from webvalid.sketches import hash64

    def keep(batch: pa.Table) -> pa.Table:
        flat, offs, valid = _split_flat(batch[text_col])
        if len(flat) == 0 or not valid.any():
            return batch.slice(0, 0)
        doc_idx = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        tok_valid = valid[doc_idx]
        h = hash64(flat.to_numpy(zero_copy_only=False))
        docs, n_tok, max_tok = _seg_max_runs(doc_idx[tok_valid],
                                             h[tok_valid])
        ok_mask = np.zeros(batch.num_rows, dtype=bool)
        frac = max_tok / n_tok.astype(np.float64)
        ok_mask[docs] = (frac <= max_top_token_frac) & (n_tok >= min_tokens)
        return batch.filter(pa.array(ok_mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def compression_ratio_batch(t: pa.Table, text_col: str = "text",
                            id_col: str = "doc_id",
                            level: int = 6) -> pa.Table:
    """Per-doc zlib compression ratio (compressed/raw bytes) — the
    classic repetitive-boilerplate signal (highly repetitive docs
    compress far below ~0.4; random text sits near 0.7+). Null/empty
    texts yield a null ratio. Deterministic (fixed zlib level), so
    tests pin exact values; rows-only gate (no SQL codec)."""
    import zlib

    texts = t[text_col].to_pylist()
    raw = np.zeros(len(texts), np.int64)
    comp = np.zeros(len(texts), np.int64)
    for i, s in enumerate(texts):
        if s:
            b = s.encode()
            raw[i] = len(b)
            comp[i] = len(zlib.compress(b, level))
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = np.where(raw > 0, comp / np.maximum(raw, 1), np.nan)
    return pa.table({
        id_col: t[id_col],
        "raw_bytes": pa.array(raw, pa.int64()),
        "compressed_bytes": pa.array(comp, pa.int64()),
        # from_pandas=True: NaN becomes a genuine Arrow NULL, honoring
        # the documented 'null ratio for null/empty texts' contract
        "compression_ratio": pa.array(np.round(ratio, 6), pa.float64(),
                                      from_pandas=True),
    })
