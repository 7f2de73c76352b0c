"""Trained character-n-gram language identification (Cavnar & Trenkle
'94 / naive-Bayes variant — public technique, no downloads).

The r3 `LangId` is a hand-written script/stopword heuristic; this
module learns per-language profiles FROM DATA and scores with the
engine's hashed-broadcast pattern:

- **Fixture**: `generate_langid_fixture` writes a deterministic
  multilingual corpus (seeded; per-language function-word lexicons
  with shared cross-language confuser tokens) with a train/test split.
  Neither the trainer nor the scorer ever sees the lexicons — only the
  train rows — so held-out accuracy is a real generalization check.
- **Training** (distributed): each batch emits pre-aggregated
  (lang, trigram-hash, count) partials via one np.unique over fused
  codes; a native `groupby(["lang", "h"]).sum` merges them; one
  vectorized `map_groups` per LANGUAGE (≤ #langs Python calls) keeps
  the top-M trigrams and computes add-half Laplace log-probabilities.
  The model is #langs × M × 16 B — broadcast-sized at any corpus size.
- **Scoring** (`NgramLangId`): map_batches actor; per batch ONE
  concatenated codepoint array → vectorized rolling trigram hash →
  per-language searchsorted gather → bincount per doc → argmax.
  No per-row Python in the hot loop beyond the C-level `str.encode`.

No reference analogue (the reference has no text ops); north-rule /
training-data addition per VERDICT r3 next-steps #8.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

# ---------------------------------------------------------------------------
# deterministic multilingual fixture
# ---------------------------------------------------------------------------

_LEX = {
    "en": ("the and of to in that with for was his they which have this "
           "from not but been would there their one all were when who "
           "will more about").split(),
    "fr": ("le la les des une dans est pour que qui avec sur pas être "
           "plus par vous nous cette mais comme tout aussi bien où très "
           "après sans déjà").split(),
    "es": ("el los las una del que con por para está son como más pero "
           "sus fue entre cuando hasta desde porque sobre también muy "
           "años ciudad nación corazón").split(),
    "de": ("der die das und ist nicht mit ein von sich auch auf werden "
           "eine wird sind oder aber durch beim schön über müssen "
           "können straße weiß zwischen").split(),
    "ru": ("и в не на что он с как это по но она этот так "
           "его было только года можно человек время жизнь "
           "работа слово день").split(),
    "zh": ("的 了 和 是 在 我们 他们 这个 中国 发展 工作 问题 时间 "
           "人民 社会 经济 文化 学习 生活 世界 历史 知识 技术 信息").split(),
}

# tokens every language can emit (numbers, latinized names, units):
# they force the model to rely on the language-specific mass
_SHARED = ("data 2024 http table id 100 web x1 alpha beta gamma code "
           "v2 item 42 log net").split()

LANGS = sorted(_LEX)


def generate_langid_fixture(out_dir: str, n_rows: int = 3000,
                            seed: int = 101) -> str:
    """Deterministic labeled corpus: (doc_id, lang, text, split).
    split: 'test' for doc_id % 5 == 0, else 'train'. Idempotent —
    returns the parquet path."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "langid.parquet")
    if os.path.exists(path):
        return path
    rng = np.random.default_rng(seed)
    langs, texts = [], []
    for i in range(n_rows):
        lang = LANGS[int(rng.integers(len(LANGS)))]
        lex = _LEX[lang]
        n_tok = int(rng.integers(20, 60))
        own = rng.random(n_tok) < 0.7
        toks = [lex[int(rng.integers(len(lex)))] if o
                else _SHARED[int(rng.integers(len(_SHARED)))]
                for o in own]
        sep = "" if lang == "zh" else " "
        langs.append(lang)
        texts.append(sep.join(toks))
    t = pa.table({
        "doc_id": pa.array(np.arange(n_rows, dtype=np.int64)),
        "lang": pa.array(langs, pa.string()),
        "text": pa.array(texts, pa.string()),
        "split": pa.array(["test" if i % 5 == 0 else "train"
                           for i in range(n_rows)], pa.string()),
    })
    import pyarrow.parquet as pq

    pq.write_table(t, path)
    return path


# ---------------------------------------------------------------------------
# vectorized char-trigram hashing
# ---------------------------------------------------------------------------

_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)


def batch_trigram_hashes(texts: list, sample_chars: int = 400
                         ) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, hash) for every char trigram of every text — one
    concatenated codepoint array, one vectorized rolling hash; window
    positions crossing a doc boundary are masked out. None/short texts
    contribute nothing (callers map them to 'und')."""
    cps, owners = [], []
    for i, t in enumerate(texts):
        if not t:
            continue
        arr = np.frombuffer(t[:sample_chars].casefold().encode("utf-32-le"),
                            dtype=np.uint32)
        if len(arr) < 3:
            continue
        cps.append(arr)
        owners.append(np.full(len(arr), i, dtype=np.int64))
    if not cps:
        return (np.array([], np.int64), np.array([], np.uint64))
    cp = np.concatenate(cps).astype(np.uint64)
    own = np.concatenate(owners)
    with np.errstate(over="ignore"):
        h = cp[:-2] * _P1 ^ cp[1:-1] * _P2 ^ cp[2:] * _P3
        h ^= h >> np.uint64(29)
        h *= _P2
    valid = own[:-2] == own[2:]
    return own[:-2][valid], h[valid]


# ---------------------------------------------------------------------------
# distributed training
# ---------------------------------------------------------------------------


def train_lang_profiles(ds, text_col: str = "text", lang_col: str = "lang",
                        top_m: int = 4000, sample_chars: int = 400) -> dict:
    """lang -> (sorted trigram hashes uint64, log-prob weights float64,
    miss floor float64). Distributed: batch partials are pre-aggregated
    (lang, h, cnt) rows; the all-to-all is a native groupby-sum; the
    per-language top-M/log-prob step is ONE vectorized map_groups call
    per language."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        lang_vals = t[lang_col].to_pylist()
        codes, uniq_langs = [], {}
        for lv in lang_vals:
            codes.append(uniq_langs.setdefault(lv, len(uniq_langs)))
        codes = np.asarray(codes, np.int64)
        doc, h = batch_trigram_hashes(texts, sample_chars)
        if len(doc) == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "h": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        lang_of = codes[doc]
        # fuse (lang_code, hash) into one sortable uint64 pair via a
        # structured view-free lexsort unique
        order = np.lexsort((h, lang_of))
        lo, ho = lang_of[order], h[order]
        new = np.ones(len(lo), bool)
        new[1:] = (lo[1:] != lo[:-1]) | (ho[1:] != ho[:-1])
        starts = np.flatnonzero(new)
        cnts = np.diff(np.append(starts, len(lo)))
        inv_langs = {v: k for k, v in uniq_langs.items()}
        # int64 bit-view: Ray's groupby/sort pickles uint64 values
        # above int64 range — equality and a consistent sort order are
        # all the model needs, so the raw bits as int64 work everywhere
        return pa.table({
            "lang": pa.array([inv_langs[c] for c in lo[starts]],
                             pa.string()),
            "h": pa.array(ho[starts].view(np.int64)),
            "cnt": pa.array(cnts.astype(np.int64)),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "h"]).sum("cnt")

    def per_lang(t: pa.Table) -> pa.Table:
        cnt = t["sum(cnt)"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        keep = np.argsort(cnt, kind="stable")[::-1][:top_m]
        kh, kc = h[keep], cnt[keep].astype(np.float64)
        total = float(cnt.sum())
        # add-half smoothing over the KEPT vocabulary; the miss floor
        # is the half-count tail probability
        denom = total + 0.5 * (len(kh) + 1)
        w = np.log((kc + 0.5) / denom)
        floor = float(np.log(0.5 / denom))
        order = np.argsort(kh, kind="stable")
        return pa.table({
            "lang": pa.array([t["lang"][0].as_py()] * len(kh), pa.string()),
            "h": pa.array(kh[order], pa.int64()),
            "w": pa.array(w[order], pa.float64()),
            "floor": pa.array(np.full(len(kh), floor)),
        })

    rows = agg.groupby("lang").map_groups(per_lang,
                                          batch_format="pyarrow").to_pandas()
    model = {}
    for lang, g in rows.groupby("lang"):
        model[lang] = (np.ascontiguousarray(g["h"].to_numpy(np.int64)),
                       np.ascontiguousarray(g["w"].to_numpy(np.float64)),
                       float(g["floor"].iloc[0]))
    return model


# ---------------------------------------------------------------------------
# broadcast scoring
# ---------------------------------------------------------------------------


class NgramLangId:
    """map_batches callable: trained-profile language ID. The model
    ships once via ray.put; per batch, K (=#langs) searchsorted gathers
    over one concatenated trigram array, then a bincount per doc."""

    def __init__(self, model_ref, text_col: str = "text",
                 id_col: str = "doc_id", sample_chars: int = 400):
        model = ray.get(model_ref) if not isinstance(model_ref, dict) \
            else model_ref
        self.langs = sorted(model)
        self.model = [model[l] for l in self.langs]
        self.text_col = text_col
        self.id_col = id_col
        self.sample_chars = sample_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        doc, h = batch_trigram_hashes(texts, self.sample_chars)
        h = h.view(np.int64)  # same bit-view as the trained model
        scores = np.full((n, len(self.langs)), -np.inf)
        if len(doc):
            for j, (H, W, floor) in enumerate(self.model):
                idx = np.searchsorted(H, h)
                idx_c = np.clip(idx, 0, len(H) - 1)
                hit = (idx < len(H)) & (H[idx_c] == h)
                s = np.where(hit, W[idx_c], floor)
                scores[:, j] = np.bincount(doc, weights=s, minlength=n)
            # docs with zero trigrams keep -inf everywhere -> 'und'
            has = np.bincount(doc, minlength=n) > 0
        else:
            has = np.zeros(n, bool)
        best = np.argmax(scores, axis=1)
        pred = np.where(has, np.asarray(self.langs, object)[best], "und")
        # margin-based confidence: winner minus runner-up, squashed.
        # Rows with zero trigrams are all -inf, so -inf - -inf = NaN
        # (plus a per-batch RuntimeWarning) — compute only over rows
        # that have trigrams and leave the rest at 0.0.
        conf = np.zeros(n, np.float64)
        if len(self.langs) > 1:
            if has.any():
                part = np.partition(scores[has], -2, axis=1)
                margin = part[:, -1] - part[:, -2]
                conf[has] = 1.0 - np.exp(-np.maximum(margin, 0.0) / 8.0)
        else:
            conf = has.astype(np.float64)
        return pa.table({
            self.id_col: batch[self.id_col],
            "lang_pred": pa.array(pred.astype(str), pa.string()),
            "lang_conf": pa.array(conf, pa.float64()),
        })
