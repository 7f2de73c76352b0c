"""Deterministic synthetic web-pages generator (FIXTURES.md F1/F2).

Seeded, reproducible generation of a Common-Crawl-style Parquet table
with planted violations and a planted distribution drift, plus the
small reference key tables for the referential-integrity checks and an
expected-violations table for tests.

Planted features (all row sets recorded in the returned info dict):
- duplicate urls (~dup_frac of rows copy an earlier row's url within
  the same output file — and therefore its text, keeping
  "byte-identical text per url" true);
- null html (~1%) and null text (~2%);
- warc_ts values outside the nominal 30-day crawl window (~0.05%);
- orphan lang codes ("xx") violating the lang reference table (~0.02%);
- a lang/host distribution shift starting at partition `drift_at`
  (drift detectors must flag it);
- a log-normal html size distribution with occasional giant rows.

`text` is a pure function of (url, seed) so the byte-identical-text
invariant is checkable; duplicated urls automatically share text.

Generation is per-FILE deterministic: file k is a pure function of
(seed, k, params), so files can be produced sequentially (default; the
test path) or in parallel as Ray tasks (`use_ray=True`; the bench path
for multi-million-row fixtures) with identical per-file content.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from webvalid.schema import VALID_LANGS

_HOSTS = [f"site{i:03d}.example.{tld}" for i, tld in zip(range(48), ["com", "org", "net", "io"] * 12)]

# Nominal crawl window: 2024-01-01 .. 2024-01-31 (us precision).
TS_LO = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
TS_HI = np.datetime64("2024-01-31T00:00:00", "us").astype(np.int64)


def _zipf_weights(n: int, s: float, rotate: int = 0) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    w = np.roll(w, rotate)
    return w / w.sum()


def _text_for(url: str, seed: int) -> str:
    """Deterministic pseudo-text per url (byte-identical invariant)."""
    h = hashlib.blake2b(f"{seed}:{url}".encode(), digest_size=16).digest()
    n_words = 5 + h[0] % 60
    x = int.from_bytes(h[8:16], "little") | 1
    words = []
    for _ in range(n_words):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        words.append(f"w{(x >> 33) % 5000:04d}")
    return f"Document at {url}. " + " ".join(words)


def _gen_file(file_idx: int, part_lo: int, n_parts_total: int, path: str,
              params: dict) -> dict:
    """Generate one parquet file covering partitions [part_lo, part_lo+k).

    Pure function of (seed, file_idx, params); returns planted-violation
    metadata plus url/text-hash arrays for the expectations table.
    """
    seed = params["seed"]
    block_size = params["block_size"]
    n_rows = params["n_rows"]
    drift_part = params["drift_part"]
    ppf = params["partitions_per_file"]

    rng = np.random.default_rng((seed, file_idx))
    lang_w_pre = _zipf_weights(len(VALID_LANGS), 1.6)
    lang_w_post = _zipf_weights(len(VALID_LANGS), 1.1, rotate=3)
    host_w_pre = _zipf_weights(len(_HOSTS), 1.3)
    host_w_post = _zipf_weights(len(_HOSTS), 1.0, rotate=11)

    dup_rows: list[tuple[int, str]] = []
    ts_outlier_rows: list[int] = []
    orphan_rows: list[int] = []
    orphan_host_rows: list[int] = []
    exp_urls: list[str] = []
    exp_md5: list[str] = []

    file_urls: list[str] = []
    writer = pq.ParquetWriter(path, _table_schema())
    parts = range(part_lo, min(part_lo + ppf, n_parts_total))
    for p in parts:
        lo = p * block_size
        hi = min(lo + block_size, n_rows)
        size = hi - lo
        if size <= 0:
            continue
        post = p >= drift_part
        lang_w = lang_w_post if post else lang_w_pre
        host_w = host_w_post if post else host_w_pre

        hosts = rng.choice(len(_HOSTS), size=size, p=host_w)
        path_ids = rng.integers(0, 1 << 32, size=size)
        urls = [f"https://{_HOSTS[h]}/p/{pid:08x}" for h, pid in zip(hosts, path_ids)]
        langs = [VALID_LANGS[i] for i in rng.choice(len(VALID_LANGS), size=size, p=lang_w)]

        win_lo = TS_LO + (TS_HI - TS_LO) * p // max(1, n_parts_total)
        win_hi = TS_LO + (TS_HI - TS_LO) * (p + 1) // max(1, n_parts_total)
        ts = rng.integers(win_lo, max(win_lo + 1, win_hi), size=size)

        row_index = np.arange(lo, hi, dtype=np.int64)

        dup_pos_set: set[int] = set()
        n_dup = rng.binomial(size, params["dup_frac"])
        if n_dup > 0 and file_urls:
            dup_pos = rng.choice(size, size=n_dup, replace=False)
            for dp in dup_pos:
                src = file_urls[int(rng.integers(0, len(file_urls)))]
                urls[int(dp)] = src
                dup_rows.append((lo + int(dp), src))
                dup_pos_set.add(int(dp))

        n_bad_host = rng.binomial(size, params["orphan_host_frac"])
        if n_bad_host > 0:
            pos = [int(p) for p in rng.choice(size, size=n_bad_host, replace=False)
                   if int(p) not in dup_pos_set]
            for bp in pos:
                urls[bp] = f"https://unregistered{bp % 7}.bad/p/{lo + bp:08x}"
                orphan_host_rows.append(lo + bp)

        n_out = rng.binomial(size, params["ts_outlier_frac"])
        if n_out > 0:
            out_pos = rng.choice(size, size=n_out, replace=False)
            for op in out_pos:
                ts[int(op)] = TS_LO - np.int64(86_400_000_000) * int(rng.integers(1, 365))
                ts_outlier_rows.append(lo + int(op))

        n_orp = rng.binomial(size, params["orphan_lang_frac"])
        if n_orp > 0:
            orp_pos = rng.choice(size, size=n_orp, replace=False)
            for op in orp_pos:
                langs[int(op)] = "xx"
                orphan_rows.append(lo + int(op))

        texts = [_text_for(u, seed) for u in urls]
        null_text = rng.random(size) < params["null_text_frac"]
        null_html = rng.random(size) < params["null_html_frac"]
        html_sizes = np.exp(
            rng.normal(params["html_mu"], params["html_sigma"], size=size)
        ).astype(np.int64)

        html_vals: list[bytes | None] = []
        text_vals: list[str | None] = []
        for i in range(size):
            t = texts[i]
            if null_text[i]:
                text_vals.append(None)
            else:
                text_vals.append(t)
                exp_urls.append(urls[i])
                exp_md5.append(hashlib.md5(t.encode()).hexdigest())
            if null_html[i]:
                html_vals.append(None)
            else:
                pad = int(html_sizes[i])
                if (lo + i) % params["giant_html_every"] == 0:
                    pad = params["giant_html_bytes"]
                filler = b"<div>" + b"x" * max(0, pad) + b"</div>"
                html_vals.append(
                    b"<html><body><p>" + t.encode() + b"</p>" + filler + b"</body></html>"
                )

        file_urls.extend(urls)
        writer.write_table(
            pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": pa.array(ts, pa.timestamp("us")),
                    "html": pa.array(html_vals, pa.binary()),
                    "text": pa.array(text_vals, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                    "row_index": pa.array(row_index, pa.int64()),
                }
            )
        )
    writer.close()

    from webvalid.checks.text_parity import pair_fingerprints
    from webvalid.sketches import hash64

    url_hash = hash64(np.array(exp_urls, dtype=object)) if exp_urls else np.empty(0, np.uint64)
    pair_hash = pair_fingerprints(url_hash, exp_md5)
    return {
        "path": path,
        "dup_rows": dup_rows,
        "ts_outlier_rows": ts_outlier_rows,
        "orphan_lang_rows": orphan_rows,
        "orphan_host_rows": orphan_host_rows,
        "exp_urls": exp_urls,
        "exp_md5": exp_md5,
        "url_hash": url_hash,
        "pair_hash": pair_hash,
    }


def _table_schema() -> pa.Schema:
    return pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
            pa.field("row_index", pa.int64()),
        ]
    )


def generate_webpages(
    out_dir: str,
    n_rows: int = 10_000,
    block_size: int = 1_000,
    seed: int = 7,
    drift_at: float = 0.6,
    dup_frac: float = 0.001,
    null_html_frac: float = 0.01,
    null_text_frac: float = 0.02,
    ts_outlier_frac: float = 0.0005,
    orphan_lang_frac: float = 0.0002,
    orphan_host_frac: float = 0.0,
    partitions_per_file: int = 4,
    giant_html_every: int = 7_001,
    giant_html_bytes: int = 1 << 20,
    html_mu: float = 6.0,
    html_sigma: float = 1.0,
    use_ray: bool = False,
    text_hash_strings: bool = True,
) -> dict:
    """Write the webpages fixture; returns paths + expected-violation rows.

    `use_ray=True` fans file generation out as Ray tasks (file content
    is identical to the sequential path). `text_hash_strings=False`
    writes only the uint64 hash columns to text_hashes.parquet —
    recommended for multi-million-row fixtures.
    """
    os.makedirs(out_dir, exist_ok=True)
    pages_dir = os.path.join(out_dir, "webpages")
    os.makedirs(pages_dir, exist_ok=True)

    n_parts = (n_rows + block_size - 1) // block_size
    drift_part = int(n_parts * drift_at)
    params = {
        "seed": seed,
        "block_size": block_size,
        "n_rows": n_rows,
        "drift_part": drift_part,
        "partitions_per_file": partitions_per_file,
        "dup_frac": dup_frac,
        "null_html_frac": null_html_frac,
        "null_text_frac": null_text_frac,
        "ts_outlier_frac": ts_outlier_frac,
        "orphan_lang_frac": orphan_lang_frac,
        "orphan_host_frac": orphan_host_frac,
        "giant_html_every": giant_html_every,
        "giant_html_bytes": giant_html_bytes,
        "html_mu": html_mu,
        "html_sigma": html_sigma,
    }

    file_specs = [
        (k, k * partitions_per_file, os.path.join(pages_dir, f"part-{k:05d}.parquet"))
        for k in range((n_parts + partitions_per_file - 1) // partitions_per_file)
    ]

    if use_ray:
        import ray

        gen_task = ray.remote(_gen_file)
        results = ray.get(
            [gen_task.remote(k, plo, n_parts, path, params)
             for k, plo, path in file_specs]
        )
    else:
        results = [
            _gen_file(k, plo, n_parts, path, params) for k, plo, path in file_specs
        ]

    dup_rows = [d for r in results for d in r["dup_rows"]]
    ts_outlier_rows = sorted(t for r in results for t in r["ts_outlier_rows"])
    orphan_rows = sorted(o for r in results for o in r["orphan_lang_rows"])
    orphan_host_rows = sorted(o for r in results for o in r["orphan_host_rows"])

    # Reference key tables (F2)
    ref_langs = pa.table(
        {
            "lang": pa.array(list(VALID_LANGS), pa.string()),
            "lang_name": pa.array([f"name_{l}" for l in VALID_LANGS], pa.string()),
        }
    )
    pq.write_table(ref_langs, os.path.join(out_dir, "ref_langs.parquet"))
    ref_hosts = pa.table(
        {
            "host": pa.array(_HOSTS, pa.string()),
            "registrar": pa.array([f"reg_{i % 5}" for i in range(len(_HOSTS))], pa.string()),
        }
    )
    pq.write_table(ref_hosts, os.path.join(out_dir, "ref_hosts.parquet"))

    # Expected text hashes: duplicated urls appear once per occurrence but
    # share identical (url, md5) pairs, so de-dup via np.unique on hashes.
    url_hash = np.sort(np.concatenate([r["url_hash"] for r in results]))
    pair_hash = np.sort(np.concatenate([r["pair_hash"] for r in results]))
    url_hash = np.unique(url_hash)
    pair_hash = np.unique(pair_hash)
    cols: dict = {
        "url_hash": pa.array(url_hash, pa.uint64()),
        "pair_hash": pa.array(pair_hash, pa.uint64()),
    }
    if text_hash_strings:
        from webvalid.checks.text_parity import pair_fingerprints
        from webvalid.sketches import hash64

        seen: dict[str, str] = {}
        for r in results:
            for u, m in zip(r["exp_urls"], r["exp_md5"]):
                seen[u] = m
        th_urls = sorted(seen)
        th_md5 = [seen[u] for u in th_urls]
        uh = hash64(np.array(th_urls, dtype=object)) if th_urls else np.empty(0, np.uint64)
        # string columns sorted by url; hash columns sorted by hash value —
        # consumers use one family or the other, never positionally both
        cols = {
            "url": pa.array(th_urls, pa.string()),
            "text_md5": pa.array(th_md5, pa.string()),
            "url_hash": pa.array(np.sort(uh), pa.uint64()),
            "pair_hash": pa.array(
                np.sort(pair_fingerprints(uh, th_md5)), pa.uint64()
            ),
        }
    pq.write_table(pa.table(cols), os.path.join(out_dir, "text_hashes.parquet"))

    return {
        "pages_dir": pages_dir,
        "files": [path for _, _, path in file_specs],
        "ref_langs": os.path.join(out_dir, "ref_langs.parquet"),
        "ref_hosts": os.path.join(out_dir, "ref_hosts.parquet"),
        "text_hashes": os.path.join(out_dir, "text_hashes.parquet"),
        "n_rows": n_rows,
        "block_size": block_size,
        "n_partitions": n_parts,
        "drift_partition": drift_part,
        "dup_rows": dup_rows,
        "ts_outlier_rows": ts_outlier_rows,
        "orphan_lang_rows": orphan_rows,
        "orphan_host_rows": orphan_host_rows,
        "ts_window": (int(TS_LO), int(TS_HI)),
        "seed": seed,
    }
