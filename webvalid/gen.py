"""Deterministic synthetic web-pages generator (FIXTURES.md F1/F2).

Seeded, reproducible generation of a Common-Crawl-style Parquet table
with planted violations and a planted distribution drift, plus the
small reference key tables for the referential-integrity checks and an
expected-violations table for tests.

Planted features (all row sets recorded in `expected_violations`):
- duplicate urls (~dup_frac of rows copy an earlier row's url — and
  therefore its text, keeping "byte-identical text per url" true);
- null html (~1%) and null text (~2%);
- warc_ts values outside the nominal 30-day crawl window (~0.05%);
- orphan lang codes ("xx") violating the lang reference table (~0.02%);
- a lang/host distribution shift starting at partition `drift_at`
  (drift detectors must flag it);
- a log-normal html size distribution with occasional giant rows.

`text` is a pure function of (url, seed) so the byte-identical-text
invariant is checkable; duplicated urls automatically share text.

The generator is driver-side, pure pyarrow/NumPy (no Ray session), and
writes one Parquet file per `partitions_per_file` logical partitions so
reads parallelize and resume tests can address file subsets.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from webvalid.schema import VALID_LANGS, WEBPAGES_SCHEMA

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
    partitions_per_file: int = 4,
    giant_html_every: int = 7_001,
) -> dict:
    """Write the webpages fixture; returns paths + expected-violation row sets."""
    os.makedirs(out_dir, exist_ok=True)
    pages_dir = os.path.join(out_dir, "webpages")
    os.makedirs(pages_dir, exist_ok=True)

    rng = np.random.default_rng(seed)
    n_parts = (n_rows + block_size - 1) // block_size
    drift_part = int(n_parts * drift_at)

    lang_w_pre = _zipf_weights(len(VALID_LANGS), 1.6)
    lang_w_post = _zipf_weights(len(VALID_LANGS), 1.1, rotate=3)
    host_w_pre = _zipf_weights(len(_HOSTS), 1.3)
    host_w_post = _zipf_weights(len(_HOSTS), 1.0, rotate=11)

    dup_rows: list[tuple[int, str]] = []  # (row_index, url)
    ts_outlier_rows: list[int] = []
    orphan_rows: list[int] = []

    all_urls: list[str] = []
    file_paths: list[str] = []
    writer = None
    writer_path = None

    expected_text_hash: dict[str, str] = {}

    for p in range(n_parts):
        lo = p * block_size
        hi = min(lo + block_size, n_rows)
        size = hi - lo
        post = p >= drift_part
        lang_w = lang_w_post if post else lang_w_pre
        host_w = host_w_post if post else host_w_pre

        hosts = rng.choice(len(_HOSTS), size=size, p=host_w)
        path_ids = rng.integers(0, 1 << 32, size=size)
        urls = [f"https://{_HOSTS[h]}/p/{pid:08x}" for h, pid in zip(hosts, path_ids)]

        langs = [VALID_LANGS[i] for i in rng.choice(len(VALID_LANGS), size=size, p=lang_w)]

        ts = rng.integers(TS_LO, TS_HI, size=size)
        # keep ts loosely monotone-ish across partitions: narrow per-partition window
        win_lo = TS_LO + (TS_HI - TS_LO) * p // max(1, n_parts)
        win_hi = TS_LO + (TS_HI - TS_LO) * (p + 1) // max(1, n_parts)
        ts = rng.integers(win_lo, max(win_lo + 1, win_hi), size=size)

        row_index = np.arange(lo, hi, dtype=np.int64)

        # plant duplicates: copy an earlier url of this run
        n_dup = rng.binomial(size, dup_frac)
        if n_dup > 0 and all_urls:
            dup_pos = rng.choice(size, size=n_dup, replace=False)
            for dp in dup_pos:
                src = all_urls[int(rng.integers(0, len(all_urls)))]
                urls[int(dp)] = src
                dup_rows.append((lo + int(dp), src))

        # plant ts outliers
        n_out = rng.binomial(size, ts_outlier_frac)
        if n_out > 0:
            out_pos = rng.choice(size, size=n_out, replace=False)
            for op in out_pos:
                ts[int(op)] = TS_LO - np.int64(86_400_000_000) * int(rng.integers(1, 365))
                ts_outlier_rows.append(lo + int(op))

        # plant orphan langs
        n_orp = rng.binomial(size, orphan_lang_frac)
        if n_orp > 0:
            orp_pos = rng.choice(size, size=n_orp, replace=False)
            for op in orp_pos:
                langs[int(op)] = "xx"
                orphan_rows.append(lo + int(op))

        texts = [_text_for(u, seed) for u in urls]
        null_text = rng.random(size) < null_text_frac
        null_html = rng.random(size) < null_html_frac
        html_sizes = np.exp(rng.normal(6.0, 1.0, size=size)).astype(np.int64)

        html_vals: list[bytes | None] = []
        text_vals: list[str | None] = []
        for i in range(size):
            t = texts[i]
            if null_text[i]:
                text_vals.append(None)
            else:
                text_vals.append(t)
                expected_text_hash[urls[i]] = hashlib.md5(t.encode()).hexdigest()
            if null_html[i]:
                html_vals.append(None)
            else:
                body = t.encode()
                pad = int(html_sizes[i])
                if (lo + i) % giant_html_every == 0:
                    pad = 1 << 20  # planted ~1 MiB giant row
                filler = (b"<div>" + b"x" * max(0, pad) + b"</div>")
                html_vals.append(b"<html><body><p>" + body + b"</p>" + filler + b"</body></html>")

        all_urls.extend(urls)

        table = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(html_vals, pa.binary()),
                "text": pa.array(text_vals, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "row_index": pa.array(row_index, pa.int64()),
            }
        )

        file_idx = p // partitions_per_file
        path = os.path.join(pages_dir, f"part-{file_idx:05d}.parquet")
        if writer_path != path:
            if writer is not None:
                writer.close()
            writer = pq.ParquetWriter(path, table.schema)
            writer_path = path
            file_paths.append(path)
        writer.write_table(table)
    if writer is not None:
        writer.close()

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

    # Expected text hashes (byte-identical-text-per-url invariant)
    th_urls = sorted(expected_text_hash)
    pq.write_table(
        pa.table(
            {
                "url": pa.array(th_urls, pa.string()),
                "text_md5": pa.array([expected_text_hash[u] for u in th_urls], pa.string()),
            }
        ),
        os.path.join(out_dir, "text_hashes.parquet"),
    )

    return {
        "pages_dir": pages_dir,
        "files": file_paths,
        "ref_langs": os.path.join(out_dir, "ref_langs.parquet"),
        "ref_hosts": os.path.join(out_dir, "ref_hosts.parquet"),
        "text_hashes": os.path.join(out_dir, "text_hashes.parquet"),
        "n_rows": n_rows,
        "block_size": block_size,
        "n_partitions": n_parts,
        "drift_partition": drift_part,
        "dup_rows": dup_rows,
        "ts_outlier_rows": sorted(ts_outlier_rows),
        "orphan_lang_rows": sorted(orphan_rows),
        "ts_window": (int(TS_LO), int(TS_HI)),
        "seed": seed,
    }
