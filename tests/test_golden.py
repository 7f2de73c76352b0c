"""Golden end-to-end run (SURVEY.md §5.2.5): the full suite on a fixed
seeded fixture must reproduce the committed verdicts/segments exactly.

Regenerate after intentional behavior changes with:
    WEBVALID_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
and commit the files under tests/golden/.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
N_ROWS = 4_000
BLOCK = 400
SEED = 31


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype == float:
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def golden_run(ray_session, tmp_path_factory):
    from webvalid.checks.base import CheckConfig
    from webvalid.gen import generate_webpages
    from webvalid.pipeline import run_validation

    d = tmp_path_factory.mktemp("golden_fix")
    info = generate_webpages(str(d), n_rows=N_ROWS, block_size=BLOCK, seed=SEED,
                             dup_frac=0.003, orphan_lang_frac=0.002,
                             ts_outlier_frac=0.002)
    out = tmp_path_factory.mktemp("golden_out")
    cfg = CheckConfig(block_size=BLOCK, ts_range=info["ts_window"])
    return run_validation(
        info["pages_dir"], str(out), cfg=cfg,
        ref_langs=info["ref_langs"], text_hashes=info["text_hashes"],
    )


@pytest.mark.parametrize("table", ["verdicts", "segments", "violations"])
def test_golden(golden_run, table):
    got = golden_run[table]
    if table == "verdicts":
        # file-level schema verdicts carry tmp paths in detail — strip
        got = got.copy()
        got.loc[got["check"] == "schema", "detail"] = "file"
    if table == "violations":
        got = got[["partition_id", "check", "url", "reason"]]
    got = _canon(got)

    path = os.path.join(GOLDEN_DIR, f"{table}.parquet")
    if os.environ.get("WEBVALID_REGEN_GOLDEN") or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(got, preserve_index=False), path)
        if not os.environ.get("WEBVALID_REGEN_GOLDEN"):
            pytest.skip(f"golden {table} created; commit tests/golden/ and re-run")
        return

    expected = _canon(pq.read_table(path).to_pandas())
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
