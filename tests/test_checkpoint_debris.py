"""Crash-debris resume: an uncommitted checkpoint group (data written,
manifest missing — i.e. the process died mid-write) must be wiped and
recomputed, yielding results identical to a clean run."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webvalid import checkpoint as ckpt
from webvalid.checks.base import CheckConfig
from webvalid.gen import generate_webpages

BLOCK = 400


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    d = tmp_path_factory.mktemp("debris_fix")
    return generate_webpages(str(d), n_rows=3200, block_size=BLOCK, seed=13)


def test_uncommitted_group_debris_is_recomputed(ray_session, fix, tmp_path_factory):
    from webvalid.pipeline import run_validation

    kwargs = dict(
        cfg=CheckConfig(block_size=BLOCK, ts_range=fix["ts_window"]),
        ref_langs=fix["ref_langs"], text_hashes=fix["text_hashes"],
        files_per_group=1,
    )
    clean_out = tmp_path_factory.mktemp("clean")
    clean = run_validation(fix["pages_dir"], str(clean_out), **kwargs)

    # simulate a crash: group 0 has a data dir with garbage but NO manifest
    crash_out = tmp_path_factory.mktemp("crash")
    ckpt_dir = os.path.join(str(crash_out), "checkpoints")
    debris = ckpt.data_dir(ckpt_dir, 0)
    os.makedirs(debris)
    pq.write_table(pa.table({"junk": pa.array([1, 2, 3])}),
                   os.path.join(debris, "partial.parquet"))
    assert not ckpt.is_done(ckpt_dir, 0)

    res = run_validation(fix["pages_dir"], str(crash_out), **kwargs)
    assert res["report"]["complete"]
    # debris was replaced by real partials + a manifest
    assert ckpt.is_done(ckpt_dir, 0)

    def canon(df):
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    for key in ("verdicts", "segments"):
        a = canon(clean[key].drop(columns=["detail"], errors="ignore"))
        b = canon(res[key].drop(columns=["detail"], errors="ignore"))
        assert a.equals(b), key


def test_map_stage_survives_worker_death(ray_session, tmp_path):
    """Ray's lineage-based retry must transparently recover a map task
    whose worker process DIES mid-stage (the cluster reality the
    resumable design assumes underneath the checkpoint layer)."""
    import os

    import pyarrow as pa
    import ray.data

    marker = str(tmp_path / "died_once")

    def poison(t: pa.Table) -> pa.Table:
        # first execution anywhere kills its worker; the retry (and
        # every other task) proceeds
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("x")
            os._exit(1)
        return t

    ds = ray.data.range(10_000, override_num_blocks=8).map_batches(
        poison, batch_format="pyarrow"
    )
    total = ds.sum("id")
    assert total == sum(range(10_000))
    assert os.path.exists(marker)
