"""Per-group checkpoint layout: atomic manifests + resume filtering.

Resumable-output design (SURVEY.md §4.2): input files are processed in
groups; each group's partial-state pass writes its (tiny) partials as
Parquet under `checkpoints/group-K/data/` and then commits a
`manifest.json` via write-to-temp + `os.rename` (atomic on POSIX). A
re-run skips committed groups and deletes/redoes uncommitted debris, so
the heavy input scan never repeats finished work; the cheap global
folds re-run from checkpointed partials. Manifests carry lineage
(files, rows, wall seconds, rows/s) surfaced in the run report.
"""

from __future__ import annotations

import json
import os
import shutil
import time

# Partial-data layout version. Bump whenever the union-schema partial
# format changes semantically (v2 added the mergeable "viocount" rows
# that referential/parity/ts verdicts are computed FROM — resuming
# from v1 partials would silently report all-pass for those checks).
# Groups committed under another version are treated as NOT done and
# reprocessed.
FORMAT_VERSION = 2


def group_dir(ckpt_dir: str, gid: int) -> str:
    return os.path.join(ckpt_dir, f"group-{gid:05d}")


def manifest_path(ckpt_dir: str, gid: int) -> str:
    return os.path.join(group_dir(ckpt_dir, gid), "manifest.json")


def is_done(ckpt_dir: str, gid: int) -> bool:
    p = manifest_path(ckpt_dir, gid)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return m.get("format_version") == FORMAT_VERSION


def read_manifest(ckpt_dir: str, gid: int) -> dict:
    with open(manifest_path(ckpt_dir, gid)) as f:
        return json.load(f)


def reset_group(ckpt_dir: str, gid: int) -> None:
    """Remove uncommitted debris from a crashed attempt."""
    d = group_dir(ckpt_dir, gid)
    if os.path.exists(d):
        shutil.rmtree(d)


def commit_group(ckpt_dir: str, gid: int, files: list[str], rows: int,
                 wall_sec: float) -> dict:
    m = {
        "format_version": FORMAT_VERSION,
        "group": gid,
        "files": files,
        "rows": rows,
        "wall_sec": wall_sec,
        "rows_per_sec": rows / wall_sec if wall_sec > 0 else None,
        "committed_at": time.time(),
    }
    path = manifest_path(ckpt_dir, gid)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.rename(tmp, path)
    return m


def data_dir(ckpt_dir: str, gid: int) -> str:
    return os.path.join(group_dir(ckpt_dir, gid), "data")
