"""Run-to-run determinism sweep over every `__ray_entry__.queries()`
callable: execute each query TWICE in one Ray session and require the
canonicalized results to be identical.

Why: the driver's correctness gate compares one engine run against
DuckDB. A query that is nondeterministic across runs (block arrival
order leaking into sampling, centroid fitting, tie-breaking, fold
order) can pass the replica today and redden a driver row tomorrow —
exactly how `similarity_ivf_checked_embeddings` failed at sf0.1
(round 5): `random_sample`'s row ORDER is block-arrival order, and
k-means init drew positional indices from it.

Usage:
    python tools/check_determinism.py [sf_dir] [query ...]
"""

from __future__ import annotations

import logging
import os
import sys

logging.getLogger("ray.data").setLevel(logging.ERROR)
# importable from any cwd: repo root (for __ray_entry__) + tools/
# (for check_oracles), derived from this file's location. PYTHONPATH
# too — Ray WORKER processes import webvalid via the environment, not
# the driver's sys.path (must be set before ray.init).
_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)
sys.path.insert(0, _HERE)
os.environ["PYTHONPATH"] = _ROOT + os.pathsep + \
    os.environ.get("PYTHONPATH", "")


def canon(obj):
    """Order-insensitive canonical form — the SAME canonicalization the
    oracle checker uses (imported, not copied: the two tools must
    agree on what 'identical results' means), plus a Dataset →
    DataFrame unwrap."""
    import pandas as pd

    from check_oracles import canon as oracle_canon

    if hasattr(obj, "to_pandas"):
        try:
            df = obj.to_pandas()
        except Exception:
            df = pd.DataFrame(obj.take_all())
    else:
        df = obj
    return oracle_canon(df)


def main() -> None:
    import pandas as pd
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level=logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            a, b = canon(fn(sf_dir)), canon(fn(sf_dir))
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"ERR  {name}: {type(e).__name__}: {e}", flush=True)
            n_fail += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns differ {list(a.columns)} vs "
                  f"{list(b.columns)}", flush=True)
            n_fail += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows differ {len(a)} vs {len(b)}",
                  flush=True)
            n_fail += 1
        else:
            diff_cols = [c for c in a.columns
                         if not a[c].equals(b[c])
                         and not (pd.api.types.is_float_dtype(a[c])
                                  and pd.api.types.is_float_dtype(b[c])
                                  and ((a[c].isna() == b[c].isna()).all()
                                       and (a[c].fillna(0.0)
                                            == b[c].fillna(0.0)).all()))]
            if diff_cols:
                print(f"FAIL {name}: values differ in {diff_cols}",
                      flush=True)
                n_fail += 1
            else:
                print(f"ok   {name}: {len(a)} rows identical across runs",
                      flush=True)
    print(f"determinism sweep done: {n_fail} failures", flush=True)
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
