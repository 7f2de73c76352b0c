"""Local replica of the driver's correctness gate.

Runs every `__ray_entry__.queries()` callable at the given sf dir and
compares row count, column set, and order-insensitive values against
`oracle_sql()` via DuckDB. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import logging
import sys

logging.getLogger("ray.data").setLevel(logging.ERROR)


def canon(df):
    import pandas as pd

    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name, got, exp) -> list[str]:
    problems = []
    if len(got) != len(exp):
        problems.append(f"rows {len(got)} != {len(exp)}")
    if set(got.columns) != set(exp.columns):
        problems.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        return problems
    g, e = canon(got), canon(exp)
    if len(g) == len(e):
        import numpy as np
        import pandas as pd

        for c in g.columns:
            gv, ev = g[c], e[c]
            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
                # dtype-strict: an integer oracle column arriving float
                # (int64 upcast through a null-filled pandas group) passes
                # allclose locally but fails the driver's value hash
                # (5.0 vs 5) — CORRECTNESS_r03's asof red row. Flag it.
                if (pd.api.types.is_integer_dtype(ev)
                        and pd.api.types.is_float_dtype(gv)):
                    problems.append(
                        f"col {c}: dtype drift — oracle int "
                        f"({ev.dtype}) but engine float ({gv.dtype}); "
                        "driver hash would mismatch")
                    continue
                if (pd.api.types.is_integer_dtype(gv)
                        and pd.api.types.is_float_dtype(ev)):
                    problems.append(
                        f"col {c}: dtype drift — oracle float "
                        f"({ev.dtype}) but engine int ({gv.dtype}); "
                        "driver hash would mismatch")
                    continue
                ok = np.allclose(
                    gv.astype(float), ev.astype(float), rtol=0, atol=0, equal_nan=True
                )
            else:
                ok = gv.astype(str).equals(ev.astype(str))
            if not ok:
                mism = (gv.astype(str) != ev.astype(str)).to_numpy().nonzero()[0][:3]
                problems.append(f"col {c} differs at rows {list(mism)}: "
                                f"got {gv.iloc[mism].tolist()} exp {ev.iloc[mism].tolist()}")
    return problems


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            got = fn(sf_dir)
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        exp = con.sql(oracles[name]).df()
        problems = compare(name, got, exp)
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + " | ".join(problems))
            failures += 1
        else:
            print(f"PASS {name}: {len(got)} rows match oracle ({dt:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
