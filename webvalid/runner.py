"""CLI entry point: generate fixtures, run/resume validation, bench.

Usage (the only module that owns a Ray session besides bench.py/tests):

    python -m webvalid.runner generate --out /tmp/fix --rows 100000 --block-size 1000
    python -m webvalid.runner run --pages /tmp/fix/webpages --out /tmp/out \
        --ref-langs /tmp/fix/ref_langs.parquet --text-hashes /tmp/fix/text_hashes.parquet
    python -m webvalid.runner run ... # again: resumes from checkpoints
    python -m webvalid.runner report --out /tmp/out

`run` is `ray job submit`-able: on a real cluster submit this module as
the job entrypoint; locally it initialises a local session.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        logging.getLogger("ray.data").setLevel(logging.ERROR)
        kwargs = dict(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_generate(args) -> int:
    from webvalid.gen import generate_webpages

    info = generate_webpages(
        args.out, n_rows=args.rows, block_size=args.block_size, seed=args.seed
    )
    print(json.dumps({k: v for k, v in info.items()
                      if k not in ("dup_rows", "files")}, default=str))
    return 0


def cmd_run(args) -> int:
    ray = _init_ray(args.num_cpus)
    from webvalid.checks.base import CheckConfig
    from webvalid.pipeline import run_validation

    cfg = CheckConfig(block_size=args.block_size)
    if args.ts_lo is not None and args.ts_hi is not None:
        cfg.ts_range = (args.ts_lo, args.ts_hi)
    res = run_validation(
        args.pages, args.out, cfg=cfg,
        ref_langs=args.ref_langs, ref_hosts=args.ref_hosts,
        text_hashes=args.text_hashes,
        files_per_group=args.files_per_group,
        max_groups=args.max_groups,
    )
    r = res["report"]
    print(json.dumps({k: r[k] for k in
                      ("complete", "rows", "rows_per_sec", "n_partitions",
                       "n_verdicts", "n_violations", "timings")}))
    ray.shutdown()
    return 0 if r["complete"] else 3


def cmd_report(args) -> int:
    path = os.path.join(args.out, "report.json")
    with open(path) as f:
        print(f.read())
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="webvalid")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="write a seeded synthetic webpages fixture")
    g.add_argument("--out", required=True)
    g.add_argument("--rows", type=int, default=100_000)
    g.add_argument("--block-size", type=int, default=1_000)
    g.add_argument("--seed", type=int, default=7)
    g.set_defaults(fn=cmd_generate)

    r = sub.add_parser("run", help="run (or resume) the validation suite")
    r.add_argument("--pages", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--block-size", type=int, default=1_000)
    r.add_argument("--ref-langs")
    r.add_argument("--ref-hosts")
    r.add_argument("--text-hashes")
    r.add_argument("--ts-lo", type=int)
    r.add_argument("--ts-hi", type=int)
    r.add_argument("--files-per-group", type=int, default=8)
    r.add_argument("--max-groups", type=int)
    r.add_argument("--num-cpus", type=int)
    r.set_defaults(fn=cmd_run)

    rep = sub.add_parser("report", help="print the last run report")
    rep.add_argument("--out", required=True)
    rep.set_defaults(fn=cmd_report)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
