"""Recompute round-vs-round per-query bench ratios from two committed
BENCH_DETAIL-style JSON files, so BASELINE.md narrative numbers are
regenerable from on-disk artifacts (VERDICT r4 "What's wrong" #1).

Usage:
    python tools/bench_ratios.py OLD.json NEW.json

Prints one JSON line:
    {"shared_queries": N, "median_ratio_new_over_old": r,
     "old_queries_total_sec": s, "new_queries_total_sec": s,
     "old_suite_sec": s, "new_suite_sec": s, ...}

plus (to stderr) the 5 biggest regressions and improvements.
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    qo, qn = old.get("queries") or {}, new.get("queries") or {}
    # a driver-truncated detail line parses with null per-query values —
    # drop non-numeric entries on BOTH sides instead of dying on them
    num = lambda v: isinstance(v, (int, float)) and not isinstance(v, bool)
    qo = {q: v for q, v in qo.items() if num(v)}
    qn = {q: v for q, v in qn.items() if num(v)}
    shared = sorted(set(qo) & set(qn))
    ratios = {q: qn[q] / qo[q] for q in shared if qo[q] > 0}
    med = statistics.median(ratios.values()) if ratios else None
    out = {
        "old": sys.argv[1],
        "new": sys.argv[2],
        "shared_queries": len(shared),
        "median_ratio_new_over_old": round(med, 3) if med else None,
        "old_queries_total_sec": round(sum(qo[q] for q in shared), 1),
        "new_queries_total_sec": round(sum(qn[q] for q in shared), 1),
        "old_suite_sec": old.get("value"),
        "new_suite_sec": new.get("value"),
        "old_suite_warm_sec": old.get("value_warm"),
        "new_suite_warm_sec": new.get("value_warm"),
        "old_membw_pre": old.get("membw_gbps_pre"),
        "new_membw_pre": new.get("membw_gbps_pre"),
    }
    print(json.dumps(out, separators=(",", ":")))
    ranked = sorted(ratios.items(), key=lambda kv: kv[1])
    for tag, rows in (("fastest (new/old)", ranked[:5]),
                      ("slowest (new/old)", ranked[-5:])):
        print(f"# {tag}:", file=sys.stderr)
        for q, r in rows:
            print(f"#   {q}: {r:.2f}x ({qo[q]}s -> {qn[q]}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
