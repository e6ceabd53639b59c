"""Longitudinal bench diff — flag regressions between round records.

VERDICT r4 Next #7: BENCH_r{n}.json metrics drifted across rounds with no
ledger. This tool diffs consecutive (or chosen) round records key-by-key
and flags drops beyond a threshold.

Usage:
    python bench_compare.py                 # latest two BENCH_r*.json
    python bench_compare.py 3 4             # compare r3 vs r4
    python bench_compare.py --threshold 15  # % drop to flag

Exit code 1 when any higher-is-better metric dropped more than the
threshold (useful as a CI-style gate). Error-type metrics (*_err, *_ate_m)
are treated as lower-is-better.
"""

import argparse
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# metrics where LOWER is better
_LOWER_BETTER = re.compile(r"(_err|_ate_m|_tree_build_s|_ms)$")
# non-metric keys to skip
_SKIP = {"batch_size", "n_points", "iters", "backend", "cpp_iters",
         "odometry_batched_B", "scan2map_batched_B", "odometry_map_points"}


def _load(n):
    path = os.path.join(HERE, f"BENCH_r{n:02d}.json")
    if not os.path.exists(path):
        path = os.path.join(HERE, f"BENCH_r{n}.json")
    with open(path) as f:
        rec = json.load(f)
    parsed = rec.get("parsed") or {}
    flat = {"value": parsed.get("value")}
    for k, v in (parsed.get("extra") or {}).items():
        if isinstance(v, (int, float)) and k not in _SKIP:
            flat[k] = v
        elif isinstance(v, dict):
            for kk, vv in v.items():
                if isinstance(vv, (int, float)):
                    flat[f"{k}.{kk}"] = vv
    return flat


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("rounds", nargs="*", type=int,
                    help="two round numbers (default: latest two)")
    ap.add_argument("--threshold", type=float, default=10.0,
                    help="%% regression to flag (default 10)")
    args = ap.parse_args(argv)

    if len(args.rounds) == 2:
        a, b = args.rounds
    else:
        ns = sorted(
            int(m.group(1))
            for p in glob.glob(os.path.join(HERE, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        )
        if len(ns) < 2:
            print("need at least two BENCH_r*.json records")
            return 0
        a, b = ns[-2], ns[-1]

    prev, cur = _load(a), _load(b)
    print(f"BENCH r{a} -> r{b}  (flagging drops > {args.threshold:.0f}%)")
    print(f"{'metric':44s} {'r' + str(a):>12s} {'r' + str(b):>12s} {'delta':>9s}")
    regressions = []
    for k in sorted(set(prev) & set(cur)):
        p, c = prev[k], cur[k]
        if not p:
            continue
        pct = (c - p) / abs(p) * 100.0
        lower_better = bool(_LOWER_BETTER.search(k))
        bad = (-pct if not lower_better else pct) > args.threshold
        mark = "  <-- REGRESSION" if bad else ""
        print(f"{k:44s} {p:12.4g} {c:12.4g} {pct:+8.1f}%{mark}")
        if bad:
            regressions.append((k, pct))
    only_prev = set(prev) - set(cur)
    only_cur = set(cur) - set(prev)
    if only_prev:
        print("dropped metrics:", ", ".join(sorted(only_prev)))
    if only_cur:
        print("new metrics:", ", ".join(sorted(only_cur)))
    if regressions:
        print(f"\n{len(regressions)} regression(s) flagged.")
        return 1
    print("\nno regressions beyond threshold.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
