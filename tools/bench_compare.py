#!/usr/bin/env python3
"""Round-over-round bench comparison (builder-side analysis tool).
Usage: python3 tools/bench_compare.py bench_runs/r8 bench_runs/r9
Per query: best-of across the new round's archived runs vs the median
of the prior round's runs; flags regressions under the repo's gate
(ratio > 1.5 AND new best > 0.3 s).
"""
import sys, json, glob, statistics

def load(dirname):
    per = {}
    for p in sorted(glob.glob(f"{dirname}/bench_*.json")):
        d = json.load(open(p))
        q = d.get("queries") or d.get("parsed", {}).get("queries") or {}
        for k, v in q.items():
            if isinstance(v, (int, float)) and v > 0:
                per.setdefault(k, []).append(v)
    return per

def main(old_dir, new_dir):
    old, new = load(old_dir), load(new_dir)
    common = sorted(set(old) & set(new))
    fresh = sorted(set(new) - set(old))
    gone = sorted(set(old) - set(new))
    tot_old = sum(statistics.median(old[k]) for k in common)
    tot_new = sum(min(new[k]) for k in common)
    print(f"common entries: {len(common)}")
    print(f"total (common): new best-of {tot_new:.1f}s vs old median {tot_old:.1f}s"
          f" = {tot_new/tot_old:.2f}x")
    regs = []
    for k in common:
        o, n = statistics.median(old[k]), min(new[k])
        if n > 1.5 * o and n > 0.3:
            regs.append((n / o, k, o, n))
    if regs:
        print("REGRESSIONS (>1.5x and >0.3s):")
        for r, k, o, n in sorted(regs, reverse=True):
            print(f"  {k}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    else:
        print("regression table: EMPTY")
    if fresh:
        t = sum(min(new[k]) for k in fresh)
        print(f"new entries ({len(fresh)}, {t:.1f}s best-of): {', '.join(fresh)}")
    if gone:
        print(f"dropped entries: {', '.join(gone)}")
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
