#!/usr/bin/env python3
"""Compare two bench ledgers: per-query delta, sorted by absolute saving.

Usage: bench_diff.py OLD.json NEW.json [min_abs_delta]
Reads the full per-query map (the "queries" object of BENCH_LOCAL-style
files). Prints regressions (new > old) and wins, plus totals.
"""
import json
import sys


def load(p):
    d = json.load(open(p))
    return d.get("queries", {}), d.get("value"), d.get("min_of_3", {})


def main():
    old_q, old_t, old_m = load(sys.argv[1])
    new_q, new_t, new_m = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    common = sorted(set(old_q) & set(new_q), key=lambda k: old_q[k] - new_q[k])
    print(f"total: {old_t} -> {new_t}  "
          f"(common-query sum {sum(old_q[k] for k in common):.1f} -> "
          f"{sum(new_q[k] for k in common):.1f})")
    print(f"only-old: {sorted(set(old_q) - set(new_q))}")
    print(f"only-new: {sorted(set(new_q) - set(old_q))}")
    print("\n-- regressions (new slower) --")
    for k in reversed(common):
        d = new_q[k] - old_q[k]
        if d >= thr:
            extra = ""
            if k in old_m and k in new_m:
                extra = f"  (min {old_m[k]:.2f} -> {new_m[k]:.2f})"
            print(f"{k:32s} {old_q[k]:7.2f} -> {new_q[k]:7.2f}  (+{d:.2f}){extra}")
    print("\n-- wins (new faster) --")
    for k in common:
        d = old_q[k] - new_q[k]
        if d >= thr:
            extra = ""
            if k in old_m and k in new_m:
                extra = f"  (min {old_m[k]:.2f} -> {new_m[k]:.2f})"
            print(f"{k:32s} {old_q[k]:7.2f} -> {new_q[k]:7.2f}  (-{d:.2f}){extra}")


if __name__ == "__main__":
    main()
