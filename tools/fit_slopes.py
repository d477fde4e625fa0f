#!/usr/bin/env python3
"""Fit per-query power-law exponents across bench-curve artifacts.

Usage: fit_slopes.py <curve1.json> <curve2.json> [curve3.json ...]

Each artifact is a Bench full ledger (with min_of_3 where measured) plus
the fixture recipe stamped by mk_curve_json.py; the data-size ratio
between two artifacts is the ratio of their fixture replications. For
each query present in every artifact, prints the min-of-3 (falling back
to the median) timings and the fitted exponent b of t = a·n^b (least
squares on log t vs log n), plus the pairwise exponent of the LAST
decade (the number the verdict's scale grades read). Dev tool only.
"""
import sys, json, math


def load(p):
    d = json.load(open(p))
    n = d.get("fixture", {}).get("replication")
    if n is None:
        raise SystemExit(f"{p}: no fixture replication stamp")
    times = dict(d.get("queries", {}))
    times.update(d.get("min_of_3", {}))  # min-of-3 overrides single runs
    return n, times, d.get("commit")


def main():
    curves = [load(p) for p in sys.argv[1:]]
    if len(curves) < 2:
        raise SystemExit("need >= 2 curve artifacts")
    curves.sort(key=lambda c: c[0])
    ns = [c[0] for c in curves]
    commits = {c[2] for c in curves}
    if len(commits) > 1:
        print(f"WARNING: artifacts span commits {sorted(map(str, commits))} "
              "- slopes mix builds", file=sys.stderr)
    common = set(curves[0][1])
    for _, t, _ in curves[1:]:
        common &= set(t)
    lx = [math.log(n) for n in ns]
    hdr = "query".ljust(30) + "".join(f"sf{n/10:g}".rjust(9) for n in ns)
    print(hdr + "    fit-b  last-b")
    for q in sorted(common):
        ys = [c[1][q] for c in curves]
        ly = [math.log(y) for y in ys]
        mx, my = sum(lx) / len(lx), sum(ly) / len(ly)
        b = (sum((x - mx) * (y - my) for x, y in zip(lx, ly))
             / sum((x - mx) ** 2 for x in lx))
        last = ((ly[-1] - ly[-2]) / (lx[-1] - lx[-2]))
        print(q.ljust(30)
              + "".join(f"{y:9.2f}" for y in ys)
              + f"  {b:7.2f} {last:7.2f}")


if __name__ == "__main__":
    main()
