#!/usr/bin/env python3
"""Assemble a BENCH_CURVE_*.json from a Bench full-ledger output, stamping
the fixture PROVENANCE (round-11 verdict #7: curve points must be
reproducible from the committed tree — "sf": "/tmp/sf30" pointing at a
deleted temp dir is not evidence).

Usage: mk_curve_json.py <bench_ledger.json> <out.json> <src_fixture> <N> [seed_note]

The fixture recipe recorded is the exact tools/make_sfN.py invocation that
rebuilds the dir the ledger ran against (the generator is deterministic —
no RNG, key-offset replication only — so the recipe IS the fixture).
"""
import sys, json

import subprocess, os

ledger, out, src, n = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
d = json.load(open(ledger))
# build provenance (round-13 verdict #7)
try:
    d["commit"] = subprocess.run(
        ["git", "-C", os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, check=True).stdout.strip()
except Exception:
    d["commit"] = None
# sink generation stamp: pre-r12 count()-sink ledgers are incomparable with
# noop-sink ones for map-only ops — tooling must refuse mixed comparisons
d.setdefault("sink", "noop")
d["fixture"] = {
    "tool": "tools/make_sfN.py",
    "cmd": f"python3 tools/make_sfN.py {src} <dst> {n}",
    "src": src,
    "replication": n,
    "deterministic": True,
}
json.dump(d, open(out, "w"), indent=1)
print(f"wrote {out} ({len(d.get('queries', {}))} queries, fixture {src} x{n})")
