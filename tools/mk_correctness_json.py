#!/usr/bin/env python3
"""Convert a selfcheck.py transcript into a CORRECTNESS-style JSON ledger.

Usage: python3 tools/mk_correctness_json.py <selfcheck.log> <out.json> [sf]

Each `[ ok ]` line becomes {"status": "pass"}, `[rows]` becomes
{"status": "rows_only"}, `[FAIL]`/`[EMPTY]` become {"status": "fail"}
with the message. Dev tool only — mirrors the driver's artifact shape
closely enough for a human/judge diff, not byte-for-byte.
"""
import sys, json, re

def main():
    log, out = sys.argv[1], sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else None
    queries = {}
    n_pass = n_rows = n_fail = 0
    for line in open(log):
        m = re.match(r"\[ ok \] (\S+) \((\d+) rows\)", line)
        if m:
            queries[m.group(1)] = {"status": "pass", "rows": int(m.group(2))}
            n_pass += 1
            continue
        m = re.match(r"\[rows\] (\S+): (\d+) rows", line)
        if m:
            queries[m.group(1)] = {"status": "rows_only",
                                   "rows": int(m.group(2))}
            n_rows += 1
            continue
        m = re.match(r"\[(FAIL|EMPTY)\] (\S+?):? (.*)", line)
        if m:
            queries[m.group(2).rstrip(':')] = {"status": "fail",
                                               "detail": m.group(3).strip()}
            n_fail += 1
    doc = {"sf": sf, "n_pass": n_pass, "n_rows_only": n_rows,
           "n_fail": n_fail, "queries": dict(sorted(queries.items()))}
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{out}: {n_pass} pass, {n_rows} rows-only, {n_fail} fail")

if __name__ == "__main__":
    main()
