#!/usr/bin/env python3
"""Convert a selfcheck.py transcript into a CORRECTNESS-style JSON ledger.

Usage: python3 tools/mk_correctness_json.py <selfcheck.log> <out.json> \
           [sf] [ref.json]

Each `[ ok ]` line becomes {"status": "pass"}, `[rows]` becomes
{"status": "rows_only"}, `[FAIL]`/`[EMPTY]` become {"status": "fail"}
with the message. Dev tool only — mirrors the driver's artifact shape
closely enough for a human/judge diff, not byte-for-byte.

With a reference ledger (4th arg — normally the committed sf0.01
CORRECTNESS_r*.json), any 0-row pass on a query that was NON-EMPTY in
the reference is flagged `"vacuous": true`, counted in `n_vacuous`,
and warned to stderr: a 0 = 0 hash match proves nothing about an op's
behavior at scale (round-9 verdict — stream_pattern_match passed sf1
and sf3 with 0 rows because its fixed threshold matched nothing above
the density it was calibrated at).
"""
import sys, json, re, subprocess, os

def git_commit():
    """Build provenance for the ledger (round-13 verdict #7: the stale
    sf10 ledger was only discoverable via git archaeology)."""
    try:
        return subprocess.run(
            ["git", "-C", os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True).stdout.strip()
    except Exception:
        return None

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--note=")]
    note = next((a[len("--note="):] for a in sys.argv[1:]
                 if a.startswith("--note=")), None)
    log, out = args[0], args[1]
    sf = args[2] if len(args) > 2 else None
    ref_rows = {}
    if len(args) > 3:
        ref = json.load(open(args[3]))
        for name, entry in ref.get("queries", ref).items():
            if isinstance(entry, dict):
                r = entry.get("rows", entry.get("spark_rows"))
                if r is not None:
                    ref_rows[name] = r
    queries = {}
    surface_n = None
    n_pass = n_rows = n_fail = n_vacuous = 0
    for line in open(log):
        m = re.match(r"== surface (\d+) ==", line)
        if m:
            surface_n = int(m.group(1))
            continue
        m = re.match(r"\[ ok \] (\S+) \((\d+) rows(?:, ([^)]*))?\)", line)
        if m:
            queries[m.group(1)] = {"status": "pass", "rows": int(m.group(2))}
            if m.group(3):
                queries[m.group(1)]["check"] = m.group(3)
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
    for name, entry in queries.items():
        if entry.get("rows") == 0 and ref_rows.get(name, 0) > 0:
            entry["vacuous"] = True
            n_vacuous += 1
            print(f"[VACUOUS] {name}: 0 rows here but {ref_rows[name]} in "
                  "the reference ledger - a 0=0 match proves nothing",
                  file=sys.stderr)
    doc = {"sf": sf, "commit": git_commit(), "surface_n": surface_n,
           "n_pass": n_pass, "n_rows_only": n_rows,
           "n_fail": n_fail, "queries": dict(sorted(queries.items()))}
    if note:
        doc["note"] = note
    if ref_rows:
        doc["n_vacuous"] = n_vacuous
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{out}: {n_pass} pass, {n_rows} rows-only, {n_fail} fail"
          + (f", {n_vacuous} VACUOUS" if n_vacuous else ""))

if __name__ == "__main__":
    main()
