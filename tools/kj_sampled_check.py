#!/usr/bin/env python3
"""Sampled-query differential check for sim_knn_join at large SF.

The full oracle re-derives the ENTIRE self-join in DuckDB, which is an
oracle-side resource limit at 200k+ vectors (the engine itself runs fine).
This check keeps the oracle memory CONSTANT in corpus size: the ENGINE side
still runs the FULL all-vectors self-join (its parquet dump is the complete
pair set), but the hash compare is restricted to the pinned query stride the
recall report already uses (vec_id % 100 = 0 AND vec_id < 2000, <= 20
queries at any SF) — the oracle recomputes the training chain (now the
two-level O(n*sqrt(k)) assignment) plus ONLY the sampled queries' slabs.

A wrong cell assignment, slab split, score, or rank on any sampled query
still goes hash-red; only the per-query search of unsampled queries is
uncovered, and those run the identical plan.

Usage: kj_sampled_check.py <sf_dir> <verify_out_dir>
Prints a selfcheck-style [ ok ]/[FAIL] line for `sim_knn_join` (suffixed
`sampled-queries`), exit 0 on pass.
"""
import sys, os, json, glob

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from selfcheck import compare, bounded_con

Q_FILTER = "vec_id % 100 = 0 AND vec_id < 2000"
ANCHOR = "FROM cells cl JOIN base b ON b.vec_id = cl.vec_id)"


def main():
    sf, out = sys.argv[1], sys.argv[2]
    # bounded_con, not a raw connect: the raw connection has no
    # memory_limit/spill dir and died with an in-memory OOM at sf10
    # (round 14) — the same failure mode selfcheck.py was bounded against
    con = bounded_con(sf)
    sql = json.load(open(f"{out}/oracle_sql.json"))["sim_knn_join"]
    if ANCHOR not in sql:
        print("[FAIL] sim_knn_join: oracle q-CTE anchor not found - "
              "the published SQL changed shape; update kj_sampled_check.py")
        sys.exit(1)
    sampled = sql.replace(
        ANCHOR,
        "FROM cells cl JOIN base b ON b.vec_id = cl.vec_id"
        " WHERE cl.vec_id % 100 = 0 AND cl.vec_id < 2000)")
    files = glob.glob(f"{out}/sim_knn_join/*.parquet")
    if not files:
        print("[FAIL] sim_knn_join: no spark output")
        sys.exit(1)
    spark_df = con.execute(
        f"SELECT * FROM read_parquet({files!r}) "
        f"WHERE q_id % 100 = 0 AND q_id < 2000").fetchdf()
    duck_df = con.execute(sampled).fetchdf()
    err = compare("sim_knn_join", spark_df, duck_df)
    if err:
        print(f"[FAIL] sim_knn_join: {err}")
        sys.exit(1)
    if len(spark_df) == 0:
        print("[FAIL] sim_knn_join: 0 sampled rows - vacuous")
        sys.exit(1)
    print(f"[ ok ] sim_knn_join ({len(spark_df)} rows, sampled-queries: "
          f"full engine-side join, oracle restricted to {Q_FILTER})")


if __name__ == "__main__":
    main()
