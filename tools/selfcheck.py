#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage:  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
        python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out

For each query in oracle_sql.json: read the Spark-written parquet, run the
oracle SQL in DuckDB over views of the fixture tables, sort columns by name,
sort rows, and compare shape + values (exact for ints/strings, 1e-9 relative
for floats). Dev tool only — not part of the Scala library.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def bounded_con(sf):
    """A DuckDB connection with explicit resource bounds (round-13 verdict
    #2: the unbounded oracle blew container memory/disk at sf10 — 23 OOMs
    — and the sweep silently kept a stale ledger). memory_limit + a spill
    dir with headroom turn an abort into a spill; threads are capped so
    one heavy oracle can't starve the box. Overridable via env."""
    con = duckdb.connect()
    spill = os.environ.get("GRAFT_DUCK_SPILL",
                           os.path.join(os.path.dirname(
                               os.path.dirname(os.path.abspath(__file__))),
                               "target", "duck_spill"))
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    con.execute("SET memory_limit='%s'"
                % os.environ.get("GRAFT_DUCK_MEM", "48GB"))
    con.execute("SET threads=%d"
                % int(os.environ.get("GRAFT_DUCK_THREADS", "24")))
    for t in TABLES:
        pth = f"{sf}/{t}.parquet"
        if os.path.exists(pth):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pth}')")
    return con

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), na_position="first",
                        kind="mergesort").reset_index(drop=True)
    return df

def compare(name, spark_df, duck_df):
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        return f"COLS spark={list(s.columns)} duck={list(d.columns)}"
    if s.shape != d.shape:
        return f"SHAPE spark={s.shape} duck={d.shape}"
    for c in s.columns:
        sv, dv = s[c], d[c]
        # The driver hash-compares TYPED values, so an integer Spark column
        # against a float/object DuckDB column (e.g. a bare SUM(int) typed as
        # HUGEINT, rendered by pandas as float64/object) hash-fails even when
        # values are equal. Flag the dtype mismatch before the tolerance
        # compare so oracle type bugs can't pass locally.
        s_int = pd.api.types.is_integer_dtype(sv)
        d_int = pd.api.types.is_integer_dtype(dv)
        if s_int != d_int and (
                pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv)
                or sv.dtype == object or dv.dtype == object):
            return (f"DTYPE col={c} spark={sv.dtype} duck={dv.dtype} "
                    f"(int vs non-int: driver hash would differ — "
                    f"CAST the oracle aggregate to BIGINT/DOUBLE)")
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            a = sv.astype(float).to_numpy()
            b = dv.astype(float).to_numpy()
            ok = np.isclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                return f"VAL col={c} row={i} spark={a[i]!r} duck={b[i]!r}"
            exact = (a == b) | (np.isnan(a) & np.isnan(b))
            if not exact.all():
                i = int(np.argmin(exact))
                return (f"FLOAT-INEXACT col={c} row={i} "
                        f"spark={a[i]!r} duck={b[i]!r} (close but hash differs)")
        else:
            sa = sv.astype(str).to_numpy()
            da = dv.astype(str).to_numpy()
            if not (sa == da).all():
                i = int(np.argmin(sa == da))
                return f"VAL col={c} row={i} spark={sa[i]!r} duck={da[i]!r}"
    return None

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = bounded_con(sf)
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output");  n_fail += 1;  continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            # sequential retry on a FRESH bounded connection: a transient
            # allocation failure (or a connection a prior OOM wedged) gets
            # one more chance before the ledger records a fail
            try:
                con.close()
            except Exception:
                pass
            con = bounded_con(sf)
            try:
                spark_df = con.execute(
                    f"SELECT * FROM read_parquet({files!r})").fetchdf()
                duck_df = con.execute(sql).fetchdf()
            except Exception as e2:
                print(f"[FAIL] {name}: {e2} (after retry; first: {e})")
                n_fail += 1
                continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"[FAIL] {name}: {err}");  n_fail += 1
        else:
            print(f"[ ok ] {name} ({len(spark_df)} rows)");  n_pass += 1
    # queries without an oracle → rows-only
    have = set(oracle)
    for d in sorted(glob.glob(f"{out}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in have:
            files = glob.glob(f"{d}/*.parquet")
            nrows = (con.execute(f"SELECT count(*) FROM read_parquet({files!r})")
                     .fetchone()[0] if files else 0)
            status = "rows" if nrows > 0 else "EMPTY"
            print(f"[{status}] {name}: {nrows} rows (no oracle)")
            if nrows == 0: n_fail += 1
    print(f"== surface {len(oracle)} ==")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
