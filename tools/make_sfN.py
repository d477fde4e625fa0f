#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing fixture dir by
replicating each fact table N times with key offsets (dims copied as-is).

Usage: python3 tools/make_sfN.py <src_dir> <dst_dir> [N=10]

The driver only ships sf{0.001,0.01,0.1}; the sf1 bench point
(VERDICT r4 item 9) needs a data-bound workload ~10x sf0.1 to expose
any O(n^2) hiding under fixed costs. Copy k of a fact row offsets its
primary key (and the foreign keys into other replicated tables) by
k * (max_key + 1), so key cardinalities, join fan-outs and series
counts scale with the data volume. documents/embeddings share one
offset base so the doc_id = vec_id pairing survives. Timestamps are
left as-is: 10x the points in the same window is 10x density, which is
how a bigger deployment actually looks to the bucketing operators.
"""
import sys
import duckdb

src, dst = sys.argv[1], sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()


def mx(table, col):
    return con.sql(
        f"SELECT max({col}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]


C = mx("customer", "c_custkey")
S = mx("supplier", "s_suppkey")
P = mx("part", "p_partkey")
O = mx("orders", "o_orderkey")
E = mx("events", "event_id")
U = mx("events", "user_id")
B = max(mx("documents", "doc_id"), mx("embeddings", "vec_id"))

plans = {
    "region": None,  # dims: copy as-is
    "nation": None,
    "customer": f"c_custkey + k.k * {C} AS c_custkey, c_name, c_nationkey, "
                "c_acctbal, c_mktsegment",
    "supplier": f"s_suppkey + k.k * {S} AS s_suppkey, s_name, s_nationkey, "
                "s_acctbal",
    "part": f"p_partkey + k.k * {P} AS p_partkey, p_name, p_brand, p_type, "
            "p_size, p_retailprice",
    "orders": f"o_orderkey + k.k * {O} AS o_orderkey, "
              f"o_custkey + k.k * {C} AS o_custkey, o_orderstatus, "
              "o_totalprice, o_orderdate, o_orderpriority",
    "lineitem": f"l_orderkey + k.k * {O} AS l_orderkey, "
                f"l_partkey + k.k * {P} AS l_partkey, "
                f"l_suppkey + k.k * {S} AS l_suppkey, l_linenumber, "
                "l_quantity, l_extendedprice, l_discount, l_tax, "
                "l_returnflag, l_linestatus, l_shipdate",
    "events": f"event_id + k.k * {E} AS event_id, ts, "
              f"user_id + k.k * {U} AS user_id, event_type, value, props",
    "documents": f"doc_id + k.k * {B} AS doc_id, text, lang, source, n_chars",
    "embeddings": f"vec_id + k.k * {B} AS vec_id, embedding, label",
}

import os
os.makedirs(dst, exist_ok=True)
for table, sel in plans.items():
    out = f"{dst}/{table}.parquet"
    if table == "events":
        # events.ts is parquet TIMESTAMP(NANOS); DuckDB reads it as a us
        # TIMESTAMP and its writer emits us, silently changing the
        # physical type the engine's nanosAsLong read path (and the
        # streaming LongType schema) depends on. Replicate through
        # pyarrow, which preserves timestamp[ns] end to end.
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pyarrow.compute as pc
        t = pq.read_table(f"{src}/{table}.parquet")
        parts = []
        for k in range(n):
            p = t.set_column(t.schema.get_field_index("event_id"),
                             "event_id", pc.add(t["event_id"], k * E))
            p = p.set_column(p.schema.get_field_index("user_id"),
                             "user_id", pc.add(p["user_id"], k * U))
            parts.append(p)
        pq.write_table(pa.concat_tables(parts), out)
    elif sel is None:
        con.sql(f"COPY (SELECT * FROM '{src}/{table}.parquet') TO '{out}' "
                "(FORMAT PARQUET)")
    else:
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}/{table}.parquet', "
            f"range({n}) AS k(k)) TO '{out}' (FORMAT PARQUET)")
    rows = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{table}: {rows} rows")
