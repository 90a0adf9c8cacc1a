#!/usr/bin/env python3
"""FK-consistent scale-up generator for local scale checks.

Replicates /root/testdata/sf0.1 by FACTOR with shifted keys so every
FK keeps resolving (orders->customer, lineitem->orders/part/supplier,
events keep per-user timelines, documents/embeddings get exact-copy
replicas — deliberately stressing the dedup/ANN paths with 10x
duplicate groups). Dims (region/nation) stay fixed, as in a real
star-schema scale-up. Output: /tmp/sfN/*.parquet (driver-side tool;
never part of the engine).
"""
import sys
import duckdb

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sf{FACTOR}x"

con = duckdb.connect()
con.execute(f"CREATE TABLE reps AS SELECT unnest(range({FACTOR})) AS i")


def src(t):
    return f"'{SRC}/{t}.parquet'"


def emit(t, sql):
    con.execute(
        f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")


import os
os.makedirs(DST, exist_ok=True)

# key strides: next power of 10 above the max key keeps ids readable
def stride(t, key):
    m = con.execute(f"SELECT max({key}) FROM {src(t)}").fetchone()[0]
    s = 1
    while s <= m:
        s *= 10
    return s


O = stride("orders", "o_orderkey")
C = stride("customer", "c_custkey")
S = stride("supplier", "s_suppkey")
P = stride("part", "p_partkey")
E = stride("events", "event_id")
U = stride("events", "user_id")
D = stride("documents", "doc_id")
V = stride("embeddings", "vec_id")

emit("region", f"SELECT * FROM {src('region')}")
emit("nation", f"SELECT * FROM {src('nation')}")
emit("customer", f"""
  SELECT c_custkey + i*{C} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM {src('customer')} CROSS JOIN reps""")
emit("supplier", f"""
  SELECT s_suppkey + i*{S} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')} CROSS JOIN reps""")
emit("part", f"""
  SELECT p_partkey + i*{P} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM {src('part')} CROSS JOIN reps""")
emit("orders", f"""
  SELECT o_orderkey + i*{O} AS o_orderkey, o_custkey + i*{C} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN reps""")
emit("lineitem", f"""
  SELECT l_orderkey + i*{O} AS l_orderkey, l_partkey + i*{P} AS l_partkey,
         l_suppkey + i*{S} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM {src('lineitem')} CROSS JOIN reps""")
# ts must stay parquet TIMESTAMP(NANOS) — the engine reads it with
# spark.sql.legacy.parquet.nanosAsLong, and this duckdb build writes
# TIMESTAMP as micros — so events goes through pyarrow (version 2.6
# keeps nanos) instead of COPY.
import pyarrow as pa
import pyarrow.parquet as pq
ev = con.execute(f"""
  SELECT event_id + i*{E} AS event_id, ts, user_id + i*{U} AS user_id,
         event_type, value, props
  FROM {src('events')} CROSS JOIN reps""").arrow()
schema = pa.schema([
    ev.schema.field(n) if n != "ts"
    else pa.field("ts", pa.timestamp("ns"))
    for n in ev.schema.names])
pq.write_table(ev.cast(schema), f"{DST}/events.parquet", version="2.6",
    coerce_timestamps=None)
print(f"events: {ev.num_rows} rows")
emit("documents", f"""
  SELECT doc_id + i*{D} AS doc_id, text, lang, source, n_chars
  FROM {src('documents')} CROSS JOIN reps""")
emit("embeddings", f"""
  SELECT vec_id + i*{V} AS vec_id, embedding, label
  FROM {src('embeddings')} CROSS JOIN reps""")
print(f"done -> {DST}")
