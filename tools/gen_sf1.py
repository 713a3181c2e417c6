#!/usr/bin/env python3
"""Generate an sf1 fixture (10x sf0.1) for the local scale-curve audit.

Fact/corpus tables are replicated 10x with key offsets so joins stay
valid (each copy's foreign keys point at the same copy's parents);
dimension tables (region, nation, customer, supplier, part) keep their
cardinality, matching how a real 10x data growth behaves. Document text
gets a per-copy suffix so near-dup structure stays realistic instead of
becoming exact 10-cliques; embeddings keep their values (10x points in
the same cluster structure).

This is driver-side tooling only (duckdb), never engine code.

Usage: python3 tools/gen_sf1.py /root/testdata/sf0.1 /tmp/sf1
"""
import os
import sys

import duckdb

src, dst = sys.argv[1], sys.argv[2]
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")

K = 10  # copies


def copy_table(name, sql=None):
    q = sql or f"SELECT * FROM '{src}/{name}.parquet'"
    con.execute(
        f"COPY ({q}) TO '{dst}/{name}.parquet' (FORMAT PARQUET, CODEC ZSTD)")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")


grid = f"(SELECT unnest(range({K})) AS i)"

for t in ["region", "nation", "customer", "supplier", "part"]:
    copy_table(t)

copy_table("orders", f"""
  SELECT o_orderkey + i * 10000000 AS o_orderkey, o_custkey, o_orderstatus,
    o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet', {grid}""")

copy_table("lineitem", f"""
  SELECT l_orderkey + i * 10000000 AS l_orderkey, l_partkey, l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate
  FROM '{src}/lineitem.parquet', {grid}""")

copy_table("events", f"""
  SELECT event_id + i * 10000000 AS event_id,
    ts + to_microseconds(i) AS ts,
    user_id + i * 1000000 AS user_id, event_type, value, props
  FROM '{src}/events.parquet', {grid}""")

copy_table("documents", f"""
  SELECT doc_id + i * 10000000 AS doc_id,
    CASE WHEN i = 0 THEN text ELSE text || ' v' || i END AS text,
    lang, source,
    n_chars + (CASE WHEN i = 0 THEN 0 ELSE 2 + length(CAST(i AS VARCHAR)) END) AS n_chars
  FROM '{src}/documents.parquet', {grid}""")

copy_table("embeddings", f"""
  SELECT vec_id + i * 10000000 AS vec_id, embedding, label
  FROM '{src}/embeddings.parquet', {grid}""")
