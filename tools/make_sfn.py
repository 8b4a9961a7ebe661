#!/usr/bin/env python3
"""Build a scaled-up replica of a testdata scale dir for floor-amortization
measurements (BASELINE.md §4). Usage: make_sfn.py <src_sf_dir> <dst_dir> <K>

Replicates each table K times with per-replica key offsets so join
selectivities stay realistic (nation/region, the tiny broadcast dims, are
left as-is). Document text gets a per-replica suffix token so exact-dup
groups don't explode combinatorially; replica 0 is byte-identical to the
source. Writes OUTSIDE /root/testdata (that tree is read-only).
"""
import os
import sys

import duckdb

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW reps AS SELECT * FROM generate_series(0, {k - 1}) t(i)")

OFF_ORDER = 10_000_000
OFF_PART = 1_000_000
OFF_SUPP = 100_000
OFF_CUST = 1_000_000
OFF_DOC = 1_000_000
OFF_EVENT = 10_000_000

def copy(table, select):
    con.execute(
        f"COPY ({select}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

def src_t(t):
    return f"'{src}/{t}.parquet'"

copy("region", f"SELECT * FROM {src_t('region')}")
copy("nation", f"SELECT * FROM {src_t('nation')}")
copy("customer", f"""
    SELECT c_custkey + i * {OFF_CUST} AS c_custkey, c_name, c_nationkey,
           c_acctbal, c_mktsegment
    FROM {src_t('customer')}, reps""")
copy("supplier", f"""
    SELECT s_suppkey + i * {OFF_SUPP} AS s_suppkey, s_name, s_nationkey,
           s_acctbal
    FROM {src_t('supplier')}, reps""")
copy("part", f"""
    SELECT p_partkey + i * {OFF_PART} AS p_partkey, p_name, p_brand, p_type,
           p_size, p_retailprice
    FROM {src_t('part')}, reps""")
copy("orders", f"""
    SELECT o_orderkey + i * {OFF_ORDER} AS o_orderkey,
           o_custkey + i * {OFF_CUST} AS o_custkey,
           o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM {src_t('orders')}, reps""")
copy("lineitem", f"""
    SELECT l_orderkey + i * {OFF_ORDER} AS l_orderkey,
           l_partkey + i * {OFF_PART} AS l_partkey,
           l_suppkey + i * {OFF_SUPP} AS l_suppkey,
           l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus, l_shipdate
    FROM {src_t('lineitem')}, reps""")
copy("events", f"""
    SELECT event_id + i * {OFF_EVENT} AS event_id, ts,
           user_id + i * {OFF_CUST} AS user_id, event_type, value, props
    FROM {src_t('events')}, reps""")
copy("documents", f"""
    SELECT doc_id + i * {OFF_DOC} AS doc_id,
           CASE WHEN i = 0 THEN text ELSE text || ' r' || i END AS text,
           lang, source,
           CAST(LENGTH(CASE WHEN i = 0 THEN text
                            ELSE text || ' r' || i END) AS BIGINT) AS n_chars
    FROM {src_t('documents')}, reps""")
copy("embeddings", f"""
    SELECT vec_id + i * {OFF_DOC} AS vec_id, embedding, label
    FROM {src_t('embeddings')}, reps""")
