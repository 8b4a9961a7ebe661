#!/usr/bin/env python3
"""Generate sf1 test data by scaling sf0.1 x10 (driver-side tooling).

The driver ships sf{0.001,0.01,0.1} only; BASELINE.md's protocol wants
the bench gate settled at sf>=1 where the fixed per-query Spark floor
amortizes. Scaling strategy (seeded, deterministic):

- relational tables: 10 copies with per-copy key offsets (offset =
  copy * (max key + 1) per key domain), so joins land on the matching
  copy and selectivities/cardinalities scale linearly, exactly as a
  10x-bigger generator run would behave. region/nation are fixed
  dimensions (as in TPC-H, they do not scale).
- events: 10 copies, event_id/user_id shifted -> 10x users with the
  same per-user session structure; timestamps unchanged (windows get
  10x rows per bucket, the streaming-shape queries scale linearly).
- documents: 10 copies, doc_id shifted, text Caesar-shifted per copy
  (letters rotated by the copy index; copy 0 is the original) so
  cross-copy similarity collapses at EVERY granularity the dedup
  operators work at -- exact hash, word bigrams/shingles (q35/q36),
  bag-of-words SimHash (q37), char-k-gram winnowing fingerprints
  (q44). A word shuffle is NOT enough: winnowing fingerprints live
  inside words and SimHash is order-invariant, so shuffled copies
  still register as near-duplicates and the pair queries blow up
  quadratically in the copy count -- a workload a true 10x corpus
  would not have. The shift preserves text length, token counts and
  word-length distribution exactly.
- embeddings: 10 copies, vec_id shifted, vector cyclically rotated by
  copy -- decorrelates copies (random-vector rotations are ~orthogonal
  in expectation) without changing norms.

Replaces the round-1 tools/make_sfn.py, whose suffix-token document
replication and verbatim embedding copies created artificial cross-copy
near-duplicates (bigram-jaccard ~0.98, cosine = 1.0), exploding the
pair-query workload in a way a true bigger corpus would not.

Usage: python3 tools/gen_sf1.py [outdir [src [copies]]]
       (defaults: /root/repo/testdata-sf1  /root/testdata/sf0.1  10)
"""
import os

import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata-sf1"
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def mx(table, col):
    return con.execute(
        f"SELECT max({col}) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


M_CUST = mx("customer", "c_custkey")
M_SUPP = mx("supplier", "s_suppkey")
M_PART = mx("part", "p_partkey")
M_ORD = mx("orders", "o_orderkey")
M_EVT = mx("events", "event_id")
M_USER = mx("events", "user_id")
M_DOC = mx("documents", "doc_id")
M_VEC = mx("embeddings", "vec_id")


def copy_table(name, select):
    con.execute(f"""
        COPY (
          SELECT {select}
          FROM '{SRC}/{name}.parquet', range({COPIES}) t(i)
          ORDER BY i
        ) TO '{OUT}/{name}.parquet' (FORMAT parquet)
    """)
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")


# fixed dimensions: straight copies
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT parquet)")
    print(t, "copied")

copy_table("customer", f"c_custkey + i * {M_CUST} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
copy_table("supplier", f"s_suppkey + i * {M_SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal")
copy_table("part", f"p_partkey + i * {M_PART} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
copy_table("orders", f"o_orderkey + i * {M_ORD} AS o_orderkey, o_custkey + i * {M_CUST} AS o_custkey, "
           "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
copy_table("lineitem", f"l_orderkey + i * {M_ORD} AS l_orderkey, l_partkey + i * {M_PART} AS l_partkey, "
           f"l_suppkey + i * {M_SUPP} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
           "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
copy_table("events", f"event_id + i * {M_EVT} AS event_id, ts, user_id + i * {M_USER} AS user_id, "
           "event_type, value, props")

# documents: Caesar-shift letters per copy; copy 0 keeps the original
LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def caesar_table(i):
    r = i % 26
    return str.maketrans(LOWER + UPPER, LOWER[r:] + LOWER[:r] + UPPER[r:] + UPPER[:r])


rows = con.execute(
    f"SELECT doc_id, text, lang, source, n_chars FROM '{SRC}/documents.parquet'"
).fetchall()
doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
for i in range(COPIES):
    table = caesar_table(i)
    for (doc_id, text, lang, source, _nc) in rows:
        t = text if i == 0 else text.translate(table)
        doc_ids.append(doc_id + i * M_DOC)
        texts.append(t)
        langs.append(lang)
        sources.append(source)
        n_chars.append(len(t))
pq.write_table(pa.table({
    "doc_id": pa.array(doc_ids, pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array(sources, pa.string()),
    "n_chars": pa.array(n_chars, pa.int64()),
}), f"{OUT}/documents.parquet")
print("documents:", len(doc_ids), "rows")

# embeddings: cyclic rotation per copy
erows = con.execute(f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'").fetchall()
vec_ids, vecs, labels = [], [], []
dim = len(erows[0][1])
for i in range(COPIES):
    r = i % dim
    for (vec_id, emb, label) in erows:
        vec_ids.append(vec_id + i * M_VEC)
        vecs.append(emb[r:] + emb[:r])
        labels.append(label)
pq.write_table(pa.table({
    "vec_id": pa.array(vec_ids, pa.int64()),
    "embedding": pa.array(vecs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}), f"{OUT}/embeddings.parquet")
print("embeddings:", len(vec_ids), "rows")
print("done ->", OUT)
