#!/usr/bin/env python3
"""Synthesize an sf1 decade for ScalingBench from the driver's sf0.1 tables.

The driver generates testdata only up to sf0.1; the fourth scaling decade
(docs/SCALING.json) needs ~10x that. This replicates each sf0.1 table 10x
with DISJOINT key ranges per copy so row counts scale linearly WITHOUT
manufacturing artificial quadratic structure:

- ids shift by k*1e6 (orderkeys by k*1e7) -> joins/groups scale linearly;
  the co-occurrence graph becomes 10 disjoint copies (nodes and edges x10,
  degree distribution preserved) instead of one graph with x10 edge
  weights.
- document text is caesar-shifted by k letters -> within-copy near-dup
  structure is preserved exactly (translate is a bijection on [a-z]), but
  cross-copy similarity is destroyed, so dedup pair counts scale x10, not
  x100 (10 exact copies of every doc would be a planted quadratic blowup
  the real corpus doesn't have).
- embeddings rotate by k dimensions -> norms and within-copy geometry
  preserved, cross-copy cosine decorrelated, same reasoning.

Output: /root/repo/target/sf1/*.parquet (scratch; regenerate with this
script). Usage: python3 tools/make_sf1.py [outdir]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
K = 10
ABC = "abcdefghijklmnopqrstuvwxyz"

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def gen(table: str, select_for_k) -> None:
    parts = [f"({select_for_k(k)})" for k in range(K)]
    sql = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


gen("lineitem", lambda k: f"""
    SELECT l_orderkey + {k}*10000000 AS l_orderkey,
           l_partkey + {k}*1000000 AS l_partkey,
           l_suppkey + {k}*1000000 AS l_suppkey,
           l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
           l_returnflag, l_linestatus, l_shipdate
    FROM '{SRC}/lineitem.parquet'""")

gen("orders", lambda k: f"""
    SELECT o_orderkey + {k}*10000000 AS o_orderkey,
           o_custkey + {k}*1000000 AS o_custkey,
           o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
    FROM '{SRC}/orders.parquet'""")

gen("customer", lambda k: f"""
    SELECT c_custkey + {k}*1000000 AS c_custkey,
           c_name || '-{k}' AS c_name,
           c_nationkey, c_acctbal, c_mktsegment
    FROM '{SRC}/customer.parquet'""")

gen("part", lambda k: f"""
    SELECT p_partkey + {k}*1000000 AS p_partkey,
           p_name || '-{k}' AS p_name,
           p_brand, p_type, p_size, p_retailprice
    FROM '{SRC}/part.parquet'""")

gen("supplier", lambda k: f"""
    SELECT s_suppkey + {k}*1000000 AS s_suppkey,
           s_name || '-{k}' AS s_name,
           s_nationkey, s_acctbal
    FROM '{SRC}/supplier.parquet'""")

gen("documents", lambda k: f"""
    SELECT doc_id + {k}*1000000 AS doc_id,
           translate(text, '{ABC}', '{ABC[k:] + ABC[:k]}') AS text,
           lang, source, n_chars
    FROM '{SRC}/documents.parquet'""")

gen("embeddings", lambda k: f"""
    SELECT vec_id + {k}*1000000 AS vec_id,
           CAST(list_concat(embedding[{k + 1}:len(embedding)],
                            embedding[1:{k}]) AS FLOAT[]) AS embedding,
           label
    FROM '{SRC}/embeddings.parquet'""")

gen("events", lambda k: f"""
    SELECT event_id + {k}*1000000 AS event_id, ts,
           user_id + {k}*1000000 AS user_id,
           event_type, value, props
    FROM '{SRC}/events.parquet'""")

for small in ("nation", "region"):
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{small}.parquet') TO "
        f"'{OUT}/{small}.parquet' (FORMAT PARQUET)")
    print(f"{small}: copied")

# sanity: the caesar shift preserved within-copy text equality structure
dup = con.execute(f"""
    WITH d AS (SELECT doc_id, md5(text) AS h FROM '{OUT}/documents.parquet')
    SELECT count(*) - count(DISTINCT h) FROM d""").fetchone()[0]
src_dup = con.execute(f"""
    WITH d AS (SELECT md5(text) AS h FROM '{SRC}/documents.parquet')
    SELECT count(*) - count(DISTINCT h) FROM d""").fetchone()[0]
assert dup == K * src_dup, f"exact-dup structure drifted: {dup} vs {K}x{src_dup}"
print(f"ok: exact-dup groups scale linearly ({src_dup} -> {dup})")
