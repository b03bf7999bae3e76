#!/usr/bin/env python3
"""Throwaway sf-scaling rehearsal data generator (SURVEY §6).

Replicates the driver's sf0.1 tables K times (default 10 -> "sf1 shape")
with consistently shifted keys, writing to an output dir OUTSIDE
/root/testdata. Replicas are structurally independent so operator runtime
scaling is measured, not artifacts of cross-replica interaction:

 - every key column (and its foreign-key references) shifts by
   replica * (max_key + 1);
 - region/nation stay fixed (TPC-H dims don't scale);
 - document text gets a replica salt token inserted every 3 words, so
   shingle/minhash/simhash near-dup structure REPLICATES instead of
   exploding quadratically across replicas (a doc and its replica copy
   share no 3-gram); n_chars is recomputed;
 - embeddings rotate per replica (distinct directions, same norms), so
   ANN/LSH bucket load replicates instead of stacking identical vectors.

Usage: python3 tools/scale_gen.py [K] [outdir]
"""
import sys
import duckdb

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-sf1"
SRC = "/root/testdata/sf0.1"

con = duckdb.connect()
con.execute(f"SET threads TO 16")

import os
os.makedirs(OUT, exist_ok=True)

def stride(table, key):
    return con.sql(f"SELECT max({key})+1 FROM '{SRC}/{table}.parquet'").fetchone()[0]

def gen(table, select_per_replica):
    reps = " UNION ALL ".join(
        f"SELECT * FROM ({select_per_replica(i)})" for i in range(K))
    con.execute(f"COPY ({reps}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

# fixed dims
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

C = stride("customer", "c_custkey")
S = stride("supplier", "s_suppkey")
P = stride("part", "p_partkey")
O = stride("orders", "o_orderkey")
E = stride("events", "event_id")
U = stride("events", "user_id")
D = stride("documents", "doc_id")
V = stride("embeddings", "vec_id")

gen("customer", lambda i: f"""
  SELECT c_custkey + {i*C} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment FROM '{SRC}/customer.parquet'""")
gen("supplier", lambda i: f"""
  SELECT s_suppkey + {i*S} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet'""")
gen("part", lambda i: f"""
  SELECT p_partkey + {i*P} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice FROM '{SRC}/part.parquet'""")
gen("orders", lambda i: f"""
  SELECT o_orderkey + {i*O} AS o_orderkey, o_custkey + {i*C} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")
gen("lineitem", lambda i: f"""
  SELECT l_orderkey + {i*O} AS l_orderkey, l_partkey + {i*P} AS l_partkey,
         l_suppkey + {i*S} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate FROM '{SRC}/lineitem.parquet'""")
gen("events", lambda i: f"""
  SELECT event_id + {i*E} AS event_id, ts, user_id + {i*U} AS user_id,
         event_type, value, props FROM '{SRC}/events.parquet'""")
# replica salt token every 3 words: no 3-gram (or longer) survives across
# replicas, so near-dup candidate structure replicates linearly
gen("documents", lambda i: f"""
  WITH w AS (SELECT doc_id, lang, source,
        list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> len(x) > 0) AS ws
      FROM '{SRC}/documents.parquet'),
  s AS (SELECT doc_id, lang, source,
        CASE WHEN {i} = 0 THEN list_aggregate(ws, 'string_agg', ' ')
        ELSE list_aggregate(
          flatten(list_transform(range(1, len(ws)+1),
            j -> CASE WHEN j % 3 = 0 THEN [ws[j], 'r{i}x'] ELSE [ws[j]] END)),
          'string_agg', ' ') END AS text
      FROM w)
  SELECT doc_id + {i*D} AS doc_id, text, lang, source,
         CAST(length(text) AS BIGINT) AS n_chars FROM s""")
# rotate embeddings per replica: same norms, distinct directions
gen("embeddings", lambda i: f"""
  SELECT vec_id + {i*V} AS vec_id,
         CASE WHEN {i} = 0 THEN embedding
              ELSE embedding[{i+1}:] || embedding[1:{i}] END AS embedding,
         label FROM '{SRC}/embeddings.parquet'""")
print("done ->", OUT)
