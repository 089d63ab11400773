#!/usr/bin/env python3
"""Synthesize an sf1 dataset as 10 key-shifted copies of sf0.1.

The driver only generates sf{0.001,0.01,0.1}; the scale probe
(VERDICT r11 item 7) needs one decade more volume to measure growth
curves. Each copy shifts every join/identity key by k*stride (stride =
max(key)+1 computed from the data), so FK joins stay consistent and
key cardinalities scale with volume, while fixed-cardinality dims
(region, nation) keep their real-world size. Time columns are NOT
shifted — 10x the traffic inside the same window, which is what a
10x-bigger deployment looks like to the window-bounded queries.

Content perturbation keeps work character realistic:
  - documents: per-copy suffix on text (within-copy duplicate
    structure preserved; no artificial 10x cross-copy exact-dup blowup)
  - embeddings: first component shifted by k*1e-3 (same: near-dup and
    ANN structure per copy, no identical-vector explosion)

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf1]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
COPIES = 10

con = duckdb.connect()


def stride(table, key):
    return con.execute(
        f"SELECT max({key}) + 1 FROM '{SRC}/{table}.parquet'"
    ).fetchone()[0]


KO = stride("orders", "o_orderkey")
KC = stride("customer", "c_custkey")
KP = stride("part", "p_partkey")
KS = stride("supplier", "s_suppkey")
KE = stride("events", "event_id")
KU = stride("events", "user_id")
KD = stride("documents", "doc_id")
KV = stride("embeddings", "vec_id")


def emit(table, select_for_k):
    sql = " UNION ALL ".join(select_for_k(k) for k in range(COPIES))
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


import os

os.makedirs(DST, exist_ok=True)

# fixed-cardinality dims: real deployments don't grow nations 10x
for t in ("region", "nation"):
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
    )
    print(f"{t}: copied as-is")

emit("customer", lambda k: f"""
  SELECT c_custkey + {k * KC} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'""")

emit("supplier", lambda k: f"""
  SELECT s_suppkey + {k * KS} AS s_suppkey, s_name, s_nationkey,
         s_acctbal FROM '{SRC}/supplier.parquet'""")

emit("part", lambda k: f"""
  SELECT p_partkey + {k * KP} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice FROM '{SRC}/part.parquet'""")

emit("orders", lambda k: f"""
  SELECT o_orderkey + {k * KO} AS o_orderkey,
         o_custkey + {k * KC} AS o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")

emit("lineitem", lambda k: f"""
  SELECT l_orderkey + {k * KO} AS l_orderkey,
         l_partkey + {k * KP} AS l_partkey,
         l_suppkey + {k * KS} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet'""")

emit("events", lambda k: f"""
  SELECT event_id + {k * KE} AS event_id, ts,
         user_id + {k * KU} AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet'""")

emit("documents", lambda k: f"""
  SELECT doc_id + {k * KD} AS doc_id,
         text || {("' copy" + "%d'" % k) if k else "''"} AS text,
         lang, source,
         n_chars + {len(" copy0") if k else 0} AS n_chars
  FROM '{SRC}/documents.parquet'""")

emit("embeddings", lambda k: f"""
  SELECT vec_id + {k * KV} AS vec_id,
         list_concat([(embedding[1] + {k} * 0.001)::FLOAT],
                     embedding[2:]) AS embedding,
         label FROM '{SRC}/embeddings.parquet'""")

print("done:", DST)
