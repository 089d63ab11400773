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

Content perturbation keeps work character realistic — the first
version of this script appended a tiny suffix to text and shifted one
vector component by 1e-3, which left cross-copy items ~99.9% similar
and inflated near-dup candidate pairs ~100x (a workload NO real 10x
corpus has; it mis-flagged every pair-generating dedup op as
super-linear). Now:
  - documents: copy k>0 splices THIRDS of three different same-lang
    docs (offsets vary per copy), so cross-copy Jaccard <= 1/3 —
    below banding thresholds — while within-copy token statistics and
    dup structure stay real;
  - embeddings: copy k rotates components by 7k mod 64 — an isometry,
    so within-copy pairwise geometry (ANN/near-dup structure) is
    EXACTLY preserved, while rotated vectors decorrelate across
    copies.

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

def doc_copy(k):
    if k == 0:
        return f"""SELECT doc_id, text, lang, source, n_chars
          FROM '{SRC}/documents.parquet'"""
    a_off = k * 7 + 1
    b_off = k * 13 + 3
    return f"""
      SELECT doc_id + {k * KD} AS doc_id, text, lang, source,
             length(text)::BIGINT AS n_chars
      FROM (
        WITH d AS (SELECT doc_id, text, lang, source,
            row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
            count(*) OVER (PARTITION BY lang) AS nl
          FROM '{SRC}/documents.parquet')
        SELECT a.doc_id,
          substr(a.text, 1, greatest(length(a.text)//3, 1)) ||
          substr(b.text, greatest(length(b.text)//3, 1) + 1,
                 greatest(length(b.text)//3, 1)) ||
          substr(c.text, 2 * greatest(length(c.text)//3, 1) + 1)
            AS text,
          a.lang, a.source
        FROM d a
        JOIN d b ON b.lang = a.lang
          AND b.rn = (a.rn - 1 + {a_off}) % a.nl + 1
        JOIN d c ON c.lang = a.lang
          AND c.rn = (a.rn - 1 + {b_off}) % a.nl + 1)"""


emit("documents", doc_copy)


def emb_copy(k):
    rot = (7 * k) % 64
    if rot == 0:
        return f"""SELECT vec_id + {k * KV} AS vec_id, embedding, label
          FROM '{SRC}/embeddings.parquet'"""
    return f"""
      SELECT vec_id + {k * KV} AS vec_id,
             list_concat(embedding[{rot + 1}:], embedding[1:{rot}])
               AS embedding,
             label FROM '{SRC}/embeddings.parquet'"""


emit("embeddings", emb_copy)

print("done:", DST)
