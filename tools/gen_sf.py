#!/usr/bin/env python3
"""Scale-up fixture generator (dev tool, driver-side python like t2_local.py).

Derives a larger scale factor from an existing fixture dir by N-fold
replication with CONSISTENT key offsets, so every foreign-key relationship
of the star schema survives: copy c's orders reference copy c's customers,
copy c's lineitems reference copy c's orders/parts/suppliers. The
region/nation dimensions stay fixed (as in TPC-H, their size is
scale-independent). Document text is replicated verbatim — a 10x-duplicated
corpus is exactly the workload dedup operators exist for — while embeddings
get a tiny deterministic per-copy perturbation on component 0 so distance
ties stay as rare as in the source data. Fully deterministic: no RNG, row
order pinned by ORDER BY.

Usage: gen_sf.py <src_dir> <dst_dir> <copies>
"""
import duckdb
import os
import sys

src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute("SET preserve_insertion_order=true")

def s(t):
    return f"read_parquet('{src}/{t}.parquet')"

def gen(table, sql):
    out = f"{dst}/{table}.parquet"
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    print(table, con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0],
          flush=True)

def mx(t, c):
    # Copy stride = max+1: keys are 0-based, so offsetting copy c by c*max
    # would collide copy c's max key with copy c+1's zero key (round-10
    # verdict: exactly copies-1 duplicate keys per table — 149999, 299998, …).
    return con.execute(f"SELECT max({c}) FROM {s(t)}").fetchone()[0] + 1

MC = mx('customer', 'c_custkey')
MS = mx('supplier', 's_suppkey')
MP = mx('part', 'p_partkey')
MO = mx('orders', 'o_orderkey')
ME = mx('events', 'event_id')
MU = mx('events', 'user_id')
MD = mx('documents', 'doc_id')
MV = mx('embeddings', 'vec_id')

C = f"(SELECT unnest(range({n})) AS c)"

gen('region', f"SELECT * FROM {s('region')} ORDER BY r_regionkey")
gen('nation', f"SELECT * FROM {s('nation')} ORDER BY n_nationkey")
gen('customer', f"""
  SELECT c_custkey + c*{MC} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM {s('customer')}, {C} ORDER BY c, c_custkey""")
gen('supplier', f"""
  SELECT s_suppkey + c*{MS} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {s('supplier')}, {C} ORDER BY c, s_suppkey""")
gen('part', f"""
  SELECT p_partkey + c*{MP} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
  FROM {s('part')}, {C} ORDER BY c, p_partkey""")
gen('orders', f"""
  SELECT o_orderkey + c*{MO} AS o_orderkey, o_custkey + c*{MC} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {s('orders')}, {C} ORDER BY c, o_orderkey""")
gen('lineitem', f"""
  SELECT l_orderkey + c*{MO} AS l_orderkey, l_partkey + c*{MP} AS l_partkey,
         l_suppkey + c*{MS} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM {s('lineitem')}, {C} ORDER BY c, l_orderkey, l_linenumber""")
gen('events', f"""
  SELECT event_id + c*{ME} AS event_id, ts, user_id + c*{MU} AS user_id,
         event_type, value, props
  FROM {s('events')}, {C} ORDER BY c, event_id""")
gen('documents', f"""
  SELECT doc_id + c*{MD} AS doc_id, text, lang, source, n_chars
  FROM {s('documents')}, {C} ORDER BY c, doc_id""")
gen('embeddings', f"""
  SELECT vec_id + c*{MV} AS vec_id,
         list_prepend(CAST(embedding[1] + c*0.001 AS FLOAT), embedding[2:]) AS embedding,
         label
  FROM {s('embeddings')}, {C} ORDER BY c, vec_id""")

# Post-generate invariant: every key column must be UNIQUE in the output —
# a replicated fixture with colliding keys silently changes the semantics of
# every keyed-table query and key-grouped oracle CTE (round-10: 8/10 sf1
# failures were exactly this).
KEYS = {'customer': 'c_custkey', 'supplier': 's_suppkey', 'part': 'p_partkey',
        'orders': 'o_orderkey', 'events': 'event_id', 'documents': 'doc_id',
        'embeddings': 'vec_id'}
for t, k in KEYS.items():
    n_rows, n_keys = con.execute(
        f"SELECT count(*), count(DISTINCT {k}) FROM read_parquet('{dst}/{t}.parquet')"
    ).fetchone()
    assert n_rows == n_keys, f"{t}.{k}: {n_rows} rows but {n_keys} distinct keys"
print("key uniqueness OK", flush=True)
