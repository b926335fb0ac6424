#!/usr/bin/env python3
"""sf10 SUBSET fixture (round-13 verdict item 6): scale documents +
embeddings 10x past sf1 — the two tables the heavy LLM-pipeline operators
consume — while carrying the remaining star-schema tables over from the
source dir unchanged. Rationale: the O(tokens^3) CDC trap was only visible
at sf1; the next trap class will only show at sf10, and a documents-only
10x (≈10 MB -> ≈100 MB parquet, ~500k docs) fits the sandbox where a full
sf10 lineitem (60M rows) would just burn disk on queries this gate never
runs.

Replication discipline is gen_sf.py's: key offsets by stride max+1 (unique
keys proven post-generate), document text replicated VERBATIM (a
10x-duplicated corpus is exactly the dedup workload), embeddings perturbed
deterministically on component 0 per copy. Fully deterministic, no RNG.

Usage: gen_sf10_docs.py <src_dir (sf1)> <dst_dir> [copies=10]
"""
import duckdb
import os
import shutil
import sys

src, dst = sys.argv[1], sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute("SET preserve_insertion_order=true")


def s(t):
    return f"read_parquet('{src}/{t}.parquet')"


def gen(table, sql):
    out = f"{dst}/{table}.parquet"
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    print(table, con.execute(
        f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0], flush=True)


MD = con.execute(f"SELECT max(doc_id) FROM {s('documents')}").fetchone()[0] + 1
MV = con.execute(f"SELECT max(vec_id) FROM {s('embeddings')}").fetchone()[0] + 1
C = f"(SELECT unnest(range({n})) AS c)"

gen('documents', f"""
  SELECT doc_id + c*{MD} AS doc_id, text, lang, source, n_chars
  FROM {s('documents')}, {C} ORDER BY c, doc_id""")
gen('embeddings', f"""
  SELECT vec_id + c*{MV} AS vec_id,
         list_prepend(CAST(embedding[1] + c*0.001 AS FLOAT), embedding[2:]) AS embedding,
         label
  FROM {s('embeddings')}, {C} ORDER BY c, vec_id""")

for t, k in [('documents', 'doc_id'), ('embeddings', 'vec_id')]:
    rows, keys = con.execute(
        f"SELECT count(*), count(DISTINCT {k}) FROM read_parquet('{dst}/{t}.parquet')"
    ).fetchone()
    assert rows == keys, f"{t}.{k}: {rows} rows, {keys} distinct keys"
print("key uniqueness OK", flush=True)

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    print(f"{t} carried over from src", flush=True)
