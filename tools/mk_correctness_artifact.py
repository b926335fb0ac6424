#!/usr/bin/env python3
"""Convert a t2_local.py full run log into a CORRECTNESS_*.json artifact in
the driver-gate shape (per-query rows/schema/hash + counts). t2's compare is
cell-exact over name-sorted columns and sorted rows, which subsumes the
driver's rows/schema/hash triple, so a PASS sets all three true.

Usage: mk_correctness_artifact.py <t2_full.out> <out.json> <sf-label>
"""
import json
import re
import sys

src, dst, sf = sys.argv[1], sys.argv[2], sys.argv[3]
out = {}
n_pass = n_fail = 0
for line in open(src):
    m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
    if m:
        out[m.group(1)] = {
            "rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": int(m.group(2)), "oracle_rows": int(m.group(2)),
            "err": None,
        }
        n_pass += 1
        continue
    m = re.match(r"FAIL (\S+):? ?(.*)", line)
    if m:
        out[m.group(1)] = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None,
            "err": m.group(2).strip()[:300] or "mismatch",
        }
        n_fail += 1

artifact = {"_meta": {
    "sf": sf,
    "method": "tools/t2_local.py cell-exact compare (name-sorted columns, "
              "sorted rows) over graft.Verify dumps vs DuckDB oracles",
    "n_pass": n_pass, "n_fail": n_fail, "n_total": n_pass + n_fail,
}}
artifact.update(dict(sorted(out.items())))
with open(dst, "w") as f:
    json.dump(artifact, f, indent=2)
print(f"{dst}: {n_pass} pass, {n_fail} fail")
