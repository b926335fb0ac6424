#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Usage: python3 tools/t2_local.py [sfDir] [outDir] [queryFilter...]

Reads outDir/oracle_sql.json (written by graft.Verify), runs each oracle in
DuckDB over the sfDir parquet tables, reads the corresponding Spark result
parquet, and compares: columns sorted by name, rows sorted, cell-exact.

Two extra gates beyond the cell-exact compare (round-1 driver findings):
- DECIMAL gate: FAIL any query whose final output contains a DECIMAL column
  on either side. The driver hashes Spark decimals as str(Decimal) but
  oracle decimals as float64 repr, so equal values hash-mismatch; the only
  safe contract is "no decimal in final output" (QDef.castDecimalOutputs +
  Verify's oracle wrapper enforce it engine-side; this catches regressions).
- T2_INORDER=1: skip the row sort, comparing in result order. Validates that
  every query's total ORDER BY survives both engines (and the Verify oracle
  wrapper's subquery) in case the driver's hash is row-order-sensitive.
"""
import duckdb, glob, json, os, sys
from decimal import Decimal

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])
inorder = os.environ.get("T2_INORDER") == "1"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm_cell(v):
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    return (type(v).__name__, str(v))

def norm_table(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out_rows = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    if not inorder:
        out_rows.sort(key=lambda r: [str(x) for x in r])
    return [cols[i] for i in order], out_rows

def decimal_cols(select_sql):
    """Column names whose DuckDB-inferred type is DECIMAL for a query."""
    rows = con.execute(f"DESCRIBE {select_sql}").fetchall()
    return [r[0] for r in rows if "DECIMAL" in str(r[1]).upper()]

def hugeint_cols(select_sql):
    """Column names DuckDB widens to HUGEINT/INT128 (e.g. bare sum(BIGINT)).

    Round-11 driver finding: the driver hashes HUGEINT cells differently
    from Spark's INT64 even when every value is equal, so a bare integer
    sum in an oracle silently fails hash_match. Verify's dialect adapter
    now casts every Spark-LongType output column to BIGINT in the oracle;
    this gate catches any path that bypasses the adapter (hand-run SQL,
    non-long Spark outputs paired with widening oracles).
    """
    rows = con.execute(f"DESCRIBE {select_sql}").fetchall()
    return [r[0] for r in rows
            if any(t in str(r[1]).upper() for t in ("HUGEINT", "INT128"))]

n_pass = n_fail = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    try:
        ohuge = hugeint_cols(oracle[name])
        if ohuge:
            print(f"FAIL {name}: HUGEINT in oracle output (driver hash "
                  f"asymmetry vs INT64): {ohuge} — CAST(... AS BIGINT)")
            n_fail += 1
            continue
        cur = con.execute(oracle[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
        n_fail += 1
        continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        continue
    cur = con.execute(f"SELECT * FROM read_parquet({files!r})")
    scols = [d[0] for d in cur.description]
    srows = cur.fetchall()
    sdec = decimal_cols(f"SELECT * FROM read_parquet({files!r})")
    odec = decimal_cols(oracle[name])
    if sdec or odec:
        print(f"FAIL {name}: DECIMAL in final output (driver hash asymmetry):"
              f" spark={sdec} oracle={odec}")
        n_fail += 1
        continue
    oc, orn = norm_table(ocols, orows)
    sc, srn = norm_table(scols, srows)
    if oc != sc:
        print(f"FAIL {name}: columns spark={sc} oracle={oc}")
        n_fail += 1
        continue
    if len(orn) != len(srn):
        print(f"FAIL {name}: rows spark={len(srn)} oracle={len(orn)}")
        n_fail += 1
        continue
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(srn, orn)) if a != b]
    if bad:
        i, a, b = bad[0]
        print(f"FAIL {name}: {len(bad)}/{len(srn)} differing rows; first at {i}:")
        print(f"  cols   {oc}")
        print(f"  spark  {a}")
        print(f"  oracle {b}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(srn)} rows)")
        n_pass += 1

print(f"\n{n_pass} passed, {n_fail} failed")
sys.exit(1 if n_fail else 0)
