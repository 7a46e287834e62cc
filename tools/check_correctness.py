#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs oracleSql, mimicking the
driver's DuckDB compare: run `sbt runMain graft.Verify <sfDir> <outDir>`
first, then this script compares each query's parquet dump against its
oracle SQL result (schema names, row count, and value hash after sorting
columns by name and rows by value).

Dev tool only (driver-side python/duckdb) — not part of the library.
Usage: python3 tools/check_correctness.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb

def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(str(x) for x in r))
    return sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        qname = qdir.rstrip("/").split("/")[-1]
        try:
            got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").df()
        except Exception as e:
            results[qname] = f"READ-FAIL {e}"
            continue
        if qname not in oracle:
            results[qname] = f"rows-only ({len(got)} rows)"
            continue
        try:
            exp = con.execute(oracle[qname]).df()
        except Exception as e:
            results[qname] = f"ORACLE-FAIL {type(e).__name__}: {e}"
            continue
        g_cols, e_cols = sorted(got.columns), sorted(exp.columns)
        if g_cols != e_cols:
            results[qname] = f"SCHEMA-MISMATCH got={g_cols} exp={e_cols}"
            continue
        if len(got) != len(exp):
            results[qname] = f"ROWCOUNT got={len(got)} exp={len(exp)}"
            continue
        gv = norm(got[g_cols].values.tolist())
        ev = norm(exp[e_cols].values.tolist())
        if gv != ev:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if a != b)
            results[qname] = f"VALUE-MISMATCH first diff at sorted row {diff[0]}: got={diff[1]} exp={diff[2]}"
        else:
            results[qname] = "OK"
    bad = {k: v for k, v in results.items()
           if not (v == "OK" or v.startswith("rows-only"))}
    for k in sorted(results):
        print(f"{'PASS' if k not in bad else 'FAIL':4} {k}: {results[k]}")
    print(f"\n{len(results) - len(bad)}/{len(results)} pass")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
