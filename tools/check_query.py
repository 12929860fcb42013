#!/usr/bin/env python3
"""Dev tool: compare one (or more) SparkEntry query dumps against their
DuckDB oracles, mirroring the driver's compare (sort columns by name,
hash values). Usage:

  sbt "runMain graft.Verify <sfDir> /tmp/graft-verify"
  python3 tools/check_query.py <sfDir> /tmp/graft-verify [query ...]
"""
import sys, json, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) for i in order))
    return sorted(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
        sdf = con.execute(f"SELECT * FROM '{files[0]}'").fetchall()
        scols = [d[0] for d in con.description]
        try:
            odf = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}"); fails += 1; continue
        ok_rows = len(sdf) == len(odf)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = ok_schema and canon(sdf, scols) == canon(odf, ocols)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails += 1
            print(f"{name}: {status} rows={len(sdf)}/{len(odf)} "
                  f"schema={ok_schema} hash={ok_hash}")
            if ok_schema and not ok_hash:
                a, b = canon(sdf, scols), canon(odf, ocols)
                diff = [x for x in a if x not in b][:3]
                print("  spark-only sample:", diff)
                diff = [x for x in b if x not in a][:3]
                print("  oracle-only sample:", diff)
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
