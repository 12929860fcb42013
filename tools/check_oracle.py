#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
<sfDir> parquet tables. Sorts columns by name, sorts rows, and compares
values cell-by-cell (exact for ints/strings, bit-exact for floats).
Dev-only tooling — the engine itself is pure Scala/Spark.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    def key(t):
        return tuple((x is None, str(type(x)), str(x)) for x in t)
    return sorted(out, key=key), [cols[i] for i in idx]

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # duckdb may give Decimal vs float etc.
    try:
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return float(a) == float(b)
    except Exception:
        pass
    return str(a) == str(b)

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out)):
        dirp = os.path.join(out, name)
        if not os.path.isdir(dirp):
            continue
        spark_rel = con.execute(
            f"SELECT * FROM parquet_scan('{dirp}/*.parquet')")
        scols = [d[0] for d in spark_rel.description]
        srows = spark_rel.fetchall()
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        try:
            orel = con.execute(oracles[name])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        s_rows, s_cols = norm(srows, scols)
        o_rows, o_cols = norm(orows, ocols)
        if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
            print(f"FAIL {name}: columns {s_cols} vs {o_cols}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rowcount {len(s_rows)} vs {len(o_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            for j, (x, y) in enumerate(zip(sr, orow)):
                if not cell_eq(x, y):
                    bad = (i, s_cols[j], x, y)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
