#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify output
parquet against DuckDB running oracle_sql.json on the same sf tables.
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, duckdb, math, os

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver testdata is flat files; ScaleDataGen corpora are Spark dirs
    p = f"{sf}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        gcols = sorted(got.columns)
        gsel = con.sql("SELECT " + ', '.join(f'"{c}"' for c in gcols) + " FROM got ORDER BY ALL")
        gtypes = [str(t) for t in gsel.types]
        g = gsel.fetchall()
        exp = con.sql(sql)
        ecols = sorted(exp.columns)
        esel = con.sql("SELECT " + ', '.join(f'"{c}"' for c in ecols) + " FROM exp ORDER BY ALL")
        etypes = [str(t) for t in esel.types]
        e = esel.fetchall()
    except Exception as ex:
        print(f"FAIL {name}: error {ex}")
        fails += 1
        continue
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} vs {ecols}"); fails += 1; continue
    if gtypes != etypes:
        # the driver's hash is TYPE-sensitive (round 9: a HUGEINT oracle
        # column hash-mismatched value-identical BIGINT rows)
        print(f"FAIL {name}: types {dict(zip(gcols, gtypes))} vs "
              f"{dict(zip(ecols, etypes))}"); fails += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
    bad = None
    for i, (rg, re) in enumerate(zip(g, e)):
        if rg != re:
            # show first mismatch with float detail
            bad = (i, rg, re); break
    if bad:
        print(f"FAIL {name}: first mismatch row {bad[0]}:\n  got {bad[1]}\n  exp {bad[2]}")
        fails += 1
    else:
        print(f"OK   {name} ({len(g)} rows)")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
