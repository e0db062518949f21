#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's output
against DuckDB executing SparkEntry.oracleSql on the same parquet tables,
compare row counts, schemas (column names) and values (columns sorted by
name, rows sorted, exact equality after the in-query rounding).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:160]}")
        fail += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        print(f"FAIL {name}: columns differ: duckdb={ec} spark={gc}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows differ: duckdb={len(exp)} spark={len(got)}")
        fail += 1
        continue
    e = exp[ec].sort_values(by=ec).reset_index(drop=True)
    g = got[ec].sort_values(by=ec).reset_index(drop=True)
    bad = None
    for c in ec:
        ev, gv = e[c].tolist(), g[c].tolist()
        for i, (x, y) in enumerate(zip(ev, gv)):
            ok = (x == y) or (x is None and y is None)
            if not ok and isinstance(x, float) and isinstance(y, float):
                ok = (math.isnan(x) and math.isnan(y)) or x == y
            if not ok:
                bad = (c, i, x, y)
                break
        if bad:
            break
    if bad:
        c, i, x, y = bad
        print(f"FAIL {name}: value mismatch col={c} row={i}: duckdb={x!r} spark={y!r}")
        fail += 1
    else:
        print(f"OK   {name}: {len(exp)} rows")
print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
