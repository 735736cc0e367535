#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare with the Spark-side parquet
dumped by graft.Verify. Columns sorted by name; rows sorted; exact value
compare with a tiny report on mismatch."""
import sys, json, glob, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = skip = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISSING spark output: {name}"); fail += 1; continue
    got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"ORACLE ERROR {name}: {str(e)[:200]}"); fail += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"SCHEMA MISMATCH {name}: spark={gc} duckdb={ec}"); fail += 1; continue
    g = got[gc].sort_values(by=gc).reset_index(drop=True)
    e = exp[ec].sort_values(by=ec).reset_index(drop=True)
    if len(g) != len(e):
        print(f"ROWCOUNT MISMATCH {name}: spark={len(g)} duckdb={len(e)}"); fail += 1; continue
    mismatch = None
    for c in gc:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            eq = (a == b) or (isinstance(a, float) and isinstance(b, float)
                              and (a == b or (math.isnan(a) and math.isnan(b))))
            if not eq:
                mismatch = (c, i, a, b); break
        if mismatch: break
    if mismatch:
        c, i, a, b = mismatch
        print(f"VALUE MISMATCH {name}: col={c} row={i} spark={a!r} duckdb={b!r}")
        fail += 1
    else:
        print(f"OK {name} ({len(g)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
