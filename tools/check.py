#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: compare each
Verify-dumped query result against its DuckDB oracle (sorted columns,
sorted rows, exact values). Usage: check.py <verify_outdir> <sf_dir>"""
import json, sys, glob, os
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver corpora are single files; Spark-written ones (ScaleUp) are
    # directories of part files — glob those
    p = f"{sfdir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(os.path.basename(p) for p in glob.glob(f"{outdir}/*")
               if os.path.isdir(p))
fails = 0
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no result parquet"); fails += 1; continue
    got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    got = got[sorted(got.columns)]
    nrows = len(got)
    if name not in oracle:
        status = "ROWS-ONLY" if nrows > 0 else "FAIL(empty)"
        if nrows == 0: fails += 1
        print(f"{status:9} {name}: rows={nrows}")
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols got={list(got.columns)} exp={list(exp.columns)}")
        fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}"); fails += 1; continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    gs = g.astype(str); es = e.astype(str)
    if gs.equals(es):
        print(f"OK        {name}: rows={len(got)}")
    else:
        diff = (gs != es).any(axis=1)
        print(f"FAIL {name}: value mismatch in {int(diff.sum())}/{len(g)} rows")
        idx = diff[diff].index[:3]
        for i in idx:
            print(f"  got: {g.loc[i].to_dict()}")
            print(f"  exp: {e.loc[i].to_dict()}")
        fails += 1
print(f"\n{len(names) - fails}/{len(names)} pass")
sys.exit(1 if fails else 0)
