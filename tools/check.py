#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: compare each
Verify-dumped query result against its DuckDB oracle (sorted columns,
sorted rows, exact values).

Usage: check.py <verify_outdir> <sf_dir> [--timeout SECS]
                [--only q1,q2] [--skip q3,q4] [--allow-timeouts yes]

--timeout bounds each ORACLE's DuckDB wall (the Spark side already ran
in Verify); a timed-out oracle reports ORACLE-TIMEOUT — it flags that
DuckDB could not replay the query at this scale within bounds, to be
re-verified at a smaller sf. Timed-out queries are not value failures,
but they ARE reduced coverage: the run exits 2 unless the caller
acknowledges with --allow-timeouts yes, so a CI caller keying on the
exit code can't treat an unverified sweep as green. Timeouts run each
oracle in a separate process (DuckDB can't be interrupted from a
signal handler mid-query)."""
import json, sys, glob, os, time
import duckdb

args, opts = [], {}
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a.startswith("--"):
        if i + 1 >= len(argv):
            sys.exit(f"usage: check.py <verify_outdir> <sf_dir> "
                     f"[--timeout SECS] [--only q1,q2] [--skip q3,q4] "
                     f"(missing value for {a})")
        opts[a.lstrip("-")] = argv[i + 1]
        i += 2
    else:
        args.append(a)
        i += 1
if len(args) != 2:
    sys.exit("usage: check.py <verify_outdir> <sf_dir> [--timeout SECS] "
             "[--only q1,q2] [--skip q3,q4]")
outdir, sfdir = args[0], args[1]
timeout = float(opts["timeout"]) if "timeout" in opts else None
only = set(opts["only"].split(",")) if "only" in opts else None
skip = set(opts["skip"].split(",")) if "skip" in opts else set()

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect():
    con = duckdb.connect()
    for t in TABLES:
        # driver corpora are single files; Spark-written ones (ScaleUp)
        # are directories of part files — glob those
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def _oracle_worker(sql, sfdir_, out):
    """Module-level so it pickles under spawn/forkserver start methods
    (a nested closure breaks --timeout mode entirely on macOS /
    forkserver-default Pythons)."""
    c = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir_}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    c.sql(sql).df().to_parquet(out)


def run_oracle_subprocess(sql, q):
    """Run one oracle in a child process; returns a DataFrame via
    parquet handoff, or None on timeout."""
    import multiprocessing as mp
    out = f"{outdir}/.oracle_{q}.parquet"
    p = mp.Process(target=_oracle_worker, args=(sql, sfdir, out))
    p.start()
    p.join(timeout)
    try:
        if p.is_alive():
            p.terminate()
            p.join()
            return None
        if p.exitcode != 0 or not os.path.exists(out):
            raise RuntimeError(f"oracle subprocess exit {p.exitcode}")
        import pandas as pd
        return pd.read_parquet(out)
    finally:
        # the timeout/error paths otherwise leave partial handoff files
        # accumulating in the verify outdir
        if os.path.exists(out):
            os.remove(out)


con = connect()
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# Expected set = the FULL declared query list (queries.json, dumped by
# Verify from SparkEntry.queries), not the result directories present: a
# query that throws on the Spark side produces no directory, and
# enumerating directories silently drops it from coverage (round 8: nine
# broken queries read as a 72/72 pass). Directories are unioned in so a
# stray extra result still gets checked; declared-but-missing = FAIL.
dirs = set(os.path.basename(p) for p in glob.glob(f"{outdir}/*")
           if os.path.isdir(p))
qlist = f"{outdir}/queries.json"
if os.path.exists(qlist):
    declared = set(json.load(open(qlist)))
else:
    # Fallback for dumps from an older Verify build. oracle_sql.json keys
    # under-count the declared set (ROWS-ONLY queries have no oracle entry),
    # so a Spark-side failure of such a query would be silently dropped —
    # make the reduced coverage loudly visible instead of letting a stale
    # Verify read as a clean sweep.
    print("WARNING: queries.json missing from outdir — stale Verify dump? "
          "Falling back to oracle_sql.json keys; ROWS-ONLY queries that "
          "failed Spark-side will NOT be counted as failures.",
          file=sys.stderr)
    declared = set(oracle.keys())
names = sorted(declared | dirs)
names = [n for n in names if (only is None or n in only) and n not in skip]
fails = 0
timeouts = []
for name in names:
    if name not in dirs:
        print(f"FAIL {name}: declared in SparkEntry.queries but no result "
              f"directory (Spark-side failure — see Verify stderr)")
        fails += 1; continue
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
    t0 = time.time()
    try:
        if timeout is not None:
            exp = run_oracle_subprocess(oracle[name], name)
            if exp is None:
                timeouts.append(name)
                print(f"ORACLE-TIMEOUT {name}: DuckDB exceeded {timeout:.0f}s "
                      f"(engine side ran; re-verify at smaller sf)")
                continue
        else:
            exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    dt = time.time() - t0
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
        print(f"OK        {name}: rows={len(got)} ({dt:.1f}s oracle)")
    else:
        diff = (gs != es).any(axis=1)
        print(f"FAIL {name}: value mismatch in {int(diff.sum())}/{len(g)} rows")
        idx = diff[diff].index[:3]
        for i in idx:
            print(f"  got: {g.loc[i].to_dict()}")
            print(f"  exp: {e.loc[i].to_dict()}")
        fails += 1
print(f"\n{len(names) - fails - len(timeouts)}/{len(names)} pass"
      + (f", {len(timeouts)} oracle-timeout: {','.join(timeouts)}" if timeouts else ""))
if fails:
    sys.exit(1)
if timeouts and opts.get("allow-timeouts") != "yes":
    print("exit 2: oracle timeouts reduced coverage "
          "(pass --allow-timeouts yes to acknowledge)")
    sys.exit(2)
sys.exit(0)
