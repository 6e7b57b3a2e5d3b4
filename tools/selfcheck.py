#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables and compare (exactly) against the
parquet Verify dumped for the same query. Columns sorted by name, rows
sorted by all columns, values compared exactly (floats bit-exact).

Each entry runs on a FRESH DuckDB connection with a spill directory and
a memory limit: on amplified dirs (30x/40x) the heavy oracle joins
(d4/d20's blocked token self-joins) otherwise accumulate allocations on
one shared connection until an unrelated 2 KB allocation OOMs the whole
run. A fresh connection releases everything per entry; the temp
directory lets the big joins go out-of-core instead of dying.
"""
import json, sys, os
import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
MEM_LIMIT = os.environ.get("GRAFT_DUCKDB_MEM", "64GB")
SPILL = os.environ.get("GRAFT_DUCKDB_SPILL", "/tmp/graft_duckdb_spill")


def make_con():
    c = duckdb.connect()
    c.execute(f"SET memory_limit='{MEM_LIMIT}'")
    c.execute(f"SET temp_directory='{SPILL}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(OUT_DIR)):
    p = os.path.join(OUT_DIR, name)
    if not os.path.isdir(p):
        continue
    con = make_con()
    try:
        got = con.sql(f"SELECT * FROM '{p}/*.parquet'").df()
        if name not in oracle:
            skips.append((name, len(got)))
            print(f"[selfcheck] SKIP {name}", file=sys.stderr, flush=True)
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            fails.append((name, f"oracle SQL error: {e}"))
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            fails.append((name, f"columns differ: got {gc} vs oracle {ec}"))
            continue
        dt = [c for c in gc if str(got[c].dtype) != str(exp[c].dtype)]
        if dt:
            fails.append((name, "dtype mismatch: " + ", ".join(
                f"{c} spark={got[c].dtype} duckdb={exp[c].dtype}" for c in dt)))
            continue
        g = got[gc].sort_values(gc, ignore_index=True)
        e = exp[gc].sort_values(gc, ignore_index=True)
        if len(g) != len(e):
            fails.append((name, f"row count: got {len(g)} vs oracle {len(e)}"))
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            passes.append((name, len(g)))
            print(f"[selfcheck] PASS {name}", file=sys.stderr, flush=True)
        except AssertionError as ex:
            fails.append((name, str(ex).split("\n")[0] + " | " +
                          "\n".join(str(ex).split("\n")[1:4])))
            print(f"[selfcheck] FAIL {name}", file=sys.stderr, flush=True)
    finally:
        con.close()

for n, r in passes:
    print(f"PASS {n} ({r} rows)")
for n, r in skips:
    print(f"SKIP (rows-only) {n} ({r} rows)")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
print(f"\n{len(passes)} pass, {len(skips)} rows-only, {len(fails)} fail")

# optional machine-readable result (arg 3): feeds the scale-coverage
# matrix (tools/scale_coverage.py) so "which entry is verified at which
# amplified scale" is a tracked artifact, not tribal knowledge
if len(sys.argv) > 3:
    json.dump({
        "sf_dir": SF_DIR,
        "pass": sorted(n for n, _ in passes),
        "rows_only": sorted(n for n, _ in skips),
        "fail": {n: m for n, m in fails},
    }, open(sys.argv[3], "w"), indent=2)
sys.exit(1 if fails else 0)
