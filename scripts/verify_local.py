#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/verify_local.py [sf_dir] [out_dir] [--skip-spark]

Runs graft.Verify (unless --skip-spark), then executes each oracle SQL in
DuckDB over the same parquet tables and compares to the Spark parquet dump:
columns sorted by name, rows sorted, values compared exactly.
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-spark" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo")
    errs = [l for l in (r.stdout + r.stderr).splitlines()
            if "[verify]" in l or "error" in l.lower()]
    for l in errs[:30]:
        print(l)
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); sys.exit(1)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints (nullable) and floats
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

n_pass = n_fail = 0
results = {}
for name in sorted(set(list(oracle.keys()))):
    spark_dir = Path(OUT) / name
    if not spark_dir.exists():
        print(f"FAIL {name}: spark output missing"); n_fail += 1; continue
    try:
        got = canon(con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df())
        want = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    ok = True
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); ok = False
    elif len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); ok = False
    else:
        # Dtype-strict: the driver compares stringified values, so a float64
        # oracle column ("1.0") vs a Spark int64 ("1") is a driver FAIL even
        # when values are numerically equal. Enforce dtype equality locally
        # so that class can never hide behind check_dtype=False again.
        dt_bad = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in got.columns if got[c].dtype != want[c].dtype]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch (spark vs oracle) {dt_bad}"); ok = False
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=True)
            except AssertionError as e:
                print(f"FAIL {name}: {str(e)[:400]}"); ok = False
    if ok:
        n_pass += 1; results[name] = "pass"
        print(f"PASS {name} ({len(got)} rows)")
    else:
        n_fail += 1; results[name] = "fail"

# rows-only queries (no oracle)
for name in sorted(p.name for p in Path(OUT).iterdir() if p.is_dir()):
    if name in oracle:
        continue
    n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{name}/*.parquet')").fetchone()[0]
    print(f"ROWS {name}: {n}")

print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} oracled")

# optional LOCALCHECK artifact: --json <path> [--round N]
if "--json" in sys.argv:
    out_path = sys.argv[sys.argv.index("--json") + 1]
    rnd = (int(sys.argv[sys.argv.index("--round") + 1])
           if "--round" in sys.argv else None)
    Path(out_path).write_text(json.dumps({
        "round": rnd,
        "sf": SF,
        "generated_by": "scripts/verify_local.py (dtype-strict)",
        "summary": f"{n_pass} pass / {n_fail} fail / {len(oracle)} oracled",
        "total": len(oracle),
        "pass": n_pass,
        "results": results,
    }, indent=1))
    print(f"wrote {out_path}")
sys.exit(0 if n_fail == 0 else 2)
