# Local replica of the driver's correctness gate: run each oracle SQL in
# DuckDB over the sf tables and diff against the Verify parquet dumps.
# Usage: python3 scripts/check_oracle.py [sfDir] [verifyOutDir]
import duckdb, json, os, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r2"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out}/oracle_sql.json"))
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
fails = []
for name in sorted(oracles):
    if only is not None and name not in only:
        continue
    sql = oracles[name]
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        fails.append(name); print(f"{name}: NO_SPARK_DUMP {e}"); continue
    try:
        oracle_df = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append(name); print(f"{name}: ORACLE_SQL_ERROR {e}"); continue
    cols = sorted(spark_df.columns)
    ocols = sorted(oracle_df.columns)
    schema = cols == ocols
    rows = len(spark_df) == len(oracle_df)
    match = False
    dtype_ok = True
    if schema and rows:
        sd = spark_df[cols].sort_values(by=cols).reset_index(drop=True)
        od = oracle_df[cols].sort_values(by=cols).reset_index(drop=True)
        # Dtype-strict pre-check: stringified "1.0" (float64) vs "1" (int64)
        # is a driver FAIL even with equal values; surface the dtype drift
        # explicitly instead of letting astype(str) obscure the cause.
        bad = [(c, str(sd[c].dtype), str(od[c].dtype))
               for c in cols if sd[c].dtype != od[c].dtype]
        if bad:
            dtype_ok = False
            print(f"{name}: DTYPE {bad}")
        match = sd.astype(str).equals(od.astype(str))
    status = "OK" if (schema and rows and match and dtype_ok) else "FAIL"
    if status == "FAIL":
        fails.append(name)
    print(f"{name}: {status} rows={len(spark_df)}/{len(oracle_df)} "
          f"schema={schema} hash={match}")
print("FAILED:" if fails else "ALL GREEN", fails if fails else "")
sys.exit(1 if fails else 0)
