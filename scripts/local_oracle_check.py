#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load Verify output
parquet per query, run the oracle SQL in DuckDB over the same tables,
compare (column-name-sorted) values. Usage:
    python3 scripts/local_oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["lineitem", "orders", "customer", "part", "supplier", "nation",
          "region", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, rows_only = [], [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    if name not in oracle:
        rows_only.append((name, len(spark_df)))
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    # Mirror the driver's checker: sort columns by name AND sort rows by
    # all columns before comparing (the driver's t04 traceback shows it
    # calls sort_values itself, so query-side ORDER BY is not required).
    s = spark_df[sorted(spark_df.columns)]
    dk = duck_df[sorted(duck_df.columns)]
    try:
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        dk = dk.sort_values(by=list(dk.columns)).reset_index(drop=True)
    except TypeError as e:
        fails.append((name, f"unsortable output (driver would crash too): {e}"))
        continue
    if list(s.columns) != list(dk.columns):
        fails.append((name, f"columns differ: {list(s.columns)} vs {list(dk.columns)}"))
        continue
    if len(s) != len(dk):
        fails.append((name, f"row counts differ: {len(s)} vs {len(dk)}"))
        continue
    # Dtype-strict: the driver hashes VALUES, so int64 101 vs float64
    # 101.0 fails there even though `==` passes here (this is exactly how
    # the p01 HUGEINT->float64 drift hid locally in round 2). Any kind
    # mismatch (int vs float vs object) is a fail.
    dtype_drift = [
        (c, str(s[c].dtype), str(dk[c].dtype))
        for c in s.columns if s[c].dtype.kind != dk[c].dtype.kind
    ]
    if dtype_drift:
        fails.append((name, f"dtype drift (driver hash would differ): {dtype_drift}"))
        continue
    mismatch = None
    for c in s.columns:
        a, b = s[c], dk[c]
        try:
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                eq = (a.isna() & b.isna()) | (a == b)
            else:
                eq = (a.isna() & b.isna()) | (a.astype(object) == b.astype(object))
        except Exception as e:
            mismatch = (c, f"compare error {e}")
            break
        if not eq.all():
            i = (~eq).idxmax()
            mismatch = (c, f"row {i}: spark={a[i]!r} duck={b[i]!r}")
            break
    if mismatch:
        fails.append((name, f"value mismatch col {mismatch[0]}: {mismatch[1]}"))
    else:
        passes.append((name, len(s)))

print(f"PASS ({len(passes)}):")
for n, r in passes:
    print(f"  {n}: {r} rows")
print(f"ROWS-ONLY ({len(rows_only)}):")
for n, r in rows_only:
    print(f"  {n}: {r} rows")
print(f"FAIL ({len(fails)}):")
for n, msg in fails:
    print(f"  {n}: {msg}")
sys.exit(1 if fails else 0)
