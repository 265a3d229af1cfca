#!/usr/bin/env python3
"""Dev-side mirror of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's parquet
against DuckDB executing the oracle SQL on the same tables.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64, ts -> ns
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures, passed, rows_only = [], [], []
    names = sorted(os.listdir(out_dir))
    for name in names:
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            failures.append((name, "no spark output parquet"))
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracle:
            rows_only.append((name, len(spark_df)))
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            failures.append((name, f"columns differ: spark={list(s.columns)} duck={list(d.columns)}"))
            continue
        if len(s) != len(d):
            failures.append((name, f"row count: spark={len(s)} duck={len(d)}"))
            continue
        try:
            pd.testing.assert_frame_equal(s, d, check_exact=True)
            passed.append((name, len(s)))
        except AssertionError as e:
            msg = str(e).split("\n")
            failures.append((name, " | ".join(msg[:6])))
    print(f"== PASSED ({len(passed)}):")
    for n, r in passed:
        print(f"   {n}: {r} rows exact-match")
    print(f"== ROWS-ONLY (no oracle) ({len(rows_only)}):")
    for n, r in rows_only:
        flag = "" if r > 0 else "  <-- EMPTY"
        print(f"   {n}: {r} rows{flag}")
    print(f"== FAILED ({len(failures)}):")
    for n, m in failures:
        print(f"   {n}: {m}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
