#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB with
the sf parquet tables registered as views, load the Spark parquet result,
sort columns by name, and compare row count, schema (column names) and
values. Exits nonzero on any mismatch.

Driver-side tooling only (duckdb/pandas/pyarrow are NOT available to the
Scala engine).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # date objects / strings: stringify for stable compare
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # Environment skew is a real failure mode: round 9's gate went red on
    # the driver's newer DuckDB (floor //) while local 1.0.0 (trunc //)
    # passed. Print the version so local-vs-driver runs are comparable.
    print(f"duckdb=={duckdb.__version__} pandas=={pd.__version__}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            want = normalize(con.execute(sql).df())
            got = normalize(
                pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"EXEC {type(e).__name__}: {e}"))
            continue
        if list(want.columns) != list(got.columns):
            failures.append((name, f"SCHEMA want={list(want.columns)} got={list(got.columns)}"))
            continue
        if len(want) != len(got):
            failures.append((name, f"ROWS want={len(want)} got={len(got)}"))
            continue
        try:
            pd.testing.assert_frame_equal(want, got, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
        except AssertionError as e:
            failures.append((name, "VALUES " + str(e).split("\n")[0]))
            continue
        print(f"  OK   {name} ({len(got)} rows)")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    print(f"{len(oracle) - len(failures)}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
