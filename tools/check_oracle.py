#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/<name>/ parquet (written by graft.Verify) and
<verify_out_dir>/oracle_sql.json, runs each oracle SQL in DuckDB against the
sf_dir parquet tables, and compares: schema (column names, sorted), row
count, and a hash of all values with columns sorted by name and rows sorted.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # make lists/arrays hashable for sorting
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if hasattr(v, "tolist")
                else (tuple(v) if isinstance(v, (list, tuple)) else v))
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    # --only-present: skip oracles whose output dir was not dumped (a
    # SPARK_GRAFT_ONLY-filtered Verify run) instead of failing them
    only_present = "--only-present" in sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only_present:
        import os
        oracles = {n: s for n, s in oracles.items()
                   if os.path.isdir(f"{out_dir}/{n}")}
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = canon(con.sql(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df())
            want = canon(con.sql(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        eq = got.equals(want)
        if not eq:
            diff_cols = [c for c in got.columns if not got[c].equals(want[c])]
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:3]:
                neq = got[c] != want[c]
                print(f"  {c}: got {got[c][neq].head(3).tolist()} want {want[c][neq].head(3).tolist()}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"{len(oracles) - failures}/{len(oracles)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
