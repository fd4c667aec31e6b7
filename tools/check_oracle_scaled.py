#!/usr/bin/env python3
"""check_oracle with a per-query timeout — for correctness sweeps ABOVE
the driver's sf0.01 gate, where a brute-force DuckDB oracle (all-pairs
jaccard, recursive closure) can legitimately outgrow its budget without
the Spark answer being wrong.

Usage: python3 tools/check_oracle_scaled.py <verify_out_dir> <sf_dir> [timeout_s]

Each oracle runs in its own worker process, killed at the timeout and
reported separately from failures (a TIMEOUT is "oracle too slow at
this sf", never "wrong answer"). Round-8 sweep: Verify dumped at sf0.1,
this script at 180 s/query → 200/200 PASS, zero timeouts. The plain
tools/check_oracle.py stays the faithful replica of the driver's
gate-time compare."""
import json
import multiprocessing as mp
import os
import queue
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def one(name, sql, out_dir, sf_dir, q):
    import duckdb
    import pandas as pd

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(
                    lambda v: tuple(v.tolist()) if hasattr(v, "tolist")
                    else (tuple(v) if isinstance(v, (list, tuple)) else v))
        return df.sort_values(by=list(df.columns), ignore_index=True)

    try:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        got = canon(con.sql(
            f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df())
        want = canon(con.sql(sql).df())
    except Exception as e:  # noqa: BLE001
        q.put(f"FAIL {name}: exception {str(e)[:150]}")
        return
    if list(got.columns) != list(want.columns):
        q.put(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
    elif len(got) != len(want):
        q.put(f"FAIL {name}: rows {len(got)} != {len(want)}")
    elif not got.equals(want):
        diff = [c for c in got.columns if not got[c].equals(want[c])]
        q.put(f"FAIL {name}: value mismatch in {diff}")
    else:
        q.put(f"PASS {name} ({len(got)} rows)")


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 180.0
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    oracles = {n: s for n, s in oracles.items()
               if os.path.isdir(f"{out_dir}/{n}")}
    passed, failed, timed_out = 0, [], []
    for name, sql in sorted(oracles.items()):
        q = mp.Queue()
        p = mp.Process(target=one, args=(name, sql, out_dir, sf_dir, q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            timed_out.append(name)
            print(f"TIMEOUT {name} (> {timeout}s DuckDB)")
            continue
        # q.empty() right after join() races the Queue feeder thread's
        # flush — a passing worker could be misread as dead; a bounded
        # get() waits out the flush instead
        try:
            msg = q.get(timeout=5)
        except queue.Empty:
            msg = f"FAIL {name}: worker died"
        print(msg)
        if msg.startswith("PASS"):
            passed += 1
        else:
            failed.append(name)
    print(f"\n{passed} passed, {len(failed)} failed, {len(timed_out)} timed out "
          f"of {len(oracles)}")
    if failed:
        print("failed:", failed)
    if timed_out:
        print("timed out (oracle too slow at this sf, not a wrong answer):",
              timed_out)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
