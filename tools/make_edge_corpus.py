#!/usr/bin/env python3
"""Derive the adversarial edge corpus used by the round-8 sweep
(EDGE_SWEEP.md): empty / one-word / non-ASCII / repeated-token documents,
a zero and a constant embedding vector, a 3-user event slice, and a tiny
low-cardinality order/lineitem slice where relative-error bounds and
interpolation gaps bite.

Usage: python3 tools/make_edge_corpus.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001 → /tmp/edgesf
Then: sbt "runMain graft.Verify <out_dir> <dump>" and
      python3 tools/check_oracle_scaled.py <dump> <out_dir>
Expected: 198/200 (q89/q160 miss on the non-ASCII doc — the documented
byte==char ASCII oracle constraint; see EDGE_SWEEP.md)."""
import os
import sys

import duckdb


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/edgesf"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    con.sql(f"""
    COPY (
      WITH base AS (SELECT * FROM '{src}/documents.parquet' LIMIT 8),
      one AS (SELECT lang, source FROM base LIMIT 1)
      SELECT * FROM base
      UNION ALL SELECT 900001, '', lang, source, 0 FROM one
      UNION ALL SELECT 900002, 'word', lang, source, 4 FROM one
      UNION ALL SELECT 900003, 'naïve café über 日本語 emoji', lang, source, 26 FROM one
      UNION ALL SELECT 900004, 'a a a a a a a a a a a a a a a a', lang, source, 31 FROM one
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")

    con.sql(f"""
    COPY (
      WITH base AS (SELECT * FROM '{src}/embeddings.parquet' LIMIT 20),
      one AS (SELECT label FROM base LIMIT 1)
      SELECT * FROM base
      UNION ALL SELECT 900001,
        (SELECT list_transform(embedding, x -> CAST(0.0 AS FLOAT)) FROM base LIMIT 1),
        label FROM one
      UNION ALL SELECT 900002,
        (SELECT list_transform(embedding, x -> CAST(0.5 AS FLOAT)) FROM base LIMIT 1),
        label FROM one
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")

    con.sql(f"""
    COPY (
      WITH u AS (SELECT user_id FROM '{src}/events.parquet'
                 GROUP BY user_id ORDER BY COUNT(*) DESC LIMIT 3)
      SELECT e.* FROM '{src}/events.parquet' e JOIN u USING (user_id)
    ) TO '{out}/events.parquet' (FORMAT PARQUET)""")

    con.sql(f"""
    COPY (SELECT * FROM '{src}/orders.parquet' WHERE o_custkey % 50 = 1)
    TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
    COPY (SELECT l.* FROM '{src}/lineitem.parquet' l
          JOIN '{out}/orders.parquet' o ON l.l_orderkey = o.o_orderkey)
    TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")

    for t in ["customer", "supplier", "part", "nation", "region"]:
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    for t in ["documents", "embeddings", "events", "orders", "lineitem"]:
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
