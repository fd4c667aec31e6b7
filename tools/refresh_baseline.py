#!/usr/bin/env python3
"""Refresh bench_baseline.json: per-query MIN across the given full-bench
JSON files, plus an optional iso map (lane-order-sensitive rows).
Usage: refresh_baseline.py out.json run1.json run2.json [...]"""
import json, sys
out, runs = sys.argv[1], sys.argv[2:]
qs = {}
for r in runs:
    d = json.load(open(r))
    for k, v in d["queries"].items():
        qs[k] = min(qs.get(k, 1e18), v)
iso = {}
try:
    prev = json.load(open(out))
    iso = prev.get("iso", {})
except Exception:
    pass
doc = {"metric": "baseline",
       "note": "per-query MIN of isolated full benches at this HEAD; "
               "iso = isolated cost for lane-order-sensitive rows "
               "(guard triggers on max(queries,iso), fast check on queries)",
       "queries": dict(sorted(qs.items())), "iso": iso}
open(out, "w").write(json.dumps(doc, separators=(",", ":")) + "\n")
print(f"wrote {out}: {len(qs)} queries, iso={iso}")
