#!/usr/bin/env python3
"""Cross-fan-out output diff: compare two Verify dump dirs query by query.

Usage: python3 tools/diff_outputs.py <outDirA> <outDirB>

Run Verify twice at different SPARK_GRAFT_CPUS (different shuffle
fan-out => different partial-aggregation merge order) and diff every
query's parquet output exactly. Any oracle-checked query that differs
here would flake the driver's hash compare (the r4 text_entropy class).
Round-5 audit: all 150 oracle queries identical at cpus=8 vs cpus=3;
the only divergence was agg_kll_quantiles (randomized sketch
compaction -- rows-only by design, never hash-compared).
"""
import sys, os, duckdb
a, b = sys.argv[1], sys.argv[2]
con = duckdb.connect()
bad = []
names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
for n in names:
    if not os.path.isdir(os.path.join(b, n)):
        bad.append((n, "missing in b")); continue
    try:
        ra = con.sql(f"SELECT * FROM read_parquet('{a}/{n}/*.parquet')")
        cols = sorted(ra.columns)
        sel = ", ".join(f'"{c}"' for c in cols)
        va = con.sql(f"SELECT {sel} FROM read_parquet('{a}/{n}/*.parquet')").fetchall()
        vb = con.sql(f"SELECT {sel} FROM read_parquet('{b}/{n}/*.parquet')").fetchall()
    except Exception as e:
        bad.append((n, f"read error: {e}")); continue
    if va != vb:
        # find first diff
        msg = f"rows {len(va)} vs {len(vb)}"
        for i, (x, y) in enumerate(zip(va, vb)):
            if x != y:
                msg = f"row {i}: {x} != {y}"; break
        bad.append((n, msg))
print(f"compared {len(names)} queries")
if bad:
    for n, m in bad: print("DIFF", n, m[:300])
    sys.exit(1)
print("ALL IDENTICAL across parallelism levels")
