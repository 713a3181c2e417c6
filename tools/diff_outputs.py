#!/usr/bin/env python3
"""Cross-fan-out output diff: compare two Verify dump dirs query by query.

Usage: python3 tools/diff_outputs.py <outDirA> <outDirB>

Run Verify twice at different SPARK_GRAFT_CPUS (different shuffle
fan-out => different partial-aggregation merge order) and diff every
query's parquet output exactly. Any oracle-checked query that differs
here would flake the driver's hash compare (the r4 text_entropy class).

Caveats:
- the query set is the UNION of both dumps, so a query that threw in
  one run (no dump dir) is reported, not silently skipped;
- rows compare via repr, so NaN == NaN (identical dumps with NaN
  columns don't produce bogus diffs);
- stream_sink_roundtrip resumes a checkpointed sink keyed on the
  source fingerprint: the second run reads back what the first wrote,
  so its "identical" result demonstrates exactly-once resume, not
  fan-out independence (its stream transform is a stateless
  projection, so there is no aggregation order to vary anyway).

Round-5 audit: all 150 oracle queries identical at cpus=8 vs cpus=3;
the only divergence was agg_kll_quantiles (randomized sketch
compaction -- rows-only by design, never hash-compared).
"""
import sys, os, duckdb

def rows_of(con, d, n, cols_sel):
    return con.sql(f"SELECT {cols_sel} FROM read_parquet('{d}/{n}/*.parquet')").fetchall()

def main(a, b):
    con = duckdb.connect()
    names_a = {d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d))}
    names_b = {d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d))}
    bad = []
    for n in sorted(names_a | names_b):
        if n not in names_a:
            bad.append((n, "missing in A (query failed in that run?)")); continue
        if n not in names_b:
            bad.append((n, "missing in B (query failed in that run?)")); continue
        try:
            ra = con.sql(f"SELECT * FROM read_parquet('{a}/{n}/*.parquet')")
            sel = ", ".join(f'"{c}"' for c in sorted(ra.columns))
            va = rows_of(con, a, n, sel)
            vb = rows_of(con, b, n, sel)
        except Exception as e:
            bad.append((n, f"read error: {e}")); continue
        # repr-compare: NaN == NaN, and nested lists/structs stringify
        if len(va) != len(vb):
            bad.append((n, f"rows {len(va)} vs {len(vb)}")); continue
        for i, (x, y) in enumerate(zip(va, vb)):
            if repr(x) != repr(y):
                bad.append((n, f"row {i}: {x!r} != {y!r}")); break
    print(f"compared {len(names_a | names_b)} queries")
    if bad:
        for n, m in bad:
            print("DIFF", n, m[:300])
        return 1
    print("ALL IDENTICAL across parallelism levels")
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
